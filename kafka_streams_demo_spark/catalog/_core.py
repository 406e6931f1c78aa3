"""Catalog registry core: the QUERIES/ORACLES dicts, the @register
decorator, and the two helpers every family module shares. Family modules
(catalog/parity.py, analytics.py, llm.py, temporal.py, tpch_extra.py,
assembly.py, pq_tier.py) import from here and register on import;
``catalog/__init__.py`` imports them in the original inventory order and
exposes the driver contract (queries / oracle_sql / summary /
DRIVER_PRIORITY)."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_demo_spark.operators.kstream import KStream
from kafka_streams_demo_spark.operators.ktable import KTable
from kafka_streams_demo_spark.operators.windows import JoinWindows, SessionWindows, TimeWindows
from kafka_streams_demo_spark.sources.registry import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def cents(col: Column) -> Column:
    """Exact-comparable money: per-row round-to-cents then integer sum."""
    return F.round(col * 100, 0).cast("long")


def fixture_fingerprint(sf_dir: str, table: str) -> str:
    """(mtime_ns, size) digest of a fixture parquet — the cache-key salt
    for the session-lifetime persisted-index caches (ADVICE r11: keys on
    sf_dir alone silently serve a stale index if the fixture is
    regenerated mid-session). Cheap (one stat), no file read."""
    import os

    p = os.path.join(sf_dir, f"{table}.parquet")
    try:
        st = os.stat(p)
        return f"{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        return "absent"


def session_tmpdir(prefix: str) -> str:
    """mkdtemp registered for atexit removal — the persisted-index caches
    leak one dir per process otherwise (ADVICE r11)."""
    import atexit
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def _events_stream(spark, sf_dir, value="value") -> KStream:
    ev = load_table(spark, "events", sf_dir)
    return KStream.from_df(ev, key="user_id", value=value, timestamp="ts", offset="event_id")

