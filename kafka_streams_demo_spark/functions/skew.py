"""Skew mitigation — salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; salting is the explicit tool for the pathological cases AQE can't
re-plan: a grouped aggregation where one key holds a double-digit share of
all rows (the classic hot-user / empty-string-key shape in training-data
pipelines).

``salted_aggregate`` runs the standard two-phase shape:
  phase 1  groupBy(key, salt)   — the hot key spreads over N partitions
  phase 2  groupBy(key)         — N partial rows per key combine to one
Both phases are hash aggregations with map-side combine; the phase-2
shuffle carries ≤ N rows per key regardless of skew.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Add a uniform salt derived from a per-row monotonic id (deterministic
    per partition layout, no RNG — keeps queries replayable)."""
    return df.withColumn(
        salt_col, F.pmod(F.monotonically_increasing_id(), F.lit(buckets)).cast("int")
    )


def salted_aggregate(
    df: DataFrame,
    key_col: str,
    partial: list[tuple[Callable[[], Column], str]],
    merge: list[tuple[Callable[[str], Column], str]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial``: (aggregate-expression factory, alias) applied per
    (key, salt); ``merge``: (combiner over the partial alias, final alias)
    applied per key. E.g. count = (count(1), 'c') then (sum('c'), 'cnt').
    """
    salted = with_salt(df, buckets)
    p1 = salted.groupBy(key_col, "_salt").agg(
        *[expr().alias(name) for expr, name in partial]
    )
    return p1.groupBy(key_col).agg(
        *[comb(name_in).alias(name_out) for (comb, name_out), (_, name_in) in zip(merge, partial)]
    )


def salted_count(df: DataFrame, key_col: str, buckets: int = 16) -> DataFrame:
    """Skew-safe count per key (the hot-key histogram)."""
    return salted_aggregate(
        df,
        key_col,
        partial=[(lambda: F.count(F.lit(1)), "c")],
        merge=[(lambda c: F.sum(c), "value")],
        buckets=buckets,
    )
