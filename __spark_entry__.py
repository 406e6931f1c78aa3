"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (clicks-per-region shape on sf0.001).
``queries()`` / ``oracle_sql()`` — the SURVEY §2 operator inventory, one
entry per implemented operator, each with a DuckDB-equivalent oracle
(see the kafka_streams_demo_spark/catalog/ package for the implementations).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_streams_demo_spark import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the golden clicks-per-region query shape (stream ⋈ table →
    re-key → sum) on the sf0.001 tables."""
    return catalog.stream_table_join_segment(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
