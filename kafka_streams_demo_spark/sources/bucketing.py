"""Bucketed tables — shuffle-free co-located joins at scale.

At 100 TB the dominant cost of a fact⋈fact join is shuffling both sides on
the key. Writing both tables bucketed on the join key (same bucket count)
lets Spark satisfy the join's distribution requirement from the storage
layout: EnsureRequirements inserts NO Exchange, and each task joins one
bucket pair. This is the Spark analogue of the reference's co-partitioned
topics (Kafka Streams requires join inputs to have equal partition counts —
kafka-streams-demo relies on 1-partition topics, ConfigHelper.scala:37).

Bucketing rides the session catalog (``saveAsTable``): configure
``spark.sql.warehouse.dir`` somewhere writable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.

    Sorting within buckets additionally removes the Sort under a
    sort-merge join — the join becomes a pure streamed merge per bucket.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog table (bucket metadata comes with it)."""
    return spark.table(table)
