"""Interactive queries — the Kafka Streams ReadOnlyKeyValueStore surface.

Kafka Streams exposes running state stores for reads:
``KafkaStreams.store(name, QueryableStoreTypes.keyValueStore())`` then
``store.all()`` / ``store.get(key)`` / ``store.approximateNumEntries()``
(the API family the reference's store-backed processors
(WordCountProcessorExample.scala:25,83-85) would be queried through).

Spark's idiomatic equivalent is the state data source reader (Spark 4):
ANY streaming query's state store is queryable from its checkpoint as a
DataFrame — no side-channel server inside the stream job, the same
Catalyst scan path as every other table, and it works offline (after the
query stopped) or between micro-batches of a live query. Point lookups
are plain filters, so predicate pushdown/pruning apply.

Scale: the reader maps state-store partitions to scan tasks — a 100 TB
RocksDB state reads like any partitioned table. No driver materialization
anywhere here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_store(
    spark: SparkSession,
    checkpoint: str,
    operator_id: int = 0,
    store_name: str | None = None,
    batch_id: int | None = None,
    flatten: bool = True,
) -> DataFrame:
    """``store.all()``: the full contents of one streaming state store.

    ``operator_id``/``store_name`` address a store when the query has
    several stateful operators; ``batch_id`` time-travels to an earlier
    micro-batch's state (Kafka Streams has no equivalent — checkpointed
    state versions come free with Spark's incremental checkpoint).
    ``flatten`` unnests the (key struct, value struct) shape into plain
    columns."""
    reader = spark.read.format("statestore").option("operatorId", operator_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    df = reader.load(checkpoint)
    if not flatten:
        return df
    return df.select("key.*", "value.*", "partition_id")


def state_partition(
    spark: SparkSession, key: dict[str, object], num_partitions: int
) -> int:
    """The state-store partition holding ``key``: streaming state is laid
    out by ``HashPartitioning(grouping_keys, n)`` = ``pmod(murmur3_hash(
    keys), n)``, which is exactly ``F.hash`` — pinned against the
    ``partition_id`` column the state source reports
    (tests/test_streaming.py). One 1-row JVM job (the hash must be
    Spark's own, not Python's)."""
    row = spark.createDataFrame([tuple(key.values())], list(key.keys())).select(
        F.pmod(F.hash(*[F.col(c) for c in key.keys()]), F.lit(num_partitions))
        .alias("p")
    ).first()
    return int(row["p"])


def state_get(
    spark: SparkSession,
    checkpoint: str,
    key: dict[str, object],
    prune_partition: bool = True,
    **kwargs,
) -> DataFrame:
    """``store.get(key)``: point lookup — ``key`` maps key-column name →
    value (composite keys supported).

    ``prune_partition`` additionally computes the ONE state partition the
    key hashes to (``state_partition``, partition count read from the
    checkpoint's metadata) and filters ``partition_id`` to it. Honesty
    note: today's state source evaluates both filters AFTER the scan (no
    SupportsPushDownFilters — the plan shows a codegen Filter directly
    over the BatchScan, pinned in tests), so this bounds which partition
    may EMIT rows, not which partitions are opened; the partition
    computation is what lets a deployment route a true single-partition
    read (and makes the lookup prune for free the day the source learns
    pushdown). Order ``key`` columns exactly as the query's groupBy keys —
    the composite hash is order-sensitive."""
    df = state_store(spark, checkpoint, **kwargs)
    if prune_partition:
        meta = state_metadata(spark, checkpoint)
        op = kwargs.get("operator_id", 0)
        n = int(
            meta.filter(F.col("operatorId") == op).select("numPartitions").first()[0]
        )
        df = df.filter(
            F.col("partition_id") == F.lit(state_partition(spark, key, n))
        )
    for col, val in key.items():
        df = df.filter(F.col(col) == F.lit(val))
    return df


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """The store catalog for a checkpoint: operator ids/names, store
    names, partition counts, batch range — Kafka Streams'
    ``KafkaStreams.metadataForAllStreamsClients()`` role, minus the
    cluster (state lives in the checkpoint, not on stream instances)."""
    return spark.read.format("state-metadata").load(checkpoint)
