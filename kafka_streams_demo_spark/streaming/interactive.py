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


def state_get(
    spark: SparkSession,
    checkpoint: str,
    key: dict[str, object],
    **kwargs,
) -> DataFrame:
    """``store.get(key)``: point lookup as a filter over the state scan —
    ``key`` maps key-column name → value (composite keys supported)."""
    df = state_store(spark, checkpoint, **kwargs)
    for col, val in key.items():
        df = df.filter(F.col(col) == F.lit(val))
    return df


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """The store catalog for a checkpoint: operator ids/names, store
    names, partition counts, batch range — Kafka Streams'
    ``KafkaStreams.metadataForAllStreamsClients()`` role, minus the
    cluster (state lives in the checkpoint, not on stream instances)."""
    return spark.read.format("state-metadata").load(checkpoint)
