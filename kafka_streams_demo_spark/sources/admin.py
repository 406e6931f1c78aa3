"""Topic/table admin lifecycle — ConfigHelper parity.

The reference's ConfigHelper creates and deletes Kafka topics around each
example run (ConfigHelper.scala:36-57: createTopics with partitions /
replication, deleteTopic). The Spark-native analogue has two halves:

- the SESSION CATALOG, where this engine's "topics" live as tables
  (create_table / drop_table / list_tables below — real, tested), and
- the KAFKA CLUSTER, which only exists when a broker and an AdminClient
  library are present (create_topics / delete_topic passthroughs below —
  option-plumbing is real; the live call is gated on a kafka-python /
  confluent-kafka import, neither of which ships in this container).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def create_table(
    spark: SparkSession,
    name: str,
    schema: StructType | str | None = None,
    df: DataFrame | None = None,
    partition_cols: list[str] | None = None,
    mode: str = "error",
) -> None:
    """Create a catalog table from a schema (empty table) or a DataFrame.

    ConfigHelper.scala:36-44 creates topics before a run; catalog tables
    are the engine's topic namespace (sources/registry reads them, sinks
    saveAsTable into them)."""
    if (schema is None) == (df is None):
        raise ValueError("pass exactly one of schema= or df=")
    if df is None:
        df = spark.createDataFrame([], schema)
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.saveAsTable(name)


def drop_table(spark: SparkSession, name: str, purge: bool = False) -> bool:
    """Drop a catalog table if it exists (ConfigHelper.scala:50-57
    deleteTopic). Returns whether it existed."""
    existed = spark.catalog.tableExists(name)
    if existed:
        spark.sql(f"DROP TABLE {name}" + (" PURGE" if purge else ""))
    return existed


def list_tables(spark: SparkSession, pattern: str | None = None) -> list[str]:
    """Table names in the current database (optionally LIKE-filtered)."""
    return [
        t.name
        for t in (spark.catalog.listTables(pattern=pattern) if pattern
                  else spark.catalog.listTables())
    ]


def topic_configs(
    partitions: int = 1, replication: int = 1, **extra: str
) -> dict[str, object]:
    """NewTopic argument set matching ConfigHelper.scala:38-41 (topic name
    is supplied at create time; 1/1 are the reference's defaults)."""
    return {"num_partitions": partitions, "replication_factor": replication,
            "topic_configs": dict(extra)}


def _admin_client(brokers: str):
    """Import-gated Kafka AdminClient: kafka-python first, then
    confluent-kafka. Raises with an actionable message when neither is
    installed (this container ships neither — the live path runs only on
    a real deployment, same caveat as sources/kafka.py)."""
    try:
        from kafka.admin import KafkaAdminClient  # type: ignore

        return ("kafka-python", KafkaAdminClient(bootstrap_servers=brokers))
    except ImportError:
        pass
    try:
        from confluent_kafka.admin import AdminClient  # type: ignore

        return ("confluent-kafka", AdminClient({"bootstrap.servers": brokers}))
    except ImportError:
        raise ImportError(
            "Kafka topic admin needs kafka-python or confluent-kafka "
            "installed and a reachable broker; in this environment use the "
            "catalog-table half (create_table/drop_table) instead"
        ) from None


def create_topics(
    topics: list[str], brokers: str = "localhost:9092",
    partitions: int = 1, replication: int = 1,
) -> None:
    """ConfigHelper.scala:36-44 createTopics passthrough."""
    kind, client = _admin_client(brokers)
    cfg = topic_configs(partitions, replication)
    if kind == "kafka-python":
        from kafka.admin import NewTopic  # type: ignore

        client.create_topics([
            NewTopic(name=t, num_partitions=cfg["num_partitions"],
                     replication_factor=cfg["replication_factor"])
            for t in topics
        ])
    else:
        from confluent_kafka.admin import NewTopic  # type: ignore

        client.create_topics([
            NewTopic(t, num_partitions=cfg["num_partitions"],
                     replication_factor=cfg["replication_factor"])
            for t in topics
        ])


def delete_topic(topic: str, brokers: str = "localhost:9092") -> None:
    """ConfigHelper.scala:50-57 deleteTopic passthrough."""
    kind, client = _admin_client(brokers)
    if kind == "kafka-python":
        client.delete_topics([topic])
    else:
        client.delete_topics([topic])
