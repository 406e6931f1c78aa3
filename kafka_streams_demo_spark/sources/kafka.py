"""Kafka source/sink builders — builder.stream / stream.to parity.

The reference subscribes topics via ``builder.stream[K,V](topic)``
(WordCountScalaExample.scala:111) and writes with ``stream.to(topic)``
(WordCountScalaExample.scala:117); serdes imply the record types
(ConfigHelper.scala:26-29). Spark's Kafka connector emits the canonical
schema ``key binary, value binary, topic, partition, offset, timestamp,
timestampType`` — exactly our engine's record model (SURVEY §1) — so these
builders only add option plumbing plus the serde-equivalent casts.

Runtime requirement: the ``spark-sql-kafka-0-10`` package on the session's
classpath (``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``).
This container ships no Kafka jar or broker, so ``load``/``start`` raise —
the builders fail with a clear message and the option-plumbing logic is
unit-tested without a broker (tests/test_sources.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# The exact schema spark-sql-kafka-0-10 emits from load() — pinned here so
# the serde projections (and their tests) are checked against the real
# connector contract even though this container has no broker/jar. If the
# connector ever changes this shape, the golden contract test drifts loudly
# instead of the casts failing silently in production.
KAFKA_SOURCE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)

CANONICAL_CAST = {
    "string": "CAST({c} AS STRING) AS {c}",
    "long": "CAST(CAST({c} AS STRING) AS LONG) AS {c}",
    "binary": "{c}",
}


def kafka_options(
    topic: str,
    brokers: str = "localhost:9092",
    starting_offsets: str = "earliest",
) -> dict[str, str]:
    """The option set builder.stream implies: subscribe + AUTO_OFFSET_RESET
    (WordCountProcessorExample.scala:19 → startingOffsets=earliest)."""
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def select_serde(key_type: str = "string", value_type: str = "string") -> list[str]:
    """Serde-equivalent projection: Kafka's binary key/value cast to the
    declared types, event time preserved (SURVEY §2a)."""
    for t in (key_type, value_type):
        if t not in CANONICAL_CAST:
            raise ValueError(f"unsupported serde type {t!r}; known: {sorted(CANONICAL_CAST)}")
    return [
        CANONICAL_CAST[key_type].format(c="key"),
        CANONICAL_CAST[value_type].format(c="value"),
        "timestamp",
        "offset",
    ]


def kafka_stream(
    spark: SparkSession,
    topic: str,
    brokers: str = "localhost:9092",
    starting_offsets: str = "earliest",
    key_type: str = "string",
    value_type: str = "string",
) -> DataFrame:
    """builder.stream[K,V](topic): subscribe → canonical (key, value,
    timestamp, offset) stream with serde casts applied."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_options(topic, brokers, starting_offsets).items():
        reader = reader.option(k, v)
    return reader.load().selectExpr(*select_serde(key_type, value_type))


def kafka_sink_options(
    topic: str,
    brokers: str = "localhost:9092",
    checkpoint: str | None = None,
) -> dict[str, str]:
    """The option set stream.to implies, as a pure dict so the contract is
    testable without a broker (the writer path below just applies it)."""
    opts = {"kafka.bootstrap.servers": brokers, "topic": topic}
    if checkpoint:
        opts["checkpointLocation"] = checkpoint
    return opts


def kafka_sink(
    df: DataFrame,
    topic: str,
    brokers: str = "localhost:9092",
    checkpoint: str | None = None,
):
    """stream.to(topic): key/value serialized back to strings, returns the
    unstarted DataStreamWriter so callers control trigger/output mode."""
    writer = df.selectExpr(
        "CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value"
    ).writeStream.format("kafka")
    for k, v in kafka_sink_options(topic, brokers, checkpoint).items():
        writer = writer.option(k, v)
    return writer
