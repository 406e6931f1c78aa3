"""Golden fixtures from FIXTURES.md — the reference's test inputs as DataFrames.

Every fixture is the exact record set the reference pipes through
TopologyTestDriver (SURVEY §5), in canonical stream shape
``key, value, timestamp, offset`` (offset = arrival order, which drives
latest-per-key KTable resolution).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(i: int, step_s: float = 1.0) -> dt.datetime:
    return _T0 + dt.timedelta(seconds=i * step_s)


def _stream(spark: SparkSession, rows: list[tuple], value_type: str = "string") -> DataFrame:
    data = [(k, v, _ts(i), i) for i, (k, v) in enumerate(rows)]
    return spark.createDataFrame(
        data, schema=f"key string, value {value_type}, timestamp timestamp, offset long"
    )


def user_clicks(spark: SparkSession) -> DataFrame:
    """Fixture #1 (StreamToTableJoinTestData.scala:33-42)."""
    rows = [("alice", 13), ("bob", 4), ("chao", 25), ("bob", 19),
            ("dave", 56), ("eve", 78), ("alice", 40), ("fang", 99)]
    return _stream(spark, rows, "long")


def user_regions(spark: SparkSession) -> DataFrame:
    """Fixture #2 (StreamToTableJoinTestData.scala:45-53). alice updates
    asia→europe — the KTable update-resolution case."""
    rows = [("alice", "asia"), ("bob", "americas"), ("chao", "asia"),
            ("dave", "europe"), ("alice", "europe"), ("eve", "americas"),
            ("fang", "asia")]
    return _stream(spark, rows)


EXPECTED_CLICKS_PER_REGION = {"americas": 101, "europe": 109, "asia": 124}
"""Fixture #3 golden output (StreamToTableJoinTestData.scala:55-59)."""


def text_lines(spark: SparkSession) -> DataFrame:
    """Fixture #4 (WordCountScalaExample.scala:57-92 documented run)."""
    rows = [(None, "hello kafka streams"),
            (None, "all streams lead to kafka"),
            (None, "join kafka summit")]
    return _stream(spark, rows)


EXPECTED_WORD_COUNTS = {"hello": 1, "kafka": 3, "streams": 2, "all": 1,
                        "lead": 1, "to": 1, "join": 1, "summit": 1}
"""Golden histogram (WordCountScalaExample.scala:82-92)."""


def stateless_input(spark: SparkSession) -> DataFrame:
    """Fixture #5 (DSLStatelessTransformation.scala:34-38): key a/b/c by i%3."""
    rows = [({0: "a", 1: "b", 2: "c"}[i % 3], i) for i in range(1, 11)]
    return _stream(spark, rows, "long")


def stateful_input(spark: SparkSession) -> DataFrame:
    """Fixture #6 (DSLStatefulTransformation.scala:40-44): key=(i%3), v=i.
    Timestamps spread so records land in ≥2 tumbling 5-min windows and ≥2
    sessions per key (FIXTURES.md #6): 4-minute spacing."""
    rows = [(str(i % 3), i) for i in range(1, 11)]
    data = [(k, v, _ts(i, step_s=240.0), i) for i, (k, v) in enumerate(rows)]
    return spark.createDataFrame(
        data, schema="key string, value long, timestamp timestamp, offset long"
    )


def join_input(spark: SparkSession, topic: int) -> DataFrame:
    """Fixture #7 (StreamToStreamJoinExample.scala:50-57): key a/b by i%2,
    value 1..2. Topic 2 offset by 0.5 s (inside the 1 s JoinWindows) plus an
    extra late record outside the window to exercise expiry."""
    base = [({0: "a", 1: "b"}[i % 2], i) for i in range(1, 3)]
    shift = 0.0 if topic == 1 else 0.5
    data = [(k, v, _T0 + dt.timedelta(seconds=i + shift), i) for i, (k, v) in enumerate(base)]
    if topic == 2:
        data.append(("a", 7, _T0 + dt.timedelta(seconds=100.0), 2))
    return spark.createDataFrame(
        data, schema="key string, value long, timestamp timestamp, offset long"
    )


def kv_string_stream(spark: SparkSession) -> DataFrame:
    """Fixture #8 (KStreamTest.scala:44-51)."""
    rows = [("1", "value1"), ("2", "value2"), ("3", "value3")]
    return _stream(spark, rows)


def wc_processor_input(spark: SparkSession) -> DataFrame:
    """Fixture #9 (WordCountProcessorExample.scala:71-77)."""
    rows = [(str(i % 2), "Hello Kafka" if i % 2 == 0 else "Kafka Streams")
            for i in range(1, 6)]
    return _stream(spark, rows)


EXPECTED_PROCESSOR_COUNTS = {"kafka": 5, "streams": 3, "hello": 2}
"""Golden (WordCountProcessorExample.scala:42 split on \\s, lowercased)."""
