"""Source-layer tests: CSV scan with explicit schema, permissive parse +
dead-letter split (LogAndContinueExceptionHandler parity — SURVEY §2a/§2i),
and the strict-schema loaders.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_streams_demo_spark.sources.registry import (
    SCHEMAS,
    dead_letter_split,
    load_table,
    read_csv,
)

SONG_SCHEMA = (
    T.StructType()
    .add("id", T.IntegerType())
    .add("album", T.StringType())
    .add("artist", T.StringType())
    .add("song", T.StringType())
    .add("genre", T.StringType())
)

# Own fixture in the shape of the reference's song_source.csv (21 rows of
# id,album,artist,song,genre — orphaned scan fixture, SURVEY §2a), with one
# deliberately corrupt row (non-integer id) for the dead-letter path.
SONG_ROWS = [
    "1,Blue Train,John Coltrane,Locomotion,Jazz",
    "2,Kind of Blue,Miles Davis,So What,Jazz",
    "3,Giant Steps,John Coltrane,Naima,Jazz",
    "4,Head Hunters,Herbie Hancock,Chameleon,Funk",
    "oops,not-an-id-row,x,y,z",
    "5,Thrust,Herbie Hancock,Actual Proof,Funk",
]


@pytest.fixture
def song_csv(tmp_path):
    p = tmp_path / "songs.csv"
    p.write_text("\n".join(SONG_ROWS) + "\n")
    return str(p)


def test_csv_scan_permissive_dead_letter(spark, song_csv):
    df = read_csv(spark, song_csv, SONG_SCHEMA)
    good, dead = dead_letter_split(df)
    assert good.count() == 5
    assert "_corrupt_record" not in good.columns
    dead_rows = [r["raw"] for r in dead.collect()]
    assert dead_rows == ["oops,not-an-id-row,x,y,z"]
    # typed columns usable downstream
    jazz = good.filter(F.col("genre") == "Jazz")
    assert jazz.count() == 3
    assert dict(good.groupBy("artist").count().collect())["Herbie Hancock"] == 2


def test_csv_failfast_raises(spark, song_csv):
    from py4j.protocol import Py4JJavaError

    df = read_csv(spark, song_csv, SONG_SCHEMA, permissive=False)
    with pytest.raises(Exception):
        df.collect()


def test_load_table_strict_schema(spark):
    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    with pytest.raises(KeyError):
        load_table(spark, "nope", "/root/testdata/sf0.001")


def test_all_tables_load(spark):
    for name in SCHEMAS:
        df = load_table(spark, name, "/root/testdata/sf0.001")
        assert df.limit(1).count() == 1, name


def test_kafka_builder_options_and_serde():
    """builder.stream option plumbing (no broker needed): subscribe,
    AUTO_OFFSET_RESET parity, serde casts."""
    from kafka_streams_demo_spark.sources.kafka import kafka_options, select_serde

    opts = kafka_options("clicks", brokers="b1:9092,b2:9092", starting_offsets="latest")
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "clicks",
        "startingOffsets": "latest",
    }
    assert select_serde("string", "long") == [
        "CAST(key AS STRING) AS key",
        "CAST(CAST(value AS STRING) AS LONG) AS value",
        "timestamp",
        "offset",
    ]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported serde"):
        select_serde("string", "avro")


def test_kafka_stream_fails_clearly_without_connector(spark):
    """This container ships no Kafka connector jar: the builder must fail
    at load() with the standard missing-data-source error, not something
    cryptic from our plumbing."""
    import pytest as _pytest

    from kafka_streams_demo_spark.sources.kafka import kafka_stream

    with _pytest.raises(Exception, match="(?i)kafka"):
        kafka_stream(spark, "clicks")


def test_rate_stream_canonical_shape(spark, tmp_path):
    """Rate source arrives in the canonical record shape and feeds the
    usual operator layer (count by key, update mode)."""
    import time

    from kafka_streams_demo_spark.sources.registry import rate_stream

    src = rate_stream(spark, rows_per_second=200, num_keys=4)
    assert src.columns == ["key", "value", "timestamp", "offset"]
    q = (
        src.groupBy("key").count()
        .writeStream.format("memory").queryName("rate_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.monotonic() + 30
        n = 0
        while time.monotonic() < deadline:
            n = spark.table("rate_counts").count()
            if n > 0:
                break
            time.sleep(0.5)
        assert n > 0
        keys = {r["key"] for r in spark.table("rate_counts").collect()}
        assert keys <= {"0", "1", "2", "3"}
    finally:
        q.stop()


def test_catalog_table_lifecycle(spark):
    """create → exists → read → drop (ConfigHelper topic-lifecycle parity
    on the session catalog)."""
    import pytest

    from kafka_streams_demo_spark.sources.admin import (
        create_table,
        drop_table,
        list_tables,
    )

    drop_table(spark, "t_admin_lifecycle")
    create_table(spark, "t_admin_lifecycle", schema="k string, v long")
    assert "t_admin_lifecycle" in list_tables(spark)
    assert spark.table("t_admin_lifecycle").count() == 0
    df = spark.range(5).selectExpr("concat('k', id) AS k", "id AS v")
    create_table(spark, "t_admin_lifecycle", df=df, mode="overwrite")
    assert spark.table("t_admin_lifecycle").count() == 5
    assert drop_table(spark, "t_admin_lifecycle") is True
    assert drop_table(spark, "t_admin_lifecycle") is False
    with pytest.raises(ValueError, match="exactly one"):
        create_table(spark, "t_bad")


def test_topic_admin_gated_without_kafka_lib(spark):
    """The live AdminClient path must fail actionably when no Kafka client
    library is installed (this container), not with a bare ImportError."""
    import pytest

    from kafka_streams_demo_spark.sources.admin import create_topics, topic_configs

    assert topic_configs(3, 2, cleanup_policy="compact") == {
        "num_partitions": 3, "replication_factor": 2,
        "topic_configs": {"cleanup_policy": "compact"},
    }
    with pytest.raises(ImportError, match="create_table/drop_table"):
        create_topics(["t1"])


def test_read_jsonl_dead_letter_routing(spark, tmp_path):
    """JSON-lines source: good rows parse to the schema; malformed lines
    and lines failing the schema surface through the same dead_letter_split
    contract as CSV (LogAndContinue parity for JSON)."""
    from pyspark.sql import types as T

    from kafka_streams_demo_spark.sources.registry import (
        dead_letter_split,
        read_jsonl,
    )

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"k": "a", "v": 1}\n'
        'not json at all\n'
        '{"k": "b", "v": 2}\n'
        '{"k": "c", "v": "NaNope"}\n'
    )
    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("v", T.LongType()),
    ])
    df = read_jsonl(spark, str(p), schema)
    good, dead = dead_letter_split(df)
    assert {(r["k"], r["v"]) for r in good.collect()} == {("a", 1), ("b", 2)}
    dead_raws = [r["raw"] for r in dead.collect()]
    assert len(dead_raws) == 2
    assert any("not json" in r for r in dead_raws)
    assert any("NaNope" in r for r in dead_raws)


def test_kafka_contract_golden_schema_and_casts(spark):
    """Drift-pin for the broker-less path (VERDICT r3 task #4): the serde
    projections must run verbatim over the EXACT DataFrame schema
    spark-sql-kafka-0-10 emits, yielding the canonical record shape with
    correctly decoded values. If either the pinned connector schema or a
    cast expression drifts, this fails loudly without needing a broker."""
    import datetime as dt

    from kafka_streams_demo_spark.sources.kafka import (
        KAFKA_SOURCE_SCHEMA,
        kafka_sink_options,
        select_serde,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (b"alice", b"42", "clicks", 0, 7, t0, 0),
        (None, b"9", "clicks", 1, 8, t0, 0),  # null key is legal in Kafka
    ]
    df = spark.createDataFrame(rows, KAFKA_SOURCE_SCHEMA)

    out = df.selectExpr(*select_serde("string", "long"))
    assert [(f.name, f.dataType.simpleString()) for f in out.schema.fields] == [
        ("key", "string"), ("value", "bigint"),
        ("timestamp", "timestamp"), ("offset", "bigint"),
    ]
    got = {r["offset"]: (r["key"], r["value"]) for r in out.collect()}
    assert got == {7: ("alice", 42), 8: (None, 9)}

    # binary serde passes bytes through untouched
    raw = df.selectExpr(*select_serde("binary", "binary")).collect()
    assert {bytes(r["value"]) for r in raw} == {b"42", b"9"}

    # sink option dict is pure and golden
    assert kafka_sink_options("out-topic", "b1:9092", "/tmp/ckpt") == {
        "kafka.bootstrap.servers": "b1:9092",
        "topic": "out-topic",
        "checkpointLocation": "/tmp/ckpt",
    }
    assert "checkpointLocation" not in kafka_sink_options("t")
