"""Join family parity (SURVEY §2f): windowed stream-stream inner/left/outer,
stream-table, table-table — combiner v1+v2 everywhere like the reference."""

import datetime as dt

from pyspark.sql import functions as F

from kafka_streams_demo_spark import KStream, KTable
from kafka_streams_demo_spark.operators.windows import JoinWindows
from kafka_streams_demo_spark.sources import fixtures

T0 = dt.datetime(2024, 1, 1)


def _pairs(stream):
    return sorted(
        (r["key"], r["value"]) for r in stream.to_df().collect()
    )


def test_stream_stream_inner_join_windowed(spark):
    """StreamToStreamJoinExample.scala:92 + KStreamTest.scala:140-162.
    topic1: (b,1)@1s (a,2)@2s; topic2: (b,1)@1.5s (a,2)@2.5s (a,7)@100s.
    1-s window pairs (b,1)+(b,1)=2 and (a,2)+(a,2)=4; the @100s record
    is outside every window (expiry)."""
    s1 = KStream(fixtures.join_input(spark, 1))
    s2 = KStream(fixtures.join_input(spark, 2))
    out = s1.join(s2, lambda v1, v2: v1 + v2, JoinWindows.of("1 second"))
    assert _pairs(out) == [("a", 4), ("b", 2)]


def test_stream_stream_left_join_windowed(spark):
    """StreamToStreamJoinExample.scala:93: left rows always emitted; no
    right match → combiner sees null (sum with null → null, Kafka's
    leftJoin(null) behavior surfaces as a null-combined value)."""
    s1 = KStream(fixtures.join_input(spark, 1))
    s2 = KStream(fixtures.join_input(spark, 2))
    # shrink window to 0.1 s so nothing matches
    out = s1.left_join(s2, lambda v1, v2: v1 + v2, JoinWindows.of("0.1 seconds"))
    assert _pairs(out) == [("a", None), ("b", None)]


def test_stream_stream_outer_join_windowed(spark):
    """StreamToStreamJoinExample.scala:94: both sides' unmatched rows emitted."""
    s1 = KStream(fixtures.join_input(spark, 1))
    s2 = KStream(fixtures.join_input(spark, 2))
    out = s1.outer_join(s2, lambda v1, v2: F.coalesce(v1, F.lit(0)) + F.coalesce(v2, F.lit(0)),
                        JoinWindows.of("1 second"))
    # matches (a,4) (b,2) + unmatched right (a,7)@100s → (a,7)
    assert _pairs(out) == [("a", 4), ("a", 7), ("b", 2)]


def test_stream_table_join(spark):
    """StreamToTableJoinExample.scala:107: inner — clicks for users with a
    region only; alice enriched with her LATEST region."""
    clicks = KStream(fixtures.user_clicks(spark))
    regions = KTable.from_stream(KStream(fixtures.user_regions(spark)))
    out = clicks.join(regions, lambda c, r: F.concat(r, F.lit(":"), c.cast("string")))
    got = _pairs(out)
    assert ("alice", "europe:13") in got and ("alice", "europe:40") in got
    assert len(got) == 8  # every click user has a region


def test_stream_table_left_join_missing_key(spark):
    """StreamToTableJoinExample.scala:108: left — user without region row
    still emitted, combiner sees null."""
    clicks_df = fixtures.user_clicks(spark)
    extra = spark.createDataFrame(
        [("ghost", 1, T0, 99)], "key string, value long, timestamp timestamp, offset long"
    )
    clicks = KStream(clicks_df.unionByName(extra))
    regions = KTable.from_stream(KStream(fixtures.user_regions(spark)))
    out = clicks.left_join(regions, lambda c, r: r)
    got = dict(_pairs(out) + [("_n", len(_pairs(out)))])
    assert got["ghost"] is None
    assert got["_n"] == 9


def test_table_table_joins(spark):
    """TableToTableJoinExample.scala:115-118: inner/left/outer over two
    changelogs. Left table: user→clicks (latest), right: user→region (latest)."""
    left = KTable.from_stream(KStream(fixtures.user_clicks(spark)))   # latest click per user
    right_rows = [("alice", "asia"), ("bob", "americas"), ("alice", "europe"), ("zed", "mars")]
    right_df = spark.createDataFrame(
        [(k, v, T0, i) for i, (k, v) in enumerate(right_rows)],
        "key string, value string, timestamp timestamp, offset long",
    )
    right = KTable.from_stream(KStream(right_df))

    inner = left.join(right, lambda v1, v2: F.concat_ws("-", v1.cast("string"), v2))
    got_inner = {r["key"]: r["value"] for r in inner.to_df().collect()}
    assert got_inner == {"alice": "40-europe", "bob": "19-americas"}

    outer = left.outer_join(right, lambda v1, v2: F.concat_ws("-", v1.cast("string"), v2))
    got_outer = {r["key"]: r["value"] for r in outer.to_df().collect()}
    assert got_outer["zed"] == "mars"          # right-only
    assert got_outer["chao"] == "25"           # left-only (concat_ws skips null)
    assert len(got_outer) == 7                 # 6 click users + zed


def test_ktable_tombstone_delete(spark):
    """Kafka null-value tombstone deletes the key from the view; a later
    re-insert resurrects it (order decided by offset)."""
    rows = [("a", "x", 0), ("b", "y", 1), ("a", None, 2), ("b", None, 3), ("b", "z", 4)]
    df = spark.createDataFrame(
        [(k, v, T0 + dt.timedelta(seconds=o), o) for k, v, o in rows],
        "key string, value string, timestamp timestamp, offset long",
    )
    view = {r["key"]: r["value"] for r in KTable.from_stream(KStream(df)).to_df().collect()}
    assert view == {"b": "z"}  # a deleted; b deleted then re-inserted


def test_global_ktable_join_broadcasts_and_never_shuffles_stream(spark):
    """GlobalKTable contract: the stream-table join against a global table
    pins a broadcast of the table side — zero Exchanges, so the stream
    needs no co-partitioning (builder.globalTable semantics)."""
    from pyspark.sql import functions as F

    from kafka_streams_demo_spark import KStream, KTable
    from kafka_streams_demo_spark.plans.explain import audit

    stream = KStream(
        spark.range(1000).selectExpr("concat('k', id % 50) AS key", "id AS value")
    )
    dim = spark.range(50).selectExpr("concat('k', id) AS key", "concat('d', id) AS value")
    gt = KTable.global_table(dim)
    out = stream.join(gt, lambda sv, tv: F.concat(tv, F.lit(":"), sv.cast("string")))
    a = audit(out.to_df())
    assert a.broadcast_joins >= 1, a.plan
    assert a.exchanges == 0, a.plan
    rows = {r["key"]: r["value"] for r in out.to_df().collect() if r["key"] == "k7"}
    assert rows["k7"].startswith("d7:"), rows


def test_global_ktable_survives_filter_and_map_values(spark):
    """Derived views of a GlobalKTable keep the pinned-broadcast contract
    (ADVICE r3: filter/map_values silently dropped global_)."""
    from pyspark.sql import functions as F

    from kafka_streams_demo_spark import KStream, KTable
    from kafka_streams_demo_spark.plans.explain import audit

    stream = KStream(
        spark.range(1000).selectExpr("concat('k', id % 50) AS key", "id AS value")
    )
    dim = spark.range(50).selectExpr("concat('k', id) AS key", "concat('d', id) AS value")
    derived = (
        KTable.global_table(dim)
        .filter(lambda k, v: k != F.lit("k9"))
        .map_values(lambda v: F.upper(v))
    )
    assert derived.global_
    out = stream.join(derived, lambda sv, tv: tv)
    a = audit(out.to_df())
    assert a.broadcast_joins >= 1, a.plan
    assert a.exchanges == 0, a.plan


def test_asymmetric_join_windows_builders(spark):
    """JoinWindows.with_before/with_after (the Kafka Streams
    .before()/.after() surface): after=0 keeps only right records at or
    before the left timestamp."""
    import datetime as dt

    from kafka_streams_demo_spark import KStream
    from kafka_streams_demo_spark.operators.windows import JoinWindows

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def stream(rows):
        return KStream(spark.createDataFrame(
            [(k, v, t0 + dt.timedelta(seconds=s)) for k, v, s in rows],
            "key string, value long, timestamp timestamp",
        ))

    left = stream([("a", 1, 10)])
    right = stream([("a", 100, 5), ("a", 200, 10), ("a", 300, 15)])

    w = JoinWindows.of("30 seconds").with_after("0 seconds")
    assert (w.before, w.after) == ("30 seconds", "0 seconds")
    got = sorted(r["value"] for r in
                 left.join(right, lambda a, b: b, w).to_df().collect())
    assert got == [100, 200]  # 15s-later record excluded by after=0

    w2 = JoinWindows.of("30 seconds").with_before("0 seconds")
    got2 = sorted(r["value"] for r in
                  left.join(right, lambda a, b: b, w2).to_df().collect())
    assert got2 == [200, 300]


def test_ktable_fk_join_semantics(spark):
    """KIP-213 FK join: left key preserved, many-to-one fan-in, left
    variant keeps unmatched rows with null right value, inner drops them."""
    from pyspark.sql import functions as F

    from kafka_streams_demo_spark import KTable

    orders = KTable(spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99)], "key long, value long"  # value = FK
    ))
    dims = KTable(spark.createDataFrame(
        [(10, "alice"), (20, "bob")], "key long, value string"
    ))
    inner = {r["key"]: r["value"] for r in orders.fk_join(
        dims, lambda v: v, lambda lv, rv: rv
    ).to_df().collect()}
    assert inner == {1: "alice", 2: "alice"}  # FK 99 unmatched -> dropped
    left = {r["key"]: r["value"] for r in orders.fk_join(
        dims, lambda v: v, lambda lv, rv: rv, how="left"
    ).to_df().collect()}
    assert left == {1: "alice", 2: "alice", 3: None}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="inner/left"):
        orders.fk_join(dims, lambda v: v, lambda lv, rv: rv, how="full")
