"""Stateful aggregation parity (SURVEY §2d) on fixture #6
(DSLStatefulTransformation.scala:40-44: key=(i%3), value=i, i=1..10)."""

from pyspark.sql import functions as F

from kafka_streams_demo_spark import KStream, KTable
from kafka_streams_demo_spark.sources import fixtures

# fixture #6: keys "1"(1,4,7,10) "2"(2,5,8) "0"(3,6,9)
EXPECTED_COUNT = {"0": 3, "1": 4, "2": 3}
EXPECTED_SUM = {"0": 18, "1": 22, "2": 15}
EXPECTED_MAX = {"0": 9, "1": 10, "2": 8}


def _kv(table):
    return {r["key"]: r["value"] for r in table.to_df().collect()}


def test_count(spark):
    """DSLStatefulTransformation.scala:63."""
    t = KStream(fixtures.stateful_input(spark)).group_by_key().count()
    assert _kv(t) == EXPECTED_COUNT


def test_aggregate_sum(spark):
    """DSLStatefulTransformation.scala:70-71: aggregate(0L)((k,new,agg)=>agg+new)."""
    t = KStream(fixtures.stateful_input(spark)).group_by_key().aggregate(lambda v: F.sum(v))
    assert _kv(t) == EXPECTED_SUM


def test_reduce_plus(spark):
    """DSLStatefulTransformation.scala:94-95: reduce(_+_)."""
    t = KStream(fixtures.stateful_input(spark)).group_by_key().reduce(lambda v: F.sum(v))
    assert _kv(t) == EXPECTED_SUM


def test_max_aggregation(spark):
    """ConfluentKStreamsDemoTest.java:31-52 custom max-agg."""
    t = KStream(fixtures.stateful_input(spark)).group_by_key().reduce(lambda v: F.max(v))
    assert _kv(t) == EXPECTED_MAX


def test_group_by_rekey_aggregate(spark):
    """DSLStatefulTransformation.scala:61: groupBy re-keys (here: parity of value)."""
    t = (
        KStream(fixtures.stateful_input(spark))
        .group_by(lambda k, v: (v % 2 == 0).cast("string"))
        .aggregate(lambda v: F.sum(v))
    )
    assert _kv(t) == {"true": 30, "false": 25}


def test_ktable_groupby_reduce_no_subtractor(spark):
    """DSLStatefulTransformation.scala:105-111: KTable.groupBy.reduce(adder,
    subtractor). Spark recomputes over the latest-state view — for the
    user_regions changelog, count per region must reflect alice's update
    (europe gains alice, asia loses her)."""
    regions = KTable.from_stream(KStream(fixtures.user_regions(spark)))
    per_region = regions.group_by(lambda k, v: v).count()
    assert _kv(per_region) == {"asia": 2, "americas": 2, "europe": 2}


def test_fold_applyinpandas(spark):
    """General non-algebraic fold escape hatch (Processor-API shaped):
    product of values per key via applyInPandas."""
    import pandas as pd

    def product(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"key": [pdf["key"].iloc[0]], "value": [int(pdf["value"].prod())]})

    out = (
        KStream(fixtures.stateful_input(spark))
        .group_by_key()
        .fold(product, "key string, value long")
    )
    got = {r["key"]: r["value"] for r in out.collect()}
    assert got == {"0": 3 * 6 * 9, "1": 1 * 4 * 7 * 10, "2": 2 * 5 * 8}


def test_approx_count_distinct_error_bound(spark):
    """approx_distinct_users (catalog): the HLL++ estimate at rsd=0.02 must
    land within 5% of the exact distinct count — the scale path for
    count-distinct without the dedup shuffle. The catalog entry is now the
    calibration shape (key, n_exact, within_3rsd — oracled since r11), so
    the raw estimate is asserted directly and the entry's booleans must
    all hold."""
    from kafka_streams_demo_spark import catalog

    sf = "/root/testdata/sf0.001"
    from kafka_streams_demo_spark.sources.registry import load_table

    ev = load_table(spark, "events", sf)
    both = {
        r["event_type"]: (r["est"], r["n"])
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("est"),
            F.count_distinct("user_id").alias("n"),
        )
        .collect()
    }
    # raw margin ratio |est-exact| / (3·rsd·exact + 1): the statistical
    # headroom behind the entry's within_3rsd boolean — printed so a
    # future red on new data is diagnosable as bound-tail vs regression
    # (ADVICE r11); must sit well inside the gate here.
    worst = max(
        abs(est - exact) / (3 * 0.02 * exact + 1.0)
        for est, exact in both.values()
    )
    print(f"approx_distinct_users margin ratio (1.0 = gate edge): {worst:.3f}")
    for k, (est, exact) in both.items():
        assert abs(est - exact) <= max(2, 0.05 * exact), (k, est, exact)
    entry = catalog.QUERIES["approx_distinct_users"](spark, sf).collect()
    assert {r["key"] for r in entry} == set(both)
    for r in entry:
        assert r["within_3rsd"], r
        assert r["n_exact"] == both[r["key"]][1]


def test_ktable_tombstone_delete_semantics(spark):
    """Null value = tombstone (Kafka changelog contract): a key whose LATEST
    record is a delete leaves the table; deleted-then-reborn survives with
    the reborn value; drop_tombstones=False keeps the null row visible."""
    df = spark.createDataFrame(
        [
            ("a", "v1", 1),
            ("a", None, 2),          # a deleted → gone
            ("b", "v1", 1),
            ("b", None, 2),
            ("b", "v3", 3),          # b reborn → v3
            ("c", "v9", 1),          # c untouched
        ],
        "key string, value string, offset long",
    )
    t = KTable.from_stream(KStream(df))
    got = {r["key"]: r["value"] for r in t.to_df().select("key", "value").collect()}
    assert got == {"b": "v3", "c": "v9"}
    raw = KTable.from_stream(KStream(df), drop_tombstones=False)
    got_raw = {r["key"]: r["value"] for r in raw.to_df().select("key", "value").collect()}
    assert got_raw == {"a": None, "b": "v3", "c": "v9"}


def test_cogroup_three_streams_mixed_types(spark):
    """cogroup folds N same-keyed streams (with distinct value types) in
    one aggregation: counts, sums, and maxes combine per key; keys present
    in only some streams still appear with null-coalesced parts."""
    from pyspark.sql import functions as F

    from kafka_streams_demo_spark import KStream
    from kafka_streams_demo_spark.operators.grouped import cogroup

    s1 = KStream(spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "z")], "key string, value string"
    )).group_by_key()
    s2 = KStream(spark.createDataFrame(
        [("a", 10), ("c", 5)], "key string, value long"
    )).group_by_key()
    s3 = KStream(spark.createDataFrame(
        [("b", 2.5), ("c", 7.5), ("c", 1.0)], "key string, value double"
    )).group_by_key()
    out = cogroup(
        [(s1, lambda v: F.count(v)), (s2, lambda v: F.sum(v)),
         (s3, lambda v: F.max(v))],
        merge=lambda p: F.concat_ws(
            ",",
            F.coalesce(p[0], F.lit(0)).cast("string"),
            F.coalesce(p[1], F.lit(0)).cast("string"),
            F.coalesce(p[2], F.lit(0.0)).cast("string"),
        ),
    )
    got = {r["key"]: r["value"] for r in out.to_df().collect()}
    assert got == {"a": "2,10,0.0", "b": "1,0,2.5", "c": "0,5,7.5"}


def test_cogroup_default_merge_sums_numeric_parts(spark):
    from pyspark.sql import functions as F

    from kafka_streams_demo_spark import KStream
    from kafka_streams_demo_spark.operators.grouped import cogroup

    s1 = KStream(spark.createDataFrame(
        [("a", 1), ("a", 2)], "key string, value long"
    )).group_by_key()
    s2 = KStream(spark.createDataFrame(
        [("a", 10), ("b", 20)], "key string, value long"
    )).group_by_key()
    out = cogroup([(s1, lambda v: F.sum(v)), (s2, lambda v: F.sum(v))])
    got = {r["key"]: r["value"] for r in out.to_df().collect()}
    assert got == {"a": 13, "b": 20}
