"""Blocked fuzzy matching / record linkage."""

from pyspark.sql import functions as F

from kafka_streams_demo_spark.functions.linkage import fuzzy_join, fuzzy_pairs


def _df(spark, names):
    return spark.createDataFrame([(n,) for n in names], "name string")


def test_fuzzy_pairs_basic_and_ordering(spark):
    df = _df(spark, ["red widget", "red widgets", "red bolt", "blue bolt", None])
    got = {
        (r["a_name"], r["b_name"]): r["dist"]
        for r in fuzzy_pairs(df, "name", max_dist=2).collect()
    }
    # same block 'red': widget/widgets dist 1; widget(s) vs bolt too far;
    # 'blue bolt' is another block — never compared to 'red bolt'
    assert got == {("red widget", "red widgets"): 1}


def test_fuzzy_pairs_dedupes_and_lowercases(spark):
    df = _df(spark, ["Red Widget", "red widget", "red widgets"])
    rows = fuzzy_pairs(df, "name", max_dist=1).collect()
    assert len(rows) == 1  # case-folded duplicates collapse in the dictionary


def test_fuzzy_pairs_block_cap_drops_hot_block(spark):
    hot = [f"common item{i}" for i in range(10)] + ["rare thing", "rare think"]
    df = _df(spark, hot)
    capped = fuzzy_pairs(df, "name", max_dist=2, max_block_size=5).collect()
    # the 10-name 'common' block is dropped; the 2-name 'rare' block survives
    assert {(r["a_name"], r["b_name"]) for r in capped} == {
        ("rare thing", "rare think")
    }


def test_fuzzy_join_cross_table(spark):
    l = _df(spark, ["acme corp", "globex inc"])
    r = spark.createDataFrame(
        [("acme corp.",), ("acme corpse",), ("initech llc",)], "vendor string"
    )
    got = {
        (x["l_name"], x["r_name"]): x["dist"]
        for x in fuzzy_join(l, r, "name", "vendor", max_dist=2).collect()
    }
    assert got == {
        ("acme corp", "acme corp."): 1,
        ("acme corp", "acme corpse"): 2,
    }


def test_fuzzy_pairs_no_cartesian_in_plan(spark):
    df = _df(spark, ["a b", "a c", "b d"])
    plan = (
        fuzzy_pairs(df, "name")._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan  # levenshtein is JVM-side
