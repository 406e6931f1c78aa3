"""Stateless operator parity (SURVEY §2b) — mirrors KStreamTest.scala +
DSLStatelessTransformation.scala golden behavior on the exact fixtures."""

from pyspark.sql import functions as F

from kafka_streams_demo_spark import KStream
from kafka_streams_demo_spark.sources import fixtures


def _kv(stream):
    return sorted((r["key"], r["value"]) for r in stream.to_df().collect())


def test_filter(spark):
    """KStreamTest.scala:35-56: filter value != 'value2' keeps value1, value3
    and nothing else (the 'no further output' assertion)."""
    s = KStream(fixtures.kv_string_stream(spark))
    out = s.filter(lambda k, v: v != F.lit("value2"))
    assert _kv(out) == [("1", "value1"), ("3", "value3")]


def test_filter_not(spark):
    """KStreamTest.scala:58-79."""
    s = KStream(fixtures.kv_string_stream(spark))
    out = s.filter_not(lambda k, v: v == F.lit("value2"))
    assert _kv(out) == [("1", "value1"), ("3", "value3")]


def test_filter_key_predicate(spark):
    """DSLStatelessTransformation.scala:56: k != 'd' (all keys a/b/c pass)."""
    s = KStream(fixtures.stateless_input(spark))
    assert out_count(s.filter(lambda k, v: k != F.lit("d"))) == 10
    assert out_count(s.filter(lambda k, v: k == F.lit("a"))) == 3


def out_count(stream):
    return stream.to_df().count()


def test_map_values_upper(spark):
    """MapFunctionScalaExample.scala:117: uppercase values."""
    s = KStream(fixtures.kv_string_stream(spark))
    out = s.map_values(lambda v: F.upper(v))
    assert _kv(out) == [("1", "VALUE1"), ("2", "VALUE2"), ("3", "VALUE3")]


def test_map_rekey(spark):
    """MapFunctionScalaExample.scala:121: move value into key."""
    s = KStream(fixtures.kv_string_stream(spark))
    out = s.map(lambda k, v: (F.upper(v), v))
    assert _kv(out) == [("VALUE1", "value1"), ("VALUE2", "value2"), ("VALUE3", "value3")]


def test_map_split_colon(spark):
    """WordCountScalaExample.scala:123-126: split 'k:v' strings into pairs."""
    df = spark.createDataFrame(
        [(None, "a:1"), (None, "b:2")], "key string, value string"
    )
    out = KStream(df).map(
        lambda k, v: (F.split(v, ":")[0], F.split(v, ":")[1])
    )
    assert _kv(out) == [("a", "1"), ("b", "2")]


def test_select_key(spark):
    """DSLStatelessTransformation.scala:92 (charAt(0)) & KStreamTest.scala:120-138."""
    s = KStream(fixtures.kv_string_stream(spark))
    out = s.select_key(lambda k, v: F.substring(v, 1, 1))
    assert _kv(out) == [("v", "value1"), ("v", "value2"), ("v", "value3")]


def test_flat_map_values_tokenize(spark):
    """WordCountScalaExample.scala:114: lower + split \\W+ explodes words."""
    s = KStream(fixtures.text_lines(spark))
    words = s.flat_map_values(lambda v: F.split(F.lower(v), r"\W+"))
    vals = sorted(r["value"] for r in words.to_df().collect())
    assert len(vals) == 11  # 3 + 5 + 3 words
    assert vals.count("kafka") == 3


def test_flat_map_two_outputs(spark):
    """DSLStatelessTransformation.scala:61-66: each record emits
    (k, len(v)) and (k, len(k))."""
    s = KStream(fixtures.kv_string_stream(spark))
    out = s.flat_map(lambda k, v: [(k, F.length(v)), (k, F.length(k))])
    got = _kv(out)
    assert len(got) == 6
    assert got.count(("1", 6)) == 1 and got.count(("1", 1)) == 1


def test_branch_first_match_wins(spark):
    """DSLStatelessTransformation.scala:48-53: prefix-a / prefix-b / default,
    first match wins, branches are disjoint and cover the stream."""
    s = KStream(fixtures.stateless_input(spark))
    a, b, rest = s.branch(
        lambda k, v: k.startswith("a"),
        lambda k, v: k.startswith("b"),
        lambda k, v: F.lit(True),
    )
    ca, cb, cr = a.to_df().count(), b.to_df().count(), rest.to_df().count()
    assert (ca, cb, cr) == (3, 4, 3)  # keys: i%3==0→a (3,6,9), 1→b (1,4,7,10), else c
    # overlap check: 'a' branch predicate is also true of nothing in rest
    assert rest.filter(lambda k, v: k.startswith("a")).to_df().count() == 0


def test_merge(spark):
    s1 = KStream(fixtures.kv_string_stream(spark))
    s2 = KStream(fixtures.kv_string_stream(spark))
    assert s1.merge(s2).to_df().count() == 6


def test_peek_and_foreach_side_effects(spark):
    """KStreamTest.scala:81-118: foreach/peek run the action per record;
    peek passes the stream through unchanged AND is lazy — no job runs
    until the returned stream's own action (VERDICT r4 #3)."""
    s = KStream(fixtures.kv_string_stream(spark))
    acc = spark.sparkContext.accumulator(0)

    def bump(row):
        acc.add(1)

    out = s.peek(bump)
    # laziness pin: building the peeked stream triggered no job — the
    # side effect has not run yet
    assert acc.value == 0
    assert out.to_df().count() == 3
    assert acc.value == 3
    # pass-through: records unchanged by the tap
    assert _kv(out) == [("1", "value1"), ("2", "value2"), ("3", "value3")]
    acc2 = spark.sparkContext.accumulator(0)
    s.foreach(lambda row: acc2.add(1))
    assert acc2.value == 3


def test_observe_metric_tap(spark):
    from pyspark.sql import Observation  # noqa: F401 — engine uses named observe

    s = KStream(fixtures.kv_string_stream(spark))
    out = s.observe("tap", F.count(F.lit(1)).alias("n"))
    assert out.to_df().count() == 3


def test_repartition_prepositions_key_hash(spark):
    """repartition(): values survive unchanged, partition count is honored,
    and rows with equal keys land in the same partition (co-location — the
    contract stateful ops rely on)."""
    from pyspark.sql import functions as F

    from kafka_streams_demo_spark import KStream

    df = spark.range(200).selectExpr(
        "concat('k', id % 7) AS key", "id AS value"
    )
    s = KStream(df).repartition(8)
    out = s.to_df()
    assert out.rdd.getNumPartitions() == 8
    assert sorted(r["value"] for r in out.collect()) == list(range(200))
    parts = (
        out.select("key", F.spark_partition_id().alias("pid"))
        .distinct()
        .groupBy("key")
        .count()
        .collect()
    )
    assert all(r["count"] == 1 for r in parts), parts


def test_split_named_branches_with_default(spark):
    """KIP-418 split(): named branches, first-match-wins, default catches
    the rest; branches partition the stream exactly."""
    from pyspark.sql import functions as F

    from kafka_streams_demo_spark import KStream

    df = spark.createDataFrame(
        [("apple", 1), ("avocado", 2), ("banana", 3), ("cherry", 4)],
        "key string, value long",
    )
    out = KStream(df).split(
        {"a_words": lambda k, v: k.startswith("a"),
         "small": lambda k, v: v <= 3},
        default="rest",
    )
    assert list(out) == ["a_words", "small", "rest"]
    got = {name: sorted(r["key"] for r in s.to_df().collect())
           for name, s in out.items()}
    # first-match-wins: banana matches only 'small'; cherry matches nothing
    assert got == {"a_words": ["apple", "avocado"],
                   "small": ["banana"], "rest": ["cherry"]}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="collides"):
        KStream(df).split({"x": lambda k, v: v > 0}, default="x")


def test_split_null_predicate_routes_to_default(spark):
    """Review r4: a NULL predicate result (v > 10 with v = NULL) must land
    in the default branch, not vanish from every branch."""
    from pyspark.sql import functions as F

    from kafka_streams_demo_spark import KStream

    df = spark.createDataFrame(
        [("a", 20), ("b", 5), ("c", None)], "key string, value long"
    )
    out = KStream(df).split({"big": lambda k, v: v > 10}, default="rest")
    assert {r["key"] for r in out["big"].to_df().collect()} == {"a"}
    assert {r["key"] for r in out["rest"].to_df().collect()} == {"b", "c"}


def test_branch_null_predicate_does_not_poison_later_branches(spark):
    """ADVICE r4 repro: a row whose FIRST predicate evaluates to NULL but
    whose SECOND predicate is TRUE must land in the second branch —
    NULL uniformly means 'did not match', and branches + default exactly
    partition the stream."""
    df = spark.createDataFrame(
        [("a", 20), ("b", None), ("c", 3)], "key string, value long"
    )
    out = KStream(df).split(
        {"big": lambda k, v: v > 5, "nullv": lambda k, v: v.isNull()},
        default="rest",
    )
    got = {name: sorted(r["key"] for r in s.to_df().collect())
           for name, s in out.items()}
    # pre-fix: ("b", NULL) vanished from every branch INCLUDING default
    assert got == {"big": ["a"], "nullv": ["b"], "rest": ["c"]}
    total = sum(len(v) for v in got.values())
    assert total == df.count()  # exact partition, no loss, no duplication
