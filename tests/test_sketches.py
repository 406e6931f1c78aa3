"""Deterministic HLL / count-min sketches (functions/sketches.py).

Catalog entries carry the cross-engine hash gate (tools/check_oracle.py);
these tests pin the sketch guarantees themselves: estimate error bounds,
exact mergeability, the overestimate-only CMS contract, and input
validation."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_streams_demo_spark.functions.sketches import (
    cms_estimate,
    cms_merge,
    cms_sketch,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _values_df(spark, values):
    return spark.createDataFrame([Row(v=v) for v in values])


def test_hll_estimate_error_bound(spark):
    # 2000 distinct values at p=9 (m=512): rsd ~ 1.04/sqrt(512) ~ 4.6%;
    # assert within 4 sigma.
    n = 2000
    df = _values_df(spark, [f"user-{i}" for i in range(n)])
    est = hll_estimate(hll_registers(df, "v", p=9), p=9).collect()[0]["estimate"]
    assert abs(est - n) / n < 4 * 1.04 / (512**0.5)


def test_hll_small_range_linear_counting(spark):
    # 20 distinct << m: the linear-counting branch should be near-exact.
    df = _values_df(spark, [f"u{i}" for i in range(20)])
    est = hll_estimate(hll_registers(df, "v", p=9), p=9).collect()[0]["estimate"]
    assert abs(est - 20) <= 2


def test_hll_duplicates_do_not_move_estimate(spark):
    once = _values_df(spark, [f"x{i}" for i in range(100)])
    thrice = _values_df(spark, [f"x{i % 100}" for i in range(300)])
    r1 = sorted(map(tuple, hll_registers(once, "v", p=9).collect()))
    r3 = sorted(map(tuple, hll_registers(thrice, "v", p=9).collect()))
    assert r1 == r3


def test_hll_merge_equals_rebuild(spark):
    a = _values_df(spark, [f"a{i}" for i in range(150)])
    b = _values_df(spark, [f"a{i}" for i in range(100, 250)])  # overlap
    merged = sorted(
        map(
            tuple,
            hll_merge(
                hll_registers(a, "v", p=7), hll_registers(b, "v", p=7)
            ).collect(),
        )
    )
    full = sorted(
        map(
            tuple,
            hll_registers(a.unionByName(b), "v", p=7).collect(),
        )
    )
    assert merged == full


def test_hll_null_inputs_ignored(spark):
    df = spark.createDataFrame([Row(v="a"), Row(v=None), Row(v="b")])
    regs = hll_registers(df, "v", p=9)
    est = hll_estimate(regs, p=9).collect()[0]["estimate"]
    assert abs(est - 2) <= 1


def test_hll_p_validation():
    with pytest.raises(ValueError):
        hll_registers(None, "v", p=3)


def test_cms_overestimates_only_and_exact_when_sparse(spark):
    vals = [f"k{i % 50}" for i in range(500)]  # each key 10x
    df = _values_df(spark, vals)
    sk = cms_sketch(df, "v", depth=3, width=256)
    items = df.distinct()
    est = {
        r["item"]: r["cms_count"]
        for r in cms_estimate(sk, items, "v", depth=3, width=256).collect()
    }
    assert all(est[f"k{i}"] >= 10 for i in range(50))
    # 50 distinct into 256 buckets x 3 rows: min-over-rows should be exact
    # for nearly all keys; assert the total overshoot is tiny.
    assert sum(est[f"k{i}"] - 10 for i in range(50)) <= 20


def test_cms_merge_equals_rebuild(spark):
    a = _values_df(spark, [f"m{i % 7}" for i in range(70)])
    b = _values_df(spark, [f"m{i % 11}" for i in range(110)])
    merged = sorted(
        map(
            tuple,
            cms_merge(
                cms_sketch(a, "v", 3, 64), cms_sketch(b, "v", 3, 64)
            ).collect(),
        )
    )
    full = sorted(map(tuple, cms_sketch(a.unionByName(b), "v", 3, 64).collect()))
    assert merged == full


def test_cms_missing_item_estimates_small(spark):
    df = _values_df(spark, [f"p{i}" for i in range(20)])
    sk = cms_sketch(df, "v", depth=3, width=128)
    items = _values_df(spark, ["never-seen"])
    est = cms_estimate(sk, items, "v", depth=3, width=128).collect()[0]["cms_count"]
    # unseen key: min over 3 rows of mostly-empty cells — bounded by the
    # worst single-cell collision mass (each cell holds <= a few of the
    # 20 singleton counts).
    assert 0 <= est <= 3


def test_cms_validation():
    with pytest.raises(ValueError):
        cms_sketch(None, "v", depth=0, width=128)
    with pytest.raises(ValueError):
        cms_merge()
    with pytest.raises(ValueError):
        hll_merge()


def test_cms_build_counts_values_before_expanding(spark):
    # the depth-fold expansion must sit ABOVE a per-value aggregate:
    # the explode's child plan contains the combined count, so the
    # d-fold blowup prices on |distinct|, not |rows|.
    df = _values_df(spark, [f"k{i % 5}" for i in range(100)])
    plan = cms_sketch(df, "v", 3, 64)._jdf.queryExecution().optimizedPlan().toString()
    gen_pos = plan.find("Generate")
    agg_below = plan.find("Aggregate", gen_pos + 1)
    assert gen_pos != -1 and agg_below != -1, plan


def test_hll_grouped_matches_per_group_build(spark):
    from kafka_streams_demo_spark.functions.sketches import (
        hll_estimate_grouped,
        hll_registers,
        hll_registers_grouped,
    )

    rows = [Row(g="a", v=f"x{i}") for i in range(80)] + [
        Row(g="b", v=f"y{i}") for i in range(30)
    ]
    df = spark.createDataFrame(rows)
    grouped = hll_registers_grouped(df, "g", "v", p=8)
    for g in ("a", "b"):
        solo = sorted(
            map(tuple, hll_registers(df.filter(F.col("g") == g), "v", p=8).collect())
        )
        sub = sorted(
            (r["bucket"], r["register"])
            for r in grouped.filter(F.col("key") == g).collect()
        )
        assert solo == sub, g
    ests = {r["key"]: r["estimate"]
            for r in hll_estimate_grouped(grouped, p=8).collect()}
    assert abs(ests["a"] - 80) / 80 < 0.3 and abs(ests["b"] - 30) / 30 < 0.3


def test_kmv_estimate_accuracy_and_exact_small(spark):
    from kafka_streams_demo_spark.functions.sketches import kmv_estimate, kmv_sketch

    small = _values_df(spark, [f"s{i}" for i in range(30)])
    est = kmv_estimate(kmv_sketch(small, "v", k=64), k=64).collect()[0]
    assert est["n_hashes"] == 30 and est["estimate"] == 30.0  # exact below k
    big = _values_df(spark, [f"b{i}" for i in range(5000)])
    est = kmv_estimate(kmv_sketch(big, "v", k=256), k=256).collect()[0]["estimate"]
    # rsd ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
    assert abs(est - 5000) / 5000 < 0.25


def test_kmv_merge_equals_rebuild(spark):
    from kafka_streams_demo_spark.functions.sketches import kmv_merge, kmv_sketch

    a = _values_df(spark, [f"u{i}" for i in range(300)])
    b = _values_df(spark, [f"u{i}" for i in range(200, 500)])
    merged = sorted(
        r["hv"]
        for r in kmv_merge(64, kmv_sketch(a, "v", 64), kmv_sketch(b, "v", 64)).collect()
    )
    full = sorted(r["hv"] for r in kmv_sketch(a.unionByName(b), "v", 64).collect())
    assert merged == full and len(full) == 64


def test_kmv_jaccard_estimates_overlap(spark):
    from kafka_streams_demo_spark.functions.sketches import kmv_jaccard

    # |A|=600, |B|=600, |A∩B|=400, |A∪B|=800 → J = 0.5
    a = _values_df(spark, [f"x{i}" for i in range(600)])
    b = _values_df(spark, [f"x{i}" for i in range(200, 800)])
    got = kmv_jaccard(a, b, "v", k=128).collect()[0]
    assert got["sample_size"] == 128
    assert abs(got["jaccard"] - 0.5) < 0.2  # binomial(128, .5): 4+ sigma


def test_kmv_validation():
    import pytest as _pytest

    from kafka_streams_demo_spark.functions.sketches import kmv_merge, kmv_sketch

    with _pytest.raises(ValueError):
        kmv_sketch(None, "v", k=1)
    with _pytest.raises(ValueError):
        kmv_merge(64)


def test_kmv_overlap_matrix_matches_pairwise(spark):
    from kafka_streams_demo_spark.functions.sketches import (
        kmv_jaccard,
        kmv_overlap_matrix,
    )

    rows = (
        [Row(g="a", v=f"x{i}") for i in range(200)]
        + [Row(g="b", v=f"x{i}") for i in range(100, 300)]
        + [Row(g="c", v=f"z{i}") for i in range(50)]
    )
    df = spark.createDataFrame(rows)
    mat = {
        (r["key_a"], r["key_b"]): (r["sample_size"], r["in_both"], r["jaccard"])
        for r in kmv_overlap_matrix(df, "g", "v", k=64).collect()
    }
    assert set(mat) == {("a", "b"), ("a", "c"), ("b", "c")}
    # pairwise function must agree exactly (same hashes, same k)
    pair = kmv_jaccard(
        df.filter(F.col("g") == "a"), df.filter(F.col("g") == "b"), "v", k=64
    ).collect()[0]
    assert mat[("a", "b")] == (
        pair["sample_size"], pair["in_both"], pair["jaccard"]
    )
    # disjoint groups: zero overlap
    assert mat[("a", "c")][1] == 0 and mat[("b", "c")][1] == 0


def test_quantile_sketch_merge_and_accuracy(spark):
    """The bottom-k-sample quantile sketch: merge(sketch(A), sketch(B))
    == sketch(A ∪ B) exactly (disjoint row keys), and the sample median
    lands within the O(1/sqrt(k)) band of the true quantile on a known
    distribution (uniform 0..9999: true q50 = 4999.5, k=256 → s.e.
    ~312; assert a generous 4-s.e. window)."""
    from kafka_streams_demo_spark.functions.sketches import (
        quantile_estimate,
        quantile_sketch,
        quantile_sketch_merge,
    )

    df = spark.createDataFrame(
        [(i, float(i % 10000)) for i in range(20000)], "k long, v double"
    )
    full = quantile_sketch(df, "v", "k", k=256)
    a = quantile_sketch(df.filter(F.col("k") % 2 == 0), "v", "k", 256)
    b = quantile_sketch(df.filter(F.col("k") % 2 == 1), "v", "k", 256)
    merged = quantile_sketch_merge(256, a, b)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))

    est = quantile_estimate(full).collect()[0]
    assert est["n_sample"] == 256
    assert abs(est["q_50"] - 4999.5) < 4 * 10000 * 0.5 / 16  # 4 s.e. at k=256
    assert est["q_25"] < est["q_50"] < est["q_75"] < est["q_90"] <= est["q_99"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        quantile_sketch(df, "v", "k", k=1)
