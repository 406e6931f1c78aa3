"""Focused tests for functions/fold.py (r13 optimization: the window-pass
sorted fold that replaced the ObjectHashAggregate collect_list idiom in
bm25 scoring, PQ ADC, and ngram_lm_score).

The contract is BIT-FOR-BIT equality with
``F.aggregate(F.array_sort(F.collect_list(v)), 0.0, acc + x)`` — the
cross-engine determinism fold every oracle replays as DuckDB
``list_sum(list_sort(list(v)))``."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_demo_spark.functions.fold import sorted_fold_sum


def _reference_fold(df, group_cols, value, out_col, round_dp=None, count_col=None):
    s = F.aggregate(
        F.array_sort(F.collect_list(value)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if round_dp is not None:
        s = F.round(s, round_dp)
    aggs = [s.alias(out_col)]
    if count_col is not None:
        aggs.append(F.count(F.lit(1)).alias(count_col))
    return df.groupBy(*group_cols).agg(*aggs)


def _fixture(spark):
    # Doubles whose sum order matters (mixed magnitudes, negatives,
    # exact ties, nulls) across groups of size 1..2000 — large enough
    # that per-partition arrival order would differ from sorted order.
    rows = spark.range(0, 6000).select(
        (F.col("id") % 7).alias("g"),
        F.when(
            F.col("id") % 97 == 0, F.lit(None).cast("double")
        ).otherwise(
            (F.hash(F.col("id").cast("string")).cast("double") / 1e4)
            + F.lit(0.1) / (F.col("id") % 13 + 1)
        ).alias("v"),
        (F.col("id") % 5).cast("long").alias("c"),
    )
    return rows.repartition(16)  # scramble arrival order


def test_sorted_fold_sum_bitwise_matches_collect_fold(spark):
    df = _fixture(spark)
    got = {
        r["g"]: (r["s"], r["n"])
        for r in sorted_fold_sum(
            df, ["g"], F.col("v"), "s", count_col="n"
        ).collect()
    }
    want = {
        r["g"]: (r["s"], r["n"])
        for r in _reference_fold(
            df, ["g"], F.col("v"), "s", count_col="n"
        ).collect()
    }
    assert set(got) == set(want)
    for g in want:
        # bit-for-bit: compare raw float repr, no tolerance
        assert got[g][0] == want[g][0] and repr(got[g][0]) == repr(want[g][0])
        assert got[g][1] == want[g][1]


def test_sorted_fold_sum_round_and_extras(spark):
    df = _fixture(spark)
    got = {
        r["g"]: (r["s"], r["t"])
        for r in sorted_fold_sum(
            df, ["g"], F.col("v"), "s", round_dp=6, extras={"t": F.sum("c")}
        ).collect()
    }
    want = {
        r["g"]: (r["s"], r["t"])
        for r in df.groupBy("g")
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list("v")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("s"),
            F.sum("c").alias("t"),
        )
        .collect()
    }
    assert got == want


def test_sorted_fold_sum_null_only_and_singleton_groups(spark):
    df = spark.createDataFrame(
        [(0, None), (0, None), (1, 2.5), (2, -0.0)], "g long, v double"
    )
    got = {r["g"]: r["s"] for r in sorted_fold_sum(df, ["g"], F.col("v"), "s").collect()}
    # collect_list skips nulls; fold of the empty list is the 0.0 seed —
    # F.sum over an all-null frame yields NULL, the one divergence from
    # the collect idiom. Callers' groups always have >=1 non-null value
    # (join outputs), so pin the live contract: null-only -> NULL sum.
    assert got[0] is None
    assert got[1] == 2.5
    assert got[2] == -0.0


def test_sorted_fold_sum_shuffle_cols_subset_reuses_exchange(spark):
    # shuffle_cols: identical values to the full-key exchange on a
    # scrambled multi-partition input, one Exchange in the plan when a
    # downstream window is keyed on the subset, and a guard on non-subset
    import pytest
    from pyspark.sql import Window

    rows = [(q, d, float(v)) for q in range(5) for d in range(7) for v in (3, -1, 2, 0)]
    df = spark.createDataFrame(rows, "q long, d long, v double").repartition(16)
    base = sorted_fold_sum(df, ["q", "d"], F.col("v"), "s", round_dp=6)
    sub = sorted_fold_sum(
        df, ["q", "d"], F.col("v"), "s", round_dp=6, shuffle_cols=["q"]
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, sub.collect()))
    w = Window.partitionBy("q").orderBy(F.desc("s"), F.asc("d"))
    ranked = sub.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 2)
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    # fold + rank share ONE hash shuffle (the input scrambler above is
    # round-robin, not counted)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    with pytest.raises(ValueError):
        sorted_fold_sum(df, ["q"], F.col("v"), "s", shuffle_cols=["d"])
