"""Bucketed band join: exactness vs brute force, and the plan contract."""

import pytest
from pyspark.sql import functions as F

from kafka_streams_demo_spark.functions.rangejoin import band_join


def _sides(spark, lvals, rvals):
    l = spark.createDataFrame([(i, v) for i, v in enumerate(lvals)],
                              "lid long, lk long")
    r = spark.createDataFrame([(i, v) for i, v in enumerate(rvals)],
                              "rid long, rk long")
    return l, r


def test_band_join_matches_bruteforce(spark):
    lvals = [0, 5, 10, 99, 100, 101, 250]
    rvals = [3, 7, 103, 107, 249, 260, 1000]
    l, r = _sides(spark, lvals, rvals)
    got = sorted(
        (x["lid"], x["rid"])
        for x in band_join(l, r, F.col("lk"), F.col("rk"), 5).collect()
    )
    want = sorted(
        (i, j)
        for i, lv in enumerate(lvals)
        for j, rv in enumerate(rvals)
        if abs(lv - rv) <= 5
    )
    assert got == want and want  # nonempty fixture


def test_band_join_boundary_inclusive_and_unique(spark):
    l, r = _sides(spark, [100], [95, 105, 94, 106, 100])
    rows = band_join(l, r, F.col("lk"), F.col("rk"), 5).collect()
    got = sorted(x["rid"] for x in rows)
    assert got == [0, 1, 4]  # exactly ±tolerance inclusive, each pair once


def test_band_join_plan_is_hash_join_not_nested_loop(spark):
    l, r = _sides(spark, list(range(50)), list(range(50)))
    banded = band_join(l, r, F.col("lk"), F.col("rk"), 3)
    plan = banded._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
    # the naive theta join on the same inputs IS a nested loop — the
    # scale hazard band_join exists to avoid
    naive = l.join(r, F.abs(F.col("lk") - F.col("rk")) <= 3)
    nplan = naive._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" in nplan or "CartesianProduct" in nplan


def test_band_join_validates_tolerance(spark):
    l, r = _sides(spark, [1], [2])
    with pytest.raises(ValueError, match="positive"):
        band_join(l, r, F.col("lk"), F.col("rk"), 0)
