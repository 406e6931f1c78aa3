"""Z-order layout: interleave correctness and clustering quality."""

import pytest
from pyspark.sql import functions as F

from kafka_streams_demo_spark.functions.layout import zorder_key, zorder_layout


def _grid(spark, n=16):
    rows = [(i * n + j, i, j) for i in range(n) for j in range(n)]
    return spark.createDataFrame(rows, "id long, x long, y long")


def test_zval_matches_reference_interleave(spark):
    df = _grid(spark, 16)
    got = {
        r["id"]: r["zval"]
        for r in zorder_key(df, [F.col("x"), F.col("y")], bits=4).collect()
    }

    def morton(x, y):  # reference bit interleave, dim0 = LSB
        return sum(((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
                   for b in range(4))

    for i in range(16):
        for j in range(16):
            assert got[i * 16 + j] == morton(i, j)


def test_zval_bounds_and_file_grid(spark):
    df = _grid(spark, 16)
    out = zorder_key(df, [F.col("x"), F.col("y")], bits=4, num_files=16).collect()
    assert all(0 <= r["zval"] < 256 for r in out)
    assert all(0 <= r["file_id"] < 16 for r in out)
    # 16 files over a 16x16 grid = 4x4 cells: each file's bounding box
    # spans at most 4 values per dimension — the multi-dim pruning win
    import collections
    box = collections.defaultdict(lambda: [99, -1, 99, -1])
    for r in out:
        b = box[r["file_id"]]
        x, y = r["id"] // 16, r["id"] % 16
        b[0], b[1] = min(b[0], x), max(b[1], x)
        b[2], b[3] = min(b[2], y), max(b[3], y)
    for b in box.values():
        assert b[1] - b[0] <= 3 and b[3] - b[2] <= 3


def test_zorder_beats_single_dim_sort_on_other_dim(spark):
    """Under a single-dim sort, files span the FULL range of the other
    dimension; z-order bounds both. This is the pruning argument."""
    df = _grid(spark, 16)
    n_files = 16
    # single-dim layout: sort by x only, 16 rows per file
    rows = sorted((r["x"], r["y"]) for r in df.collect())
    per_file = [rows[i * 16:(i + 1) * 16] for i in range(n_files)]
    worst_y_span = max(
        max(y for _, y in f) - min(y for _, y in f) for f in per_file
    )
    assert worst_y_span == 15  # x-sort leaves y completely unclustered
    # z-order: every file spans ≤ 4 in y (asserted exactly above)


def test_constant_dimension_buckets_to_zero(spark):
    df = spark.createDataFrame([(1, 7, 3), (2, 7, 9)], "id long, x long, y long")
    out = zorder_key(df, [F.col("x"), F.col("y")], bits=4).collect()
    # degenerate range (mx == mn): every value buckets to 0, no div-by-zero
    assert all(r["zval"] % 2 == 0 for r in out)  # x contributes nothing


def test_zorder_layout_write_path_plan(spark):
    df = _grid(spark, 16)
    arranged = zorder_layout(df, [F.col("x"), F.col("y")], bits=4, num_files=4)
    plan = arranged._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert plan.lower().count("exchange") >= 1


def test_num_files_validation(spark):
    df = _grid(spark, 4)
    with pytest.raises(ValueError, match="power of two"):
        zorder_key(df, [F.col("x"), F.col("y")], bits=2, num_files=3)
    with pytest.raises(ValueError, match="exceeds"):
        zorder_key(df, [F.col("x"), F.col("y")], bits=2, num_files=32)
