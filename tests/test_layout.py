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


def test_zorder_huge_span_no_overflow(spark):
    """62-bit-magnitude dimensions (the module's stated regime): the
    multiply-free bucket formula must assign monotone in-range buckets
    where the former ((v-mn)*256) DIV (mx-mn+1) overflowed long and
    misbucketed / threw under ANSI (ADVICE r7). Span here is 2^63-1 —
    the hard int64-representability bound."""
    lo, hi = -(1 << 62), (1 << 62) - 1
    xs = [lo, lo + 1, -1, 0, 1, hi // 2, hi - 1, hi]
    df = spark.createDataFrame(
        [(i, x, x) for i, x in enumerate(xs)], "id long, x long, y long"
    )
    out = {r["id"]: r["zval"]
           for r in zorder_key(df, [F.col("x"), F.col("y")], bits=8).collect()}
    assert len(out) == len(xs)
    # recompute buckets the same multiply-free way and check the zval of
    # equal-dims rows is the 2-way self-interleave of an in-range bucket
    w = (hi - lo) // 256 + 1
    for i, x in enumerate(xs):
        b = (x - lo) // w
        assert 0 <= b < 256
        z = sum((((b >> k) & 1) << (2 * k)) | (((b >> k) & 1) << (2 * k + 1))
                for k in range(8))
        assert out[i] == z
    # monotone per dimension: bigger value never lands in a smaller bucket
    zs = [out[i] for i in range(len(xs))]
    assert zs == sorted(zs)


def test_compaction_plan_python_replay_and_grouping(spark):
    """Exact Python replay of the packing formula (exclusive cumsum DIV
    target, dense renumber) plus the structural contracts: group ids are
    dense and non-decreasing in file order, and packing never reorders
    files across groups."""
    import pytest as _pytest

    from kafka_streams_demo_spark.functions.layout import compaction_plan

    rows = [
        ("a", 1, 100), ("a", 2, 120), ("a", 3, 90), ("a", 4, 310),
        ("a", 5, 10), ("a", 6, 10), ("b", 1, 299), ("b", 2, 1),
        ("b", 3, 1),
    ]
    files = spark.createDataFrame(rows, "part string, file_id int, bytes long")
    got = {
        (r["part"], r["file_id"]): r["group_id"]
        for r in compaction_plan(files, 300, ("part",)).collect()
    }

    # replay
    want = {}
    for part in ("a", "b"):
        fs = sorted((f, b) for p, f, b in rows if p == part)
        cum, raw = 0, []
        for f, b in fs:
            raw.append((f, cum // 300))
            cum += b
        dense, seen = {}, 0
        for f, g in raw:
            if g not in dense:
                seen += 1
                dense[g] = seen
            want[(part, f)] = dense[g]
    assert got == want

    # structural: dense, non-decreasing, file-order contiguous
    for part in ("a", "b"):
        gs = [got[(part, f)] for f in sorted(f for p, f, _ in rows if p == part)]
        assert gs[0] == 1
        assert all(b - a in (0, 1) for a, b in zip(gs, gs[1:]))

    # the 310-byte oversized file is its own group
    grp4 = got[("a", 4)]
    assert [k for k, g in got.items() if k[0] == "a" and g == grp4] == [("a", 4)]

    with _pytest.raises(ValueError):
        compaction_plan(files, 0)


def _hilbert_ref(n, x, y):
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_reference_and_is_bijective(spark):
    """The unrolled CASE/arith chain equals the classic xy2d recurrence
    on the FULL 16x16 grid (identity bucketing: values already span
    [0, 2^bits)), and the rank is a bijection onto [0, n^2)."""
    from kafka_streams_demo_spark.functions.layout import hilbert_key

    bits, n = 4, 16
    rows = [(x * n + y, x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        (r["x"], r["y"]): r["hval"]
        for r in hilbert_key(df, [F.col("x"), F.col("y")], bits=bits).collect()
    }
    assert got == {(x, y): _hilbert_ref(n, x, y) for _, x, y in rows}
    assert sorted(got.values()) == list(range(n * n))


def test_hilbert_adjacency_beats_zorder_locality(spark):
    """The property that makes Hilbert the better clustering curve:
    EVERY consecutive rank pair is a Manhattan-distance-1 grid
    neighbor, where Morton order jumps (max step spans half the grid);
    consequently equal-size files cut from the Hilbert sort have
    bounding boxes no worse than Z-order's on the same grid."""
    from kafka_streams_demo_spark.functions.layout import hilbert_key, zorder_key

    bits, n, files = 4, 16, 16
    rows = [(x * n + y, x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    dims = [F.col("x"), F.col("y")]
    hv = {r["hval"]: (r["x"], r["y"])
          for r in hilbert_key(df, dims, bits=bits).collect()}
    zv = {r["zval"]: (r["x"], r["y"])
          for r in zorder_key(df, dims, bits=bits).collect()}

    h_steps = [
        abs(hv[i][0] - hv[i + 1][0]) + abs(hv[i][1] - hv[i + 1][1])
        for i in range(n * n - 1)
    ]
    z_steps = [
        abs(zv[i][0] - zv[i + 1][0]) + abs(zv[i][1] - zv[i + 1][1])
        for i in range(n * n - 1)
    ]
    assert max(h_steps) == 1          # every Hilbert step is adjacent
    assert max(z_steps) > 1           # Morton provably jumps

    def worst_bbox(order):
        per = n * n // files
        worst = 0
        cells = [order[i] for i in range(n * n)]
        for f in range(files):
            seg = cells[f * per:(f + 1) * per]
            xs, ys = [c[0] for c in seg], [c[1] for c in seg]
            worst = max(worst, (max(xs) - min(xs)) + (max(ys) - min(ys)))
        return worst

    assert worst_bbox(hv) <= worst_bbox(zv)


def test_hilbert_layout_write_path_single_range_shuffle(spark):
    """The write-path arrangement is ONE range shuffle: the plan carries
    exactly one rangepartitioning Exchange (plus the broadcast of the
    one-row min/max stats), and rows inside each file are sorted by
    hval."""
    from kafka_streams_demo_spark.functions.layout import hilbert_layout
    from kafka_streams_demo_spark.sources import load_table

    orders = load_table(spark, "orders", "/root/testdata/sf0.001")
    out = hilbert_layout(
        orders,
        [F.col("o_custkey"),
         F.unix_date(F.col("o_orderdate").cast("date")).cast("long")],
        bits=8, num_files=64,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("rangepartitioning") == 1
    rows = out.select("file_id", "hval").collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r["file_id"], []).append(r["hval"])
    # collect() preserves within-partition order after sortWithinPartitions
    assert all(vs == sorted(vs) for vs in by_file.values())


def test_compaction_apply_rewrites_one_file_per_group(spark, tmp_path):
    """The OPTIMIZE rewrite half (VERDICT r8 task 7): compaction_apply
    executes a compaction_plan with one range shuffle and must (a)
    preserve content exactly — order-independent manifests per table
    partition match before/after, (b) produce EXACTLY one data file per
    plan group, (c) keep each output file's rows in the table's
    original (file_id, sort) order so existing clustering survives."""
    import glob
    import os

    from kafka_streams_demo_spark.functions.layout import (
        compaction_apply,
        compaction_plan,
        content_manifest,
    )

    # rows spread over small files: (part, file_id, row payload)
    rows = [
        (p, f, (ord(p) % 7) * 1000 + f * 10 + r, f"v-{p}-{f}-{r}")
        for p in ("a", "b")
        for f in range(1, 7)
        for r in range(3)
    ]
    data = spark.createDataFrame(
        rows, "part string, file_id int, seq long, payload string"
    )
    files = data.groupBy("part", "file_id").agg(
        (F.count(F.lit(1)) * 100).alias("bytes")
    )
    plan = compaction_plan(files, 300, ("part",))
    out = str(tmp_path / "compacted")
    compaction_apply(
        data, plan, out, part_cols=("part",), file_col="file_id",
        sort_cols=("seq",),
    )

    back = spark.read.parquet(out)
    # (a) content preserved per table partition (order-independent)
    before = {
        tuple(r) for r in content_manifest(
            data, ("part",), F.concat_ws("|", "file_id", "seq", "payload")
        ).collect()
    }
    after = {
        tuple(r) for r in content_manifest(
            back, ("part",), F.concat_ws("|", "file_id", "seq", "payload")
        ).collect()
    }
    assert before == after

    # (b) exactly one data file per plan group
    groups = {(r["part"], r["group_id"]) for r in plan.collect()}
    for p, g in groups:
        part_files = [
            f for f in glob.glob(os.path.join(out, f"part={p}", f"group_id={g}", "*"))
            if os.path.basename(f).startswith("part-")
        ]
        assert len(part_files) == 1, (p, g, part_files)

    # (c) in-file row order = (file_id, seq): read each group file alone
    for p, g in groups:
        got = spark.read.parquet(
            os.path.join(out, f"part={p}", f"group_id={g}")
        ).select("file_id", "seq").collect()
        ks = [(r["file_id"], r["seq"]) for r in got]
        assert ks == sorted(ks), (p, g, ks)

    # (d) the rewrite plan carries exactly one wide-table shuffle
    meta = plan.select("part", "file_id", "group_id")
    tagged = data.join(F.broadcast(meta), ["part", "file_id"])
    arranged = tagged.repartitionByRange(F.col("part"), F.col("group_id")) \
        .sortWithinPartitions("part", "group_id", "file_id", "seq")
    ep = arranged._jdf.queryExecution().executedPlan().toString()
    assert ep.count("Exchange rangepartitioning") == 1


def _skilling_ref(X, b):
    """Pure-Python Skilling axes→Hilbert-rank (AIP Conf. Proc. 707,
    2004): transpose conversion + bit interleave, the reference the
    SQL unroll must match exactly."""
    X = list(X)
    n = len(X)
    Q = 1 << (b - 1)
    while Q > 1:
        P = Q - 1
        for i in range(n):
            if X[i] & Q:
                X[0] ^= P
            else:
                t = (X[0] ^ X[i]) & P
                X[0] ^= t
                X[i] ^= t
        Q >>= 1
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = 0
    Q = 1 << (b - 1)
    while Q > 1:
        if X[n - 1] & Q:
            t ^= Q - 1
        Q >>= 1
    for i in range(n):
        X[i] ^= t
    h = 0
    for q in range(b - 1, -1, -1):
        for i in range(n):
            h = (h << 1) | ((X[i] >> q) & 1)
    return h


def test_hilbert_nd_matches_skilling_reference_full_grids(spark):
    """The d-dimensional unroll equals the pure-Python Skilling
    transpose on FULL grids (identity bucketing), is a bijection onto
    [0, 2^(nd*bits)), and satisfies the defining Hilbert adjacency
    property: consecutive ranks are Manhattan-distance-1 neighbors —
    for 3-D and 4-D, the dimensions hilbert_key could not reach."""
    from kafka_streams_demo_spark.functions.layout import hilbert_key_nd

    for nd, bits in ((3, 2), (4, 2), (3, 3)):
        n = 1 << bits
        import itertools

        pts = list(itertools.product(range(n), repeat=nd))
        rows = [(i, *p) for i, p in enumerate(pts)]
        schema = "id long, " + ", ".join(f"c{i} long" for i in range(nd))
        df = spark.createDataFrame(rows, schema)
        got = {
            tuple(r[f"c{i}"] for i in range(nd)): r["hval"]
            for r in hilbert_key_nd(
                df, [F.col(f"c{i}") for i in range(nd)], bits=bits
            ).collect()
        }
        want = {p: _skilling_ref(p, bits) for p in pts}
        assert got == want, (nd, bits)
        ranks = sorted(got.values())
        assert ranks == list(range(n ** nd))  # bijection
        by_rank = {h: p for p, h in got.items()}
        for h in range(1, n ** nd):
            a, b2 = by_rank[h - 1], by_rank[h]
            assert sum(abs(x - y) for x, y in zip(a, b2)) == 1  # adjacency


def test_hilbert_nd_range_bucketing_and_file_ids(spark):
    """Non-identity spans route through the same hybrid bucket_expr as
    zorder (monotone in-range buckets), and file_id is the top bits of
    the rank."""
    from kafka_streams_demo_spark.functions.layout import hilbert_key_nd

    rows = [(i, i * 37 % 1000, (i * 91) % 500, i % 250) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, a long, b long, c long")
    out = hilbert_key_nd(
        df, [F.col("a"), F.col("b"), F.col("c")], bits=4, num_files=8
    ).collect()
    assert len(out) == 300
    assert all(0 <= r["hval"] < (1 << 12) for r in out)
    assert all(r["file_id"] == r["hval"] >> 9 for r in out)


def test_hilbert_layout_nd_write_path_plan(spark):
    """One range shuffle, nothing more — the d-dim write path keeps the
    zorder_layout contract."""
    import itertools

    from kafka_streams_demo_spark.functions.layout import hilbert_layout_nd

    rows = [(i, *p) for i, p in enumerate(itertools.product(range(8), repeat=3))]
    df = spark.createDataFrame(rows, "id long, a long, b long, c long")
    arranged = hilbert_layout_nd(
        df, [F.col("a"), F.col("b"), F.col("c")], bits=3, num_files=4
    )
    plan = arranged._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert plan.count("Exchange rangepartitioning") == 1


def test_compaction_apply_refuses_rows_missing_from_plan(spark, tmp_path):
    """ADVICE r9: a data row whose (part, file_id) is absent from the
    plan (stale/partial manifest) must FAIL the rewrite loudly, not be
    silently dropped from the output table — the refuse-loudly
    convention; the manifest check would only catch the loss if the
    caller remembered to run content_manifest afterwards."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from kafka_streams_demo_spark.functions.layout import (
        compaction_apply,
        compaction_plan,
    )

    data = spark.createDataFrame(
        [("a", f, f * 10 + r, "x") for f in range(1, 5) for r in range(2)],
        "part string, file_id int, seq long, payload string",
    )
    # plan built from a STALE manifest missing file_id=4
    files = (
        data.filter(F.col("file_id") < 4)
        .groupBy("part", "file_id")
        .agg((F.count(F.lit(1)) * 100).alias("bytes"))
    )
    plan = compaction_plan(files, 300, ("part",))
    with pytest.raises((Py4JJavaError, Exception)) as ei:
        compaction_apply(
            data, plan, str(tmp_path / "out"),
            part_cols=("part",), file_col="file_id", sort_cols=("seq",),
        )
    assert "no plan group" in str(ei.value)
