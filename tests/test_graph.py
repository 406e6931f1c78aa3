"""PageRank / triangle counting (functions/graph.py). The catalog pins
cross-engine bit-equality; these pin the math on known graphs."""

import pytest
from pyspark.sql import Row

from kafka_streams_demo_spark.functions.graph import (
    orient_edges,
    pagerank,
    triangle_counts,
)


def _edges(spark, pairs, cols=("src", "dst")):
    return spark.createDataFrame([Row(**{cols[0]: a, cols[1]: b}) for a, b in pairs])


def test_pagerank_mass_conserved(spark):
    # bidirectional triangle: symmetric, ranks equal and sum to 1
    pairs = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "a"), ("a", "c")]
    ranks = {r["node"]: r["rank"] for r in pagerank(_edges(spark, pairs), 3).collect()}
    assert ranks == {"a": pytest.approx(1 / 3, abs=1e-6),
                     "b": pytest.approx(1 / 3, abs=1e-6),
                     "c": pytest.approx(1 / 3, abs=1e-6)}


def test_pagerank_hub_ranks_higher(spark):
    # star with backlinks: hub h collects from 3 leaves
    pairs = [("h", x) for x in "abc"] + [(x, "h") for x in "abc"]
    ranks = {r["node"]: r["rank"] for r in pagerank(_edges(spark, pairs), 3).collect()}
    assert ranks["h"] > ranks["a"] == ranks["b"] == ranks["c"]
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-5)


def test_pagerank_two_node_exact(spark):
    # a<->b stays uniform at every iteration: 0.15/2 + 0.85*0.5 = 0.5
    ranks = {r["node"]: r["rank"]
             for r in pagerank(_edges(spark, [("a", "b"), ("b", "a")]), 4).collect()}
    assert ranks == {"a": 0.5, "b": 0.5}


def test_pagerank_checkpoint_path(spark):
    pairs = [("a", "b"), ("b", "a")]
    ranks = {r["node"]: r["rank"]
             for r in pagerank(_edges(spark, pairs), 6, checkpoint_every=2).collect()}
    assert ranks == {"a": 0.5, "b": 0.5}


def test_pagerank_validation():
    with pytest.raises(ValueError):
        pagerank(None, iterations=0)


def test_orient_edges_total_order(spark):
    # path a-b-c: deg(b)=2 > deg(a)=deg(c)=1 — both edges point INTO b
    oe = orient_edges(_edges(spark, [("a", "b"), ("b", "c")], cols=("a", "b"))).collect()
    assert {(r["src"], r["dst"]) for r in oe} == {("a", "b"), ("c", "b")}
    assert all(r["src_deg"] <= r["dst_deg"] for r in oe)


def test_triangles_k4(spark):
    # K4: 4 triangles, each node in exactly 3
    nodes = "abcd"
    und = [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1:]]
    got = {r["node"]: r["triangles"]
           for r in triangle_counts(_edges(spark, und, cols=("a", "b"))).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_triangles_square_has_none(spark):
    und = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    assert triangle_counts(_edges(spark, und, cols=("a", "b"))).count() == 0


def test_triangles_counted_once(spark):
    # one triangle plus a pendant edge
    und = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    got = {r["node"]: r["triangles"]
           for r in triangle_counts(_edges(spark, und, cols=("a", "b"))).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_triangle_incremental_equals_rebuild(spark):
    import random

    from kafka_streams_demo_spark.functions.graph import triangle_counts_incremental

    rng = random.Random(7)
    nodes = list(range(12))
    all_edges = sorted(
        {(a, b) for a in nodes for b in nodes if a < b and rng.random() < 0.35}
    )
    for frac in (0.0, 0.4, 0.8, 1.0):
        cut = int(len(all_edges) * frac)
        old = _edges(spark, all_edges[:cut] or [(-1, -2)], cols=("a", "b"))
        if not all_edges[:cut]:
            old = old.filter("a > 0")  # empty old graph
        delta = _edges(spark, all_edges[cut:] or [(-1, -2)], cols=("a", "b"))
        if not all_edges[cut:]:
            delta = delta.filter("a > 0")
        inc = sorted(
            map(tuple, triangle_counts_incremental(old, delta).filter("triangles > 0").collect())
        )
        full = sorted(
            map(tuple, triangle_counts(_edges(spark, all_edges, cols=("a", "b"))).collect())
        )
        assert inc == full, frac


def test_triangles_bloom_prefilter_parity(spark):
    import random

    from kafka_streams_demo_spark.functions.graph import triangle_counts as tc

    rng = random.Random(11)
    und = sorted({(a, b) for a in range(15) for b in range(15)
                  if a < b and rng.random() < 0.3})
    df = _edges(spark, und, cols=("a", "b"))
    plain = sorted(map(tuple, tc(df, bloom_prefilter=False).collect()))
    bloomed = sorted(map(tuple, tc(df, bloom_prefilter=True).collect()))
    assert plain == bloomed and plain


def test_pagerank_plain_sum_parity_at_6dp(spark):
    import random

    rng = random.Random(3)
    nodes = [f"n{i}" for i in range(30)]
    pairs = sorted({(a, b) for a in nodes for b in nodes
                    if a != b and rng.random() < 0.15})
    # ensure no dangling nodes: add reverse edges
    pairs = sorted(set(pairs) | {(b, a) for a, b in pairs})
    df = _edges(spark, pairs)
    exact = sorted(map(tuple, pagerank(df, 4, exact_folds=True).collect()))
    plain = sorted(map(tuple, pagerank(df, 4, exact_folds=False).collect()))
    assert exact == plain  # 6dp rounding absorbs addition-order noise
