"""The 10× scale-tier generator (tools/gen_scale.py, VERDICT r11 task 1):
the scaling-exponent measurements are only meaningful if the derived
tier preserves the fixtures' workload SHAPE — these pin the three
invariants the generator's docstring claims."""

import math
import sys


sys.path.insert(0, "/root/repo")

from tools.gen_scale import (  # noqa: E402
    OFF,
    replicate,
    transform_documents,
    transform_embeddings,
)


def test_replicate_preserves_mod_residues_and_counts(spark):
    """Key offsets are r·10⁹: every ``key % k`` residue the catalog's
    splits rely on (doc_id % 20 eval split, % 2 incremental split, % 4
    wallclock batches) is preserved per replica, keys are globally
    disjoint across replicas, and row count scales exactly."""
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    rep = replicate(df, ["doc_id"], 4)
    rows = rep.select("_r", "doc_id").collect()
    assert len(rows) == 400
    seen = set()
    for r in rows:
        base = r["doc_id"] - r["_r"] * OFF
        assert 0 <= base < 100
        for k in (2, 4, 20):
            assert r["doc_id"] % k == base % k, (k, r)
        assert r["doc_id"] not in seen
        seen.add(r["doc_id"])


def test_document_transform_repeats_near_dup_structure_per_replica(spark):
    """Within a replica, shingle overlap (and thus planted near-dups) is
    identical to the source; across replicas, token sets are DISJOINT —
    so pair counts scale ×replicas, never ×(replicas choose 2)·pairs."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
            (3, "alpha beta gamma delta epsilon zeta eta theta"),
        ],
        "doc_id long, text string",
    )
    out = transform_documents(replicate(docs, ["doc_id"], 3))
    rows = {(r["_r"], r["doc_id"] % OFF): r["text"] for r in out.collect()}
    # replica 0 is verbatim
    assert rows[(0, 1)] == "the quick brown fox jumps over the lazy dog"
    # within replica 2, docs 1 and 2 still share 7 of 9 tokens
    t1, t2 = set(rows[(2, 1)].split()), set(rows[(2, 2)].split())
    assert len(t1 & t2) == 7
    # across replicas, token sets are disjoint (suffix differs)
    assert not set(rows[(1, 1)].split()) & set(rows[(2, 1)].split())
    assert not set(rows[(0, 1)].split()) & set(rows[(1, 1)].split())
    # n_chars recomputed to match the transformed text
    for r in out.collect():
        assert r["n_chars"] == len(r["text"])


def test_embedding_rotation_preserves_norm_and_decorrelates(spark):
    """Rotation is an isometry (norms bit-preserved as multisets) and
    replica r's copy of a vector is NOT identical to replica 0's (no
    exact-tie degeneracy in brute-force top-k)."""
    vecs = [
        [1.0, 2.0, 3.0, 4.0],
        [0.5, -1.5, 2.5, 0.0],
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    out = transform_embeddings(replicate(df, ["vec_id"], 3), dim=4)
    got = {(r["_r"], r["vec_id"] % OFF): list(r["embedding"]) for r in out.collect()}
    for i, v in enumerate(vecs):
        assert got[(0, i)] == v  # replica 0 verbatim
        for r in (1, 2):
            rot = got[(r, i)]
            assert sorted(rot) == sorted(v)  # same multiset (isometry)
            assert rot == v[r:] + v[:r]      # exact rotation semantics
            if len(set(v)) > 1:
                assert rot != v              # decorrelated
            assert math.isclose(
                sum(x * x for x in rot), sum(x * x for x in v), rel_tol=0
            )
