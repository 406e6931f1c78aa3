"""Training-data assembly: chunking, sequence packing, mixture sampling.

No reference counterpart (north-star extension family); the contracts are
pinned here plus the duckdb oracles in catalog.py (doc_chunk_overlap /
pack_sequences / mixture_sample).
"""

import pytest
from pyspark.sql import functions as F

from kafka_streams_demo_spark.functions.packing import (
    chunk_documents,
    mixture_sample,
    pack_sequences,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_chunk_short_doc_single_chunk(spark):
    docs = _docs(spark, [(1, "s", "a b c")])
    out = chunk_documents(docs, chunk_size=4, overlap=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["chunk_id"], r["start_tok"], r["n_tokens"]) == (0, 1, 3)


def test_chunk_exact_boundary_no_empty_tail(spark):
    # n == chunk_size must yield exactly one chunk, not a 1-token tail
    docs = _docs(spark, [(1, "s", "a b c d")])
    out = chunk_documents(docs, chunk_size=4, overlap=1).collect()
    assert len(out) == 1


def test_chunk_overlap_and_truncated_tail(spark):
    # 6 tokens, size 4, overlap 2 (stride 2): starts 1, 3 — second chunk
    # covers through the end; every token is in at least one chunk
    docs = _docs(spark, [(1, "s", "a b c d e f")])
    out = {r["start_tok"]: r for r in chunk_documents(docs, 4, 2).collect()}
    assert sorted(out) == [1, 3]
    assert out[1]["n_tokens"] == 4 and out[3]["n_tokens"] == 4
    assert out[3]["chunk_id"] == 1


def test_chunk_covers_every_token(spark):
    docs = _docs(spark, [(i, "s", " ".join(f"t{j}" for j in range(n)))
                         for i, n in enumerate([1, 5, 7, 8, 9, 31, 32, 33, 99])])
    rows = chunk_documents(docs, chunk_size=8, overlap=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, n in enumerate([1, 5, 7, 8, 9, 31, 32, 33, 99]):
        covered = set()
        for r in by_doc[i]:
            covered.update(range(r["start_tok"], r["start_tok"] + r["n_tokens"]))
        assert covered == set(range(1, n + 1)), f"doc {i} (n={n})"


def test_chunk_rejects_degenerate_stride():
    with pytest.raises(ValueError):
        chunk_documents(None, chunk_size=4, overlap=4)


def _greedy_model(sizes, cap):
    bins, fill, b = [], 0, -1
    for nt in sizes:
        if b >= 0 and fill + nt <= cap:
            fill += nt
        else:
            b += 1
            fill = nt
        bins.append(b)
    return bins


def test_pack_matches_greedy_model(spark):
    sizes = [10, 10, 10, 25, 5, 40, 3, 3, 3, 3]
    docs = _docs(
        spark,
        [(i, "s", " ".join(["w"] * n)) for i, n in enumerate(sizes)],
    )
    out = pack_sequences(docs, capacity=30).collect()
    got = {r["doc_id"]: (r["bin_id"], r["n_tokens"]) for r in out}
    model = _greedy_model(sizes, 30)
    for i, n in enumerate(sizes):
        assert got[i] == (model[i], n)


def test_pack_oversized_doc_gets_own_bin(spark):
    docs = _docs(spark, [(1, "s", " ".join(["w"] * 100)), (2, "s", "a b")])
    out = {r["doc_id"]: r["bin_id"] for r in pack_sequences(docs, capacity=10).collect()}
    assert out[1] != out[2]


def test_pack_groups_are_independent(spark):
    docs = _docs(
        spark,
        [(1, "a", " ".join(["w"] * 8)), (2, "a", " ".join(["w"] * 8)),
         (3, "b", " ".join(["w"] * 8))],
    )
    out = {r["doc_id"]: (r["grp"], r["bin_id"]) for r in
           pack_sequences(docs, capacity=10).collect()}
    # each group restarts at bin 0
    assert out[1] == ("a", 0) and out[2] == ("a", 1) and out[3] == ("b", 0)


def test_pack_no_bin_overflows_unless_single_doc(spark):
    sizes = [7, 9, 4, 12, 2, 2, 2, 30, 1]
    docs = _docs(spark, [(i, "s", " ".join(["w"] * n)) for i, n in enumerate(sizes)])
    rows = pack_sequences(docs, capacity=12).collect()
    fills = {}
    counts = {}
    for r in rows:
        fills[r["bin_id"]] = fills.get(r["bin_id"], 0) + r["n_tokens"]
        counts[r["bin_id"]] = counts.get(r["bin_id"], 0) + 1
    for b, fill in fills.items():
        assert fill <= 12 or counts[b] == 1


def test_pack_sharding_splits_large_group_into_parallel_tasks(spark):
    # A "large" source (tiny tokens_per_shard stands in for the 1M default)
    # must fan out into >1 (grp, shard) applyInPandas task instead of one
    # sequential task per group — the 100 TB soft spot.
    sizes = [5] * 40  # 200 tokens in one group
    docs = _docs(spark, [(i, "s", " ".join(["w"] * n)) for i, n in enumerate(sizes)])
    packed = pack_sequences(docs, capacity=10, tokens_per_shard=50)
    rows = packed.collect()
    shards = {r["bin_id"] >> 32 for r in rows}
    assert len(shards) > 1, "large group did not sub-shard"
    # invariants survive sharding: every doc exactly once, no overflow,
    # bins never span shards, local bins contiguous from 0 within a shard
    assert sorted(r["doc_id"] for r in rows) == list(range(40))
    fills, counts, by_shard = {}, {}, {}
    for r in rows:
        fills[r["bin_id"]] = fills.get(r["bin_id"], 0) + r["n_tokens"]
        counts[r["bin_id"]] = counts.get(r["bin_id"], 0) + 1
        by_shard.setdefault(r["bin_id"] >> 32, set()).add(r["bin_id"] & 0xFFFFFFFF)
    for b, fill in fills.items():
        assert fill <= 10 or counts[b] == 1
    for shard, locals_ in by_shard.items():
        assert locals_ == set(range(len(locals_))), f"shard {shard} bins not contiguous"


def test_pack_single_shard_identical_to_unsharded(spark):
    # When a group fits one shard (the test-scale case for the 1M default),
    # sharded output must equal the unsharded greedy pack bit-for-bit.
    sizes = [10, 10, 10, 25, 5, 40, 3, 3, 3, 3]
    docs = _docs(spark, [(i, "s", " ".join(["w"] * n)) for i, n in enumerate(sizes)])
    sharded = {r["doc_id"]: r["bin_id"] for r in
               pack_sequences(docs, capacity=30, tokens_per_shard=1_000_000).collect()}
    unsharded = {r["doc_id"]: r["bin_id"] for r in
                 pack_sequences(docs, capacity=30, tokens_per_shard=None).collect()}
    assert sharded == unsharded
    model = _greedy_model(sizes, 30)
    assert sharded == {i: model[i] for i in range(len(sizes))}


def test_pack_shard_boundary_only_local_damage(spark):
    # Sharding may close a bin at each shard boundary but must never mix
    # docs across shards; within each shard the pack equals the greedy
    # model run on that shard's docs alone.
    sizes = [7, 9, 4, 12, 2, 2, 2, 30, 1, 6, 6, 6]
    docs = _docs(spark, [(i, "s", " ".join(["w"] * n)) for i, n in enumerate(sizes)])
    rows = pack_sequences(docs, capacity=12, tokens_per_shard=30).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["bin_id"] >> 32, []).append(r)
    assert len(by_shard) > 1
    for shard, rs in by_shard.items():
        rs = sorted(rs, key=lambda r: r["doc_id"])
        model = _greedy_model([r["n_tokens"] for r in rs], 12)
        assert [r["bin_id"] & 0xFFFFFFFF for r in rs] == model


def test_pack_string_ids_auto_hash_shard(spark):
    """VERDICT r4 #5: non-numeric doc ids must shard automatically via
    xxhash64 instead of requiring tokens_per_shard=None — no silent-misuse
    trap. Shards hold pseudo-random id subsets; invariants (each doc once,
    no overflow, bins never span shards, per-shard greedy-in-id-order)
    must all survive."""
    sizes = [5] * 40
    docs = spark.createDataFrame(
        [(f"doc{i:04d}", "s", " ".join(["w"] * n)) for i, n in enumerate(sizes)],
        "doc_id string, source string, text string",
    )
    rows = pack_sequences(docs, capacity=10, tokens_per_shard=50).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(f"doc{i:04d}" for i in range(40))
    by_shard = {}
    fills, counts = {}, {}
    for r in rows:
        by_shard.setdefault(r["bin_id"] >> 32, []).append(r)
        fills[r["bin_id"]] = fills.get(r["bin_id"], 0) + r["n_tokens"]
        counts[r["bin_id"]] = counts.get(r["bin_id"], 0) + 1
    assert len(by_shard) > 1, "string-id group did not hash-shard"
    for b, fill in fills.items():
        assert fill <= 10 or counts[b] == 1
    for shard, rs in by_shard.items():
        rs = sorted(rs, key=lambda r: r["doc_id"])
        assert [r["bin_id"] & 0xFFFFFFFF for r in rs] == _greedy_model(
            [r["n_tokens"] for r in rs], 10
        )


def test_pack_string_ids_single_shard_identical_to_unsharded(spark):
    """A string-id group whose total fits one shard packs identically to
    the unsharded scan (n_shards=1 → every hash lands in shard 0)."""
    sizes = [10, 10, 10, 25, 5, 40, 3, 3, 3, 3]
    docs = spark.createDataFrame(
        [(f"doc{i:04d}", "s", " ".join(["w"] * n)) for i, n in enumerate(sizes)],
        "doc_id string, source string, text string",
    )
    sharded = {r["doc_id"]: r["bin_id"] for r in
               pack_sequences(docs, capacity=30).collect()}  # default 1M shard
    unsharded = {r["doc_id"]: r["bin_id"] for r in
                 pack_sequences(docs, capacity=30, tokens_per_shard=None).collect()}
    assert sharded == unsharded
    model = _greedy_model(sizes, 30)  # doc%04d sorts like the int it wraps
    assert sharded == {f"doc{i:04d}": model[i] for i in range(len(sizes))}


def test_mixture_sample_deterministic_and_monotone(spark):
    docs = _docs(
        spark,
        [(i, "s", f"document number {i} with some words") for i in range(400)],
    )
    full = mixture_sample(docs, {}, default_weight=1.0)
    half = mixture_sample(docs, {}, default_weight=0.5)
    quarter = mixture_sample(docs, {}, default_weight=0.25)
    n_full, n_half, n_quarter = full.count(), half.count(), quarter.count()
    assert n_full == 400
    # content-hash threshold: expected rate ±10pp at n=400
    assert abs(n_half / 400 - 0.5) < 0.1
    assert abs(n_quarter / 400 - 0.25) < 0.1
    # monotone: a kept row at weight w stays kept at any w' > w
    half_ids = {r["doc_id"] for r in half.select("doc_id").collect()}
    quarter_ids = {r["doc_id"] for r in quarter.select("doc_id").collect()}
    assert quarter_ids <= half_ids
    # deterministic across evaluations
    again = {r["doc_id"] for r in
             mixture_sample(docs, {}, default_weight=0.5).select("doc_id").collect()}
    assert again == half_ids


def test_mixture_per_source_weights(spark):
    docs = _docs(
        spark,
        [(i, f"src{i % 2}", f"text body {i} alpha beta") for i in range(300)],
    )
    out = mixture_sample(docs, {"src0": 1.0, "src1": 0.0})
    srcs = {r["source"] for r in out.select("source").collect()}
    assert srcs == {"src0"}
    assert out.count() == 150


def test_temperature_mixture_flattens_sources(spark):
    """alpha=1 keeps the natural distribution; alpha=0 downsamples every
    source to ~the smallest one's count; rates are monotone in alpha and
    the kept set is deterministic (a subset relation, like mixture_sample)."""
    from kafka_streams_demo_spark.functions.packing import temperature_mixture

    docs = _docs(spark, [(i, "big" if i < 400 else "small",
                          f"doc {i} text body {i * 13}") for i in range(500)])
    natural = temperature_mixture(docs, alpha=1.0)
    assert natural.count() == 500
    flat = temperature_mixture(docs, alpha=0.0)
    by_src = {r["source"]: r["n"] for r in
              flat.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_src["small"] == 100
    assert abs(by_src["big"] - 100) < 40  # 400 * 0.25 rate, hash noise
    # monotone: rows kept at lower alpha stay kept at higher alpha
    flat_ids = {r["doc_id"] for r in flat.select("doc_id").collect()}
    mid_ids = {r["doc_id"] for r in
               temperature_mixture(docs, alpha=0.5).select("doc_id").collect()}
    assert flat_ids <= mid_ids


def test_pack_sequences_keeps_null_group_docs(spark):
    """Review r4 (confirmed repro): sharding's inner equi-join dropped
    NULL-group docs; the null-safe join must keep them, matching the
    unsharded path."""
    docs = spark.createDataFrame(
        [(1, None, "a b c"), (2, None, "d e"), (3, "s", "f g h")],
        "doc_id long, source string, text string",
    )
    sharded = pack_sequences(docs, capacity=10)  # default sharding ON
    unsharded = pack_sequences(docs, capacity=10, tokens_per_shard=None)
    assert sharded.count() == unsharded.count() == 3
    got = {r["doc_id"]: r["grp"] for r in sharded.collect()}
    assert got[1] is None and got[3] == "s"


def test_temperature_mixture_floors_rate_never_drops_source(spark):
    """ADVICE r4: a source so much larger than the smallest that its exact
    keep-rate rounds to 0/256 must be floored to 1/256, not silently
    erased — temperature mixing reweights sources, it never deletes one.
    alpha=0 with counts 1 vs 3000: exact threshold round(256/3000)=0."""
    from kafka_streams_demo_spark.functions.packing import temperature_mixture

    docs = spark.range(3001).selectExpr(
        "id AS doc_id",
        "CASE WHEN id = 0 THEN 'tiny' ELSE 'huge' END AS source",
        "concat('doc ', id, ' body ', id * 17) AS text",
    )
    kept = temperature_mixture(docs, alpha=0.0)
    by_src = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_src.get("huge", 0) >= 1  # pre-fix: 0 — the source vanished
    assert by_src["huge"] <= 3000 * 4 // 256  # still heavily downsampled
    assert by_src["tiny"] == 1


def test_temperature_mixture_keeps_null_group_docs(spark):
    from kafka_streams_demo_spark.functions.packing import temperature_mixture

    docs = spark.createDataFrame(
        [(i, None if i < 50 else "s", f"text {i} body {i*3}") for i in range(100)],
        "doc_id long, source string, text string",
    )
    out = temperature_mixture(docs, alpha=1.0)  # natural rates: keep all
    assert out.count() == 100


def test_mixture_upsample_copy_counts_and_determinism(spark):
    """Rates above 1 replicate rows (floor + content-hash coin for the
    fraction); rate 0 erases a source; integral rates are exact; output
    is deterministic across invocations; negative rates raise."""
    from kafka_streams_demo_spark.functions.packing import mixture_upsample

    docs = _docs(
        spark,
        [(i, ["a", "b", "c"][i % 3], f"text {i} body {i * 11}") for i in range(300)],
    )
    out = mixture_upsample(docs, {"a": 3.0, "b": 0.0, "c": 1.5})
    by_src = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_src["a"] == 300  # 100 docs × exactly 3
    assert "b" not in by_src   # erased
    assert 100 <= by_src["c"] <= 200  # 1 or 2 copies each
    # per-row copy ids are 1..n with no gaps
    per_doc = out.filter(F.col("source") == "a").groupBy("doc_id").agg(
        F.sort_array(F.collect_list("copy_id")).alias("ids"))
    assert all(r["ids"] == [1, 2, 3] for r in per_doc.collect())
    # deterministic: a second run is identical
    again = {(r["doc_id"], r["copy_id"]) for r in
             mixture_upsample(docs, {"a": 3.0, "b": 0.0, "c": 1.5}).collect()}
    first = {(r["doc_id"], r["copy_id"]) for r in out.collect()}
    assert first == again
    import pytest as _pytest
    with _pytest.raises(ValueError, match="negative"):
        mixture_upsample(docs, {"a": -1.0})


def test_shuffle_shards_deterministic_uniform_and_seeded(spark):
    """shuffle_shards: every doc appears exactly once; pos is dense
    1..|shard| within each shard; the same seed reproduces the identical
    assignment; a different seed produces a different order; shards are
    roughly balanced."""
    from kafka_streams_demo_spark.functions.packing import shuffle_shards

    docs = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    a = shuffle_shards(docs, n_shards=4, seed=42).collect()
    assert len(a) == 400 and len({r["doc_id"] for r in a}) == 400
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) == {0, 1, 2, 3}
    for shard, poses in by_shard.items():
        assert sorted(poses) == list(range(1, len(poses) + 1)), shard
        assert 50 <= len(poses) <= 150  # uniform-ish at n=400
    b = shuffle_shards(docs, n_shards=4, seed=42).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = {r["doc_id"]: (r["shard"], r["pos"]) for r in
         shuffle_shards(docs, n_shards=4, seed=7).collect()}
    a_map = {r["doc_id"]: (r["shard"], r["pos"]) for r in a}
    assert a_map != c  # reseeding reshuffles

    import pytest as _pytest
    with _pytest.raises(ValueError, match="n_shards"):
        shuffle_shards(docs, n_shards=0)


def test_weighted_sample_biased_toward_heavy(spark):
    from pyspark.sql import Row

    from kafka_streams_demo_spark.functions.packing import weighted_sample

    # 100 light docs (w=1) vs 100 heavy (w=100): across 20 seeds, the
    # heavy stratum must dominate the k=20 sample on average.
    rows = [Row(doc_id=i, w=1) for i in range(100)] + [
        Row(doc_id=100 + i, w=100) for i in range(100)
    ]
    df = spark.createDataFrame(rows)
    heavy = 0
    for seed in range(20):
        got = weighted_sample(df, 20, "w", seed=seed).collect()
        assert len(got) == 20
        heavy += sum(1 for r in got if r["doc_id"] >= 100)
    assert heavy / (20 * 20) > 0.8  # E[heavy share] ≈ 0.99


def test_weighted_sample_deterministic_across_partitionings(spark):
    from pyspark.sql import Row

    from kafka_streams_demo_spark.functions.packing import weighted_sample

    rows = [Row(doc_id=i, w=(i % 7) + 1, g=str(i % 3)) for i in range(200)]
    df = spark.createDataFrame(rows)
    a = sorted(r["doc_id"] for r in weighted_sample(df, 15, "w").collect())
    b = sorted(
        r["doc_id"]
        for r in weighted_sample(df.repartition(13, "g"), 15, "w").collect()
    )
    assert a == b
    ga = sorted(
        map(tuple, weighted_sample(df, 5, "w", by="g").select("g", "doc_id").collect())
    )
    gb = sorted(
        map(
            tuple,
            weighted_sample(df.coalesce(1), 5, "w", by="g")
            .select("g", "doc_id")
            .collect(),
        )
    )
    assert ga == gb and len(ga) == 15


def test_weighted_sample_validation_and_nulls(spark):
    import pytest as _pytest
    from pyspark.sql import Row

    from kafka_streams_demo_spark.functions.packing import weighted_sample

    df = spark.createDataFrame([Row(doc_id=1, w=5), Row(doc_id=2, w=None)])
    got = weighted_sample(df, 10, "w").collect()
    assert [r["doc_id"] for r in got] == [1]  # NULL weight dropped
    with _pytest.raises(ValueError, match="k must be"):
        weighted_sample(df, 0, "w")


def test_weighted_sample_global_uses_topk_plan(spark):
    # the global path must compile to TakeOrderedAndProject (per-
    # partition heaps + driver merge), never a full sort
    from pyspark.sql import Row

    from kafka_streams_demo_spark.functions.packing import weighted_sample

    df = spark.createDataFrame([Row(doc_id=i, w=i + 1) for i in range(50)])
    plan = weighted_sample(df, 5, "w")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_chunk_null_text_single_chunk(spark):
    """NULL text coalesces to '' and yields exactly one (empty-token)
    chunk — split(NULL) is NULL and the pre-fix sequence/explode silently
    dropped the row, contradicting the one-chunk-minimum contract
    (ADVICE r7)."""
    import hashlib

    docs = _docs(spark, [(1, "s", None), (2, "s", "a b")])
    out = {r["doc_id"]: r for r in chunk_documents(docs, chunk_size=4, overlap=1).collect()}
    assert set(out) == {1, 2}
    r = out[1]
    assert (r["chunk_id"], r["start_tok"], r["n_tokens"]) == (0, 1, 1)
    assert r["chunk_md5"] == hashlib.md5(b"").hexdigest()


def test_token_budget_select_matches_bruteforce_model(spark):
    from kafka_streams_demo_spark.functions.packing import token_budget_select

    rows = [
        # (doc_id, score, n_tokens) — scores span bands, include ties
        (1, 5.0, 100), (2, 5.0, 50), (3, 4.2, 200), (4, 1.7, 400),
        (5, 1.7, 100), (6, -0.3, 50), (7, -2.9, 10), (8, 3.1, 300),
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double, n_tokens long")
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in token_budget_select(df, budget=700).collect()
    }
    # model: sort by (-score, doc_id), greedy prefix
    want = {}
    cum = 0
    for d, s, n in sorted(rows, key=lambda x: (-x[1], x[0])):
        cum += n
        if cum > 700:
            break
        want[d] = cum
    assert got == want
    assert want == {1: 100, 2: 150, 3: 350, 8: 650}  # 4 (cum 1050) breaks


def test_token_budget_select_band_scan_equals_naive_window(spark):
    from pyspark.sql import Window

    from kafka_streams_demo_spark.functions.packing import token_budget_select

    rows = [(i, float((i * 37) % 11) - 5.0, (i * 13) % 40 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, score double, n_tokens long")
    got = sorted(
        map(tuple, token_budget_select(df, budget=2500, band_width=2.0)
            .select("doc_id", "cum_tokens").collect())
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = sorted(
        map(tuple, df.withColumn("cum_tokens", F.sum("n_tokens").over(w))
            .where(F.col("cum_tokens") <= 2500)
            .select("doc_id", "cum_tokens").collect())
    )
    assert got == naive


def test_token_budget_select_rejects_bad_budget(spark):
    import pytest

    from kafka_streams_demo_spark.functions.packing import token_budget_select

    df = spark.createDataFrame([(1, 1.0, 1)], "doc_id long, score double, n_tokens long")
    with pytest.raises(ValueError):
        token_budget_select(df, budget=0)
