"""Text analysis functions: tokenization, lang-id, quality, fingerprints."""

from pyspark.sql import functions as F

from kafka_streams_demo_spark.functions.text import (
    fingerprint_bow,
    lang_id,
    quality_score,
    rolling_hash,
    token_count_bpe,
    token_count_ws,
    tokenize,
    word_shingles,
)


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias("v")).first()["v"]


def test_token_counts(spark):
    assert _one(spark, "a b c", token_count_ws(F.col("text"))) == 3
    # BPE-ish: alpha runs + single digits + punct
    assert _one(spark, "ab 12 c!", token_count_bpe(F.col("text"))) == 5  # ab,1,2,c,!


def test_lang_id_markers_and_tiebreak(spark):
    assert _one(spark, "the cat and the dog", lang_id(F.col("text"))) == "en"
    assert _one(spark, "el perro y la casa de los gatos", lang_id(F.col("text"))) == "es"
    assert _one(spark, "der hund und die katze", lang_id(F.col("text"))) == "de"
    assert _one(spark, "xyzzy plugh foo", lang_id(F.col("text"))) == "und"
    # tie: 'the' (en) vs 'le' (fr) 1-1 → first list wins
    assert _one(spark, "the le", lang_id(F.col("text"))) == "en"


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [(1, "the a of and to in is it for on", 30),
         (2, "zz", 2)],
        "doc_id long, text string, n_chars long",
    )
    rows = {r["doc_id"]: r["s"] for r in df.select(
        "doc_id", quality_score(F.col("text"), F.col("n_chars")).alias("s")).collect()}
    assert 0.0 <= rows[2] < rows[1] <= 1.0


def test_fingerprint_bow_order_insensitive(spark):
    a = _one(spark, "alpha beta gamma", fingerprint_bow(F.col("text")))
    b = _one(spark, "gamma alpha beta", fingerprint_bow(F.col("text")))
    c = _one(spark, "alpha beta delta", fingerprint_bow(F.col("text")))
    assert a == b and a != c


def test_rolling_hash_order_sensitive(spark):
    a = _one(spark, "alpha beta gamma", rolling_hash(F.col("text")))
    b = _one(spark, "gamma alpha beta", rolling_hash(F.col("text")))
    c = _one(spark, "alpha beta gamma", rolling_hash(F.col("text")))
    assert a == c and a != b
    from kafka_streams_demo_spark.functions.text import ROLLING_HASH_MOD
    assert 0 <= a < ROLLING_HASH_MOD


def test_word_shingles(spark):
    got = _one(spark, "a b c d", word_shingles(tokenize(F.col("text")), 3))
    assert got == ["a_b_c", "b_c_d"]
    assert _one(spark, "a b", word_shingles(tokenize(F.col("text")), 3)) == []


def test_winnow_fingerprints_guarantee_and_bounds(spark):
    """Winnowing invariants: two docs sharing a k+w-1 = 7-token run share
    ≥1 fingerprint; fingerprints ⊆ k-gram hashes; docs under k+w-1
    tokens yield none; disjoint docs share none."""
    from kafka_streams_demo_spark.functions.text import winnow_fingerprints

    shared = "one two three four five six seven"
    fp = lambda text: set(  # noqa: E731
        _one(spark, text, winnow_fingerprints(tokenize(F.col("text"))))
    )
    a = fp(f"prefix words here {shared} tail a")
    b = fp(f"other start {shared} different ending words")
    assert a & b, "7-token shared run must share a fingerprint"
    assert fp("short doc only") == set()
    c = fp("totally disjoint vocabulary nothing matches at all here now")
    assert not (a & c)


def test_char_entropy_golden_values(spark):
    """Known distributions: uniform 2 symbols → 1 bit, uniform 4 → 2 bits,
    single symbol → 0, empty → 0 (guard)."""
    from pyspark.sql import functions as F

    from kafka_streams_demo_spark.functions.text import char_entropy

    docs = spark.createDataFrame(
        [(1, "aabb"), (2, "abcd"), (3, "aaaa"), (4, "")],
        "doc_id long, text string",
    )
    arr = docs.select(
        "doc_id", F.array_sort(F.split(F.col("text"), "")).alias("_cs")
    ).select(
        "doc_id", "_cs",
        # split("") yields [""] — count only real characters
        F.size(F.filter("_cs", lambda c: c != F.lit(""))).alias("_n"),
    )
    got = {r["doc_id"]: r["e"] for r in arr.select(
        "doc_id", char_entropy(F.filter("_cs", lambda c: c != F.lit("")), F.col("_n")).alias("e")
    ).collect()}
    assert got[1] == 1.0
    assert got[2] == 2.0
    assert got[3] == 0.0
    assert got[4] == 0.0


def test_bm25_search_matches_python_model_and_plan(spark):
    """BM25 top-k == the textbook formula computed in Python on a tiny
    corpus (docs with 0 query terms excluded; rounded-score ordering,
    doc-id tiebreak); the plan's ONLY exchange is the 1-row-per-task
    partial-agg gather for the global stats (partial_avg/partial_sum
    visible) — tf/dl are row-local, stats broadcast back, top-k is
    TakeOrdered; corpus rows never shuffle."""
    import math

    from kafka_streams_demo_spark.functions.text import bm25_search
    from kafka_streams_demo_spark.plans.explain import audit

    corpus = [
        (1, "table scan fast table"),
        (2, "slow row merge"),
        (3, "fast fast fast scan"),
        (4, "table"),
        (5, "window agg join"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    out = bm25_search(df, "table scan fast", k=3)

    # python model
    k1, b = 1.2, 0.75
    toks = {d: t.split() for d, t in corpus}
    n = len(corpus)
    avgdl = sum(len(w) for w in toks.values()) / n
    terms = ["table", "scan", "fast"]
    dfs = {t: sum(1 for w in toks.values() if t in w) for t in terms}
    scores = {}
    for d, w in toks.items():
        s = 0.0
        for t in terms:
            tf = w.count(t)
            idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(w) / avgdl))
        if any(t in w for t in terms):
            scores[d] = round(s, 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = [(r["doc_id"], r["score"]) for r in out.collect()]
    assert [(d, round(s, 4)) for d, s in got] == [(d, round(s, 4)) for d, s in want]

    a = audit(bm25_search(df, "table scan fast"))
    assert a.exchanges == 1, f"only the stats partial-agg gather may exchange:\n{a.plan}"
    assert "partial_avg" in a.plan  # map-side combine before the gather
    assert "TakeOrderedAndProject" in a.plan  # top-k without a sort shuffle

    import pytest as _pytest
    with _pytest.raises(ValueError, match="no terms"):
        bm25_search(df, "   ")


def test_bm25_search_queries_parity_and_shape(spark):
    """The query-TABLE variant (VERDICT r5 #5): for each query it returns
    exactly the single-query path's top-k docs and 6-dp scores (same
    smoothed idf; sorted-order contribution fold); queries that hit
    nothing contribute no rows; rk is dense 1..n per query."""
    from kafka_streams_demo_spark.functions.text import (
        bm25_search,
        bm25_search_queries,
    )

    corpus = [
        (1, "table scan fast table"),
        (2, "slow row merge"),
        (3, "fast fast fast scan"),
        (4, "table"),
        (5, "window agg join"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    qdf = spark.createDataFrame(
        [(10, "table scan fast"), (20, "merge row"), (30, "zzz_nohit")],
        "query_id long, query_text string",
    )
    out = bm25_search_queries(df, qdf, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rk"], r["doc_id"], r["score"]))
    for q in by_q:
        by_q[q].sort()
        assert [rk for rk, _, _ in by_q[q]] == list(range(1, len(by_q[q]) + 1))
    assert 30 not in by_q  # no-hit query yields no rows

    for qid, qtext in [(10, "table scan fast"), (20, "merge row")]:
        single = [(r["doc_id"], r["score"])
                  for r in bm25_search(df, qtext, k=3).collect()]
        multi = [(d, s) for _, d, s in by_q[qid]]
        assert multi == single, f"query {qid}: {multi} != {single}"


def test_bm25_search_queries_corpus_never_shuffles(spark):
    """Plan contract: with the query side broadcast, the corpus-side
    posting rows reach the score aggregate through broadcast joins only —
    exchanges exist solely for the tiny matched/stats/df relations and
    the per-query rank window, and at least one BroadcastExchange
    carries the query terms."""
    from kafka_streams_demo_spark.functions.text import bm25_search_queries
    from kafka_streams_demo_spark.plans.explain import audit

    df = spark.createDataFrame(
        [(i, "table scan fast row merge") for i in range(20)],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame(
        [(1, "table scan"), (2, "merge")], "query_id long, query_text string"
    )
    a = audit(bm25_search_queries(df, qdf, k=5))
    assert "BroadcastExchange" in a.plan
    # corpus explode feeds a BroadcastHashJoin (stream side), never a
    # SortMergeJoin — the posting rows must not be exchange-partitioned
    assert "SortMergeJoin" not in a.plan, a.plan


def test_bm25_postings_path_matches_direct_and_buckets_help(spark):
    """The persisted-postings path returns exactly the direct path's
    results (stats recovered from postings, incl. empty-text docs); a
    term-bucketed postings table feeds the df aggregate without a
    re-Exchange (fewer exchanges than the unbucketed scan plan)."""
    from kafka_streams_demo_spark.functions.text import (
        bm25_postings,
        bm25_search_queries,
        write_bm25_postings,
    )
    from kafka_streams_demo_spark.plans.explain import audit

    df = spark.createDataFrame(
        [(1, "table scan fast table"), (2, "slow row merge"),
         (3, "fast fast fast scan"), (4, ""), (5, "window agg join")],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame(
        [(1, "table scan fast"), (2, "merge row")],
        "query_id long, query_text string",
    )
    direct = sorted(
        tuple(r) for r in bm25_search_queries(df, qdf, k=3).collect()
    )
    via_postings = sorted(
        tuple(r) for r in
        bm25_search_queries(None, qdf, k=3, postings=bm25_postings(df)).collect()
    )
    assert direct == via_postings

    write_bm25_postings(bm25_postings(df), "bm25_post_test", num_buckets=4)
    try:
        prev_abs = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        # under the DEFAULT broadcast query-term join the postings scan's
        # term-bucketing feeds the df aggregate directly (the broadcast
        # join preserves the stream side's partitioning) — that is the
        # production win. At 4 toy buckets vs 32 shuffle partitions the
        # autoBucketedScan heuristic would drop the bucketed scan for
        # parallelism, so pin the mechanism; at scale num_buckets is
        # sized ≈ shuffle partitions and the heuristic keeps it.
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        try:
            plain = bm25_search_queries(
                None, qdf, k=3, postings=bm25_postings(df)
            )
            bucketed = bm25_search_queries(
                None, qdf, k=3, postings=spark.table("bm25_post_test")
            )
            a_plain, a_buck = audit(plain), audit(bucketed)
            assert "SelectedBucketsCount" in a_buck.plan
            # the df_t groupBy(term) reads its distribution from storage
            assert a_buck.exchanges < a_plain.exchanges, (
                f"bucketed {a_buck.exchanges} vs plain {a_plain.exchanges}"
            )
            assert sorted(tuple(r) for r in bucketed.collect()) == direct
        finally:
            spark.conf.set(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev_abs
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS bm25_post_test")

    import pytest as _pytest
    with _pytest.raises(ValueError, match="docs or postings"):
        bm25_search_queries(None, qdf)


def test_bm25_postings_append_is_incremental(spark):
    """Index maintenance = append: base postings written once, a delta
    batch appended with mode='append', and search over the re-read table
    returns exactly the one-shot batch results (N/avgdl/df recovered
    from the combined postings are always current — no stats table to
    invalidate). Lazy UNION composition (the catalog's
    bm25_postings_incremental path) matches too."""
    from kafka_streams_demo_spark.functions.text import (
        bm25_postings,
        bm25_search_queries,
        write_bm25_postings,
    )

    df = spark.createDataFrame(
        [(1, "table scan fast table"), (2, "slow row merge"),
         (3, "fast fast fast scan"), (4, ""), (5, "window agg join")],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame(
        [(1, "table scan fast"), (2, "merge row")],
        "query_id long, query_text string",
    )
    batch = sorted(tuple(r) for r in bm25_search_queries(df, qdf, k=3).collect())

    base, delta = df.where("doc_id <= 3"), df.where("doc_id > 3")
    via_union = sorted(
        tuple(r) for r in bm25_search_queries(
            None, qdf, k=3,
            postings=bm25_postings(base).unionByName(bm25_postings(delta)),
        ).collect()
    )
    assert via_union == batch

    write_bm25_postings(bm25_postings(base), "bm25_incr_test", num_buckets=4)
    try:
        write_bm25_postings(
            bm25_postings(delta), "bm25_incr_test", num_buckets=4, mode="append"
        )
        via_table = sorted(
            tuple(r) for r in bm25_search_queries(
                None, qdf, k=3, postings=spark.table("bm25_incr_test")
            ).collect()
        )
        assert via_table == batch
    finally:
        spark.sql("DROP TABLE IF EXISTS bm25_incr_test")


def test_gopher_quality_rules_fire_individually(spark):
    """Each Gopher rule (Rae et al. 2021 Appendix A) kills exactly the doc
    built to violate it; a well-formed doc passes everything."""
    from kafka_streams_demo_spark.functions.text import gopher_quality

    good_words = ("the quick brown fox jumps over lazy dogs and cats with "
                  "plenty more everyday common words that keep going ") * 5
    docs = spark.createDataFrame([
        (1, good_words.strip()),                       # passes all rules
        (2, "the and of short"),                       # too few words
        (3, " ".join(["a"] * 60) + " the and"),        # mean word len < 3
        (4, good_words.strip() + " " + "#" * 1 * 60),  # hash symbols
        (5, "- " + good_words.strip()),                # single bullet line
        (6, " ".join(["12345"] * 60) + " the and"),    # no alphabetic words
        (7, " ".join(["zork"] * 60)),                  # no stopwords
    ], "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_quality(docs).collect()}
    assert got[1]["keep"] is True
    assert got[2]["keep"] is False and got[2]["n_words"] < 50
    assert got[3]["keep"] is False and got[3]["mean_word_len"] < 3.0
    assert got[4]["keep"] is False and got[4]["symbol_ratio"] >= 0.1
    assert got[5]["keep"] is False and got[5]["bullet_frac"] >= 0.9
    assert got[6]["keep"] is False and got[6]["alpha_frac"] < 0.8
    assert got[7]["keep"] is False and got[7]["n_stopwords"] < 2
    # multi-line: one bullet of three lines → fraction 1/3, under the cap
    ml = spark.createDataFrame(
        [(8, "- bullet line\n" + good_words.strip() + "\nplain closing line")],
        "doc_id long, text string",
    )
    r = gopher_quality(ml).collect()[0]
    assert r["bullet_frac"] == round(1 / 3, 6) and r["keep"] is True
    # ellipsis-ended lines
    el = spark.createDataFrame(
        [(9, (good_words.strip() + "...\n") * 2 + good_words.strip() + "...")],
        "doc_id long, text string",
    )
    r = gopher_quality(el).collect()[0]
    assert r["ellipsis_frac"] == 1.0 and r["keep"] is False


def test_c4_line_clean_rules(spark):
    """C4 rules (Raffel et al. 2019 §2.2): terminal-punctuation lines with
    ≥3 words survive; short, unterminated, and 'javascript' lines drop;
    '{' or 'lorem ipsum' anywhere drops the whole page."""
    from kafka_streams_demo_spark.functions.text import c4_line_clean

    docs = spark.createDataFrame([
        (1, 'good sentence stays here.\nno terminal punct\nok? \n'
            'enable javascript to view this.\ntoo short.\nalso "quoted line" stays.'),
        (2, "function() { return 1; }\nreal sentence would stay."),
        (3, "lorem ipsum dolor sit amet.\nreal text here too."),
        (4, "every line is kept here!\nand this one also stays."),
    ], "doc_id long, text string")
    got = {r["doc_id"]: r for r in c4_line_clean(docs).collect()}
    r1 = got[1]
    assert r1["page_ok"] and r1["n_lines"] == 6
    # "ok? " ends in terminal punctuation but has only 1 word — dropped
    assert r1["new_text"].split("\n") == [
        "good sentence stays here.", 'also "quoted line" stays.'
    ]
    assert r1["n_kept"] == 2
    assert not got[2]["page_ok"] and got[2]["n_kept"] == 0 and got[2]["new_text"] == ""
    assert not got[3]["page_ok"]
    assert got[4]["n_kept"] == 2 and got[4]["new_text"].count("\n") == 1


def test_gopher_repetition_signals(spark):
    """Repetition filters (Gopher A1.2): a clean varied doc passes; a doc
    that is one 2-gram over and over trips the top-2-gram char fraction;
    duplicated lines trip the line fractions; a repeated long phrase
    trips the dup-n-gram fractions."""
    from kafka_streams_demo_spark.functions.text import gopher_repetition

    varied = " ".join(f"w{i}" for i in range(40))
    phrase = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame([
        (1, varied),
        (2, "spam ham " * 30 + "spam"),          # one dominating 2-gram
        (3, "dup line\ndup line\nother line"),    # duplicate lines
        (4, (phrase + " ") * 4 + "tail"),         # repeated 10-gram phrase
    ], "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_repetition(docs).collect()}
    r1 = got[1]
    assert r1["keep"] is True
    assert r1["dup_line_frac"] == 0.0 and r1["top2gram_char_frac"] < 0.2
    assert got[2]["keep"] is False and got[2]["top2gram_char_frac"] > 0.2
    r3 = got[3]
    assert r3["dup_line_frac"] == round(1 / 3, 6)
    assert r3["dup_line_char_frac"] > 0.2 and r3["keep"] is False
    r4 = got[4]
    assert r4["dup10gram_char_frac"] > 0.10 and r4["keep"] is False
    # clamping: coverage approximation never exceeds 1
    for r in got.values():
        for n in (5, 6, 7, 8, 9, 10):
            assert 0.0 <= r[f"dup{n}gram_char_frac"] <= 1.0


def test_run_starts_semantics(spark):
    """run_starts over a sorted array yields run-start indices whose
    consecutive differences are exactly each distinct element's count —
    including empty and NULL inputs (empty starts)."""
    from kafka_streams_demo_spark.functions.text import run_starts

    df = spark.createDataFrame(
        [(1, ["a", "a", "b", "c", "c", "c"]), (2, ["x"]), (3, []), (4, None)],
        "id long, s array<string>",
    ).select("id", "s", run_starts(F.col("s")).alias("st"))
    got = {r["id"]: r["st"] for r in df.collect()}
    assert got[1] == [0, 2, 3]
    assert got[2] == [0]
    assert got[3] == [] and got[4] == []


def test_gopher_repetition_long_document_bounded(spark):
    """The linearized counting (array_sort + run_starts) must handle a
    ≥50k-word document in bounded time — the former per-distinct-gram
    in-array scan was O(L²)·9 (~10¹⁰ comparisons at this length) and
    would effectively never finish. Values stay exact: the dominating
    2-gram fraction and dup-gram coverage match hand math."""
    import time

    from kafka_streams_demo_spark.functions.text import gopher_repetition

    # 60k words over a 2k vocab: every 2-gram appears ~30x (all dup'd),
    # no single gram dominates; deterministic construction
    words = [f"w{(i * 7919) % 2000}" for i in range(60_000)]
    long_doc = " ".join(words)
    docs = spark.createDataFrame(
        [(1, long_doc), (2, " ".join(f"w{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    t0 = time.monotonic()
    got = {r["doc_id"]: r for r in gopher_repetition(docs).collect()}
    elapsed = time.monotonic() - t0
    assert elapsed < 120.0, f"long-doc pass took {elapsed:.1f}s — not linear"
    # .filter("keep") is the natural composition — the pushdown_barrier
    # must keep the pushed predicate from re-inflating the HOF tree
    t0 = time.monotonic()
    kept = gopher_repetition(docs).filter("keep").count()
    elapsed = time.monotonic() - t0
    assert kept == 1
    assert elapsed < 120.0, f"filter-on-keep took {elapsed:.1f}s — pushdown leak"
    r1 = got[1]
    # (i*7919) mod 2000 cycles with period 2000 → every 5-gram repeats
    # ~30x → dup coverage clamps to 1.0
    assert r1["dup5gram_char_frac"] == 1.0
    assert r1["keep"] is False
    assert got[2]["keep"] is True


def test_bm25_postings_long_document_bounded(spark):
    """bm25_postings run-length tf counting stays linear on a 60k-token
    document and its (term, tf) rows sum back to the doc length."""
    import time

    from kafka_streams_demo_spark.functions.text import bm25_postings

    words = [f"t{(i * 104729) % 5000}" for i in range(60_000)]
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    t0 = time.monotonic()
    rows = bm25_postings(docs).collect()
    elapsed = time.monotonic() - t0
    assert elapsed < 60.0, f"postings took {elapsed:.1f}s — not linear"
    assert len(rows) == 5000
    assert sum(r["tf"] for r in rows) == 60_000
    assert all(r["dl"] == 60_000 for r in rows)


def test_bm25_postings_null_text_matches_direct_path(spark):
    """ADVICE r6: NULL text coalesces to '' in BOTH paths, so N/avgdl
    derived from postings equals the direct path's and the documented
    bit-equality holds on corpora with NULL rows."""
    from kafka_streams_demo_spark.functions.text import (
        bm25_postings,
        bm25_search_queries,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, None), (3, "beta gamma")],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame([(1, "alpha beta")], "query_id long, query_text string")
    direct = sorted(
        tuple(r) for r in bm25_search_queries(docs, qdf, k=5).collect()
    )
    via_postings = sorted(
        tuple(r)
        for r in bm25_search_queries(
            None, qdf, k=5, postings=bm25_postings(docs)
        ).collect()
    )
    assert direct == via_postings and len(direct) == 2
    # the NULL doc contributes one "" posting row with dl=1
    p = {(r["doc_id"], r["term"]): r for r in bm25_postings(docs).collect()}
    assert p[(2, "")]["dl"] == 1 and p[(2, "")]["tf"] == 1


def test_gopher_repetition_impls_are_bit_identical(spark):
    """arrow (numpy/Counter kernel) and native (HOF column expressions)
    gopher_repetition must produce identical rows — the impl flag is a
    runtime choice, never a semantic one. The fixture forces every
    kernel path: short docs (tuple-Counter), a >2000-word doc (numpy
    id-window path), '_'-bearing words (joined-string fallback, where
    id-tuples and joins are non-bijective), unicode, NULL and empty
    text, heavy repetition."""
    rows = [
        (1, "the cat sat\nthe cat sat\non the mat."),
        (2, "a_b c d a b_c d"),                       # '_' fallback path
        (3, None),
        (4, ""),
        (5, "solo"),
        (6, "naïve café déjà vu naïve café déjà vu naïve café déjà vu"),
        (7, " ".join(f"w{(i * 7919) % 300}" for i in range(3000))),  # numpy path
        (8, "x " * 50),                                # one dominating gram
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from kafka_streams_demo_spark.functions.text import gopher_repetition

    a = {r["doc_id"]: tuple(r) for r in gopher_repetition(docs, impl="arrow").collect()}
    n = {r["doc_id"]: tuple(r) for r in gopher_repetition(docs, impl="native").collect()}
    assert a == n
    assert len(a) == len(rows)


def test_char_gram_index_positions(spark):
    from kafka_streams_demo_spark.functions.text import char_gram_index

    df = spark.createDataFrame([(1, "abcde"), (2, "abc"), (3, "ab"), (4, None)],
                               "doc_id long, text string")
    rows = {(r["doc_id"], r["gram"], r["pos"])
            for r in char_gram_index(df, n=3).collect()}
    # doc 1: abc@0 bcd@1 cde@2; doc 2: abc@0; docs 3/4 too short → absent
    assert rows == {(1, "abc", 0), (1, "bcd", 1), (1, "cde", 2), (2, "abc", 0)}


def test_substring_find_all_occurrences(spark):
    from kafka_streams_demo_spark.functions.text import substring_find

    df = spark.createDataFrame(
        [(1, "xx table scan yy table scan"), (2, "TABLE SCAN"), (3, "table sc")],
        "doc_id long, text string",
    )
    got = sorted((r["doc_id"], r["start"])
                 for r in substring_find(df, "table scan", n=4).collect())
    assert got == [(1, 3), (1, 17), (2, 0)]  # case-folded; partial no match


def test_substring_find_overlapping_and_boundary(spark):
    from kafka_streams_demo_spark.functions.text import substring_find

    df = spark.createDataFrame([(1, "aaaaaa")], "doc_id long, text string")
    got = sorted(r["start"] for r in substring_find(df, "aaaa", n=4).collect())
    assert got == [0, 1, 2]  # overlapping matches all found


def test_substring_find_rarest_mode_matches_full(spark):
    from kafka_streams_demo_spark.functions.text import substring_find

    df = spark.createDataFrame(
        [(i, f"prefix{i} the rare needle here and the common the the")
         for i in range(10)] + [(99, "no match at all")],
        "doc_id long, text string",
    )
    full = sorted((r["doc_id"], r["start"])
                  for r in substring_find(df, "rare needle", n=4).collect())
    rare = sorted((r["doc_id"], r["start"])
                  for r in substring_find(df, "rare needle", n=4, rarest_k=2).collect())
    assert full == rare and len(full) == 10


def test_substring_find_via_persisted_index(spark):
    from kafka_streams_demo_spark.functions.text import (
        char_gram_index,
        substring_find,
    )

    df = spark.createDataFrame(
        [(1, "find the pattern in here")], "doc_id long, text string"
    )
    idx = char_gram_index(df, n=4)
    got = substring_find(None, "pattern", n=4, index=idx).collect()
    assert [(r["doc_id"], r["start"]) for r in got] == [(1, 9)]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="pass docs"):
        substring_find(None, "pattern", n=4, index=idx, rarest_k=1)
    with _pytest.raises(ValueError, match="shorter"):
        substring_find(df, "ab", n=4)


def test_token_drift_kl_flags_new_token(spark):
    from kafka_streams_demo_spark.functions.text import token_drift_kl

    a = spark.createDataFrame(
        [(1, "spam spam spam common"), (2, "spam common word")],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(3, "common word here"), (4, "common word")],
        "doc_id long, text string",
    )
    rows = token_drift_kl(a, b, k=3).collect()
    assert rows[0]["token"] == "spam"  # the A-only token dominates KL(A||B)
    assert rows[0]["c_a"] == 4 and rows[0]["c_b"] == 0
    assert rows[0]["kl_term"] > 0


def test_token_drift_kl_symmetric_corpora_near_zero(spark):
    from kafka_streams_demo_spark.functions.text import token_drift_kl

    a = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    rows = token_drift_kl(a, a, k=10).collect()
    assert all(r["kl_term"] == 0.0 for r in rows)  # identical dists → 0


def test_tfidf_doc_pairs_identical_docs_cosine_one(spark):
    from pyspark.sql import Row

    from kafka_streams_demo_spark.functions.text import tfidf_doc_pairs

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma"),
            Row(doc_id=2, text="alpha beta gamma"),
            Row(doc_id=3, text="delta epsilon zeta"),
        ]
    )
    got = {(r["i"], r["j"]): r["cosine"]
           for r in tfidf_doc_pairs(df, threshold=0.0).collect()}
    assert got[(1, 2)] == 1.0
    assert (1, 3) not in got and (2, 3) not in got  # orthogonal: no shared term


def test_tfidf_doc_pairs_cap_drops_hot_terms(spark):
    from pyspark.sql import Row

    from kafka_streams_demo_spark.functions.text import tfidf_doc_pairs

    # 'the' appears in all 4 docs; with cap=3 it leaves the term space,
    # making docs 1/2 orthogonal (their only shared term was 'the').
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the apple"),
            Row(doc_id=2, text="the orange"),
            Row(doc_id=3, text="the pear kiwi"),
            Row(doc_id=4, text="the pear kiwi"),
        ]
    )
    uncapped = {(r["i"], r["j"]) for r in tfidf_doc_pairs(df, 0.0).collect()}
    capped = {(r["i"], r["j"])
              for r in tfidf_doc_pairs(df, 0.0, max_doc_freq=3).collect()}
    assert (1, 2) in uncapped and (1, 2) not in capped
    assert (3, 4) in capped  # still share 'pear kiwi'


def test_tfidf_doc_pairs_null_text_no_rows(spark):
    from pyspark.sql import Row

    from kafka_streams_demo_spark.functions.text import tfidf_doc_pairs

    df = spark.createDataFrame(
        [Row(doc_id=1, text=None), Row(doc_id=2, text="a b"), Row(doc_id=3, text="a c")]
    )
    got = {(r["i"], r["j"]) for r in tfidf_doc_pairs(df, threshold=0.0).collect()}
    assert got == {(2, 3)}


def test_run_starts_null_elements_own_run(spark):
    """NULL elements form their own run instead of merging into the
    preceding one (plain != evaluates to NULL, not true, at a NULL
    boundary — ADVICE r7); a leading NULL still anchors index 0."""
    from kafka_streams_demo_spark.functions.text import run_starts

    df = spark.createDataFrame(
        [(1, ["a", "a", "b", None, None]), (2, [None, None]), (3, [None, "a"])],
        "id long, s array<string>",
    ).select("id", run_starts(F.col("s")).alias("st"))
    got = {r["id"]: r["st"] for r in df.collect()}
    assert got[1] == [0, 2, 3]   # pre-fix: [0, 2] — NULL run merged into 'b'
    assert got[2] == [0]
    assert got[3] == [0, 1]


def test_bm25_pruned_equals_exhaustive(spark):
    """MaxScore-pruned bulk BM25 ≡ the exhaustive path bit-for-bit —
    at several k (k=1 exercises aggressive pruning, k=50 forces
    fewer-than-k-candidate queries into the phase-2 rescue)."""
    from kafka_streams_demo_spark.functions.text import (
        bm25_search_queries,
        bm25_search_queries_pruned,
    )
    from kafka_streams_demo_spark.sources.registry import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    toks = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("_w")
    )
    qdf = toks.filter(F.size("_w") >= 4).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice("_w", 2, 3), " ").alias("query_text"),
    )
    for k in (1, 5, 50):
        base = {
            (r["query_id"], r["doc_id"]): (r["score"], r["rk"])
            for r in bm25_search_queries(docs, qdf, k=k).collect()
        }
        pruned = {
            (r["query_id"], r["doc_id"]): (r["score"], r["rk"])
            for r in bm25_search_queries_pruned(docs, qdf, k=k).collect()
        }
        assert pruned == base, (
            k,
            len(base),
            len(pruned),
            dict(list((set(base.items()) ^ set(pruned.items())))[:4] if base != pruned else []),
        )


def test_zipf_corpus_shape_and_determinism(spark):
    """The retrieval-pruning grading fixture: deterministic across
    builds, Zipf-skewed df (head term in most docs, median term rare —
    the property the driver documents table lacks), fixed doc length."""
    from collections import Counter

    from kafka_streams_demo_spark.functions.text import zipf_corpus

    a = {r["doc_id"]: r["text"] for r in zipf_corpus(spark, 300).collect()}
    b = {r["doc_id"]: r["text"] for r in zipf_corpus(spark, 300).collect()}
    assert a == b and len(a) == 300
    assert all(len(t.split(" ")) == 60 for t in a.values())
    df = Counter()
    for t in a.values():
        df.update(set(t.split(" ")))
    counts = sorted(df.values(), reverse=True)
    # head term is stopword-like; the median vocab word is rare
    assert counts[0] >= 0.8 * 300, counts[0]
    assert counts[len(counts) // 2] <= 0.05 * 300, counts[len(counts) // 2]
