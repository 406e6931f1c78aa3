"""Distributed n-gram LM scoring (Stupid Backoff / CCNet) and DSIR."""

import math

from pyspark.sql import functions as F

from kafka_streams_demo_spark.functions.lm import (
    ccnet_bucket,
    dsir_select,
    dsir_weights,
    ngram_lm_score,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stupid_backoff_seen_and_backoff_paths(spark):
    # train: "a b a b" → cb(a,b)=2 cb(b,a)=1; cu a=2 b=2; N=4
    train = _docs(spark, [(1, "a b a b")])
    # score: "a b c" → (a,b) seen: S=2/2=1 → log 0; (b,c) unseen,
    # c unseen unigram → S = 0.4 * 1/4 = 0.1 → log10 = -1
    score = _docs(spark, [(9, "a b c")])
    row = ngram_lm_score(score, train_docs=train).first()
    assert row["t"] == 2
    # nll = -(0 + (-1))/2 = 0.5
    assert row["nll"] == 0.5


def test_backoff_uses_seen_unigram_count(spark):
    # train: "a b c c" → cu c=2, N=4; (x,c) unseen bigram but c seen:
    # S = 0.4 * 2/4 = 0.2
    train = _docs(spark, [(1, "a b c c")])
    score = _docs(spark, [(9, "x c")])
    row = ngram_lm_score(score, train_docs=train).first()
    assert row["t"] == 1
    assert row["nll"] == round(-math.log10(0.2), 6)


def test_short_and_null_docs_dropped(spark):
    train = _docs(spark, [(1, "a b")])
    score = _docs(spark, [(2, "a"), (3, None), (4, "a b")])
    got = {r["doc_id"] for r in ngram_lm_score(score, train_docs=train).collect()}
    assert got == {4}  # 1-token and NULL (→ [""] 1 token) docs have no bigram


def test_ccnet_bucket_boundaries(spark):
    scored = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0), (4, 2.5)], "doc_id long, nll double"
    )
    got = {
        r["doc_id"]: r["bucket"]
        for r in ccnet_bucket(scored, cutoffs=(2.0, 2.5)).collect()
    }
    # [lo, hi) half-open on the left: lo itself is middle, hi itself tail
    assert got == {1: "head", 2: "middle", 3: "tail", 4: "tail"}


def test_dsir_weights_favor_target_like_docs(spark):
    # target docs are all "x y"; raw mixes in "p q". A new doc made of
    # target features must out-weigh one made of raw-only features.
    docs = spark.createDataFrame(
        [(1, "x y x y", "t"), (2, "x y", "t"), (3, "p q p q", "r"),
         (4, "x y", "r"), (5, "p q", "r")],
        "doc_id long, text string, source string",
    )
    w = {
        r["doc_id"]: r["w"]
        for r in dsir_weights(docs, F.col("source") == "t", num_buckets=64).collect()
    }
    # absolute signs shift with the Laplace denominators (B ≫ counts on a
    # toy corpus); resampling uses the ORDER, which must favor target-like
    assert w[4] > w[5]  # same length, target-featured doc wins
    assert w[1] > w[3]
    assert min(w[1], w[2], w[4]) > max(w[3], w[5])


def test_dsir_select_topk_deterministic_tiebreak(spark):
    docs = spark.createDataFrame(
        [(i, "x y" if i % 2 == 0 else "p q", "t" if i == 0 else "r")
         for i in range(10)],
        "doc_id long, text string, source string",
    )
    top = dsir_select(docs, F.col("source") == "t", k=3, num_buckets=64).collect()
    # all even docs share identical features/weights → doc_id breaks ties
    assert [r["doc_id"] for r in top] == [0, 2, 4]


def test_lm_plan_stays_jvm_side(spark):
    docs = _docs(spark, [(i, "a b c a") for i in range(8)])
    plan = ngram_lm_score(docs)._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    plan2 = (
        dsir_weights(docs.withColumn("source", F.lit("t")), F.lit(True))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PythonUDF" not in plan2 and "BatchEvalPython" not in plan2


def test_dsir_ratio_table_broadcasts(spark):
    docs = _docs(spark, [(i, "a b") for i in range(8)]).withColumn(
        "source", F.lit("t")
    )
    plan = (
        dsir_weights(docs, F.col("source") == "t")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastExchange" in plan  # the B-row log-ratio model


def test_merge_lm_counts_equals_batch(spark):
    from kafka_streams_demo_spark.functions.lm import (
        lm_counts,
        merge_lm_counts,
        ngram_lm_score,
    )

    docs = _docs(spark, [(i, f"a b c a b w{i % 3} end") for i in range(12)])
    d1, d2 = docs.where("doc_id % 2 = 0"), docs.where("doc_id % 2 = 1")
    mcb, mcu = merge_lm_counts([lm_counts(d1), lm_counts(d2)])
    bcb, bcu = lm_counts(docs)
    assert sorted(map(tuple, mcb.collect())) == sorted(map(tuple, bcb.collect()))
    assert sorted(map(tuple, mcu.collect())) == sorted(map(tuple, bcu.collect()))
    # scoring via merged counts ≡ direct train — bit-equal nll
    via_counts = sorted(
        map(tuple, ngram_lm_score(docs, counts=(mcb, mcu)).collect())
    )
    direct = sorted(map(tuple, ngram_lm_score(docs).collect()))
    assert via_counts == direct


def test_train_pred_equals_train_docs(spark):
    # the train_pred fast path (cb re-aggregated from the scoring set's
    # per-doc bigram frame, r13) must be bit-equal to passing the same
    # subset as train_docs — including docs exercising backoff, ties,
    # short/NULL docs, and a train split that is a strict subset
    docs = _docs(
        spark,
        [(i, f"a b c a b w{i % 3} end extra{i % 5}") for i in range(20)]
        + [(20, "a"), (21, None), (22, "a b")],
    )
    pred = F.col("doc_id") % 5 != 0
    via_pred = sorted(
        map(tuple, ngram_lm_score(docs, train_pred=pred).collect())
    )
    via_docs = sorted(
        map(tuple, ngram_lm_score(docs, train_docs=docs.where(pred)).collect())
    )
    assert via_pred == via_docs


def test_nb_scores_separate_classes(spark):
    from kafka_streams_demo_spark.functions.lm import nb_quality_scores

    # positive class talks about "clean curated prose", negatives about
    # "spam junk clicks" — an unseen doc from each vocabulary should
    # score on its class's side
    docs = _docs(
        spark,
        [
            (1, "clean curated prose clean curated prose"),
            (2, "clean prose curated clean"),
            (3, "spam junk clicks spam junk clicks"),
            (4, "junk spam clicks junk"),
            (5, "clean curated"),   # held-out positive-like
            (6, "spam clicks"),     # held-out negative-like
        ],
    )
    got = {
        r["doc_id"]: r["score"]
        for r in nb_quality_scores(docs, F.col("doc_id") <= 2).collect()
    }
    assert len(got) == 6
    assert got[5] > got[6]
    assert got[1] > 0 and got[3] < 0


def test_nb_score_includes_prior(spark):
    from kafka_streams_demo_spark.functions.lm import nb_quality_scores

    # identical token bags: the ONLY signal separating the (single)
    # feature's llr from zero is class imbalance, and the score must
    # equal prior + n·llr exactly as specified
    docs = _docs(spark, [(1, "x"), (2, "x"), (3, "x"), (4, "x")])
    got = {
        r["doc_id"]: r["score"]
        for r in nb_quality_scores(docs, F.col("doc_id") <= 3).collect()
    }
    prior = math.log(3.0 / 1.0)
    llr = math.log(4.0 / (3 + 256)) - math.log(2.0 / (1 + 256))
    want = round(prior + llr, 6)
    assert all(v == want for v in got.values())


def test_pareto_filter_keep_monotone_and_deterministic(spark):
    from kafka_streams_demo_spark.functions.lm import pareto_quality_filter

    scored = spark.createDataFrame(
        [(i, s) for i, s in enumerate([-20.0, -2.0, 0.0, 2.0, 20.0] * 40)],
        "doc_id long, score double",
    )
    out = pareto_quality_filter(scored).collect()
    assert len(out) == 200
    # saturated scores: σ(20) ≈ 1 → keep guaranteed (pareto > 0 always);
    # σ(-20) ≈ 0 → keep requires pareto > 1, prob (1/2)^9 ≈ 0.2%
    by_score = {}
    for r in out:
        by_score.setdefault(r["score"], []).append(r["keep"])
    assert all(k == 1 for k in by_score[20.0])
    keep_rate = {s: sum(v) / len(v) for s, v in by_score.items()}
    assert keep_rate[-20.0] <= keep_rate[0.0] <= keep_rate[20.0]
    # stochastic-but-derandomized: the mid band admits SOME of each side
    # (tail diversity — the reason GPT-3 doesn't hard-threshold). At
    # score 2.0 the keep probability is P(pareto > 1−σ(2)) =
    # (1−0.119)^9 ≈ 0.36, so 40 deterministic draws land strictly
    # inside (0, 1) with overwhelming margin; score 0.0's ~2.6% rate is
    # too rare to assert non-zero on 40 draws.
    assert 0 < keep_rate[2.0] < 1
    # bit-stable across a different partitioning
    out2 = pareto_quality_filter(scored.repartition(7)).collect()
    assert {(r["doc_id"], r["keep"]) for r in out2} == {
        (r["doc_id"], r["keep"]) for r in out
    }


def test_nb_plan_stays_jvm_side(spark):
    from kafka_streams_demo_spark.functions.lm import (
        nb_quality_scores,
        pareto_quality_filter,
    )
    from kafka_streams_demo_spark.plans.explain import audit

    docs = _docs(spark, [(1, "a b c"), (2, "b c d"), (3, "d e f")])
    df = pareto_quality_filter(nb_quality_scores(docs, F.col("doc_id") == 1))
    a = audit(df)
    assert a.python_evals == 0


def test_nb_merge_counts_equals_batch(spark):
    from kafka_streams_demo_spark.functions.lm import (
        merge_nb_counts,
        nb_model_counts,
        nb_quality_scores,
    )

    docs = _docs(
        spark,
        [
            (1, "clean curated prose clean"),
            (2, "clean prose curated"),
            (3, "spam junk clicks spam"),
            (4, "junk spam clicks"),
            (5, "clean spam mixed bag"),
            (6, "curated junk mixed"),
        ],
    )
    pred = F.col("doc_id") <= 2
    batch = {
        r["doc_id"]: r["score"]
        for r in nb_quality_scores(docs, pred).collect()
    }
    parts = [
        nb_model_counts(docs.where(F.col("doc_id") % 2 == 0), pred),
        nb_model_counts(docs.where(F.col("doc_id") % 2 == 1), pred),
    ]
    inc = {
        r["doc_id"]: r["score"]
        for r in nb_quality_scores(
            docs, counts=merge_nb_counts(parts)
        ).collect()
    }
    assert inc == batch  # bit-for-bit: integer totals are order-free


def test_nb_persisted_model_scores_unseen_buckets_with_smoothing(spark):
    """ADVICE r10: scoring a NEW document against a persisted model must
    apply the Laplace unseen-bucket weight ln((n_neg+B)/(n_pos+B)) to
    features the model never saw — not an implicit 0. Train on a corpus
    with n_pos != n_neg, score a doc of entirely novel tokens, and check
    the closed form: prior + n_features · default_llr."""
    import math

    from kafka_streams_demo_spark.functions.lm import (
        nb_model_counts,
        nb_quality_scores,
    )

    train = spark.createDataFrame(
        [
            (1, "good clean prose here"),
            (2, "fine solid writing style"),
            (3, "spam junk words"),
        ],
        "doc_id long, text string",
    )
    num_buckets = 64
    counts = nb_model_counts(train, F.col("doc_id") <= 2, num_buckets=num_buckets)
    bc, dc = counts
    n_pos, n_neg = bc.agg(F.sum("c_pos"), F.sum("c_neg")).collect()[0]
    d_pos, d_neg = dc.collect()[0]
    assert d_pos == 2 and d_neg == 1 and n_pos != n_neg

    # a document of tokens the model never saw; its features may still
    # HASH onto trained buckets, so compute the expected score from the
    # actual bucket coverage rather than assuming all-unseen
    new = spark.createDataFrame(
        [(99, "zzqx wvvk pplm")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["score"]
        for r in nb_quality_scores(new, counts=counts, num_buckets=num_buckets).collect()
    }
    from kafka_streams_demo_spark.functions.lm import _feature_rows, _tokens

    feats = _feature_rows(_tokens(new, "doc_id", "text"), num_buckets)
    model = {r["bucket"]: (r["c_pos"], r["c_neg"]) for r in bc.collect()}
    B = float(num_buckets)
    contribs = []
    for r in feats.collect():
        cp, cn = model.get(r["bucket"], (0, 0))
        contribs.append(
            r["c"]
            * (
                math.log((cp + 1.0) / (n_pos + B))
                - math.log((cn + 1.0) / (n_neg + B))
            )
        )
    expected = round(math.log(d_pos / d_neg) + sum(sorted(contribs)), 6)
    assert abs(got[99] - expected) < 2e-6, (got[99], expected)
    # and the fix is load-bearing: with llr=0 for unseen buckets the
    # score would differ (n_pos != n_neg makes the default nonzero)
    unseen = [c for r in feats.collect() if r["bucket"] not in model for c in [r["c"]]]
    assert unseen, "test needs at least one unseen bucket"
