"""Distributed n-gram language modeling for corpus quality scoring.

Two published large-scale training-data techniques, both pure DataFrame
(zero Python boundary, zero driver-side iteration):

- ``ngram_lm_score`` — Stupid Backoff bigram LM (Brants et al. 2007,
  "Large Language Models in Machine Translation" — the smoothing scheme
  *designed for* distributed MapReduce-style count aggregation) trained
  on a reference subset, scoring every document's per-token negative
  log-likelihood. ``ccnet_bucket`` then applies fixed head/middle/tail
  cutoffs — the CCNet recipe (Wenzek et al. 2019): cutoffs are computed
  OFFLINE once per language from a sample's score distribution and
  applied as constants, so the scoring pass itself needs no global sort
  or window (embarrassingly parallel at 100 TB).

- ``dsir_weights`` / ``dsir_select`` — Data Selection via Importance
  Resampling (Xie et al. 2023): hashed n-gram bag-of-features, per-doc
  importance weight log p_target(doc) − log p_raw(doc) under two
  Laplace-smoothed multinomials over B hash buckets, then top-k
  selection.

Scale design, both paths: token/bigram counts are groupBy aggregates
(map-side partial combine — the Brants et al. distribution strategy);
the per-doc scoring join is keyed on terms/buckets, never on docs, and
joins doc-level DISTINCT-gram rows (multiplicity pre-aggregated) so a
100k-token document contributes its distinct grams once, not one row
per position. The DSIR log-ratio table is exactly ``num_buckets`` rows
— broadcast. Per-doc float sums fold in SORTED order (the cross-engine
determinism contract: ``aggregate(array_sort(collect_list(x)))`` ≡
DuckDB ``list_sum(list_sort(list(x)))``) so 6-dp rounded scores are
stable under shuffle arrival order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "lm_counts",
    "merge_lm_counts",
    "ngram_lm_score",
    "ccnet_bucket",
    "dsir_weights",
    "dsir_select",
    "nb_quality_scores",
    "nb_model_counts",
    "merge_nb_counts",
    "pareto_quality_filter",
]


def _sorted_sum(col: Column) -> Column:
    """Order-insensitive double sum: fold the sorted contribution list.
    Still the right aggregate for the NB scoring paths — the r13 A/B of
    the window fold (functions/fold.py) was a wash-to-slightly-worse
    there (quality_classifier_filter 1.33 → 1.39 s, token_budget_select
    1.46 → 1.51 s at sf0.1) while dsir_weights kept the fold (clear win,
    1.44 → 1.21 s): the NB contribution join emits fewer, pre-combined
    rows per doc, so the map-side partial combine beats the raw-row
    exchange."""
    return F.aggregate(
        F.array_sort(F.collect_list(col)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _tokens(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    extra: dict[str, Column] | None = None,
) -> DataFrame:
    # NOT spread (functions/spread.py): consumers reference the token
    # frame from several branches (uni+bigram unions, train+score), so a
    # repartition here runs once PER BRANCH — measured net-negative at
    # sf0.1 (quality_classifier_filter 1.46 → 1.93 s; r13)
    names = list(extra) if extra else []
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *(expr.alias(name) for name, expr in (extra or {}).items()),
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " ").alias("_ts"),
    ).select("doc_id", *names, "_ts", F.size("_ts").alias("_n"))


def _bigram_rows(toks: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, [carry...], w1, w2, c) — per-doc bigram multiplicities.
    ``_ts`` is a bound attribute (the run_starts HOF contract), and docs
    shorter than 2 tokens are filtered before the 0-based
    ``sequence(0, _n-2)`` is built (Spark's sequence DESCENDS when
    start > stop — never evaluate it on an empty doc). ``carry`` names
    per-doc-constant columns to keep through the aggregate (added to the
    group keys; doc_id determines them, so the groups are unchanged)."""
    return (
        toks.where(F.col("_n") >= 2)
        .select(
            "doc_id",
            *carry,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("_n") - 2),
                    lambda i: F.struct(
                        F.get(F.col("_ts"), i).alias("w1"),
                        F.get(F.col("_ts"), i + 1).alias("w2"),
                    ),
                )
            ).alias("_b"),
        )
        .groupBy(
            "doc_id", *carry, F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )


def lm_counts(
    train_docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """The Stupid Backoff model IS two count tables — (bigram counts
    (w1, w2, cb), unigram counts (w, cu)); total tokens N = Σ cu. Counts
    are ADDITIVE, so the persisted-index maintenance story is trivial:
    union a delta batch's counts with the stored tables and re-sum —
    index+delta ≡ retrain bit-for-bit (``merge_lm_counts``; same-oracle
    proven by the ``ccnet_perplexity_incremental`` catalog entry). This
    additivity is exactly why Brants et al. 2007 chose the scheme for
    MapReduce-scale training."""
    ttoks = _tokens(train_docs, id_col, text_col)
    cb = _bigram_rows(ttoks).groupBy("w1", "w2").agg(F.sum("c").alias("cb"))
    cu = (
        ttoks.select(F.explode("_ts").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    return cb, cu


def merge_lm_counts(
    parts: list[tuple[DataFrame, DataFrame]]
) -> tuple[DataFrame, DataFrame]:
    """Additive merge of ``lm_counts`` partial tables (stored index +
    delta batches): union then re-sum — one map-side-combined aggregate
    per table, never a re-tokenize of the base corpus."""
    cbs, cus = zip(*parts)
    cb = cbs[0]
    for other in cbs[1:]:
        cb = cb.unionByName(other)
    cu = cus[0]
    for other in cus[1:]:
        cu = cu.unionByName(other)
    return (
        cb.groupBy("w1", "w2").agg(F.sum("cb").alias("cb")),
        cu.groupBy("w").agg(F.sum("cu").alias("cu")),
    )


def ngram_lm_score(
    docs: DataFrame,
    train_docs: DataFrame | None = None,
    alpha: float = 0.4,
    id_col: str = "doc_id",
    text_col: str = "text",
    counts: tuple[DataFrame, DataFrame] | None = None,
    train_pred: Column | None = None,
) -> DataFrame:
    """Per-document Stupid Backoff bigram cross-entropy.

    Trains bigram/unigram counts on ``train_docs`` (default: ``docs``
    itself — but pass a held-out reference corpus so the backoff path is
    actually exercised; CCNet trains on target-domain text and scores
    the crawl). Or pass ``counts`` — (cb, cu) tables from ``lm_counts``
    / ``merge_lm_counts`` — to score against a persisted model without
    re-tokenizing the training corpus (N is recovered as Σcu). Or pass
    ``train_pred`` — a boolean Column over ``docs`` — when the train
    split is a subset of the scoring set: the train bigram counts are
    then re-aggregated from the scoring set's persisted per-doc bigram
    frame instead of tokenized a second time (bit-identical counts;
    guide §2.4). Score per doc: ``nll = -(1/T) Σ log10 S(w_i | w_{i-1})``
    over the T = n−1 bigram positions, where

        S(w2|w1) = count(w1 w2) / count(w1)        if the bigram was seen
                 = alpha · count(w2) / N           otherwise (backoff)

    with unseen-unigram ``count(w2)`` coalesced to 1 (an OOV
    pseudo-count, documented deviation — Brants et al. leave OOV to the
    decoder). Docs with fewer than 2 tokens are dropped (no bigram
    evidence). Returns (doc_id, t, nll) with nll rounded to 6 dp.

    100 TB shape: counts are two map-side-combined aggregates over the
    TRAIN corpus; scoring builds per-doc DISTINCT bigram rows (position
    multiplicity pre-aggregated, so join traffic is distinct-grams not
    positions), scores each distinct scoring-set bigram ONCE against the
    count tables (term-keyed joins — AQE handles Zipf-head skew; the
    model table is vocab-bounded, not corpus-bounded), then one
    doc-keyed aggregate folds contributions in sorted order. No global
    window anywhere.
    """
    train_from_db = counts is None and train_pred is not None
    if counts is not None:
        cb, cu = counts
    elif train_from_db:
        # train ⊆ docs selected by a per-doc predicate: the scoring set's
        # per-doc bigram frame (db below) already holds every train
        # bigram with its multiplicity, so cb is a re-aggregation of the
        # persisted db instead of a second tokenize+bigram pass over the
        # train corpus (guide §2.4 — duplicated subtrees; r13: cb alone
        # was 0.6 s warm at sf0.1, ~all of it shared with db). cb is
        # derived after db exists; cu (unigram counts) still needs a
        # token-level pass — the bigram frame cannot recover the last
        # token of each doc.
        cb = None
        cu = None
    else:
        if train_docs is None:
            train_docs = docs
        cb, cu = lm_counts(train_docs, id_col, text_col)
    # persist the unigram table: N, the w1 side, and the w2 side all
    # read it, and Catalyst replans its upstream per reference (a full
    # train-corpus re-tokenize ×3 in the batch entry; the whole
    # merge-and-resum chain ×3 in the incremental one — the r9 minhash
    # lesson). Vocab-bounded, released via dedup.release_caches().
    # Persist OUR OWN projection, never the caller's frame: the extra
    # Project gives a distinct analyzed plan, so a caller-persisted
    # counts table keeps its storage level and release_caches() can't
    # unpersist the caller's long-lived model behind its back.
    from kafka_streams_demo_spark.functions.dedup import _track_cache

    if train_from_db:
        stoks = _tokens(docs, id_col, text_col, extra={"_tr": train_pred})
        db = _bigram_rows(stoks, carry=("_tr",)).persist()
        _track_cache(db)
        cu = (
            stoks.where(F.col("_tr"))
            .select(F.explode("_ts").alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("cu"))
        )
    else:
        stoks = _tokens(docs, id_col, text_col)
        # score each DISTINCT scoring-set bigram once against the model;
        # the per-doc bigram rows feed both the distinct probe set and
        # the contribution join — persist so the scoring corpus
        # tokenizes once
        db = _bigram_rows(stoks).persist()
        _track_cache(db)
    cu = cu.select("w", "cu").persist()
    _track_cache(cu)
    # N = Σ cu — exact integer identity with counting the exploded
    # tokens, and derivable from stored counts alone
    n_tok = cu.agg(F.sum("cu").cast("double").alias("n_tok"))
    if train_from_db:
        # the distinct scoring-bigram set AND its train count in ONE
        # aggregate over the persisted bigram frame: sum(when(_tr, c))
        # ignores non-train rows and yields NULL for a never-in-train
        # bigram — exactly the left-join-miss the backoff branch keys on
        # (integer sum, order-insensitive; identical to the previous
        # distinct() + train-side groupBy + (w1,w2) join-back, which
        # exchanged db twice and ran a second join — guide §2.4)
        sb = db.groupBy("w1", "w2").agg(
            F.sum(F.when(F.col("_tr"), F.col("c"))).alias("cb")
        )
    else:
        sb = db.select("w1", "w2").distinct().join(cb, ["w1", "w2"], "left")
    cu1 = cu.select(F.col("w").alias("w1"), F.col("cu").alias("cu1"))
    cu2 = cu.select(F.col("w").alias("w2"), F.col("cu").alias("cu2"))
    model = (
        sb.join(cu1, "w1", "left")
        .join(cu2, "w2", "left")
        .crossJoin(n_tok)  # 1-row stats — broadcast by construction
        .select(
            "w1",
            "w2",
            F.when(
                F.col("cb").isNotNull(),
                F.col("cb").cast("double") / F.col("cu1").cast("double"),
            )
            .otherwise(
                F.lit(alpha)
                * F.coalesce(F.col("cu2"), F.lit(1)).cast("double")
                / F.col("n_tok")
            )
            .alias("s"),
        )
    )
    contrib = db.join(model, ["w1", "w2"]).select(
        "doc_id", "c", (F.col("c").cast("double") * F.log10("s")).alias("v")
    )
    # window fold (functions/fold.py): same sorted-order sum of v as the
    # collect_list fold, one Sort+Window pass instead of the object agg;
    # t = Σc is an integer sum — order-insensitive, safe as an extra
    from kafka_streams_demo_spark.functions.fold import sorted_fold_sum

    folded = sorted_fold_sum(
        contrib, ["doc_id"], F.col("v"), "_sv", extras={"t": F.sum("c")}
    )
    return folded.select(
        "doc_id",
        "t",
        F.round(-F.col("_sv") / F.col("t").cast("double"), 6).alias("nll"),
    )


def ccnet_bucket(
    scored: DataFrame, cutoffs: tuple[float, float], score_col: str = "nll"
) -> DataFrame:
    """CCNet head/middle/tail assignment from FIXED cutoffs (Wenzek et
    al. 2019 §4.3: per-language thresholds are percentiles of a sample's
    perplexity distribution, computed offline once, then applied as
    constants — so this pass is a pure row-local projection, no global
    sort/window at scale). head = best (lowest) scores."""
    lo, hi = cutoffs
    s = F.col(score_col)
    return scored.withColumn(
        "bucket",
        F.when(s < F.lit(lo), F.lit("head"))
        .when(s < F.lit(hi), F.lit("middle"))
        .otherwise(F.lit("tail")),
    )


def _hash_bucket(col: Column, num_buckets: int) -> Column:
    """Cross-engine stable feature hash: 60-bit integer from the md5 hex
    prefix (sign-safe in both engines), mod B. DuckDB replays it as
    ``('0x' || substr(md5(s), 1, 15))::BIGINT % B``."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long"),
        F.lit(num_buckets),
    )


def _feature_rows(
    toks: DataFrame, num_buckets: int
) -> DataFrame:
    """(doc_id, bucket, c) hashed unigram+bigram bag-of-features counts.
    Bigram feature strings are '_'-joined so the oracle can rebuild them
    with list comprehensions."""
    uni = toks.select("doc_id", F.explode("_ts").alias("f"))
    big = (
        toks.where(F.col("_n") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("_n") - 2),
                    lambda i: F.concat_ws(
                        "_", F.get(F.col("_ts"), i), F.get(F.col("_ts"), i + 1)
                    ),
                )
            ).alias("f"),
        )
    )
    return (
        uni.unionByName(big)
        .select("doc_id", _hash_bucket(F.col("f"), num_buckets).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_weights(
    docs: DataFrame,
    target_pred: Column,
    num_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc DSIR importance log-weight (Xie et al. 2023 §3): hashed
    unigram+bigram features, weight = Σ_f n_f · (ln p̂_target(f) −
    ln p̂_raw(f)) with Laplace-smoothed bucket multinomials
    p̂(f) = (cnt_f + 1)/(total + B). ``target_pred`` is a boolean Column
    over ``docs`` selecting the target-domain sample; the raw
    distribution is the whole corpus (the paper's setup: raw = the big
    crawl the target sample is drawn against).

    Returns (doc_id, w) with w rounded to 6 dp. 100 TB shape: feature
    counts are map-side-combined aggregates; the log-ratio model is
    EXACTLY ``num_buckets`` rows → broadcast; per-doc weight is one
    doc-keyed sorted-fold aggregate. Nothing corpus-sized ever sits on
    one node."""
    toks = _tokens(docs, id_col, text_col)
    # doc→target flag, joined onto the hashed feature counts (doc-keyed,
    # co-partitioned with the groupBy output)
    flagged = docs.select(
        F.col(id_col).alias("doc_id"), target_pred.alias("_is_t")
    )
    # feats feeds BOTH the bucket-totals model estimate and the per-doc
    # contribution join; Catalyst does not dedupe common subtrees across
    # branches, so left lazy the whole upstream (tokenize + hash +
    # count, plus whatever plan produced ``docs``) runs twice — the main
    # driver of pipeline_quality_curation's 95-Exchange plan (VERDICT r7
    # task 3). One doc×bucket-sized materialization caps it; at cluster
    # scale this is `.checkpoint()` to durable storage, locally the
    # executor-block variant suffices.
    feats = (
        _feature_rows(toks, num_buckets)
        .join(flagged, "doc_id")
        .localCheckpoint(eager=True)
    )

    totals = feats.groupBy("bucket").agg(
        F.sum("c").alias("c_raw"),
        F.sum(F.when(F.col("_is_t"), F.col("c")).otherwise(F.lit(0))).alias("c_tgt"),
    )
    grand = totals.agg(
        F.sum("c_raw").alias("n_raw"), F.sum("c_tgt").alias("n_tgt")
    )
    b = float(num_buckets)
    ratios = (
        totals.crossJoin(grand)  # 1-row grand totals — broadcast
        .select(
            "bucket",
            (
                F.log(
                    (F.col("c_tgt") + F.lit(1)).cast("double")
                    / (F.col("n_tgt") + F.lit(b)).cast("double")
                )
                - F.log(
                    (F.col("c_raw") + F.lit(1)).cast("double")
                    / (F.col("n_raw") + F.lit(b)).cast("double")
                )
            ).alias("lr"),
        )
    )
    contrib = feats.join(F.broadcast(ratios), "bucket").select(
        "doc_id", (F.col("c").cast("double") * F.col("lr")).alias("v")
    )
    # window fold (functions/fold.py): identical sorted-order sum as the
    # collect_list fold, one Exchange+Sort+Window pass instead of the
    # sort-fallback ObjectHashAggregate (~256 contributions/doc)
    from kafka_streams_demo_spark.functions.fold import sorted_fold_sum

    return sorted_fold_sum(contrib, ["doc_id"], F.col("v"), "w", round_dp=6)


def dsir_select(
    docs: DataFrame,
    target_pred: Column,
    k: int,
    num_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k DSIR selection: rank by (w DESC, doc_id) — the doc_id
    tiebreak makes the cut deterministic across engines. The global
    top-k is a TakeOrdered (per-partition heads + driver merge of k·P
    rows), not a full sort."""
    w = dsir_weights(docs, target_pred, num_buckets, id_col, text_col)
    return w.orderBy(F.desc("w"), F.asc("doc_id")).limit(k)


def nb_model_counts(
    docs: DataFrame,
    positive_pred: Column,
    num_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """The NB model IS two count tables — ((bucket, c_pos, c_neg)
    feature counts, (d_pos, d_neg) document counts) — and counts are
    ADDITIVE, so the persisted-model maintenance story mirrors
    :func:`lm_counts`: count each ingest batch independently, union and
    re-sum (:func:`merge_nb_counts`), and index+delta ≡ retrain
    bit-for-bit (integer sums are order-free; the scoring math consumes
    only the merged totals). One map-side-combined aggregation pass per
    batch, nothing doc-sized retained."""
    toks = _tokens(docs, id_col, text_col)
    flagged = docs.select(
        F.col(id_col).alias("doc_id"), positive_pred.alias("_is_p")
    )
    feats = _feature_rows(toks, num_buckets).join(flagged, "doc_id")
    bucket_counts = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("_is_p"), F.col("c")).otherwise(F.lit(0))).alias(
            "c_pos"
        ),
        F.sum(F.when(~F.col("_is_p"), F.col("c")).otherwise(F.lit(0))).alias(
            "c_neg"
        ),
    )
    doc_counts = flagged.agg(
        F.sum(F.when(F.col("_is_p"), F.lit(1)).otherwise(F.lit(0))).alias(
            "d_pos"
        ),
        F.sum(F.when(~F.col("_is_p"), F.lit(1)).otherwise(F.lit(0))).alias(
            "d_neg"
        ),
    )
    return bucket_counts, doc_counts


def merge_nb_counts(
    parts: list[tuple[DataFrame, DataFrame]],
) -> tuple[DataFrame, DataFrame]:
    """Merge per-batch NB count tables by union + re-sum (additive —
    the same compaction a persisted count index runs on append)."""
    if not parts:
        raise ValueError("merge_nb_counts needs at least one batch")
    bc0, dc0 = parts[0]
    bc = bc0
    dc = dc0
    for b, d in parts[1:]:
        bc = bc.unionByName(b)
        dc = dc.unionByName(d)
    merged_bc = bc.groupBy("bucket").agg(
        F.sum("c_pos").alias("c_pos"), F.sum("c_neg").alias("c_neg")
    )
    merged_dc = dc.agg(
        F.sum("d_pos").alias("d_pos"), F.sum("d_neg").alias("d_neg")
    )
    return merged_bc, merged_dc


def _nb_score_with_model(
    docs: DataFrame,
    counts: tuple[DataFrame, DataFrame],
    num_buckets: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Score docs against a fitted (bucket_counts, doc_counts) model —
    the counts→llr→broadcast-join math shared by the batch and
    incremental paths; bit-identical to training in-line because every
    input to the double math is an order-free integer total.

    A scoring feature hashing to a bucket the model never saw gets the
    Laplace-smoothed unseen-bucket weight ln((n_neg+B)/(n_pos+B)) —
    the (0+1)/(n+B) estimate on both sides — via the left join +
    coalesce below, not an implicit 0 (which would mis-score genuinely
    new documents whenever n_pos ≠ n_neg)."""
    bc, dc = counts
    # bc is referenced twice (grand + llr) and Catalyst never dedupes
    # common subtrees — without this the caller's whole per-batch
    # tokenize+count lineage (e.g. the merged union in the incremental
    # tier) executes twice. At most num_buckets rows post-aggregation.
    bc = bc.localCheckpoint(eager=True)
    grand = bc.agg(F.sum("c_pos").alias("n_pos"), F.sum("c_neg").alias("n_neg"))
    b = float(num_buckets)
    llr = bc.crossJoin(grand).select(  # grand is 1 row — broadcast
        "bucket",
        (
            F.log(
                (F.col("c_pos") + F.lit(1)).cast("double")
                / (F.col("n_pos") + F.lit(b)).cast("double")
            )
            - F.log(
                (F.col("c_neg") + F.lit(1)).cast("double")
                / (F.col("n_neg") + F.lit(b)).cast("double")
            )
        ).alias("_llr"),
    )
    unseen = grand.select(
        (
            F.log((F.col("n_neg") + F.lit(b)).cast("double"))
            - F.log((F.col("n_pos") + F.lit(b)).cast("double"))
        ).alias("_dllr")
    )
    feats = _feature_rows(_tokens(docs, id_col, text_col), num_buckets)
    contrib = (
        feats.join(F.broadcast(llr), "bucket", "left")
        .crossJoin(F.broadcast(unseen))  # 1-row default — broadcast
        .select(
            "doc_id",
            (
                F.col("c").cast("double")
                * F.coalesce(F.col("_llr"), F.col("_dllr"))
            ).alias("v"),
        )
    )
    sums = contrib.groupBy("doc_id").agg(_sorted_sum(F.col("v")).alias("_s"))
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(sums, "doc_id", "left")
        .crossJoin(dc)  # 1-row prior — broadcast
        .select(
            "doc_id",
            F.round(
                F.log(
                    F.col("d_pos").cast("double") / F.col("d_neg").cast("double")
                )
                + F.coalesce(F.col("_s"), F.lit(0.0)),
                6,
            ).alias("score"),
        )
    )


def nb_quality_scores(
    docs: DataFrame,
    positive_pred: Column | None = None,
    num_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    counts: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Multinomial Naive-Bayes quality classifier — the GPT-3-style
    document-quality model (Brown et al. 2020 Appendix A trains a
    linear classifier on hashed features with a curated positive class
    vs a crawl negative class; multinomial NB is the closed-form member
    of that family, trainable in ONE aggregation pass with no iterative
    optimizer). ``positive_pred`` is a boolean Column over ``docs``
    labeling the high-quality seed; everything else is the negative
    class.

    Returns (doc_id, score) where score is the 6-dp-rounded log-odds

        ln(d_pos/d_neg) + Σ_f n_f · (ln p̂_pos(f) − ln p̂_neg(f))

    over hashed unigram+bigram features with Laplace-smoothed bucket
    multinomials p̂(f) = (cnt_f + 1)/(total + B).

    100 TB shape (same skeleton as :func:`dsir_weights`): the "training
    pass" is a map-side-combined groupBy over (doc, bucket) feature
    counts; the fitted model is EXACTLY ``num_buckets`` rows → broadcast
    to the scoring join; the class prior is a 1-row frame riding a
    crossJoin. Per-doc sums fold in sorted order (cross-engine float
    contract), so the score hashes identically on DuckDB.

    With ``counts`` (a fitted (bucket_counts, doc_counts) model from
    :func:`nb_model_counts` / :func:`merge_nb_counts`) the training
    pass is skipped and docs are scored against the persisted model —
    index+delta ≡ retrain bit-for-bit since every double is derived
    from order-free integer totals (``positive_pred`` is then unused)."""
    if counts is not None:
        return _nb_score_with_model(docs, counts, num_buckets, id_col, text_col)
    if positive_pred is None:
        raise ValueError("nb_quality_scores needs positive_pred or counts")
    toks = _tokens(docs, id_col, text_col)
    flagged = docs.select(
        F.col(id_col).alias("doc_id"), positive_pred.alias("_is_p")
    )
    # one doc×bucket materialization: feats feeds the model estimate AND
    # the scoring join (Catalyst won't dedupe the common subtree — the
    # dsir_weights lesson, VERDICT r7 task 3)
    feats = (
        _feature_rows(toks, num_buckets)
        .join(flagged, "doc_id")
        .localCheckpoint(eager=True)
    )
    totals = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("_is_p"), F.col("c")).otherwise(F.lit(0))).alias(
            "c_pos"
        ),
        F.sum(F.when(~F.col("_is_p"), F.col("c")).otherwise(F.lit(0))).alias(
            "c_neg"
        ),
    )
    grand = totals.agg(
        F.sum("c_pos").alias("n_pos"), F.sum("c_neg").alias("n_neg")
    )
    prior = flagged.agg(
        F.sum(F.when(F.col("_is_p"), F.lit(1)).otherwise(F.lit(0))).alias(
            "d_pos"
        ),
        F.sum(F.when(~F.col("_is_p"), F.lit(1)).otherwise(F.lit(0))).alias(
            "d_neg"
        ),
    )
    b = float(num_buckets)
    llr = totals.crossJoin(grand).select(  # grand is 1 row — broadcast
        "bucket",
        (
            F.log(
                (F.col("c_pos") + F.lit(1)).cast("double")
                / (F.col("n_pos") + F.lit(b)).cast("double")
            )
            - F.log(
                (F.col("c_neg") + F.lit(1)).cast("double")
                / (F.col("n_neg") + F.lit(b)).cast("double")
            )
        ).alias("_llr"),
    )
    contrib = feats.join(F.broadcast(llr), "bucket").select(
        "doc_id", (F.col("c").cast("double") * F.col("_llr")).alias("v")
    )
    sums = contrib.groupBy("doc_id").agg(_sorted_sum(F.col("v")).alias("_s"))
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(sums, "doc_id", "left")
        .crossJoin(prior)  # 1-row prior — broadcast
        .select(
            "doc_id",
            F.round(
                F.log(
                    F.col("d_pos").cast("double") / F.col("d_neg").cast("double")
                )
                + F.coalesce(F.col("_s"), F.lit(0.0)),
                6,
            ).alias("score"),
        )
    )


def pareto_quality_filter(
    scored: DataFrame,
    alpha: float = 9.0,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """GPT-3's stochastic quality keep rule, replayed deterministically
    (Brown et al. 2020 Appendix A: a document is kept iff
    ``np.random.pareto(alpha) > 1 − classifier_score`` — low-scoring
    docs still get in with small probability, which preserves tail
    diversity that a hard threshold destroys). The Pareto draw is
    derandomized by inverse-CDF over a DOC-ID hash: u = (md5-60-bit of
    the doc id + 0.5)/2^60 ∈ (0,1), pareto = (1−u)^(−1/α) − 1 — stable
    across runs, engines, and partitionings, unlike ``rand()``. Keying
    on the id (not content) is the intended contract: a given doc's
    admission draw is fixed forever, so re-scoring a corpus version
    with edited text redraws nothing — keep-bit churn tracks score
    changes only, never the derandomizer.

    Input: (doc_id, score) log-odds from :func:`nb_quality_scores`.
    Output: (doc_id, score, prob, pareto, keep) with prob = σ(score)
    and pareto both rounded to 6 dp BEFORE the comparison, so the keep
    bit is a function of already-rounded (engine-stable) doubles.
    Embarrassingly parallel: one projection, no shuffle."""
    two60 = float(1 << 60)
    u = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(two60)
    prob = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col(score_col))), 6
    ).alias("prob")
    pareto = F.round(
        F.pow(F.lit(1.0) - u, F.lit(-(1.0 / alpha))) - F.lit(1.0), 6
    ).alias("pareto")
    out = scored.select(F.col(id_col), F.col(score_col), prob, pareto)
    return out.withColumn(
        "keep",
        (F.col("pareto") > F.lit(1.0) - F.col("prob")).cast("int"),
    )
