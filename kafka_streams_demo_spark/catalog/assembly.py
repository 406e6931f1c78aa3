"""Training-data assembly: packing / mixture / sampling / lakehouse layout.

Split from the single-module catalog in round 10 (VERDICT r9 task 7) —
entries and oracles are byte-identical to their pre-split form; the
registry lives in ``catalog._core`` and the driver contract in
``catalog/__init__.py``. Registration order is preserved by the
``__init__`` import sequence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from kafka_streams_demo_spark.catalog._core import (  # noqa: F401
    ORACLES,
    QUERIES,
    _events_stream,
    cents,
    register,
)
from kafka_streams_demo_spark.operators.kstream import KStream  # noqa: F401
# cross-family oracle composition: the persisted-postings BM25 entry
# re-uses the multi-query BM25 oracle defined with its siblings
from kafka_streams_demo_spark.catalog.temporal import (  # noqa: F401
    _BM25_MULTI_ORACLE,
)
from kafka_streams_demo_spark.operators.ktable import KTable  # noqa: F401
from kafka_streams_demo_spark.operators.windows import (  # noqa: F401
    JoinWindows,
    SessionWindows,
    TimeWindows,
)
from kafka_streams_demo_spark.sources.registry import load_table  # noqa: F401

# ---------------------------------------------------------------------------
# Training-data assembly: chunking / sequence packing / mixture sampling
# ---------------------------------------------------------------------------

@register(
    "doc_chunk_overlap",
    "WITH t AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w FROM documents), "
    "s AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w)-8, 1), 24)) AS st FROM t) "
    "SELECT doc_id, CAST((st-1)//24 AS BIGINT) AS chunk_id, CAST(st AS BIGINT) AS start_tok, "
    "CAST(least(32, len(w)-st+1) AS BIGINT) AS n_tokens, "
    "md5(array_to_string(w[st:st+31], ' ')) AS chunk_md5 FROM s",
)
def doc_chunk_overlap(spark, sf_dir):
    """Context-window prep: 32-token chunks advancing 24 (8-token overlap).
    Tokenize → sequence(starts) → explode → slice: a narrow map stage —
    chunking never shuffles at any corpus size."""
    from kafka_streams_demo_spark.functions.packing import chunk_documents

    return chunk_documents(
        load_table(spark, "documents", sf_dir), chunk_size=32, overlap=8
    )


@register(
    "pack_sequences",
    """
    WITH RECURSIVE d AS (
      SELECT source AS grp, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents),
    r AS (
      SELECT grp, doc_id, n_tokens, rn, n_tokens AS fill, 0 AS bin FROM d WHERE rn = 1
      UNION ALL
      SELECT d.grp, d.doc_id, d.n_tokens, d.rn,
             CASE WHEN r.fill + d.n_tokens <= 256 THEN r.fill + d.n_tokens ELSE d.n_tokens END,
             CASE WHEN r.fill + d.n_tokens <= 256 THEN r.bin ELSE r.bin + 1 END
      FROM d JOIN r ON d.grp = r.grp AND d.rn = r.rn + 1)
    SELECT grp, doc_id, n_tokens, CAST(bin AS BIGINT) AS bin_id FROM r
    """,
)
def pack_sequences_q(spark, sf_dir):
    """Greedy first-fit-in-order sequence packing into 256-token bins per
    source — the applyInPandas sequential-scan family (one shuffle on the
    group key, groups pack in parallel). The oracle keeps the recursive-CTE
    form, so the gate checks the per-group fold itself."""
    from kafka_streams_demo_spark.functions.packing import pack_sequences

    return pack_sequences(load_table(spark, "documents", sf_dir), capacity=256)


@register(
    "pack_sequences_strid",
    """
    WITH RECURSIVE d AS (
      SELECT source AS grp, printf('d%09d', doc_id) AS doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             row_number() OVER (PARTITION BY source ORDER BY printf('d%09d', doc_id)) AS rn
      FROM documents),
    r AS (
      SELECT grp, doc_id, n_tokens, rn, n_tokens AS fill, 0 AS bin FROM d WHERE rn = 1
      UNION ALL
      SELECT d.grp, d.doc_id, d.n_tokens, d.rn,
             CASE WHEN r.fill + d.n_tokens <= 256 THEN r.fill + d.n_tokens ELSE d.n_tokens END,
             CASE WHEN r.fill + d.n_tokens <= 256 THEN r.bin ELSE r.bin + 1 END
      FROM d JOIN r ON d.grp = r.grp AND d.rn = r.rn + 1)
    SELECT grp, doc_id, n_tokens, CAST(bin AS BIGINT) AS bin_id FROM r
    """,
)
def pack_sequences_strid_q(spark, sf_dir):
    """pack_sequences over STRING doc ids (VERDICT r4 #5): non-numeric ids
    auto-shard on xxhash64 instead of demanding tokens_per_shard=None.
    Zero-padded ids keep string order == numeric order, so the recursive-
    CTE oracle replays the same greedy fold; at this scale the group fits
    one shard, making hash- and range-sharding provably identical."""
    from kafka_streams_demo_spark.functions.packing import pack_sequences

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "doc_id", F.format_string("d%09d", F.col("doc_id"))
    )
    return pack_sequences(docs, capacity=256)


@register(
    "temperature_mixture",
    "WITH c AS (SELECT lang, COUNT(*)::DOUBLE AS cnt FROM documents GROUP BY 1), "
    "m AS (SELECT MIN(cnt) AS cmin FROM c), "
    "r AS (SELECT lang, CAST(GREATEST(1, LEAST(256, ROUND(256 * POWER(cmin / cnt, 0.5)))) AS INT) AS t FROM c, m) "
    "SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang) "
    "WHERE substring(md5(d.text), 1, 2) < "
    "CASE WHEN t >= 256 THEN 'zz' ELSE printf('%02x', t) END",
)
def temperature_mixture_q(spark, sf_dir):
    """Temperature-based corpus mixing (functions/packing.py:
    temperature_mixture, alpha=0.5): each LANGUAGE downsampled to
    (c_min/c_i)^0.5 — the multilingual-LM recipe that flattens language
    imbalance (the fixture's langs are skewed ~3:1, so this actually
    drops rows, unlike the evenly-sized sources) — with the deterministic
    content-hash keep rule, all math in the plan (tiny counts aggregate
    broadcast back, no RNG, no collect). The oracle replays the identical
    arithmetic in SQL."""
    from kafka_streams_demo_spark.functions.packing import temperature_mixture

    docs = load_table(spark, "documents", sf_dir)
    return temperature_mixture(docs, alpha=0.5, group_col="lang").select(
        "doc_id", "lang"
    )


@register(
    "mixture_sample",
    "SELECT doc_id, source FROM documents WHERE substring(md5(text), 1, 2) < "
    "CASE WHEN source = 'src0' THEN 'zz' WHEN source = 'src1' THEN '80' "
    "WHEN source = 'src2' THEN '40' ELSE '20' END",
)
def mixture_sample_q(spark, sf_dir):
    """Deterministic corpus-mixture sampling: per-source keep rates decided
    by a content-hash threshold (src0 1.0, src1 0.5, src2 0.25, rest
    0.125) — reproducible across engines and partitionings, unlike
    rand()/sampleBy. A narrow filter: the mixture definition IS the scan
    predicate."""
    from kafka_streams_demo_spark.functions.packing import mixture_sample

    docs = load_table(spark, "documents", sf_dir)
    return mixture_sample(
        docs, {"src0": 1.0, "src1": 0.5, "src2": 0.25}, default_weight=0.125
    ).select("doc_id", "source")


@register(
    "band_join_error_purchase",
    """
    SELECT a.event_id AS err_id, b.event_id AS purch_id,
           CAST(epoch_us(a.ts) - epoch_us(b.ts) AS BIGINT) AS delta_us
    FROM events a JOIN events b
      ON abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 60000000
    WHERE a.event_type = 'error' AND b.event_type = 'purchase'
    """,
)
def band_join_error_purchase_q(spark, sf_dir):
    """UNKEYED band join (functions/rangejoin.py:band_join): every
    (error, purchase) event pair within ±60 s across ALL users — the
    incident-correlation query with no equality key, which OSS Catalyst
    plans as BroadcastNestedLoopJoin, O(|A|·|B|) (range-join rewrites
    are a Databricks-runtime extra). Bucketed expansion instead: keys
    quantized into width-60s buckets with exact integer DIV, purchase
    side expanded to bucket ±1, hash equi-join on the bucket, exact band
    filter — no false negatives (width-t buckets of values ≤ t apart
    differ by ≤ 1), each pair produced exactly once (one expansion row
    matches), linear cost, AQE-skew-safe. The oracle is the plain theta
    join, so the hash gate proves the bucketed rewrite exact."""
    from kafka_streams_demo_spark.functions.rangejoin import band_join

    ev = load_table(spark, "events", sf_dir)
    err = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.unix_micros("ts").alias("err_us")
    )
    pur = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purch_id"), F.unix_micros("ts").alias("purch_us")
    )
    return band_join(
        err, pur, F.col("err_us"), F.col("purch_us"), 60_000_000
    ).select(
        "err_id", "purch_id",
        (F.col("err_us") - F.col("purch_us")).alias("delta_us"),
    )


@register(
    "pipeline_quality_curation",
    """
    WITH toks AS (SELECT doc_id, string_split(lower(coalesce(text, '')), ' ') AS ts
                  FROM documents),
    tr AS (SELECT * FROM toks WHERE doc_id % 5 <> 0),
    tbig AS (SELECT ts[i] AS w1, ts[i+1] AS w2
             FROM tr, UNNEST(range(1, len(ts))) AS g(i) WHERE len(ts) >= 2),
    cbm AS (SELECT w1, w2, count(*) AS cb FROM tbig GROUP BY 1, 2),
    tuni AS (SELECT unnest(ts) AS w FROM tr),
    cum AS (SELECT w, count(*) AS cu FROM tuni GROUP BY 1),
    nt AS (SELECT CAST(count(*) AS DOUBLE) AS n_tok FROM tuni),
    sbig AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
             FROM toks, UNNEST(range(1, len(ts))) AS g(i) WHERE len(ts) >= 2),
    db AS (SELECT doc_id, w1, w2, count(*) AS c FROM sbig GROUP BY 1, 2, 3),
    contrib AS (SELECT db.doc_id, db.c,
        CAST(db.c AS DOUBLE) * log10(
          CASE WHEN cbm.cb IS NOT NULL
               THEN CAST(cbm.cb AS DOUBLE) / CAST(cu1.cu AS DOUBLE)
               ELSE 0.4 * CAST(coalesce(cu2.cu, 1) AS DOUBLE) / nt.n_tok END) AS v
      FROM db LEFT JOIN cbm USING (w1, w2)
      LEFT JOIN cum cu1 ON db.w1 = cu1.w
      LEFT JOIN cum cu2 ON db.w2 = cu2.w
      CROSS JOIN nt),
    sc AS (SELECT doc_id,
                  ROUND(-list_sum(list_sort(list(v))) / CAST(SUM(c) AS DOUBLE), 6) AS nll
           FROM contrib GROUP BY 1),
    surv AS (SELECT d.doc_id, d.source, sc.nll
             FROM documents d JOIN sc USING (doc_id)
             WHERE sc.nll < 1.4861),
    stoks AS (SELECT t.doc_id, t.ts FROM toks t JOIN surv USING (doc_id)),
    uni AS (SELECT doc_id, unnest(ts) AS f FROM stoks),
    big AS (SELECT doc_id, ts[i] || '_' || ts[i+1] AS f
            FROM stoks, UNNEST(range(1, len(ts))) AS g(i) WHERE len(ts) >= 2),
    allf AS (SELECT doc_id, ('0x' || substr(md5(f), 1, 15))::BIGINT % 256 AS bucket
             FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)),
    feats AS (SELECT doc_id, bucket, count(*) AS c FROM allf GROUP BY 1, 2),
    flg AS (SELECT doc_id, source = 'src0' AS is_t FROM surv),
    tot AS (SELECT bucket, SUM(c) AS c_raw,
                   SUM(CASE WHEN is_t THEN c ELSE 0 END) AS c_tgt
            FROM feats JOIN flg USING (doc_id) GROUP BY 1),
    gr AS (SELECT SUM(c_raw) AS n_raw, SUM(c_tgt) AS n_tgt FROM tot),
    lr AS (SELECT bucket,
                  ln(CAST(c_tgt + 1 AS DOUBLE) / CAST(n_tgt + 256 AS DOUBLE))
                - ln(CAST(c_raw + 1 AS DOUBLE) / CAST(n_raw + 256 AS DOUBLE)) AS lr
           FROM tot CROSS JOIN gr),
    dcontrib AS (SELECT doc_id, CAST(c AS DOUBLE) * lr AS v
                 FROM feats JOIN lr USING (bucket)),
    wts AS (SELECT doc_id, ROUND(list_sum(list_sort(list(v))), 6) AS w
            FROM dcontrib GROUP BY 1),
    ranked AS (SELECT s.doc_id, s.source, s.nll, wts.w,
                      row_number() OVER (PARTITION BY s.source
                                         ORDER BY wts.w DESC, s.doc_id) AS rn
               FROM surv s JOIN wts USING (doc_id))
    SELECT doc_id, source, nll, w, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 10
    """,
)
def pipeline_quality_curation_q(spark, sf_dir):
    """The QUALITY-CURATION pipeline composing this round's stages into
    one lazy plan — the CCNet→DSIR→cap recipe a pretraining data team
    actually runs: (1) Stupid-Backoff LM perplexity scores every doc
    (train split doc_id%5≠0), dropping the 'tail' bucket (fixed CCNet
    cutoff); (2) DSIR importance weights computed OVER THE SURVIVORS
    (both multinomials re-estimated post-filter — the stages genuinely
    feed each other, target = src0); (3) per-domain cap keeps the top-10
    docs per source by (w DESC, doc_id) through the hot-key-parallel
    salted top-k. Output (doc_id, source, nll, w, rn). Each stage is an
    already-oracled op (ccnet_perplexity / dsir_select /
    domain_cap_sample); the full recursive oracle replays the chain so
    the hash gate proves the COMPOSITION, not just the parts. Scale: LM
    joins are term-keyed, the DSIR model is B broadcast rows, the cap
    never funnels a megadomain into one task."""
    from kafka_streams_demo_spark.functions.lm import (
        ccnet_bucket,
        dsir_weights,
        ngram_lm_score,
    )
    from kafka_streams_demo_spark.functions.skew import salted_topk_per_key

    docs = load_table(spark, "documents", sf_dir)
    # Stage boundaries are CHECKPOINTED: Catalyst does not dedupe common
    # subtrees across branches, so the lazy composition re-ran the whole
    # LM-scoring plan inside every branch of the DSIR stage and again in
    # the final rank join — 95 Exchanges, the catalog outlier (VERDICT
    # r7 task 3). `scored` is doc-count-sized (no text), `surv` is the
    # curated split the later stages genuinely share; at cluster scale
    # these become `.checkpoint()`/table writes between stages — exactly
    # how a production curation run stages its intermediates.
    scored = ccnet_bucket(
        ngram_lm_score(docs, train_pred=F.col("doc_id") % 5 != 0),
        cutoffs=(1.4722, 1.4861),
    ).localCheckpoint(eager=True)
    surv = docs.join(
        scored.where(F.col("bucket") != "tail").select("doc_id", "nll"), "doc_id"
    ).localCheckpoint(eager=True)
    wts = dsir_weights(surv, F.col("source") == "src0")
    ranked = surv.select("doc_id", "source", "nll").join(wts, "doc_id")
    return salted_topk_per_key(
        ranked, "source", [F.desc("w"), "doc_id"], k=10, salt_cols=["doc_id"]
    ).select("doc_id", "source", "nll", "w", F.col("rn").cast("long").alias("rn"))


@register(
    "domain_cap_sample",
    """
    WITH r AS (SELECT doc_id, source,
                      row_number() OVER (PARTITION BY source
                                         ORDER BY md5(text), doc_id) AS rn
               FROM documents)
    SELECT doc_id, source, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 15
    """,
)
def domain_cap_sample_q(spark, sf_dir):
    """Per-domain contribution caps (RefinedWeb, Penedo et al. 2023 —
    bound any one domain's share of the training mix): keep ≤ 15 docs
    per source (the sf0.01 fixture holds 25/source, so the cap BINDS), elected by deterministic content-hash order (md5(text),
    doc_id tiebreak — reproducible across engines/partitionings, no
    RNG). Runs through salted_topk_per_key (functions/skew.py): rank
    within (source, salt) first so a megadomain spreads over 16 tasks,
    then re-rank the ≤ k·16 survivors — the oracle's plain one-window
    formulation proves the hot-key-parallel plan bit-equal (the
    same-oracle pattern)."""
    from kafka_streams_demo_spark.functions.skew import salted_topk_per_key

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "source", F.md5("text").alias("_h")
    )
    return salted_topk_per_key(
        docs, "source", ["_h", "doc_id"], k=15
    ).select("doc_id", "source", F.col("rn").cast("long").alias("rn"))


@register(
    "token_drift_kl",
    """
    WITH ta AS (SELECT unnest(string_split(lower(coalesce(text, '')), ' ')) AS token
                FROM documents WHERE source = 'src0'),
    tb AS (SELECT unnest(string_split(lower(coalesce(text, '')), ' ')) AS token
           FROM documents WHERE source = 'src1'),
    ca AS (SELECT token, count(*) AS c_a FROM ta GROUP BY 1),
    cb AS (SELECT token, count(*) AS c_b FROM tb GROUP BY 1),
    j AS (SELECT coalesce(ca.token, cb.token) AS token,
                 coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b
          FROM ca FULL OUTER JOIN cb USING (token)),
    s AS (SELECT SUM(c_a) AS n_a, SUM(c_b) AS n_b, COUNT(*) AS v FROM j),
    t AS (SELECT token, c_a, c_b,
                 ROUND((CAST(c_a + 1 AS DOUBLE) / CAST(n_a + v AS DOUBLE))
                       * ln((CAST(c_a + 1 AS DOUBLE) / CAST(n_a + v AS DOUBLE))
                            / (CAST(c_b + 1 AS DOUBLE) / CAST(n_b + v AS DOUBLE))),
                       6) AS kl_term
          FROM j CROSS JOIN s)
    SELECT token, CAST(c_a AS BIGINT) AS c_a, CAST(c_b AS BIGINT) AS c_b, kl_term
    FROM t ORDER BY kl_term DESC, token LIMIT 20
    """,
)
def token_drift_kl_q(spark, sf_dir):
    """Corpus drift monitoring (functions/text.py:token_drift_kl): top-20
    per-token contributions to KL(src0 ‖ src1) between the two sources'
    Laplace-smoothed unigram distributions — the tokens newly
    over-represented in one snapshot, the first signal when an ingest
    source goes bad. Two map-side-combined counts, one term-keyed
    full-outer join, vocab-bounded totals broadcast back, TakeOrdered
    top-k: nothing corpus-sized moves."""
    from kafka_streams_demo_spark.functions.text import token_drift_kl

    docs = load_table(spark, "documents", sf_dir)
    return token_drift_kl(
        docs.where(F.col("source") == "src0"),
        docs.where(F.col("source") == "src1"),
        k=20,
    )


_SUBSTRING_ORACLE = """
WITH d AS (SELECT doc_id, lower(text) AS s FROM documents),
pos AS (SELECT doc_id, i AS start
        FROM d, UNNEST(range(0, length(s) - 10 + 1)) AS g(i)
        WHERE substr(s, i + 1, 10) = 'table scan')
SELECT doc_id, CAST(start AS BIGINT) AS start FROM pos
"""


@register("substring_search_index", _SUBSTRING_ORACLE)
def substring_search_index_q(spark, sf_dir):
    """Exact substring search over a positional char-4-gram inverted
    index (functions/text.py:char_gram_index + substring_find) — every
    occurrence of 'table scan', found WITHOUT scanning document text at
    query time (the code-search primitive). Stride-offset query grams
    cover every query character, so the count-equality groupBy — the
    only shuffle, keyed (doc, start) — yields occurrences with zero
    false positives by construction; no verify pass. The oracle is an
    INDEPENDENT formulation (brute-force position scan with substr
    equality), so the hash gate cross-proves the index algebra, not a
    replay of it. Index rows persist bucketed by gram and compose by
    append like the other index tiers."""
    from kafka_streams_demo_spark.functions.text import substring_find

    return substring_find(
        load_table(spark, "documents", sf_dir), "table scan", n=4
    )


@register("substring_search_incremental", _SUBSTRING_ORACLE)
def substring_search_incremental_q(spark, sf_dir):
    """Incremental maintenance of the positional gram index: base
    (doc_id%5≠0) and delta (doc_id%5=0) indexed separately and composed
    by UNION — gram rows are row-local and deterministic per doc, so
    append IS maintenance, same contract as the BM25/minhash/LM tiers.
    SAME oracle as substring_search_index: the hash gate proves
    index+delta ≡ one-shot full-corpus indexing bit-for-bit."""
    from kafka_streams_demo_spark.functions.text import (
        char_gram_index,
        substring_find,
    )

    docs = load_table(spark, "documents", sf_dir)
    idx = char_gram_index(docs.where(F.col("doc_id") % 5 != 0), n=4).unionByName(
        char_gram_index(docs.where(F.col("doc_id") % 5 == 0), n=4)
    )
    return substring_find(None, "table scan", n=4, index=idx)


@register("substring_search_rarest", _SUBSTRING_ORACLE)
def substring_search_rarest_q(spark, sf_dir):
    """The hot-gram production mode of substring_find: candidates from
    only the 2 RAREST stride grams (df from the index itself — the
    selective-trigram trick real code search uses to bound join traffic
    under Zipf gram skew), then a row-local substr-equality verify
    eliminates the false positives coverage no longer excludes. SAME
    oracle as substring_search_index — the driver hash gate proves
    rare-gram+verify ≡ full-stride bit-for-bit."""
    from kafka_streams_demo_spark.functions.text import substring_find

    return substring_find(
        load_table(spark, "documents", sf_dir), "table scan", n=4, rarest_k=2
    )


def _zorder_oracle() -> str:
    from kafka_streams_demo_spark.functions.layout import (
        bucket_expr,
        zorder_oracle_terms,
    )

    return f"""
    WITH v AS (SELECT o_orderkey, o_custkey AS v0,
                      CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS v1
               FROM orders),
    s AS (SELECT min(v0) AS mn0, max(v0) AS mx0,
                 min(v1) AS mn1, max(v1) AS mx1 FROM v),
    b AS (SELECT o_orderkey,
            {bucket_expr("v0", "mn0", "mx0", 256, div="//")} AS b0,
            {bucket_expr("v1", "mn1", "mx1", 256, div="//")} AS b1
          FROM v CROSS JOIN s),
    z AS (SELECT o_orderkey,
                 CAST({zorder_oracle_terms(2, 8)} AS BIGINT) AS zval
          FROM b)
    SELECT o_orderkey, zval, CAST(zval // 1024 AS BIGINT) AS file_id FROM z
    """


def _hilbert_oracle(bits: int = 8) -> str:
    """CTE chain generated from the SAME engine-neutral stage strings
    the Spark plan unrolls (layout.hilbert_stage_exprs) — lockstep by
    construction. Per-level suffixed column names keep every reference
    unambiguous (no reliance on either engine's lateral-alias rules)."""
    from kafka_streams_demo_spark.functions.layout import (
        bucket_expr,
        hilbert_stage_exprs,
    )

    px, py, pd = "x", "y", "d"
    prev = "b"
    ctes = []
    for idx, lvl in enumerate(reversed(range(bits))):
        dn, xn, yn = hilbert_stage_exprs(1 << lvl, x=px, y=py, d=pd)
        nx, ny, ndd = f"x{idx}", f"y{idx}", f"d{idx}"
        ctes.append(
            f"h{idx} AS (SELECT o_orderkey, {xn} AS {nx}, {yn} AS {ny},"
            f" {dn} AS {ndd} FROM {prev})"
        )
        px, py, pd, prev = nx, ny, ndd, f"h{idx}"
    chain = ",\n    ".join(ctes)
    return f"""
    WITH v AS (SELECT o_orderkey, o_custkey AS v0,
                      CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS v1
               FROM orders),
    s AS (SELECT min(v0) AS mn0, max(v0) AS mx0,
                 min(v1) AS mn1, max(v1) AS mx1 FROM v),
    b AS (SELECT o_orderkey,
            CAST({bucket_expr("v0", "mn0", "mx0", 256, div="//")} AS BIGINT) AS x,
            CAST({bucket_expr("v1", "mn1", "mx1", 256, div="//")} AS BIGINT) AS y,
            CAST(0 AS BIGINT) AS d
          FROM v CROSS JOIN s),
    {chain}
    SELECT o_orderkey, CAST({pd} AS BIGINT) AS hval,
           CAST({pd} // 1024 AS BIGINT) AS file_id FROM {prev}
    """


@register("hilbert_layout", _hilbert_oracle())
def hilbert_layout_q(spark, sf_dir):
    """Hilbert-curve clustering keys over the SAME orders(o_custkey,
    o_orderdate) grid as zorder_layout (functions/layout.py:
    hilbert_key — the layout Iceberg offers beside Z-order): identical
    exact-integer range buckets, then the xy2d recurrence unrolled into
    8 chained CASE/arith projections instead of Morton's interleave
    sum. Consecutive ranks are ADJACENT grid cells (no diagonal jumps),
    so equal-size files cut from the sort have tighter per-dimension
    bounding boxes — superiority over zorder on the same grid is
    property-pinned in tests/test_layout.py. The oracle's CTE chain is
    GENERATED from the same stage strings the Spark plan unrolls."""
    from kafka_streams_demo_spark.functions.layout import hilbert_key

    orders = load_table(spark, "orders", sf_dir)
    return hilbert_key(
        orders,
        [F.col("o_custkey"), F.unix_date(F.col("o_orderdate").cast("date")).cast("long")],
        bits=8,
        num_files=64,
    ).select("o_orderkey", "hval", "file_id")


@register("zorder_layout", _zorder_oracle())
def zorder_layout_q(spark, sf_dir):
    """Z-order (Morton) clustering keys over orders(o_custkey,
    o_orderdate) — functions/layout.py:zorder_key, the math behind
    Delta/Iceberg OPTIMIZE ZORDER: 8-bit range buckets from a broadcast
    one-row min/max aggregate (exact integer DIV — never long/long
    double division), unrolled bit interleave, file_id = top 6 bits
    (64 files ≡ the 8×8 grid cell). Sorting by this ONE key co-locates
    rows close in BOTH dimensions, so parquet min/max stats prune
    two-dimensional predicates; the bounded per-file bounding-box
    property is pinned in tests/test_layout.py. The oracle replays the
    identical bucket + interleave arithmetic (zorder_oracle_terms keeps
    the two unrolls side by side)."""
    from kafka_streams_demo_spark.functions.layout import zorder_key

    orders = load_table(spark, "orders", sf_dir)
    return zorder_key(
        orders,
        [F.col("o_custkey"), F.unix_date(F.col("o_orderdate").cast("date")).cast("long")],
        bits=8,
        num_files=64,
    ).select("o_orderkey", "zval", "file_id")


def _hilbert_nd_oracle(nd: int = 3, bits: int = 4) -> str:
    """CTE chain generated from the SAME engine-neutral Skilling stage
    strings the Spark plan unrolls (layout.hilbert_nd_stages) — lockstep
    by construction, like the 2-D _hilbert_oracle. XOR is already
    rendered as a+b−2·(a&b) in the generator (DuckDB's ^ is POWER), so
    the only per-stage work here is suffixing the state column names
    (the repo rule: never rely on either engine's lateral-alias
    precedence)."""
    import re

    from kafka_streams_demo_spark.functions.layout import (
        bucket_expr,
        hilbert_nd_stages,
    )

    state = [f"_x{i}" for i in range(nd)] + ["_t"]
    cur = {c: c for c in state}
    pat = re.compile("|".join(sorted(map(re.escape, state), key=len, reverse=True)))
    ctes, prev = [], "b"
    for k, stage in enumerate(hilbert_nd_stages(nd, bits)):
        cols = []
        nxt = {}
        for c in state:
            name = f"{c}_{k}"
            if c in stage:
                expr = pat.sub(lambda m: cur[m.group(0)], stage[c])
                cols.append(f"{expr} AS {name}")
            else:
                cols.append(f"{cur[c]} AS {name}")
            nxt[c] = name
        ctes.append(f"h{k} AS (SELECT o_orderkey, {', '.join(cols)} FROM {prev})")
        cur, prev = nxt, f"h{k}"
    interleave = " + ".join(
        f"((({cur[f'_x{i}']} >> {q}) & 1) << {q * nd + (nd - 1 - i)})"
        for q in range(bits)
        for i in range(nd)
    )
    chain = ",\n    ".join(ctes)
    shift = nd * bits - (64).bit_length() + 1  # num_files=64
    return f"""
    WITH v AS (SELECT o_orderkey, o_custkey AS v0,
                      CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS v1,
                      CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS v2
               FROM orders),
    s AS (SELECT min(v0) AS mn0, max(v0) AS mx0,
                 min(v1) AS mn1, max(v1) AS mx1,
                 min(v2) AS mn2, max(v2) AS mx2 FROM v),
    b AS (SELECT o_orderkey,
            CAST({bucket_expr("v0", "mn0", "mx0", 1 << bits, div="//")} AS BIGINT) AS _x0,
            CAST({bucket_expr("v1", "mn1", "mx1", 1 << bits, div="//")} AS BIGINT) AS _x1,
            CAST({bucket_expr("v2", "mn2", "mx2", 1 << bits, div="//")} AS BIGINT) AS _x2,
            CAST(0 AS BIGINT) AS _t
          FROM v CROSS JOIN s),
    {chain}
    SELECT o_orderkey, CAST({interleave} AS BIGINT) AS hval,
           CAST(({interleave}) // {1 << shift} AS BIGINT) AS file_id FROM {prev}
    """


@register("hilbert_nd_layout", _hilbert_nd_oracle())
def hilbert_nd_layout_q(spark, sf_dir):
    """3-DIMENSIONAL Hilbert clustering keys over orders(o_custkey,
    o_orderdate, floor(o_totalprice·100)) — functions/layout.py:
    hilbert_key_nd, the Skilling-transpose generalization closing the
    2-D hilbert_key's dimensionality limit (real layout tooling offers
    multi-dim Hilbert beside Z-order). The oracle's CTE chain is
    GENERATED from the same engine-neutral stage strings the Spark plan
    unrolls, so the ~bits·nd-stage transpose is hash-gated cross-engine
    end-to-end; the Python-reference grid equality and the Manhattan-1
    adjacency property live in tests/test_layout.py."""
    from kafka_streams_demo_spark.functions.layout import hilbert_key_nd

    orders = load_table(spark, "orders", sf_dir)
    return hilbert_key_nd(
        orders,
        [
            F.col("o_custkey"),
            F.unix_date(F.col("o_orderdate").cast("date")).cast("long"),
            F.floor(F.col("o_totalprice") * 100).cast("long"),
        ],
        bits=4,
        num_files=64,
    ).select("o_orderkey", "hval", "file_id")


@register(
    "compaction_plan",
    """
    WITH f AS (
      SELECT event_type AS part, CAST(ts AS DATE) AS file_day,
             COUNT(*) AS bytes
      FROM events GROUP BY 1, 2),
    c AS (
      SELECT part, file_day, bytes,
             COALESCE(SUM(bytes) OVER (PARTITION BY part ORDER BY file_day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      FROM f),
    g AS (SELECT part, file_day, bytes, cum // 300 AS grp FROM c)
    SELECT part, file_day, CAST(bytes AS BIGINT) AS bytes,
           CAST(dense_rank() OVER (PARTITION BY part ORDER BY grp) AS BIGINT)
             AS group_id
    FROM g
    """,
)
def compaction_plan_q(spark, sf_dir):
    """Small-files compaction planning (functions/layout.py:
    compaction_plan — the lakehouse OPTIMIZE bin-pack): the events
    table's (event_type, day) cells stand in for a partitioned table's
    file manifest (bytes = row count); in-order exclusive-cumsum DIV
    target grouping with a dense per-partition renumber, so each group
    is one ~target-sized rewrite task and existing sort order survives
    compaction. Exact integer DIV (PB-scale cumulative bytes overflow
    the double mantissa); planning cost is manifest-sized, one window
    shuffle on the partition key. Oracle replays the window formula
    relationally."""
    from kafka_streams_demo_spark.functions.layout import compaction_plan

    ev = load_table(spark, "events", sf_dir)
    files = ev.groupBy(
        F.col("event_type").alias("part"),
        F.to_date("ts").alias("file_day"),
    ).agg(F.count(F.lit(1)).alias("bytes"))
    return compaction_plan(
        files, target_bytes=300,
        part_cols=("part",), file_col="file_day", size_col="bytes",
    )


@register(
    "compaction_roundtrip",
    """
    WITH f AS (
      SELECT event_type AS part, CAST(ts AS DATE) AS file_day,
             COUNT(*) AS bytes
      FROM events GROUP BY 1, 2),
    c AS (
      SELECT part, file_day,
             COALESCE(SUM(bytes) OVER (PARTITION BY part ORDER BY file_day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      FROM f),
    g AS (SELECT part,
                 dense_rank() OVER (PARTITION BY part ORDER BY (cum // 300))
                   AS group_id
          FROM c),
    ng AS (SELECT part, CAST(COUNT(DISTINCT group_id) AS BIGINT) AS n_groups
           FROM g GROUP BY 1),
    m AS (
      SELECT event_type AS part, CAST(COUNT(*) AS BIGINT) AS n_rows,
             bit_xor(('0x' || substr(md5(
               coalesce(CAST(CAST(ts AS DATE) AS VARCHAR), '') || '|' ||
               coalesce(CAST(event_id AS VARCHAR), '')), 1, 15))::BIGINT)
               AS content_xor
      FROM events GROUP BY 1)
    SELECT m.part, m.n_rows, m.content_xor, ng.n_groups,
           TRUE AS preserved
    FROM m JOIN ng USING (part)
    """,
)
def compaction_roundtrip_q(spark, sf_dir):
    """The full lakehouse OPTIMIZE loop, externally hash-gated (VERDICT
    r9 task 4): plan (functions/layout.py:compaction_plan) → APPLY — a
    real parquet rewrite through compaction_apply's one range shuffle —
    → manifest-verify (content_manifest) on the files READ BACK from
    disk. Returns per table partition: the post-rewrite row count and
    order-independent 60-bit content checksum, the number of output
    groups actually written, and ``preserved`` = after-manifest ==
    before-manifest. The oracle computes the manifest directly from the
    source rows and the group count from the planner's window-formula
    replay with preserved=TRUE — so a rewrite that drops, duplicates,
    or corrupts ANY row, or emits a group layout different from the
    plan, hash-mismatches the gate. Content strings use only
    string/date/long columns (double rendering differs across engines).
    The rewrite lands in a fresh temp dir per invocation (events-sized;
    the entry is a correctness gate, not a bench headliner)."""
    import tempfile

    from kafka_streams_demo_spark.functions.layout import (
        compaction_apply,
        compaction_plan,
        content_manifest,
    )

    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_type").alias("part"),
        F.to_date("ts").alias("file_day"),
        "event_id",
    )
    files = ev.groupBy("part", "file_day").agg(F.count(F.lit(1)).alias("bytes"))
    plan = compaction_plan(
        files, target_bytes=300,
        part_cols=("part",), file_col="file_day", size_col="bytes",
    )
    out = tempfile.mkdtemp(prefix="kafka_streams_demo_spark_compact_")
    compaction_apply(
        ev, plan, out,
        part_cols=("part",), file_col="file_day", sort_cols=("event_id",),
    )
    back = spark.read.parquet(out)

    def content(df):
        return content_manifest(
            df,
            ("part",),
            F.concat_ws(
                "|",
                F.coalesce(F.col("file_day").cast("string"), F.lit("")),
                F.coalesce(F.col("event_id").cast("string"), F.lit("")),
            ),
        )

    before = content(ev).select(
        "part", F.col("n_rows").alias("_bn"), F.col("content_xor").alias("_bx")
    )
    groups = back.groupBy("part").agg(
        F.countDistinct("group_id").cast("long").alias("n_groups")
    )
    return (
        content(back)
        .join(before, "part")
        .join(groups, "part")
        .select(
            "part",
            "n_rows",
            "content_xor",
            "n_groups",
            (
                (F.col("n_rows") == F.col("_bn"))
                & (F.col("content_xor") == F.col("_bx"))
            ).alias("preserved"),
        )
    )


@register(
    "fuzzy_pairs_part_names",
    """
    WITH p AS (SELECT DISTINCT lower(p_name) AS name FROM part),
    pb AS (SELECT name, string_split(name, ' ')[1] AS blk FROM p)
    SELECT a.name AS a_name, b.name AS b_name,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
    FROM pb a JOIN pb b ON a.blk = b.blk AND a.name < b.name
    WHERE abs(length(a.name) - length(b.name)) <= 3
      AND levenshtein(a.name, b.name) <= 3
    """,
)
def fuzzy_pairs_part_names_q(spark, sf_dir):
    """Blocked fuzzy self-linkage (functions/linkage.py:fuzzy_pairs;
    Christen 2012 blocking) — near-duplicate part names within edit
    distance 3, first-token blocks. The record-linkage primitive exact
    joins can't express, WITHOUT a cartesian product: distinct-value
    dictionary first (the 100 TB trick — linkage on values, hash-join
    back for rows), equi-join on the block key, length-band prefilter,
    then Spark's THRESHOLDED levenshtein (banded O(d·L) DP). The oracle
    replays blocking + full levenshtein — identical survivors, proving
    the banded threshold DP is a pure optimization."""
    from kafka_streams_demo_spark.functions.linkage import fuzzy_pairs

    return fuzzy_pairs(load_table(spark, "part", sf_dir), "p_name", max_dist=3)


@register("bm25_postings_incremental", _BM25_MULTI_ORACLE)
def bm25_postings_incremental_q(spark, sf_dir):
    """The INCREMENTAL lexical-index tier (functions/text.py:
    bm25_postings): postings built from the doc_id%5≠0 base corpus plus
    a separately-built delta batch (doc_id%5=0), composed by UNION —
    posting rows are deterministic per document and ROW-LOCAL, so
    appending a delta batch IS index maintenance (no read-modify-write,
    no re-tokenizing the base corpus; corpus-level stats N/avgdl/df are
    recovered from the combined postings at query time, so they are
    always current). Registered against the SAME oracle as
    bm25_search_multi/bm25_search_postings — the driver hash gate proves
    index+delta ≡ one-shot batch bit-for-bit, completing the incremental
    symmetry across all three index families (exact/minhash/embedding
    dedup, IVF dense, and now the BM25 lexical tier). In production the
    delta lands via write_bm25_postings(mode='append') into the
    term-bucketed table; the append path is pinned by
    tests/test_text.py::test_bm25_postings_append_is_incremental."""
    from kafka_streams_demo_spark.functions.text import (
        bm25_postings,
        bm25_search_queries,
    )

    docs = load_table(spark, "documents", sf_dir)
    base = bm25_postings(docs.where(F.col("doc_id") % 5 != 0))
    delta = bm25_postings(docs.where(F.col("doc_id") % 5 == 0))
    qdf = spark.createDataFrame(
        [(1, "table scan fast"), (2, "stream join window"),
         (3, "vector hash merge")],
        "query_id long, query_text string",
    )
    return bm25_search_queries(
        None, qdf, k=10, postings=base.unionByName(delta)
    )


_CCNET_ORACLE = """
    WITH toks AS (SELECT doc_id, string_split(lower(coalesce(text, '')), ' ') AS ts
                  FROM documents),
    tr AS (SELECT * FROM toks WHERE doc_id % 5 <> 0),
    tbig AS (SELECT ts[i] AS w1, ts[i+1] AS w2
             FROM tr, UNNEST(range(1, len(ts))) AS g(i) WHERE len(ts) >= 2),
    cb AS (SELECT w1, w2, count(*) AS cb FROM tbig GROUP BY 1, 2),
    tuni AS (SELECT unnest(ts) AS w FROM tr),
    cu AS (SELECT w, count(*) AS cu FROM tuni GROUP BY 1),
    nt AS (SELECT CAST(count(*) AS DOUBLE) AS n_tok FROM tuni),
    sbig AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
             FROM toks, UNNEST(range(1, len(ts))) AS g(i) WHERE len(ts) >= 2),
    db AS (SELECT doc_id, w1, w2, count(*) AS c FROM sbig GROUP BY 1, 2, 3),
    contrib AS (SELECT db.doc_id, db.c,
        CAST(db.c AS DOUBLE) * log10(
          CASE WHEN cb.cb IS NOT NULL
               THEN CAST(cb.cb AS DOUBLE) / CAST(cu1.cu AS DOUBLE)
               ELSE 0.4 * CAST(coalesce(cu2.cu, 1) AS DOUBLE) / nt.n_tok END) AS v
      FROM db LEFT JOIN cb USING (w1, w2)
      LEFT JOIN cu cu1 ON db.w1 = cu1.w
      LEFT JOIN cu cu2 ON db.w2 = cu2.w
      CROSS JOIN nt),
    sc AS (SELECT doc_id, SUM(c) AS t,
                  ROUND(-list_sum(list_sort(list(v))) / CAST(SUM(c) AS DOUBLE), 6) AS nll
           FROM contrib GROUP BY 1)
    SELECT doc_id, CAST(t AS BIGINT) AS t, nll,
           CASE WHEN nll < 1.4722 THEN 'head'
                WHEN nll < 1.4861 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM sc
"""


@register("ccnet_perplexity", _CCNET_ORACLE)
def ccnet_perplexity_q(spark, sf_dir):
    """CCNet-style LM quality bucketing (functions/lm.py:ngram_lm_score +
    ccnet_bucket; Wenzek et al. 2019 §4.3, Brants et al. 2007 Stupid
    Backoff — the smoothing designed FOR distributed count aggregation):
    a bigram LM trained on the doc_id%5≠0 reference split scores EVERY
    doc's per-token NLL (the held-out 20% genuinely exercises the
    backoff branch), then fixed head/middle/tail cutoffs — CCNet's
    offline-percentile constants (p33/p67 of the sf0.01 distribution),
    applied row-locally so the scoring pass needs NO global sort/window.
    Scale: counts are map-side-combined aggregates; each distinct
    scoring bigram is priced once against the vocab-bounded model table
    (term-keyed joins, AQE-skew-safe); contributions fold in sorted
    order per doc (the cross-engine float contract)."""
    from kafka_streams_demo_spark.functions.lm import ccnet_bucket, ngram_lm_score

    docs = load_table(spark, "documents", sf_dir)
    scored = ngram_lm_score(docs, train_pred=F.col("doc_id") % 5 != 0)
    return ccnet_bucket(scored, cutoffs=(1.4722, 1.4861))


@register("ccnet_perplexity_incremental", _CCNET_ORACLE)
def ccnet_perplexity_incremental_q(spark, sf_dir):
    """The INCREMENTAL LM-model tier (functions/lm.py:lm_counts +
    merge_lm_counts): Stupid Backoff counts are ADDITIVE — the train
    split arrives as two delta batches (doc_id%5∈{1,2} and {3,4}),
    each counted independently, merged by union+re-sum, then every doc
    is scored against the merged model WITHOUT re-tokenizing either
    batch (N recovered as Σcu). Registered against the SAME oracle as
    ccnet_perplexity, so the driver hash gate proves index+delta ≡
    one-shot retrain bit-for-bit — the additivity that made Brants et
    al. 2007 the MapReduce-era LM recipe, now the maintenance story for
    a persisted count table (append delta counts, compact by re-sum)."""
    from kafka_streams_demo_spark.functions.lm import (
        ccnet_bucket,
        lm_counts,
        merge_lm_counts,
        ngram_lm_score,
    )

    docs = load_table(spark, "documents", sf_dir)
    batch1 = lm_counts(docs.where(F.pmod(F.col("doc_id"), F.lit(5)).isin(1, 2)))
    batch2 = lm_counts(docs.where(F.pmod(F.col("doc_id"), F.lit(5)).isin(3, 4)))
    merged = merge_lm_counts([batch1, batch2])
    return ccnet_bucket(
        ngram_lm_score(docs, counts=merged), cutoffs=(1.4722, 1.4861)
    )


@register(
    "dsir_select",
    """
    WITH toks AS (SELECT doc_id, string_split(lower(coalesce(text, '')), ' ') AS ts
                  FROM documents),
    uni AS (SELECT doc_id, unnest(ts) AS f FROM toks),
    big AS (SELECT doc_id, ts[i] || '_' || ts[i+1] AS f
            FROM toks, UNNEST(range(1, len(ts))) AS g(i) WHERE len(ts) >= 2),
    allf AS (SELECT doc_id, ('0x' || substr(md5(f), 1, 15))::BIGINT % 256 AS bucket
             FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)),
    feats AS (SELECT doc_id, bucket, count(*) AS c FROM allf GROUP BY 1, 2),
    flg AS (SELECT doc_id, source = 'src0' AS is_t FROM documents),
    tot AS (SELECT bucket, SUM(c) AS c_raw,
                   SUM(CASE WHEN is_t THEN c ELSE 0 END) AS c_tgt
            FROM feats JOIN flg USING (doc_id) GROUP BY 1),
    gr AS (SELECT SUM(c_raw) AS n_raw, SUM(c_tgt) AS n_tgt FROM tot),
    lr AS (SELECT bucket,
                  ln(CAST(c_tgt + 1 AS DOUBLE) / CAST(n_tgt + 256 AS DOUBLE))
                - ln(CAST(c_raw + 1 AS DOUBLE) / CAST(n_raw + 256 AS DOUBLE)) AS lr
           FROM tot CROSS JOIN gr),
    contrib AS (SELECT doc_id, CAST(c AS DOUBLE) * lr AS v
                FROM feats JOIN lr USING (bucket)),
    w AS (SELECT doc_id, ROUND(list_sum(list_sort(list(v))), 6) AS w
          FROM contrib GROUP BY 1)
    SELECT doc_id, w FROM w ORDER BY w DESC, doc_id LIMIT 50
    """,
)
def dsir_select_q(spark, sf_dir):
    """DSIR — Data Selection via Importance Resampling (functions/lm.py:
    dsir_select; Xie et al. 2023 §3): hashed unigram+bigram features
    (the cross-engine md5-60-bit bucket hash, B=256), per-doc importance
    weight Σ n_f·(ln p̂_target − ln p̂_raw) under Laplace-smoothed bucket
    multinomials — target = the src0 sample, raw = the whole corpus —
    then top-50 by (w DESC, doc_id). Scale: feature counts are map-side-
    combined aggregates keyed by (doc, bucket); the log-ratio model is
    EXACTLY B rows → broadcast; the global top-k is a TakeOrdered, not a
    full sort. Smoke-checked: the src0 target docs surface at the top,
    as resampling toward the target distribution should."""
    from kafka_streams_demo_spark.functions.lm import dsir_select

    docs = load_table(spark, "documents", sf_dir)
    return dsir_select(docs, F.col("source") == "src0", k=50)



# Shared NB-score CTE chain (through `s` = (doc_id, score)): the exact
# classifier math both the filter entry and the budget-selection entry
# replay — hashed uni+bigram features, Laplace-smoothed class
# multinomials, sorted-fold per-doc sums, 6-dp log-odds.
_NB_SCORE_CTES = """
    toks AS (SELECT doc_id, string_split(lower(coalesce(text, '')), ' ') AS ts
                  FROM documents),
    uni AS (SELECT doc_id, unnest(ts) AS f FROM toks),
    big AS (SELECT doc_id, ts[i] || '_' || ts[i+1] AS f
            FROM toks, UNNEST(range(1, len(ts))) AS g(i) WHERE len(ts) >= 2),
    allf AS (SELECT doc_id, ('0x' || substr(md5(f), 1, 15))::BIGINT % 256 AS bucket
             FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)),
    feats AS (SELECT doc_id, bucket, count(*) AS c FROM allf GROUP BY 1, 2),
    flg AS (SELECT doc_id, source = 'src0' AS is_p FROM documents),
    tot AS (SELECT bucket,
                   SUM(CASE WHEN is_p THEN c ELSE 0 END) AS c_pos,
                   SUM(CASE WHEN NOT is_p THEN c ELSE 0 END) AS c_neg
            FROM feats JOIN flg USING (doc_id) GROUP BY 1),
    gr AS (SELECT SUM(c_pos) AS n_pos, SUM(c_neg) AS n_neg FROM tot),
    pr AS (SELECT SUM(CASE WHEN is_p THEN 1 ELSE 0 END) AS d_pos,
                  SUM(CASE WHEN NOT is_p THEN 1 ELSE 0 END) AS d_neg FROM flg),
    llr AS (SELECT bucket,
                   ln(CAST(c_pos + 1 AS DOUBLE) / CAST(n_pos + 256 AS DOUBLE))
                 - ln(CAST(c_neg + 1 AS DOUBLE) / CAST(n_neg + 256 AS DOUBLE)) AS llr
            FROM tot CROSS JOIN gr),
    contrib AS (SELECT doc_id, CAST(c AS DOUBLE) * llr AS v
                FROM feats JOIN llr USING (bucket)),
    s AS (SELECT doc_id,
                 ROUND(ln(CAST(d_pos AS DOUBLE) / CAST(d_neg AS DOUBLE))
                       + list_sum(list_sort(list(v))), 6) AS score
          FROM contrib CROSS JOIN pr GROUP BY doc_id, d_pos, d_neg)
"""


@register(
    "quality_classifier_filter",
    f"""
    WITH {_NB_SCORE_CTES},
    k AS (SELECT doc_id, score,
                 ROUND(1.0 / (1.0 + exp(-score)), 6) AS prob,
                 ROUND(POW(1.0 - (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 0.5)
                                 / 1152921504606846976.0, -(1.0/9.0)) - 1.0, 6) AS pareto
          FROM s)
    SELECT doc_id, score, prob, pareto,
           CAST(CASE WHEN pareto > 1.0 - prob THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM k
    """,
)
def quality_classifier_filter_q(spark, sf_dir):
    """GPT-3-style quality-classifier filtering (functions/lm.py:
    nb_quality_scores + pareto_quality_filter; Brown et al. 2020
    Appendix A): a multinomial Naive-Bayes model over hashed
    unigram+bigram features — the closed-form, one-aggregation-pass
    member of the linear-classifier family GPT-3's pipeline trains —
    fitted with src0 as the curated positive class and the rest of the
    crawl as negative, scores every document; the keep bit replays
    GPT-3's stochastic Pareto rule (keep iff pareto > 1 − σ(score))
    with the draw derandomized by inverse-CDF over the doc-id hash, so
    low-quality docs retain tail-diversity admission probability and
    the whole decision is engine-replayable. Scale: the model is B=256
    rows (broadcast), the prior 1 row, scoring one doc-keyed aggregate
    — no global sort, no Python."""
    from kafka_streams_demo_spark.functions.lm import (
        nb_quality_scores,
        pareto_quality_filter,
    )

    docs = load_table(spark, "documents", sf_dir)
    scored = nb_quality_scores(docs, F.col("source") == "src0")
    return pareto_quality_filter(scored, alpha=9.0)

@register(
    "quality_classifier_incremental", ORACLES["quality_classifier_filter"]
)
def quality_classifier_incremental_q(spark, sf_dir):
    """The INCREMENTAL classifier tier (functions/lm.py:nb_model_counts
    + merge_nb_counts): NB counts are ADDITIVE — the corpus arrives as
    two ingest batches (doc_id%2), each counted independently, merged
    by union+re-sum, then every doc is scored against the merged model
    and run through the same Pareto keep rule. Registered against the
    SAME oracle as quality_classifier_filter, so the driver hash gate
    proves index+delta ≡ one-shot retrain bit-for-bit (every double in
    the scoring math derives from order-free integer totals) — the
    same maintenance story as the LM-count and sketch families: append
    a batch's counts, compact by re-sum, never re-tokenize history."""
    from kafka_streams_demo_spark.functions.lm import (
        merge_nb_counts,
        nb_model_counts,
        nb_quality_scores,
        pareto_quality_filter,
    )

    docs = load_table(spark, "documents", sf_dir)
    is_pos = F.col("source") == "src0"
    b1 = nb_model_counts(docs.where(F.col("doc_id") % 2 == 0), is_pos)
    b2 = nb_model_counts(docs.where(F.col("doc_id") % 2 == 1), is_pos)
    merged = merge_nb_counts([b1, b2])
    return pareto_quality_filter(
        nb_quality_scores(docs, counts=merged), alpha=9.0
    )

@register(
    "token_budget_select",
    f"""
    WITH {_NB_SCORE_CTES},
    tok AS (SELECT doc_id,
                   CAST(len(string_split(lower(coalesce(text, '')), ' ')) AS BIGINT)
                     AS n_tokens
            FROM documents),
    cum AS (SELECT s.doc_id, s.score, tok.n_tokens,
                   CAST(SUM(tok.n_tokens) OVER (ORDER BY s.score DESC, s.doc_id
                                                ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS cum_tokens
            FROM s JOIN tok USING (doc_id))
    SELECT doc_id, score, n_tokens, cum_tokens FROM cum WHERE cum_tokens <= 6000
    """,
)
def token_budget_select_q(spark, sf_dir):
    """Budgeted corpus assembly (functions/packing.py:
    token_budget_select): fill a global 6000-token budget with the
    best documents by NB classifier score — "the highest-quality N
    tokens" as one plan, the selection rule a budget/curriculum
    pipeline applies after scoring. Deterministic cut: (score DESC,
    doc_id) order, keep while the running total stays within budget
    (the fixture holds ~15k tokens, so the budget BINDS). Scale: the
    running total rides the two-phase bucketed prefix scan (score
    bands as buckets — floor(-score) ascends with the descending sort)
    instead of the naive single-sort-task global window the oracle can
    afford; integer token math over 6-dp scores keeps the hash
    engine-stable."""
    from kafka_streams_demo_spark.functions.lm import nb_quality_scores
    from kafka_streams_demo_spark.functions.packing import token_budget_select

    docs = load_table(spark, "documents", sf_dir)
    scored = nb_quality_scores(docs, F.col("source") == "src0")
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), " "))
        .cast("long")
        .alias("n_tokens"),
    )
    return token_budget_select(scored.join(toks, "doc_id"), budget=6000)
