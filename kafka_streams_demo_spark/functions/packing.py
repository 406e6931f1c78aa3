"""Training-data assembly: chunking, sequence packing, mixture sampling.

The reference has no counterpart for these (its data plane is keyed
records, SURVEY §1); they are the north-star LLM-pipeline extensions that
turn a filtered corpus into model-ready sequences:

- ``chunk_documents``: split each document into fixed-size token windows
  with overlap (context-window prep). Pure column expressions — tokenize,
  ``sequence`` for chunk starts, ``explode``, ``slice`` — so chunking
  100 TB is a narrow map stage, no shuffle, no Python.
- ``pack_sequences``: greedy first-fit-in-order packing of documents into
  fixed-capacity token bins (one bin = one training sequence). The greedy
  scan is sequential, but only *within a shard*: each group is range-
  sharded on doc_id (target ``tokens_per_shard`` tokens per shard), shards
  pack in parallel as independent ``applyInPandas`` tasks, and bin ids are
  offset per shard so they never collide — one giant source can no longer
  serialize into a single task.
- ``mixture_sample``: deterministic per-source rate sampling (corpus
  mixture weights) via a content-hash threshold — reproducible across
  engines and partitionings, unlike ``rand()``/``sampleBy``.
- ``temperature_mixture``: the multilingual-LM temperature recipe — each
  group downsampled to ``(c_min/c_i)^(1-alpha)`` with the same
  content-hash rule; rates derived in-plan from a tiny counts aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 32,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_id, start_tok, n_tokens, chunk_md5) — whitespace-token
    windows of ``chunk_size`` tokens advancing by ``chunk_size - overlap``.

    The last window is truncated at the document end; every token belongs
    to at least one window; documents shorter than one window yield exactly
    one chunk. The token array is materialized behind its own projection
    (HOF lambdas re-evaluate inline expressions per element).
    """
    stride = chunk_size - overlap
    if stride <= 0:
        raise ValueError("chunk_size must exceed overlap")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        # NULL text ⇒ '' (split(NULL) is NULL: sequence/explode would
        # silently drop the row, contradicting the one-chunk-minimum
        # contract and the sibling operators' NULL→'' convention)
        F.split(F.coalesce(F.col(text_col), F.lit("")), " ").alias("_toks"),
    ).select("doc_id", "_toks", F.size("_toks").alias("_n"))
    started = toks.select(
        "doc_id",
        "_toks",
        "_n",
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.col("_n") - F.lit(overlap), F.lit(1)),
                F.lit(stride),
            )
        ).alias("st"),
    )
    return started.select(
        "doc_id",
        ((F.col("st") - 1) / F.lit(stride)).cast("long").alias("chunk_id"),
        F.col("st").cast("long").alias("start_tok"),
        F.least(F.lit(chunk_size), F.col("_n") - F.col("st") + 1)
        .cast("long")
        .alias("n_tokens"),
        F.md5(
            F.array_join(F.slice("_toks", F.col("st"), F.lit(chunk_size)), " ").cast(
                "binary"
            )
        ).alias("chunk_md5"),
    )


_BINS_PER_SHARD = 1 << 32  # bin-id stride between shards (collision-free)


def pack_sequences(
    docs: DataFrame,
    capacity: int = 256,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_per_shard: int | None = 1_000_000,
) -> DataFrame:
    """Greedy first-fit-in-order sequence packing: within each group,
    documents (in ``id_col`` order) accumulate into bins of ``capacity``
    whitespace tokens; a document that would overflow the open bin starts
    the next one; oversized documents (> capacity) occupy a bin alone.

    Output: (group, doc_id, n_tokens, bin_id).

    Scale design: the greedy scan is inherently sequential, so a group is
    first split into doc_id-range *shards* of ~``tokens_per_shard`` tokens
    (one tiny per-group aggregate for (total, min_id, max_id), broadcast
    back, shard = pure column math). Each (group, shard) packs as its own
    ``applyInPandas`` task — a billion-document source becomes thousands of
    parallel tasks instead of one Arrow-buffered pandas frame. Bin ids are
    ``shard * 2^32 + local_bin``: unique and deterministic across shards,
    contiguous only within a shard (apply ``dense_rank`` over distinct bin
    ids downstream if contiguity matters). Packing differs from the
    unsharded scan only at shard boundaries (an open bin closes there); a
    group whose total fits one shard — including everything at test scale
    with the 1M default — packs identically to the unsharded algorithm.
    ``tokens_per_shard=None`` disables sharding. Range-sharding assumes
    roughly uniform doc_ids over their span; skewed density affects
    balance, never correctness. NON-NUMERIC ids shard automatically on
    ``xxhash64(doc_id)`` (masked to 62 bits, so range math can't
    overflow): shards then hold pseudo-random id subsets instead of
    contiguous ranges — each shard still packs ITS docs in id order, and
    a group whose total fits one shard (n_shards = 1) remains identical
    to the unsharded scan under either key.
    """
    from pyspark.sql.types import NumericType

    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )
    id_numeric = isinstance(toks.schema["doc_id"].dataType, NumericType)

    if tokens_per_shard is not None:
        # shard key: integral. Long/long `/` in Spark is DOUBLE division —
        # at 62-bit hash magnitudes the 53-bit mantissa misassigns shards
        # (a max-hash doc lands in a phantom shard n_shards), so every
        # range step below uses exact integer DIV arithmetic instead.
        sk = (
            F.col("doc_id").cast("long")
            if id_numeric
            else F.xxhash64(F.col("doc_id")).bitwiseAND(F.lit((1 << 62) - 1))
        )
        toks = toks.withColumn("_sk", sk)
        stats = (
            toks.groupBy("grp")
            .agg(
                F.sum("n_tokens").alias("_tot"),
                F.min("_sk").alias("_lo"),
                F.max("_sk").alias("_hi"),
            )
            .withColumn(
                "_nsh",
                F.greatest(
                    F.lit(1), F.ceil(F.col("_tot") / F.lit(tokens_per_shard))
                ).cast("long"),
            )
            # span = (hi-lo) DIV nsh + 1: exact, ≥1, and guarantees
            # (sk-lo) DIV span ≤ nsh-1 for every sk in [lo, hi]
            .withColumn("_span", F.expr("(_hi - _lo) DIV _nsh + 1"))
        )
        # null-safe join: a NULL group key is a legal group (groupBy keeps
        # it) and must not silently drop its docs (review r4)
        sd = stats.select(
            F.col("grp").alias("_sg"), "_lo", "_span"
        )
        toks = (
            toks.join(F.broadcast(sd), toks["grp"].eqNullSafe(sd["_sg"]))
            .withColumn("shard", F.expr("(_sk - _lo) DIV _span"))
            .drop("_sg", "_lo", "_span", "_sk")
        )
    else:
        toks = toks.withColumn("shard", F.lit(0).cast("long"))

    cap = capacity

    def pack(keys, pdf):
        shard = keys[1]
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, fill, b = [], 0, -1
        for nt in pdf["n_tokens"]:
            if b >= 0 and fill + nt <= cap:
                fill += nt
            else:
                b += 1
                fill = nt
            bins.append(shard * _BINS_PER_SHARD + b)
        out = pdf[["grp", "doc_id", "n_tokens"]].copy()
        out["bin_id"] = bins
        return out

    grp_t = toks.schema["grp"].dataType.simpleString()
    id_t = toks.schema["doc_id"].dataType.simpleString()
    return toks.groupBy("grp", "shard").applyInPandas(
        pack, f"grp {grp_t}, doc_id {id_t}, n_tokens long, bin_id long"
    )


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    default_weight: float = 1.0,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic mixture sampling: keep each row with probability
    ``weights[source]`` decided by a content-hash threshold — the first two
    hex digits of md5(text) compared against ``round(weight · 256)``. The
    same row is kept or dropped on every engine and every partitioning
    (unlike ``rand()``), so a mixture is a reproducible dataset definition,
    not a lottery. Weight granularity is 1/256.
    """
    def thresh(w: float) -> str:
        t = max(0, min(256, round(w * 256)))
        # 256/256 = keep-all: "zz" sorts above every 2-digit hex string
        # (a 3-char "100" would compare lexicographically BELOW "ff")
        return "zz" if t == 256 else format(t, "02x")

    expr = F.lit(thresh(default_weight))
    for src, w in weights.items():
        expr = F.when(F.col(group_col) == src, F.lit(thresh(w))).otherwise(expr)
    return docs.filter(
        F.substring(F.md5(F.col(text_col).cast("binary")), 1, 2) < expr
    )


def mixture_upsample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    group_col: str = "source",
    text_col: str = "text",
    copy_col: str = "copy_id",
) -> DataFrame:
    """Mixture sampling with rates ABOVE 1 (epochs-per-source): each row
    is emitted ``floor(rate)`` times plus one more with probability
    ``frac(rate)`` — decided by the same content-hash rule as
    ``mixture_sample``, so the realized copy count of every row is
    reproducible across engines and partitionings. Rates below 1 degrade
    to the familiar keep/drop filter (0 ≤ copies ≤ 1). Output: the input
    columns plus ``copy_col`` (1..n per surviving copy) — downstream
    shuffles/packing treat copies as distinct rows.

    Scale: a narrow map stage — one ``when`` ladder for the rate, one
    bounded ``sequence``+``explode``; no shuffle, no RNG, no driver
    state. Fractional granularity 1/256."""
    def parts(r: float) -> tuple[int, str]:
        if r < 0:
            raise ValueError(f"negative rate {r}")
        whole = int(r)
        t = max(0, min(256, round((r - whole) * 256)))
        thresh = "zz" if t == 256 else format(t, "02x")
        return whole, thresh

    dw, dt = parts(default_rate)
    whole_expr = F.lit(dw)
    thresh_expr = F.lit(dt)
    for src, r in rates.items():
        w, t = parts(r)
        whole_expr = F.when(F.col(group_col) == src, F.lit(w)).otherwise(whole_expr)
        thresh_expr = F.when(F.col(group_col) == src, F.lit(t)).otherwise(thresh_expr)
    n_copies = whole_expr + F.when(
        F.substring(F.md5(F.col(text_col).cast("binary")), 1, 2) < thresh_expr,
        F.lit(1),
    ).otherwise(F.lit(0))
    # sequence(1, 0) DESCENDS in Spark — empty-copy rows need the guard
    copies = F.when(
        n_copies >= 1, F.sequence(F.lit(1), n_copies.cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    return docs.select("*", F.explode(copies).alias(copy_col))


def temperature_mixture(
    docs: DataFrame,
    alpha: float = 0.5,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-based corpus mixing (the multilingual-LM sampling
    recipe): downsample each source to ``rate = (c_min / c_i)^(1-alpha)``
    — ``alpha=1`` keeps the natural distribution, ``alpha=0`` flattens
    every source to the smallest one's count (in expectation), values
    between interpolate. Downsampling-only (rates ≤ 1), so it composes
    with the same deterministic content-hash keep rule as
    ``mixture_sample``: reproducible across engines and partitionings.

    All math stays in the plan: per-source counts (a tiny aggregate)
    broadcast back, the global min folded in via a 1-row cross join —
    no driver collect, no RNG. Rate granularity 1/256, FLOORED AT 1/256:
    a source so much larger than the smallest that its exact rate rounds
    to 0/256 (> ~256^(1/(1-alpha)) × c_min) is kept at ~0.4% instead of
    being dropped entirely — temperature mixing reweights sources, it
    must never silently erase one (ADVICE r4)."""
    counts = docs.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    cmin = counts.agg(F.min("_c").alias("_cmin"))
    rates = counts.crossJoin(F.broadcast(cmin)).select(
        "_g",
        F.greatest(
            F.lit(1),
            F.least(
                F.lit(256),
                F.round(
                    F.lit(256) * F.pow(F.col("_cmin") / F.col("_c"), 1.0 - alpha)
                ),
            ),
        ).cast("int").alias("_t"),
    )
    thresh = F.when(F.col("_t") >= 256, F.lit("zz")).otherwise(
        F.format_string("%02x", F.col("_t"))
    )
    return (
        docs.join(F.broadcast(rates), docs[group_col].eqNullSafe(rates["_g"]))
        .filter(F.substring(F.md5(F.col(text_col).cast("binary")), 1, 2) < thresh)
        .drop("_g", "_t")
    )


def shuffle_shards(
    docs: DataFrame,
    n_shards: int,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle into shards — the reproducible
    replacement for rand()-ordered training-data shuffles: (doc_id,
    shard, pos) where ``shard`` and the within-shard ``pos`` derive
    entirely from md5(seed:id), so every run, engine, and partitioning
    produces the SAME shuffle order (rand() does not survive a retry,
    let alone an engine swap — same argument as sample_per_source). A
    training job reads shard s in pos order; changing ``seed`` reshuffles.

    The hash is a 60-bit integer from the first 15 md5 hex digits —
    exactly replayable in SQL (oracle-gated). Scale: one shuffle on the
    shard key + a per-shard sort (the window); at 100 TB write the output
    partitioned by shard with ``sortWithinPartitions(pos)`` and readers
    stream shards sequentially. Uniformity: md5 is uniform, so shards are
    balanced to ~sqrt(n/doc_count) relative error — no hot shard."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from pyspark.sql import Window

    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.lit(str(seed)), F.col(id_col).cast("string")
                ).cast("binary")
            ),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    based = docs.select(F.col(id_col).alias("doc_id"), h.alias("_h")).withColumn(
        "shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("long")
    )
    w = Window.partitionBy("shard").orderBy("_h", "doc_id")
    return based.select(
        "doc_id", "shard", F.row_number().over(w).cast("long").alias("pos")
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
    by: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis & Spirakis 2006): key_i = u_i^(1/w_i) with u_i a
    hash-derived uniform in (0,1], take the k largest keys — exactly a
    weighted sample, reproducible on every engine and partitioning
    (the same argument as mixture_sample / shuffle_shards: rand() does
    not survive a retry). The uniform is (hash60(seed:id)+1) / 2^60, so
    the oracle replays the identical doubles.

    ``by=None``: global top-k — compiles to TakeOrderedAndProject
    (per-partition heaps, no full sort). ``by=col``: k per group via one
    window shuffle. Weights clamp to >= 1 (a zero weight would make the
    exponent infinite); rows with NULL weight are dropped."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.lit(str(seed)), F.col(id_col).cast("string")
                ).cast("binary")
            ),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    u = (h + F.lit(1)) / F.lit(float(1 << 60))
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1.0))
    keyed = docs.filter(F.col(weight_col).isNotNull()).withColumn(
        "_k", F.pow(u, F.lit(1.0) / w)
    )
    if by is None:
        return keyed.orderBy(F.desc("_k"), F.col(id_col)).limit(k).drop("_k")
    from pyspark.sql import Window

    win = Window.partitionBy(by).orderBy(F.desc("_k"), F.col(id_col))
    return (
        keyed.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= k)
        .drop("_k", "_rn")
    )


def token_budget_select(
    scored: DataFrame,
    budget: int,
    score_col: str = "score",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    band_width: float = 1.0,
) -> DataFrame:
    """Budgeted corpus assembly: keep the best documents by score until a
    global token budget is filled — "give me 10B tokens of the
    highest-quality data" as one plan. Selection order is
    (score DESC, doc_id) so the cut is deterministic across
    engines/partitionings; a doc is kept iff the running token total
    THROUGH it stays ≤ ``budget`` (greedy prefix fill, the rule a
    curriculum/budget pipeline actually applies).

    Scale: a naive global cumsum window is ONE sort task; this rides
    :func:`~kafka_streams_demo_spark.functions.skew.bucketed_running_sum`
    — the two-phase prefix scan — with score bands as buckets
    (``floor(-score / band_width)`` ascends exactly with the descending
    score order, so banding refines the sort; parallelism ∝ #bands).
    The running total is integer math over already-rounded scores, so
    the output hashes identically on DuckDB's single window.

    Input: (doc_id, score, n_tokens). Output: the kept rows +
    ``cum_tokens``."""
    from kafka_streams_demo_spark.functions.skew import bucketed_running_sum

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    # the prefix scan references its input TWICE (local window + band
    # totals) and Catalyst does not dedupe common subtrees — left lazy,
    # an expensive upstream scoring pipeline would run twice. The frame
    # is doc-count-sized (id, score, tokens — no text), so one bounded
    # materialization is the right trade at any corpus size.
    base = scored.withColumn("_g", F.lit(1)).localCheckpoint(eager=True)
    cum = bucketed_running_sum(
        base,
        "_g",
        tokens_col,
        [F.desc(score_col), F.asc(id_col)],
        F.floor(-F.col(score_col) / F.lit(float(band_width))),
        out_col="cum_tokens",
    )
    return cum.where(F.col("cum_tokens") <= F.lit(budget)).drop("_g")
