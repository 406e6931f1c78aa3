"""Deterministic, oracle-replayable streaming sketches: HyperLogLog and
count-min.

Approximate-distinct and approximate-frequency already exist in the
catalog as rows-only entries over Spark's built-ins
(``approx_count_distinct`` / ``approx_percentile`` — their internal
hashing is engine-private, so no SQL oracle can replay them). These
implementations make the sketch itself the contract: every hash is the
repo's standard 60-bit md5 integer (``('0x' || substr(md5(s),1,15))::
BIGINT`` in DuckDB), so the register/counter TABLES are bit-equal across
engines and the estimates land under the full hash gate.

Reference parity: the reference's demo topology counts distinct-ish
aggregates with Kafka Streams state stores
(src/main/java/com/github/hosnimed/WordCountDemo.java:35); these are the
mergeable-sketch upgrades a 100 TB corpus needs when exact per-key state
no longer fits.

Why "the sketch is a table" matters at scale: a register table is
MERGEABLE state — union two register tables and take per-bucket max (HLL)
or per-cell sum (CMS) and you get exactly the sketch of the unioned
inputs. That is the index+delta contract the dedup/BM25/IVF tiers
already follow, and here it is PROVABLE bit-for-bit: the incremental
catalog entries register against the SAME oracle as the full build, so a
driver green on the merged sketch externally proves merge(old, delta) ≡
rebuild(all).

Scale shape (both sketches):
- one shuffle, keyed by a few hundred sketch cells, with map-side
  combine (max / sum are partial-aggregatable) — reducer state is O(m),
  never O(distinct values);
- CMS builds count per VALUE first (one combined shuffle), then expands
  d rows per distinct value — the d× blowup prices on |distinct|, not
  |rows|;
- estimates fold per-bucket doubles in sorted order (the cross-engine
  float-sum determinism rule), so the final double is identical in Spark
  and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash60(col: Column, seed: int | str) -> Column:
    """60-bit cross-engine hash: first 15 md5 hex digits of 'seed:value'.
    Non-negative (< 2^60), so &, >>, and % agree between engines."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat_ws(":", F.lit(str(seed)), col.cast("string")).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def _hash60_sql(expr: str, seed: int | str) -> str:
    """DuckDB replay of :func:`_hash60` for oracle authoring."""
    return f"('0x' || substr(md5('{seed}:' || {expr}), 1, 15))::BIGINT"


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007)
# ---------------------------------------------------------------------------

HLL_HASH_BITS = 60


def hll_registers(
    df: DataFrame,
    col: str,
    p: int = 9,
    seed: int = 42,
) -> DataFrame:
    """Build the HLL register table: (bucket, register) for every
    non-empty bucket of an m = 2**p register sketch.

    bucket = low p bits of the 60-bit hash; rho = position of the first
    set bit in the remaining w = 60-p bits (w+1 if they are all zero);
    register = max(rho) per bucket. Bit length comes from
    ``length(bin(x))`` — minimal-length binary rendering in BOTH engines,
    so the oracle replays it exactly.

    Scale: one groupBy on <= m keys, max is map-side combined; reducer
    state is O(m). The output IS the mergeable sketch — see
    :func:`hll_merge`."""
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    m = 1 << p
    w = HLL_HASH_BITS - p
    h = _hash60(F.col(col), seed)
    src = df.filter(F.col(col).isNotNull()).select(h.alias("_h"))
    suffix = F.shiftright(F.col("_h"), p)
    rho = F.when(suffix == 0, F.lit(w + 1)).otherwise(
        F.lit(w + 1) - F.length(F.bin(suffix))
    )
    return (
        src.select(
            F.col("_h").bitwiseAND(F.lit(m - 1)).alias("bucket"),
            rho.alias("_rho"),
        )
        .groupBy("bucket")
        .agg(F.max("_rho").cast("int").alias("register"))
    )


def hll_registers_sql(expr: str, from_clause: str, p: int = 9, seed: int = 42) -> str:
    """DuckDB oracle for :func:`hll_registers` (same hash, same rho)."""
    m = 1 << p
    w = HLL_HASH_BITS - p
    hv = _hash60_sql(expr, seed)
    return f"""
WITH hsh AS (SELECT {hv} AS hv {from_clause}),
parts AS (SELECT hv & {m - 1} AS bucket, hv >> {p} AS suffix FROM hsh),
rho AS (SELECT bucket,
               CASE WHEN suffix = 0 THEN {w + 1}
                    ELSE {w + 1} - length(bin(suffix)) END AS r
        FROM parts)
SELECT bucket, CAST(max(r) AS INT) AS register FROM rho GROUP BY bucket
"""


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge HLL sketches: union register tables, keep per-bucket max.
    merge(hll(A), hll(B)) == hll(A UNION ALL B) exactly — the lossless
    mergeability that makes HLL the standard distributed-distinct sketch.
    The incremental catalog entry registers this against the full-build
    oracle, so the hash gate proves the identity externally."""
    if not register_tables:
        raise ValueError("need at least one register table")
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("bucket").agg(F.max("register").cast("int").alias("register"))


def hll_estimate(registers: DataFrame, p: int = 9) -> DataFrame:
    """One-row estimate from a register table: (m, nonzero_buckets,
    estimate). Standard bias-corrected harmonic mean with the
    small-range linear-counting correction (E <= 2.5m and empty buckets
    exist -> m * ln(m / V)).

    Cross-engine determinism: the 2^-register terms fold in sorted order
    (``F.aggregate(F.array_sort(F.collect_list(...)))`` ≡ DuckDB
    ``list_sum(list_sort(list(...)))``); empty buckets contribute
    exactly (m - nonzero) * 1.0; alpha is spelled as the same literal
    arithmetic in both engines."""
    m = 1 << p
    agg = registers.agg(
        F.count(F.lit(1)).alias("nonzero_buckets"),
        F.aggregate(
            F.array_sort(F.collect_list(F.pow(F.lit(2.0), -F.col("register")))),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("_present"),
    )
    zeros = F.lit(m) - F.col("nonzero_buckets")
    ssum = zeros.cast("double") + F.col("_present")
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    raw = alpha * F.lit(float(m)) * F.lit(float(m)) / ssum
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        F.col("nonzero_buckets").cast("long").alias("nonzero_buckets"),
        F.round(est, 6).alias("estimate"),
    )


def hll_estimate_sql(registers_sql: str, p: int = 9) -> str:
    """DuckDB oracle for :func:`hll_estimate` over a registers subquery."""
    m = 1 << p
    return f"""
WITH regs AS ({registers_sql}),
acc AS (SELECT count(*) AS nz,
               coalesce(list_sum(list_sort(list(pow(2.0, -register)))), 0.0)
                   AS present
        FROM regs),
terms AS (SELECT nz, ({m} - nz) AS zeros,
                 CAST({m} - nz AS DOUBLE) + present AS ssum
          FROM acc),
est AS (SELECT nz, zeros,
               (0.7213 / (1.0 + 1.079 / {float(m)})) * {float(m)} * {float(m)}
                   / ssum AS raw
        FROM terms)
SELECT CAST({m} AS BIGINT) AS m,
       CAST(nz AS BIGINT) AS nonzero_buckets,
       ROUND(CASE WHEN raw <= {2.5 * m} AND zeros > 0
                  THEN {float(m)} * ln({float(m)} / CAST(zeros AS DOUBLE))
                  ELSE raw END, 6) AS estimate
FROM est
"""


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------


def cms_sketch(
    df: DataFrame,
    col: str,
    depth: int = 3,
    width: int = 128,
    seed: int = 42,
) -> DataFrame:
    """Build a count-min sketch table: (row, bucket, cnt) for every
    non-empty cell of a depth x width grid. Row r hashes value v to
    bucket ``hash60('seed.r:v') % width`` and adds v's count.

    Build order matters at scale: count per VALUE first (one shuffle,
    fully map-side combined), THEN expand d rows per distinct value and
    re-aggregate to <= d*width cells. The d-fold blowup prices on
    |distinct values|, not |input rows| — exploding first would triple a
    100 TB scan's shuffle for no reason."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}x{width}")
    per_value = (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).cast("string").alias("_v"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    expanded = per_value.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
        "_v",
        "_c",
    )
    return (
        expanded.select(
            F.col("row").cast("int").alias("row"),
            _cms_bucket(F.col("row"), F.col("_v"), width, seed).alias("bucket"),
            "_c",
        )
        .groupBy("row", "bucket")
        .agg(F.sum("_c").alias("cnt"))
    )


def _cms_bucket(row: Column, value: Column, width: int, seed: int) -> Column:
    """Cell hash for CMS row r: hash60 of ':<seed>.<r>:<value>' mod width
    (the leading ':' is _hash60's empty-seed prefix; the oracle replays
    the exact same string)."""
    label = F.concat_ws(".", F.lit(str(seed)), row)
    return F.pmod(
        _hash60(F.concat_ws(":", label, value.cast("string")), seed=""),
        F.lit(width),
    )


def cms_sketch_sql(
    expr: str, from_clause: str, depth: int = 3, width: int = 128, seed: int = 42
) -> str:
    """DuckDB oracle for :func:`cms_sketch` (same label string, same hash)."""
    hv = f"('0x' || substr(md5(':' || '{seed}' || '.' || r || ':' || v), 1, 15))::BIGINT"
    return f"""
WITH per_value AS (SELECT CAST({expr} AS VARCHAR) AS v, count(*) AS c
                   {from_clause} GROUP BY 1),
expanded AS (SELECT r.r, v, c
             FROM per_value CROSS JOIN (SELECT unnest(range(0, {depth})) AS r) r),
cells AS (SELECT r, {hv} % {width} AS bucket, c FROM expanded)
SELECT CAST(r AS INT) AS row, bucket, SUM(c) AS cnt
FROM cells GROUP BY 1, 2
"""


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches: per-cell sum. merge(cms(A), cms(B)) ==
    cms(A UNION ALL B) exactly (counters are linear), the CMS half of the
    mergeable-sketch contract. Registered against the full-build oracle
    so the identity is externally hash-proven."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for t in sketches[1:]:
        out = out.unionByName(t)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 3,
    width: int = 128,
    seed: int = 42,
) -> DataFrame:
    """Point-query the sketch for each item: est = min over the d rows of
    the item's cell count (missing cell = 0). Overestimates only, by the
    classic (eps, delta) bound.

    Scale: items expand d rows each and join the <= d*width-cell sketch —
    broadcast-sized by construction, so the probe never shuffles the
    corpus side (the sketch is the corpus's only residue)."""
    probes = items.filter(F.col(col).isNotNull()).select(
        F.col(col).alias("item"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    probes = probes.select(
        "item",
        F.col("row").cast("int").alias("row"),
        _cms_bucket(F.col("row"), F.col("item"), width, seed).alias("bucket"),
    )
    joined = probes.join(sketch, ["row", "bucket"], "left").select(
        "item", F.coalesce(F.col("cnt"), F.lit(0)).alias("_cell")
    )
    return joined.groupBy("item").agg(F.min("_cell").cast("long").alias("cms_count"))


def hll_registers_grouped(
    df: DataFrame,
    key_col: str,
    col: str,
    p: int = 9,
    seed: int = 42,
) -> DataFrame:
    """Per-key HLL register tables: (key, bucket, register) — one
    mergeable distinct-sketch PER GROUP (the shape Kafka Streams keeps
    in a per-key state store, and what approx_count_distinct(col) GROUP
    BY key maintains internally with an engine-private hash). One
    groupBy on (key, bucket) with map-side-combined max; reducer state
    is O(groups x m)."""
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    m = 1 << p
    w = HLL_HASH_BITS - p
    h = _hash60(F.col(col), seed)
    src = df.filter(F.col(col).isNotNull() & F.col(key_col).isNotNull()).select(
        F.col(key_col).alias("key"), h.alias("_h")
    )
    suffix = F.shiftright(F.col("_h"), p)
    rho = F.when(suffix == 0, F.lit(w + 1)).otherwise(
        F.lit(w + 1) - F.length(F.bin(suffix))
    )
    return (
        src.select(
            "key",
            F.col("_h").bitwiseAND(F.lit(m - 1)).alias("bucket"),
            rho.alias("_rho"),
        )
        .groupBy("key", "bucket")
        .agg(F.max("_rho").cast("int").alias("register"))
    )


def hll_estimate_grouped(registers: DataFrame, p: int = 9) -> DataFrame:
    """Per-key estimates from a grouped register table: (key,
    nonzero_buckets, estimate) — the same bias-corrected harmonic mean
    + linear-counting correction as :func:`hll_estimate`, folded in
    sorted order per key."""
    m = 1 << p
    agg = registers.groupBy("key").agg(
        F.count(F.lit(1)).alias("nonzero_buckets"),
        F.aggregate(
            F.array_sort(F.collect_list(F.pow(F.lit(2.0), -F.col("register")))),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("_present"),
    )
    zeros = F.lit(m) - F.col("nonzero_buckets")
    ssum = zeros.cast("double") + F.col("_present")
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    raw = alpha * F.lit(float(m)) * F.lit(float(m)) / ssum
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        "key",
        F.col("nonzero_buckets").cast("long").alias("nonzero_buckets"),
        F.round(est, 6).alias("estimate"),
    )


# ---------------------------------------------------------------------------
# KMV / bottom-k sketch (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07)
# ---------------------------------------------------------------------------

KMV_HASH_SPACE = float(1 << 60)


def kmv_sketch(df: DataFrame, col: str, k: int = 64, seed: int = 42) -> DataFrame:
    """Bottom-k (KMV) sketch: the k SMALLEST distinct 60-bit hash values
    of the column — the third mergeable-sketch family member (HLL
    estimates cardinality, CMS frequency; KMV gives cardinality AND a
    uniform DISTINCT SAMPLE, which neither can). Returns (hv) rows,
    <= k of them.

    Scale: distinct on the hash (map-side combined) then a bottom-k —
    TakeOrderedAndProject per-partition heaps, never a full sort. The
    sketch is O(k) state; see :func:`kmv_merge`."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = _hash60(F.col(col), seed)
    return (
        df.filter(F.col(col).isNotNull())
        .select(h.alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )


def kmv_merge(k: int, *sketches: DataFrame) -> DataFrame:
    """Merge KMV sketches: union, distinct, keep the k smallest.
    merge(kmv(A), kmv(B)) == kmv(A UNION ALL B) exactly — the k smallest
    of the union are always within the union of each side's k smallest.
    Registered same-oracle with the full build, so the identity is
    externally hash-proven like the HLL/CMS merges."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for t in sketches[1:]:
        out = out.unionByName(t)
    return out.distinct().orderBy("hv").limit(k)


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Cardinality from a KMV sketch: (n_hashes, estimate). With fewer
    than k distinct values the sketch IS the distinct set (estimate
    exact); at k, estimate = (k-1) * HASH_SPACE / kth_minimum — the
    classic unbiased bottom-k estimator. Integer max + one division,
    deterministic across engines."""
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_hashes"), F.max("hv").alias("_kth")
    )
    est = F.when(
        F.col("n_hashes") < k, F.col("n_hashes").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(KMV_HASH_SPACE) / F.col("_kth").cast("double")
    )
    return agg.select(
        F.col("n_hashes").cast("long").alias("n_hashes"),
        F.round(est, 6).alias("estimate"),
    )


def kmv_jaccard(
    df_a: DataFrame, df_b: DataFrame, col: str, k: int = 64, seed: int = 42
) -> DataFrame:
    """Jaccard similarity of two value SETS from their KMV sketches
    (Beyer et al.: the k smallest hashes of A ∪ B are a uniform sample
    of the union, so the fraction present in both sketches estimates
    |A ∩ B| / |A ∪ B|). One row: (sample_size, in_both, jaccard).

    This is what bottom-k buys over HLL: set-OVERLAP estimation from
    O(k) state per side — e.g. audience overlap between event types
    across a 100 TB log without a distinct-join."""
    sa = kmv_sketch(df_a, col, k, seed)
    sb = kmv_sketch(df_b, col, k, seed)
    union_k = kmv_merge(k, sa, sb)
    in_both = union_k.join(sa, "hv", "left_semi").join(sb, "hv", "left_semi")
    counts = union_k.agg(F.count(F.lit(1)).alias("sample_size")).crossJoin(
        in_both.agg(F.count(F.lit(1)).alias("in_both"))
    )
    return counts.select(
        F.col("sample_size").cast("long").alias("sample_size"),
        F.col("in_both").cast("long").alias("in_both"),
        F.round(F.col("in_both") / F.col("sample_size"), 6).alias("jaccard"),
    )


def kmv_sketch_grouped(
    df: DataFrame, key_col: str, col: str, k: int = 64, seed: int = 42
) -> DataFrame:
    """Per-key bottom-k sketches: (key, hv) with <= k rows per key —
    one distinct + one windowed bottom-k (WindowGroupLimit heaps), the
    grouped sibling of :func:`kmv_sketch`."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql import Window

    h = _hash60(F.col(col), seed)
    distinct = (
        df.filter(F.col(col).isNotNull() & F.col(key_col).isNotNull())
        .select(F.col(key_col).alias("key"), h.alias("hv"))
        .distinct()
    )
    w = Window.partitionBy("key").orderBy("hv")
    return (
        distinct.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_overlap_matrix(
    df: DataFrame, key_col: str, col: str, k: int = 64, seed: int = 42
) -> DataFrame:
    """Pairwise Jaccard matrix between ALL key groups from their KMV
    sketches, in one plan: for each pair, the bottom-k of the two
    sketches' union is a uniform union sample; the fraction present in
    both estimates J. Returns (key_a, key_b, sample_size, in_both,
    jaccard) for key_a < key_b.

    This is the sketch table paying off as INFRASTRUCTURE: the per-key
    sketches are O(groups x k) rows total, so the all-pairs comparison
    — which exact would cost a distinct-join per pair over the raw log —
    runs entirely on sketch rows. Groups² x k stays tiny for the
    bounded-cardinality keys this is for (sources, event types,
    languages)."""
    # persist the per-key sketches: the key list and BOTH pair sides
    # read them, and Catalyst replans the raw-log distinct + window per
    # reference (the r9 minhash lesson — 3 full log scans without it).
    # O(groups × k) rows; released via dedup.release_caches().
    from kafka_streams_demo_spark.functions.dedup import _track_cache

    sk = kmv_sketch_grouped(df, key_col, col, k, seed).persist()
    _track_cache(sk)
    keys = sk.select("key").distinct()
    pairs = (
        keys.select(F.col("key").alias("key_a"))
        .join(keys.select(F.col("key").alias("key_b")))
        .filter(F.col("key_a") < F.col("key_b"))
    )
    rows_a = pairs.join(sk.withColumnsRenamed({"key": "key_a"}), "key_a").select(
        "key_a", "key_b", "hv", F.lit(1).alias("_a"), F.lit(0).alias("_b")
    )
    rows_b = pairs.join(sk.withColumnsRenamed({"key": "key_b"}), "key_b").select(
        "key_a", "key_b", "hv", F.lit(0).alias("_a"), F.lit(1).alias("_b")
    )
    merged = (
        rows_a.unionByName(rows_b)
        .groupBy("key_a", "key_b", "hv")
        .agg(F.max("_a").alias("in_a"), F.max("_b").alias("in_b"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("key_a", "key_b").orderBy("hv")
    union_k = merged.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    return union_k.groupBy("key_a", "key_b").agg(
        F.count(F.lit(1)).cast("long").alias("sample_size"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("in_both"),
        F.round(
            F.sum(F.col("in_a") * F.col("in_b"))
            / F.count(F.lit(1)),
            6,
        ).alias("jaccard"),
    )


def quantile_sketch(
    df: DataFrame, val_col: str, key_col: str, k: int = 256, seed: int = 42
) -> DataFrame:
    """Bottom-k-sample quantile sketch — the FOURTH mergeable-sketch
    family member (HLL: cardinality, CMS: frequency, KMV: distinct
    sample; this: quantiles): the ``k`` rows whose 60-bit hash of the
    ROW KEY is smallest form a deterministic uniform row sample, and
    quantiles over it estimate population quantiles with the classic
    O(1/sqrt(k)) sampling error. Returns (hv, v) rows, <= k of them.

    Unlike GK/KLL sketches (whose state depends on insertion order —
    unreplayable cross-engine), the bottom-k-by-hash sample is a pure
    function of the data, so the sketch AND its merge sit under the
    hash gate, and merge(sketch(A), sketch(B)) == sketch(A ∪ B)
    EXACTLY (the KMV argument: the union's k smallest hashes are within
    the union of each side's k smallest). Scale: per-partition
    TakeOrdered heaps, never a full sort; O(k) state."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = _hash60(F.col(key_col), seed)
    return (
        df.filter(F.col(key_col).isNotNull() & F.col(val_col).isNotNull())
        .select(h.alias("hv"), F.col(val_col).cast("double").alias("v"))
        .orderBy("hv", "v")
        .limit(k)
    )


def quantile_sketch_merge(k: int, *sketches: DataFrame) -> DataFrame:
    """Merge bottom-k quantile sketches: union, keep the k smallest by
    (hv, v) — registered same-oracle with the full build so the
    merge ≡ rebuild identity is externally hash-proven, like the
    HLL/CMS/KMV merges. Disjoint-key batches give disjoint hv sets; the
    (hv, v) tie order makes even collision cases deterministic."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for t in sketches[1:]:
        out = out.unionByName(t)
    return out.orderBy("hv", "v").limit(k)


def quantile_estimate(
    sketch: DataFrame, qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99)
) -> DataFrame:
    """Population-quantile estimates from the sketch sample: Spark's
    exact interpolated ``percentile`` over the <= k sample values (≡
    DuckDB ``quantile_cont`` at 6 dp — the cross-engine pair the exact-
    percentile entries already pin). One row: (n_sample, q_25, ...)."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n_sample")] + [
        F.round(F.expr(f"percentile(v, {q})"), 6).alias(
            "q_" + str(q).replace("0.", "").ljust(2, "0")
        )
        for q in qs
    ]
    return sketch.agg(*aggs)
