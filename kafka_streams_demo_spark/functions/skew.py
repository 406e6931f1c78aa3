"""Skew mitigation — salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; salting is the explicit tool for the pathological cases AQE can't
re-plan: a grouped aggregation where one key holds a double-digit share of
all rows (the classic hot-user / empty-string-key shape in training-data
pipelines).

``salted_aggregate`` runs the standard two-phase shape:
  phase 1  groupBy(key, salt)   — the hot key spreads over N partitions
  phase 2  groupBy(key)         — N partial rows per key combine to one
Both phases are hash aggregations with map-side combine; the phase-2
shuffle carries ≤ N rows per key regardless of skew.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Add a uniform salt derived from a per-row monotonic id (deterministic
    per partition layout, no RNG — keeps queries replayable)."""
    return df.withColumn(
        salt_col, F.pmod(F.monotonically_increasing_id(), F.lit(buckets)).cast("int")
    )


def salted_aggregate(
    df: DataFrame,
    key_col: str,
    partial: list[tuple[Callable[[], Column], str]],
    merge: list[tuple[Callable[[str], Column], str]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial``: (aggregate-expression factory, alias) applied per
    (key, salt); ``merge``: (combiner over the partial alias, final alias)
    applied per key. E.g. count = (count(1), 'c') then (sum('c'), 'cnt').
    """
    salted = with_salt(df, buckets)
    p1 = salted.groupBy(key_col, "_salt").agg(
        *[expr().alias(name) for expr, name in partial]
    )
    return p1.groupBy(key_col).agg(
        *[comb(name_in).alias(name_out) for (comb, name_out), (_, name_in) in zip(merge, partial)]
    )


def salted_count(df: DataFrame, key_col: str, buckets: int = 16) -> DataFrame:
    """Skew-safe count per key (the hot-key histogram)."""
    return salted_aggregate(
        df,
        key_col,
        partial=[(lambda: F.count(F.lit(1)), "c")],
        merge=[(lambda c: F.sum(c), "value")],
        buckets=buckets,
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (large, skewed) LEFT side, replicate
    the (smaller) RIGHT side once per salt bucket, join on (key, salt).
    A hot left key spreads over ``buckets`` reducers instead of melting
    one; the right side grows ×buckets — use when the right side is
    modest but too big (or streaming) for a broadcast, and AQE's runtime
    skew split can't apply (e.g. stateful streaming joins, or a skew AQE
    underestimates). Result == plain ``left.join(right, ...)`` (column
    order: left cols then right cols; join keys from both sides kept)."""
    salted_l = with_salt(left, buckets, "_salt")
    replicated_r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    cond = (salted_l[left_on] == replicated_r[right_on]) & (
        salted_l["_salt"] == replicated_r["_salt"]
    )
    out_cols = [salted_l[c] for c in left.columns] + [replicated_r[c] for c in right.columns]
    return salted_l.join(replicated_r, cond, how).select(*out_cols)


def bucketed_running_sum(
    df: DataFrame,
    key_col: str,
    val_col,
    order_cols: list[str],
    bucket_col,
    out_col: str = "running",
) -> DataFrame:
    """Hot-key-parallel cumulative sum: the classic two-phase prefix scan.

    A plain running sum partitions the window by key, so one hot key
    (10⁹ rows) is a single sort task. Phase 1 computes local cumulative
    sums within (key, bucket) — parallelism ∝ key-span/bucket; phase 2
    turns per-bucket totals into per-bucket starting offsets with a window
    over BUCKETS (rows per key = #buckets, trivially small) and joins them
    back on (key, bucket). ``local + offset`` equals the global scan
    exactly for any bucketing that refines the order columns (e.g.
    ``date_trunc`` of the event time when ordering by time). ``val_col``
    and ``bucket_col`` may be Columns or names."""
    from pyspark.sql.window import Window as _W

    val = F.col(val_col) if isinstance(val_col, str) else val_col
    bkt = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    base = df.withColumn("_bkt", bkt).withColumn("_v", val)
    w_local = (
        _W.partitionBy(key_col, "_bkt")
        .orderBy(*order_cols)
        .rowsBetween(_W.unboundedPreceding, _W.currentRow)
    )
    local = base.withColumn("_local", F.sum("_v").over(w_local))
    totals = base.groupBy(key_col, "_bkt").agg(F.sum("_v").alias("_tot"))
    w_off = (
        _W.partitionBy(key_col)
        .orderBy("_bkt")
        .rowsBetween(_W.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0))
    ).select(key_col, "_bkt", "_off")
    return (
        local.join(offsets, [key_col, "_bkt"])
        .withColumn(out_col, F.col("_local") + F.col("_off"))
        .drop("_bkt", "_v", "_local", "_off")
    )


def bucketed_sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_cols: list[str],
    gap_s: int,
    bucket_s: int,
) -> DataFrame:
    """Hot-key-parallel gap sessionization → per-session rollup
    (key, session_id, n_events, start_us, end_us), exactly equal to the
    single-window formulation.

    A plain sessionize chains lag() per key — one hot key is one sort
    task. Here each (key, time-bucket) sessionizes locally in parallel;
    only a bucket's LAST session can merge with the next bucket's FIRST
    (within a bucket, consecutive sessions are > gap apart by
    construction, and ``bucket_s > gap_s`` means a merge can never skip
    an empty bucket). Boundary merges may chain across many buckets (one
    session spanning a week of days), so merge edges run through
    ``connected_components`` over SESSION-level rows (≪ events; rounds =
    longest chain). Renumbering by session start restores the exact
    running-count session ids. Equivalence is pinned by registering this
    plan against the same SQL oracle as the plain sessionize."""
    if bucket_s <= gap_s:
        raise ValueError(f"bucket_s ({bucket_s}) must exceed gap_s ({gap_s})")
    from pyspark.sql.window import Window as _W

    from kafka_streams_demo_spark.functions.dedup import connected_components

    ts_long = F.col(ts_col).cast("long")
    base = df.withColumn("_bkt", F.floor(ts_long / bucket_s))
    w = _W.partitionBy(key_col, "_bkt").orderBy(*order_cols)
    wrun = w.rowsBetween(_W.unboundedPreceding, _W.currentRow)
    new_sess = F.when(
        F.lag(ts_col).over(w).isNull()
        | (ts_long - F.lag(ts_col).over(w).cast("long") > gap_s),
        1,
    ).otherwise(0)
    local = base.withColumn("_ls", F.sum(new_sess).over(wrun))
    loc = (
        local.groupBy(key_col, "_bkt", "_ls")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.min(ts_col).alias("_start"),
            F.max(ts_col).alias("_end"),
        )
        .withColumn("_node", F.concat_ws("|", F.col(key_col), "_bkt", "_ls"))
    )
    n_sess = _W.partitionBy(key_col, "_bkt")
    # localCheckpoint, not persist: read 3x below (last/first/merged) and
    # a plain persist leaks cached blocks for the session lifetime (no
    # unpersist point before the caller's action); checkpointed blocks are
    # freed when the DataFrame is garbage collected
    loc = loc.withColumn("_max_ls", F.max("_ls").over(n_sess)).localCheckpoint(
        eager=False
    )
    last = loc.filter(F.col("_ls") == F.col("_max_ls")).select(
        F.col(key_col).alias("_k"), F.col("_bkt").alias("_b"),
        F.col("_end").alias("_e"), F.col("_node").alias("i"),
    )
    first = loc.filter(F.col("_ls") == 1).select(
        F.col(key_col).alias("_k"), F.col("_bkt").alias("_b"),
        F.col("_start").alias("_s"), F.col("_node").alias("j"),
    )
    edges = last.alias("a").join(
        first.alias("b"),
        (F.col("a._k") == F.col("b._k"))
        & (F.col("a._b") + 1 == F.col("b._b"))
        & (F.col("b._s").cast("long") - F.col("a._e").cast("long") <= gap_s),
    ).select("i", "j")
    labels = connected_components(edges)
    merged = (
        loc.join(labels, loc["_node"] == labels["node"], "left")
        .withColumn("_grp", F.coalesce(F.col("cluster_id"), F.col("_node")))
    )
    sess = merged.groupBy(key_col, "_grp").agg(
        F.sum("_n").alias("n_events"),
        F.min("_start").alias("_sstart"),
        F.max("_end").alias("_send"),
    )
    w_num = _W.partitionBy(key_col).orderBy("_sstart")
    out = sess.select(
        key_col,
        F.row_number().over(w_num).cast("long").alias("session_id"),
        "n_events",
        F.unix_micros(F.col("_sstart")).alias("start_us"),
        F.unix_micros(F.col("_send")).alias("end_us"),
    )
    return out


def salted_topk_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: list,
    k: int,
    buckets: int = 16,
    rank_col: str = "rn",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Hot-key-parallel top-k per key: a rank window partitions by key, so
    one hot key sorts in a single task. Two-phase instead: rank within
    (key, salt) — a hot key spreads over ``buckets`` tasks — keep each
    salt's local top-k (any global top-k row is top-k within its salt
    bucket, so no survivor is lost), then re-rank the ≤ k·buckets
    survivors per key. Exact for ranks ≤ k with a deterministic order
    (include a tiebreaker column); salting is content-hash on
    ``salt_cols`` (default: the plain-named order columns — pass
    explicitly when order_cols are desc()/expression sort orders, which
    cannot be hashed), so results are partitioning-independent."""
    from pyspark.sql.window import Window as _W

    if salt_cols is None:
        salt_cols = [c for c in order_cols if isinstance(c, str)]
    if not salt_cols:
        raise ValueError(
            "salt_cols required when order_cols contain no plain column names"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(buckets))
    local_w = _W.partitionBy(key_col, "_salt").orderBy(*order_cols)
    survivors = (
        df.withColumn("_salt", salt)
        .withColumn("_lrn", F.row_number().over(local_w))
        .filter(F.col("_lrn") <= k)
        .drop("_lrn")
    )
    final_w = _W.partitionBy(key_col).orderBy(*order_cols)
    return (
        survivors.withColumn(rank_col, F.row_number().over(final_w))
        .filter(F.col(rank_col) <= k)
        .drop("_salt")
    )
