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
