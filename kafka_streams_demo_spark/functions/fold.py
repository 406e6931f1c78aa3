"""Sorted-fold double sums without the ObjectHashAggregate.

The repo's cross-engine determinism idiom is the ascending-sorted left
fold — ``F.aggregate(F.array_sort(F.collect_list(v)), 0.0, acc + x)`` ≡
DuckDB ``list_sum(list_sort(list(v)))`` — because double addition is not
associative and shuffle arrival order is nondeterministic. The
collect_list formulation executes as an ObjectHashAggregate, which above
``spark.sql.objectHashAggregate.sortBased.fallbackThreshold`` (default
128 keys) silently degrades to SORT-based aggregation with per-group
ArrayBuffer allocation on both sides of the exchange — measured 9.3 s
for the 5.6M-row bm25 bulk scoring aggregate at sf0.1 (r13; raising the
threshold made it WORSE: 28 s of hash-map churn).

This module computes the IDENTICAL fold with one window pass instead:
rows are exchanged by the group key, sorted by (key, value), and a
whole-partition-frame ``F.sum`` accumulates them sequentially — Spark's
UnboundedWindowFunctionFrame adds rows one at a time in partition-sort
order, so the emitted value is ((0.0 + v1) + v2) + ... over ascending
values: bit-for-bit the same IEEE addition sequence as the sorted fold
(and 0.0 + v == v exactly for every double). Verified value-identical on
all 2.39M (query, doc) groups of the sf0.1 bm25 bulk load (r13), and the
same-oracle hash gates pin it per entry.

Plan shape: Exchange + ONE Sort + streaming Window over raw rows,
versus ObjectHashAggregate(partial) + Exchange of list buffers +
ObjectHashAggregate(final) with a sort fallback on BOTH sides — 2.7×
faster on the bm25 bulk aggregate, and the win grows with group count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sorted_fold_sum"]


def sorted_fold_sum(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    out_col: str,
    round_dp: int | None = None,
    count_col: str | None = None,
    extras: dict[str, Column] | None = None,
    shuffle_cols: list[str] | None = None,
) -> DataFrame:
    """Per-``group_cols`` ascending-sorted left-fold sum of ``value``.

    Returns one row per group: ``group_cols + [out_col]`` (+ a
    ``count_col`` row count when requested) — exactly
    ``df.groupBy(*group_cols).agg(round(fold(sort(collect_list(value)))))``
    but executed as a single window pass (see module docstring).

    ``value`` may be any Column expression over ``df``; nulls are skipped
    by the sum exactly as collect_list skips them (they sort first, add
    nothing). ``count_col`` counts ROWS per group (collect-era
    ``F.count(F.lit(1))`` parity), not non-null values.

    ``extras``: additional per-group aggregates ``{out_name: agg_expr}``
    evaluated over the same whole-partition frame (e.g. ``F.sum("c")``).
    Only ORDER-INSENSITIVE aggregates belong here (integer sums, counts,
    min/max) — they see rows in value-sorted order, not arrival order.

    ``shuffle_cols``: optional strict PREFIX-SUBSET of ``group_cols`` to
    hash-exchange on instead of the full group key. HashPartitioning(S)
    satisfies ClusteredDistribution(G) whenever S ⊆ G, so the fold's
    window accepts the coarser layout — and a downstream window/groupBy
    keyed on ``shuffle_cols`` (e.g. the per-query rank after a
    per-(query, doc) score fold) then REUSES the same exchange instead
    of re-shuffling every group row (guide §2.4: operations keyed the
    same way share one exchange). Identical results for any
    partitioning; only pass keys whose per-key row volume is
    task-bounded (the downstream window has that same bound already).
    """
    tagged = df.withColumn("_fold_v", value)
    if shuffle_cols is not None:
        if not set(shuffle_cols) <= set(group_cols):
            raise ValueError("shuffle_cols must be a subset of group_cols")
        tagged = tagged.repartition(*[F.col(c) for c in shuffle_cols])
    gw = Window.partitionBy(*group_cols).orderBy(F.asc("_fold_v"))
    full = gw.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    s = F.sum("_fold_v").over(full)
    if round_dp is not None:
        s = F.round(s, round_dp)
    cols = [*group_cols, s.alias(out_col)]
    if count_col is not None:
        cols.append(F.count(F.lit(1)).over(full).alias(count_col))
    for name, agg in (extras or {}).items():
        cols.append(agg.over(full).alias(name))
    return (
        tagged.withColumn("_fold_rn", F.row_number().over(gw))
        .select(*cols, "_fold_rn")
        .filter(F.col("_fold_rn") == 1)
        .drop("_fold_rn")
    )
