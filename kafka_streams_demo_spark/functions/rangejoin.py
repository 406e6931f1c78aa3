"""Unkeyed band (range) joins without a cross product.

``a ⋈ |a.k − b.k| ≤ t b`` with NO equality key is the classic Spark
scale trap: Catalyst plans it as BroadcastNestedLoopJoin (OSS has no
range-join optimization — that's a Databricks-runtime extra), which is
O(|A|·|B|) and falls over the moment neither side broadcasts. The
standard fix is BUCKETED EXPANSION (the interval-join strategy Flink
ships natively): quantize the key into width-``t`` buckets, expand ONE
side to its bucket ±1, equi-join on the bucket, then apply the exact
band predicate.

No false negatives: |l − r| ≤ t ⇒ their width-t bucket ids differ by at
most 1, and the expansion covers exactly that. Cost: 3× one side's rows
through a hash equi-join — linear, shuffle-partitioned, AQE-skew-safe —
instead of |A|·|B| comparisons.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["band_join"]


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_key: Column,
    right_key: Column,
    tolerance: int,
) -> DataFrame:
    """Pairs (all left columns, all right columns) where
    ``|left_key − right_key| ≤ tolerance``; keys must be exact integers
    (cast timestamps to ``unix_micros`` first — long/long DIV keeps the
    bucket math exact where double division would misassign).

    The RIGHT side expands ×3 (bucket −1/0/+1); put the smaller table on
    the right. The equi-join on ``_band`` is a plain shuffle hash join —
    a hot bucket (flash-sale minute) is ordinary join skew, handled by
    AQE splitting, not a nested loop."""
    if tolerance <= 0:
        raise ValueError("tolerance must be a positive integer")
    l = left.withColumn("_lk", left_key.cast("long")).withColumn(
        "_band", F.expr(f"_lk DIV {tolerance}")
    )
    r = right.withColumn("_rk", right_key.cast("long"))
    r = r.withColumn(
        "_band",
        F.explode(
            F.array(
                F.expr(f"_rk DIV {tolerance} - 1"),
                F.expr(f"_rk DIV {tolerance}"),
                F.expr(f"_rk DIV {tolerance} + 1"),
            )
        ),
    )
    return (
        l.join(r, "_band")
        .where(F.abs(F.col("_lk") - F.col("_rk")) <= F.lit(tolerance))
        .drop("_band", "_lk", "_rk")
    )
