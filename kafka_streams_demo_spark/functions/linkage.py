"""Approximate string matching / record linkage with blocking.

The classic entity-resolution primitive the reference's exact-key joins
can't express: find pairs of values whose edit distance is small,
WITHOUT a cartesian product. Standard blocking design (Christen 2012,
"Data Matching"):

1. dedupe the attribute into a DISTINCT-value dictionary first — at
   100 TB the dictionary is orders of magnitude smaller than the table,
   and linkage on values is linkage on rows after a hash-join back;
2. equi-join candidate pairs on a cheap BLOCK KEY (default: first
   token), so the quadratic step runs per block, never per corpus;
3. prefilter with the length band |len(a)−len(b)| ≤ d (a necessary
   condition for edit distance ≤ d — free column math before the DP);
4. score survivors with Spark's THRESHOLDED levenshtein — the banded
   O(d·L) DP, not the full O(L²) matrix.

Skew: a hot block (one ubiquitous first token) degrades toward block²;
``max_block_size`` drops over-cap blocks LOUDLY (same audited-cap
contract as functions/dedup.py's LSH buckets) rather than silently
stalling a straggler task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["fuzzy_pairs", "fuzzy_join"]


def _dict_with_block(
    df: DataFrame, text_col: str, block: Column | None
) -> DataFrame:
    out = df.select(F.lower(F.col(text_col)).alias("name")).where(
        F.col("name").isNotNull()
    ).distinct()
    blk = block if block is not None else F.split(F.col("name"), " ").getItem(0)
    return out.select("name", blk.alias("blk"))


def _cap_blocks(d: DataFrame, max_block_size: int | None) -> DataFrame:
    if max_block_size is None:
        return d
    sizes = d.groupBy("blk").agg(F.count(F.lit(1)).alias("_bs"))
    return (
        d.join(sizes, "blk")
        .where(F.col("_bs") <= max_block_size)
        .drop("_bs")
    )


def fuzzy_pairs(
    df: DataFrame,
    text_col: str,
    max_dist: int = 3,
    block: Column | None = None,
    max_block_size: int | None = None,
) -> DataFrame:
    """Self-linkage over one column's distinct values: (a_name, b_name,
    dist) with a_name < b_name and levenshtein ≤ ``max_dist``.

    100 TB shape: DISTINCT shrinks the table to its value dictionary
    (map-side combine); the self-join is keyed on the block column, so
    the only quadratic work is within-block; the length band and the
    banded-DP threshold bound the per-pair cost. No corpus-sized
    relation is ever broadcast or collected."""
    d = _cap_blocks(_dict_with_block(df, text_col, block), max_block_size)
    a = d.select(F.col("name").alias("a_name"), "blk")
    b = d.select(F.col("name").alias("b_name"), "blk")
    return (
        a.join(b, "blk")
        .where(F.col("a_name") < F.col("b_name"))
        .where(
            F.abs(F.length("a_name") - F.length("b_name")) <= F.lit(max_dist)
        )
        .select(
            "a_name",
            "b_name",
            F.levenshtein("a_name", "b_name", max_dist).alias("_d"),
        )
        .where(F.col("_d") >= 0)  # thresholded DP returns -1 above max_dist
        .select("a_name", "b_name", F.col("_d").cast("long").alias("dist"))
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
    block: Column | None = None,
    max_block_size: int | None = None,
) -> DataFrame:
    """Cross-table fuzzy equi-join on string similarity: returns
    (l_name, r_name, dist) over the two DISTINCT value dictionaries —
    join the result back to either table on the exact name to recover
    row-level matches (dictionary-first keeps the DP cost value-pair-
    bounded, not row-pair-bounded)."""
    l = _cap_blocks(_dict_with_block(left, left_col, block), max_block_size)
    r = _cap_blocks(_dict_with_block(right, right_col, block), max_block_size)
    return (
        l.select(F.col("name").alias("l_name"), "blk")
        .join(r.select(F.col("name").alias("r_name"), "blk"), "blk")
        .where(
            F.abs(F.length("l_name") - F.length("r_name")) <= F.lit(max_dist)
        )
        .select(
            "l_name",
            "r_name",
            F.levenshtein("l_name", "r_name", max_dist).alias("_d"),
        )
        .where(F.col("_d") >= 0)
        .select("l_name", "r_name", F.col("_d").cast("long").alias("dist"))
    )
