"""Scale-adaptive input spreading for per-row-expensive operators.

The driver fixtures arrive as ONE parquet file per table (documents:
5000 rows in a single ~1.5 MB file, one row group), so every scan of
them is a single partition — and every row-local chain downstream
(Arrow kernels, tokenize/shingle HOF math, regex cleaning, posting
builds) runs on ONE core until its first exchange, leaving the other 31
idle. That is guide §2.5's "input skew: one huge unsplittable file" in
miniature: `spark.sql.files.minPartitionNum` cannot help because a
single row group is not splittable, so the fix is the guide's —
"repartition immediately after the read". Measured at sf0.1 (r13):
gopher_repetition 2.4 → 0.55 s from this alone.

``spread`` is deliberately CONDITIONAL, not a constant: it round-robin
repartitions to ``sparkContext.defaultParallelism`` (the cluster's slot
count — local[N] → N, a real cluster → its executor cores) ONLY when
the input plan produces fewer partitions than that. At 100 TB a table
scan yields thousands of partitions and the helper is a structural
no-op — no exchange is added — so the bench's local win is not a
local[32]-tuned constant (the round rules' scale-adaptivity test).

Result-safety: round-robin repartition changes row placement only.
Every caller is a row-local map (per-row outputs independent of
placement) feeding order-insensitive aggregation (sorted folds, counts,
maxes) — the repo's cross-engine determinism discipline already forbids
placement-sensitive results, and each touched entry stays under its
DuckDB oracle hash gate. Spark's sort-before-repartition (default on)
keeps the placement itself deterministic under task retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` to cluster parallelism iff its
    current plan yields fewer partitions (single-small-file scans);
    structural no-op on well-partitioned inputs (any real-scale scan)."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
