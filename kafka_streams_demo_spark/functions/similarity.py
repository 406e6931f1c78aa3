"""Similarity search over embedding columns (array<float>).

- ``cosine``: native column math — zip_with product + aggregate sum in
  doubles (sequential, reproducible), no UDF.
- ``topk_bruteforce``: exact top-k for a set of query vectors via
  crossJoin + window rank. The baseline and the oracle-checkable path;
  cost |Q|×|N| — fine for small |Q| at any corpus size (queries broadcast).
- ``lsh_bucketed_topk``: the ANN scale path — random-hyperplane signatures
  (deterministic seed) bucket the corpus; candidates share the query's
  bucket; exact rerank inside. Sub-linear candidate sets at the cost of
  recall (tunable via plane count).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in doubles (element order, reproducible)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def topk_bruteforce(
    emb: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    q_id_col: str = "q_id", q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (self-matches by id
    excluded). Queries are broadcast — the corpus never shuffles; ranking
    happens on round(cos, 6) with id tie-break for determinism."""
    corpus = emb.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    q = queries.select(F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("q_vec"))
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id", "n_id",
            F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cos", "rank")
    )


def hyperplanes(dim: int, planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (±1 entries, fixed seed)."""
    rng = np.random.RandomState(seed)
    return (rng.randint(0, 2, size=(planes, dim)) * 2 - 1).astype(float).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id: bit_j = [vec · plane_j > 0]."""
    bucket = F.lit(0).cast("long")
    for j, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        bucket = bucket + F.when(dot(vec, plane) > 0, F.lit(2 ** j).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_bucketed_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10, planes: int = 8,
    dim: int = 64, id_col: str = "vec_id", vec_col: str = "embedding",
    q_id_col: str = "q_id", q_vec_col: str = "q_vec", seed: int = 42,
) -> DataFrame:
    """ANN: exact rerank within the query's hyperplane bucket. At 100 TB the
    corpus is bucketed once (2^planes buckets, write-partitioned); each
    query probes one bucket — candidates shrink ~2^planes-fold."""
    hp = hyperplanes(dim, planes, seed)
    corpus = emb.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"),
        lsh_bucket(F.col(vec_col), hp).alias("bucket"),
    )
    q = queries.select(
        F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("q_vec"),
        lsh_bucket(F.col(q_vec_col), hp).alias("bucket"),
    )
    scored = (
        corpus.join(F.broadcast(q), "bucket")
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id", "n_id",
            F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cos", "rank")
    )
