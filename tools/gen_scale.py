"""Scale-tier generator (VERDICT r11 task 1): derive an sf1-equivalent
dataset (10x sf0.1) from the DRIVER's own fixtures, so scaling exponents
are measured on the same distributions the catalog grades on.

NOT new synthetic data: each table is the driver table replayed
``replicas`` times with disjoint key ranges (offset = r * 10^9, which
preserves ``key % k`` residues for every k dividing 10^9 — 2, 4, 5,
10, 20, ... — the moduli the catalog's split/bucket rules use; NOT
mod 3: 10^9 ≡ 1 (mod 3), so the wallclock gap-injection rule
``(user_id + event_id % 4) % 3`` selects a per-replica-shifted subset
at the scale tiers. Gates stay consistent — the oracle replays the
same rule on the same data — but that subset's SHAPE is not
residue-preserved), mirroring how TPC-H scales (facts and dims grow
linearly, region/nation stay fixed). Two tables get a content
transform so workload SHAPE survives the replication:

- documents: every token in replica r>0 gets suffix ``r`` (one
  regexp_replace) — cross-replica shingle sets become disjoint, so the
  planted near-dup structure repeats PER replica instead of every doc
  becoming a 10-way near-dup cluster (which would inflate pair counts
  x45 and grade the dedup tier on a shape no real corpus has).
  n_chars is recomputed from the transformed text.
- embeddings: replica r's vectors are rotated by r positions —
  norm-preserving, decorrelates replicas so brute-force top-k doesn't
  degenerate into 10-way exact ties.

Output: /root/repo/.scale/sf1/*.parquet (gitignored; /root/testdata is
read-only). Deterministic — same input, same output.

Usage: python tools/gen_scale.py [src_sf_dir] [out_dir] [replicas]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_demo_spark.session import get_spark  # noqa: E402

OFF = 10**9

# table -> columns to offset by replica * OFF
KEY_OFFSETS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]


def replicate(df, key_cols, replicas):
    """explode(array(0..r-1)) — row-local fan-out, no upstream re-run."""
    rep = df.select(
        F.explode(F.array(*[F.lit(r) for r in range(replicas)])).alias("_r"), "*"
    )
    for c in key_cols:
        rep = rep.withColumn(c, F.col(c) + F.col("_r").cast("long") * F.lit(OFF))
    return rep


def transform_documents(rep):
    """Replica r>0: suffix every token with r (disjoint cross-replica
    shingles — the near-dup structure repeats per replica) and recompute
    n_chars from the transformed text. Expects the ``_r`` column."""
    return rep.withColumn(
        "text",
        F.when(F.col("_r") == 0, F.col("text")).otherwise(
            F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(F.lit("$1"), F.col("_r").cast("string")),
            )
        ),
    ).withColumn("n_chars", F.length("text").cast("long"))


def transform_embeddings(rep, dim):
    """Replica r's vectors rotated by ``r % dim`` positions (the shift
    wraps when replicas exceed the dimension — the 100x tier) with a
    sign flip on every second wrap band (``(r // dim) % 2``): both are
    norm-preserving, and together they keep all replicas < 2*dim
    pairwise-decorrelated. Expects the ``_r`` column."""
    rot = F.col("_r") % F.lit(dim)
    rotated = F.when(rot == 0, F.col("embedding")).otherwise(
        F.concat(
            F.slice("embedding", rot + 1, F.lit(dim) - rot),
            F.slice("embedding", F.lit(1), rot),
        )
    )
    return rep.withColumn(
        "embedding",
        F.when(
            (F.col("_r") / F.lit(dim)).cast("int") % 2 == 1,
            F.transform(rotated, lambda x: -x),
        ).otherwise(rotated),
    )


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf1"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(app_name="gen-scale")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    for t in FIXED:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(f"{t}: copied")

    for t, keys in KEY_OFFSETS.items():
        df = replicate(spark.read.parquet(f"{src}/{t}.parquet"), keys, replicas)
        if t == "documents":
            df = transform_documents(df)
        if t == "embeddings":
            dim = len(
                spark.read.parquet(f"{src}/{t}.parquet").first()["embedding"]
            )
            df = transform_embeddings(df, dim)
        df = df.drop("_r")
        df.repartition(max(2, replicas)).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
