"""SparkSession factory with scale-oriented defaults.

The reference's whole runtime-tuning surface is one flag
(``TOPOLOGY_OPTIMIZATION=OPTIMIZE``, reference ConfigHelper.scala:24); in
Spark the equivalent optimizations (shuffle reuse/merge, operator fusion)
are Catalyst built-ins. What we DO tune is the physical execution surface
that matters at 100 TB:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting,
  broadcast demotion/promotion based on observed sizes)
- shuffle partition count sized from the env, so local[32] tests don't
  inherit the 200 default while a real cluster can override
- Arrow on, so any pandas-UDF boundary is batched, never per-row
- parquet pushdown/pruning left on (defaults) — plans/explain.py asserts it
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "kafka-streams-demo-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    On a real cluster, pass ``master=None`` with a spark-submit-provided
    master; locally defaults to ``local[$SPARK_GRAFT_CPUS]``.
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_CPUS

    # Python workers must be able to import this package regardless of the
    # driver's cwd (pandas-UDF closures may reference it): export the repo
    # root on PYTHONPATH before the JVM / worker daemon launches.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    py_path = os.environ.get("PYTHONPATH", "")
    if repo_root not in py_path.split(os.pathsep):
        os.environ["PYTHONPATH"] = repo_root + (os.pathsep + py_path if py_path else "")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Filter-inference rules synthesize isnotnull/size>0 predicates from
        # join keys and explode()s, and predicate pushdown then substitutes
        # the FULL defining expression through projections — for HOF-heavy
        # columns (shingle/token arrays) that re-evaluates the whole
        # interpreted expression chain once more per row (measured 4-7× on
        # the dedup family: ngram-jaccard 16s→3.9s at sf0.1). Our sources
        # declare explicit schemas with no null keys, so the inferred
        # predicates prune nothing here.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromConstraints,"
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Write timestamps as INT64 micros, not the legacy INT96: INT96
        # columns carry NO min/max statistics, which silently disables
        # row-group skipping for every time-range predicate over data we
        # write (verified by test_range_clustered_write_tightens_rowgroup_stats).
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # At 100 TB scale: bounded scan-task size; 128m is the sweet spot for
        # parquet row-group alignment.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # Split small scans across the cluster even when files < 128m —
        # harmless at 100 TB (scan count dominated by maxPartitionBytes),
        # keeps all cores busy at small SF.
        .config("spark.sql.files.minPartitionNum", str(2 * DEFAULT_CPUS))
        # Broadcast threshold: dimension tables (region/nation/supplier) stay
        # broadcast even at sf100; AQE can still demote at runtime.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # static config — must be set before the session exists; bucketed
        # tables (sources/bucketing.py) land here via saveAsTable
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE",
                os.path.join(tempfile.gettempdir(), "spark-graft-warehouse"),
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
