"""Skewed-join crossover measurement (VERDICT r11 task 4).

Times three strategies on the closed-form power-law JOIN-KEY fixture
(catalog/llm.py:_skewed_facts — key 0 holds ~17.9% of all rows):

- naive   : sort-merge join, AQE skew split disabled
- aqe     : sort-merge join, AQE skew split enabled with thresholds
            lowered to bench scale (the default 256 MB partition
            threshold never triggers on MBs of data — lowering it
            emulates what a 100 TB run's genuinely-oversized hot
            partition would trigger natively)
- salted  : functions/skew.py:salted_join (32 buckets), AQE skew off —
            the a-priori bound that needs no runtime re-plan

The ``--replicas N`` tier replays lineitem N times with disjoint
orderkey ranges (explode(array), row-local — no upstream re-execution),
so each replica draws fresh md5 uniforms: same skew SHAPE, N× the rows
(replicas=10 at sf0.1 ≈ the sf1 facts volume). AQE skew-split detection
is read from the executed plan's AQEShuffleRead nodes.

Usage: python tools/bench_skew.py [sf_dir] [--replicas N]
Prints one JSON line per (scenario, pass) plus a summary line LAST.

Results recorded in BASELINE.md r12.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_demo_spark.session import get_spark  # noqa: E402
from kafka_streams_demo_spark.sources.registry import load_table  # noqa: E402


def facts(spark, sf_dir: str, replicas: int):
    """The CATALOG's skewed-facts derivation (the measured plan must be
    the oracle-gated plan — catalog/llm.py:_skewed_facts is imported,
    not duplicated), with an optional replica fan-out: lineitem replayed
    with disjoint orderkey ranges so each replica draws fresh md5
    uniforms — same skew shape, N× the rows."""
    from kafka_streams_demo_spark.catalog.llm import _skewed_facts

    if replicas <= 1:
        return _skewed_facts(spark, sf_dir)
    li = load_table(spark, "lineitem", sf_dir).select(
        F.explode(F.array(*[F.lit(r) for r in range(replicas)])).alias("_r"),
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
    ).select(
        (F.col("l_orderkey") + F.col("_r").cast("long") * F.lit(10**9)).alias(
            "l_orderkey"
        ),
        "l_linenumber",
        "l_quantity",
    )
    # replica branch re-derives the key with the SAME closed form as
    # _skewed_facts (which reads lineitem from sf_dir and can't see the
    # replicated frame); parity of the replicas=1 path with the catalog
    # entry is structural (it IS the catalog function)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("l_orderkey").cast("string"),
                    F.lit(":"),
                    F.col("l_linenumber").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    return li.select(
        F.floor(F.lit(1000.0) * u * u * u * u).cast("long").alias("skew_key"),
        "l_quantity",
    )


def dims(spark):
    from kafka_streams_demo_spark.catalog.llm import _skew_dims

    return _skew_dims(spark)


def rollup(joined):
    from kafka_streams_demo_spark.catalog.llm import _skew_rollup

    return _skew_rollup(joined)


def materialized_facts(spark, sf_dir: str, replicas: int, n_files: int = 64):
    """The skewed facts written to a temp parquet in ``n_files`` files,
    read back. TWO reasons this is the honest shape: (1) all scenarios
    then time the JOIN, not the md5 key derivation; (2) AQE's skew split
    operates on MAPPER blocks — the driver's single-row-group parquet
    yields ONE mapper, whose one block per reduce partition is
    unsplittable, so OptimizeSkewedJoin silently declines no matter the
    thresholds (found empirically: mapStats showed top=686 KB vs median
    84 KB — flagged skewed, yet no split). A 100 TB input has thousands
    of mappers; n_files=64 emulates that."""
    import tempfile

    path = tempfile.mkdtemp(prefix="bench_skew_facts_")
    facts(spark, sf_dir, replicas).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(path)
    return spark.read.parquet(path)


def build_from(spark, f, strategy: str):
    d = dims(spark).hint("merge")
    if strategy == "salted":
        from kafka_streams_demo_spark.functions.skew import salted_join

        return rollup(salted_join(f, d, "skew_key", "dim_key", buckets=32))
    return rollup(f.join(d, F.col("skew_key") == F.col("dim_key")))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    replicas = 1
    for i, a in enumerate(sys.argv[1:]):
        if a == "--replicas":
            replicas = int(sys.argv[1:][i + 1])
    spark = get_spark(app_name="bench-skew")
    spark.sparkContext.setLogLevel("ERROR")
    f = materialized_facts(spark, sf_dir, replicas)

    scenarios = {
        # (skewJoin.enabled, lowered thresholds, strategy)
        "naive": ("false", False, "plain"),
        "aqe": ("true", True, "plain"),
        "salted": ("false", False, "salted"),
    }
    summary: dict[str, dict] = {}
    for name, (skew_on, lower, strategy) in scenarios.items():
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_on)
        if lower:
            # emulate at-scale triggering: the hot partition is only
            # ~66 KB COMPRESSED at sf0.1 (125k rows of one repeated key
            # + doubles lz4-compress hard), vs 256 MB+ at 100 TB. 32k
            # is the empirical trigger point; the 1.2 factor scales
            # with the median so the replica tiers don't over-split.
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k"
            )
            spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k"
            )
        times = []
        skew_split = False
        for _ in range(3):
            spark.catalog.clearCache()
            df = build_from(spark, f, strategy)
            t0 = time.monotonic()
            # collect, not a noop write: the result is 10 rows, and only
            # an action on THIS DataFrame finalizes its own adaptive plan
            # (a write wraps the plan in a new QueryExecution, leaving
            # df's at isFinalPlan=false with no AQEShuffleRead markers)
            df.collect()
            times.append(round(time.monotonic() - t0, 3))
            plan = df._jdf.queryExecution().executedPlan().toString()
            skew_split = skew_split or "skewed" in plan.lower()
        if lower:
            # restore defaults for the next scenario
            spark.conf.unset(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
            )
            spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
            spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        summary[name] = {
            "sec_min": min(times),
            "passes": times,
            "aqe_skew_split_seen": skew_split,
        }
        print(json.dumps({"scenario": name, "replicas": replicas, **summary[name]}))
    print(
        json.dumps(
            {
                "metric": "skew_join_crossover",
                "sf_dir": sf_dir,
                "replicas": replicas,
                "summary": {k: v["sec_min"] for k, v in summary.items()},
                "aqe_split_seen": summary["aqe"]["aqe_skew_split_seen"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
