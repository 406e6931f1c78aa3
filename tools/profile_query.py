"""Per-query profiling for the optimization rounds.

Times named catalog entries (noop sink, per-query min over N passes, same
methodology as bench.py) and optionally dumps `.explain("formatted")` to
plans/<plans-dir>/<name>_<tag>.txt.

Usage:
  python tools/profile_query.py [--sf SF_DIR] [--passes N] [--plans TAG] q1 q2 ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--plans", default=None, help="dump plans with this tag (before/after)")
    ap.add_argument("--plans-dir", default="r14", help="subdir of plans/ for dumps")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from kafka_streams_demo_spark import catalog
    from kafka_streams_demo_spark.session import get_spark

    spark = get_spark(app_name="profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()

    # warmup: codegen + parquet footers + Python worker daemon (bench.py)
    qs["count_by_key"](spark, args.sf).write.format("noop").mode("overwrite").save()
    import pandas as pd  # noqa: F401

    def _noop(it):
        for pdf in it:
            yield pdf

    spark.range(32).mapInPandas(_noop, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.plans_dir)
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, float] = {}
    for name in args.names:
        if name not in qs:
            print(f"{name}: NOT IN CATALOG")
            continue
        if args.plans:
            df = qs[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{args.plans}.txt"), "w") as f:
                f.write(plan)
        best = None
        per_pass = []
        if args.passes <= 0:
            print(f"{name}: plan dumped")
            continue
        for _ in range(args.passes):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.monotonic()
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            per_pass.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        results[name] = round(best, 3)
        print(f"{name}: {results[name]}  passes={per_pass}")
    print("TOTAL:", round(sum(results.values()), 3))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
