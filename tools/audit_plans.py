"""Catalog-wide physical-plan audit — the ".explain and iterate" loop
applied to EVERY registered entry, producing a committed artifact
(PLAN_AUDIT_r{N}.json) so plan regressions are diffable round-over-round.

For each catalog.queries() entry (built against sf0.01; plans are
analyzed, NOT executed), records the plans/explain.py audit counters and
two hazard flags:

- cartesian: a CartesianProduct node — never acceptable in this repo
  (the audit exits non-zero if any appear);
- bnlj: BroadcastNestedLoopJoin — acceptable ONLY for the sanctioned
  1-row-stats crossJoin pattern (corpus aggregates, quantile thresholds,
  N-row); the artifact lists every site so a reviewer can check new ones.

Usage: python tools/audit_plans.py [--json OUT.json] [sf_dir] [query ...]
(optional query names restrict the audit — e.g. the scale-tier subset
audited at .scale/sf10 for the decade-over-decade plan diff, r13)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    out_path = None
    if "--json" in args:
        i = args.index("--json")
        out_path = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from kafka_streams_demo_spark import catalog
    from kafka_streams_demo_spark.plans.explain import audit
    from kafka_streams_demo_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    cartesians: list[str] = []
    for name, fn in catalog.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            a = audit(df)
            row = {
                "exchanges": a.exchanges,
                "broadcast_joins": a.broadcast_joins,
                "sort_merge_joins": a.sort_merge_joins,
                # PlanAudit folds BNLJ into broadcast_joins; count the
                # node directly — the artifact wants BNLJ sites explicit
                "bnlj": a.plan.count("BroadcastNestedLoopJoin"),
                "python_evals": a.python_evals,
                "codegen_stages": a.codegen_stages,
                "cartesian": "CartesianProduct" in a.plan,
                "err": None,
            }
            if row["cartesian"]:
                cartesians.append(name)
        except Exception as exc:  # noqa: BLE001 — audit must cover the catalog
            row = {"err": f"{type(exc).__name__}: {exc}"[:200]}
        results[name] = row
        flag = " CARTESIAN!" if row.get("cartesian") else ""
        bn = row.get("bnlj") or 0
        print(f"{name}: exch={row.get('exchanges')} bnlj={bn}{flag}"
              if not row.get("err") else f"{name}: ERR {row['err']}")

    bnlj_sites = sorted(
        n for n, r in results.items() if (r.get("bnlj") or 0) > 0
    )
    summary = {
        "entries": len(results),
        "errors": sorted(n for n, r in results.items() if r.get("err")),
        "cartesians": cartesians,
        "bnlj_sites": bnlj_sites,
    }
    print(json.dumps(summary))
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"summary": summary, "plans": results}, f, indent=1)
    spark.stop()
    return 1 if cartesians or summary["errors"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
