"""Local replica of the driver's correctness gate.

Runs every ``catalog.queries()`` entry on Spark and its ``oracle_sql()``
on DuckDB over the same parquet (default sf0.01), then compares:
row count, column names/order-insensitive schema, and an
order-insensitive value hash over columns sorted by name.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
       python tools/check_oracle.py --json OUT.json [sf_dir] [query ...]

With --json, per-query results are also written in the driver's
CORRECTNESS_r{N}.json row shape, so the repo can commit a full-catalog
correctness artifact (the driver's own gate samples the first 50).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import duckdb


def canonical(rows: list[tuple], colnames: list[str]) -> str:
    """Order-insensitive canonical digest: sort columns by name, normalize
    values, sort rows, hash."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            return f"{v:.6f}"
        if isinstance(v, bool):
            return str(int(v))
        return str(v)

    lines = sorted("|".join(norm(row[i]) for i in order) for row in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    report: dict[str, dict] = {}

    sys.path.insert(0, "/root/repo")
    from kafka_streams_demo_spark import catalog
    from kafka_streams_demo_spark.session import get_spark

    spark = get_spark(app_name="check-oracle")
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            # Spark-written table (directory of part files) — e.g. the
            # r12 .scale tiers; the driver fixtures are single files
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    qs, oracles = catalog.queries(), catalog.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": None,
                            "oracle_rows": None, "err": f"spark: {e}"}
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={len(s_rows)} (no oracle — rows-only check)")
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": len(s_rows),
                            "oracle_rows": None, "err": "no_oracle"}
            continue
        try:
            cur = con.execute(oracles[name])
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": len(s_rows),
                            "oracle_rows": None, "err": f"duckdb: {e}"}
            continue

        schema_ok = sorted(s_cols) == sorted(d_cols)
        rows_ok = len(s_rows) == len(d_rows)
        hash_ok = False
        problems = []
        if not schema_ok:
            problems.append(f"schema: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        if not rows_ok:
            problems.append(f"rowcount: spark={len(s_rows)} duckdb={len(d_rows)}")
        if not problems:
            h1, h2 = canonical(s_rows, s_cols), canonical(d_rows, d_cols)
            hash_ok = h1 == h2
            if not hash_ok:
                problems.append(f"valuehash: spark={h1} duckdb={h2}")
                # show a sample diff
                s_set = {tuple(str(x) for x in r) for r in s_rows}
                d_set = {tuple(str(x) for x in r) for r in d_rows}
                only_s = list(s_set - d_set)[:3]
                only_d = list(d_set - s_set)[:3]
                if only_s:
                    problems.append(f"  spark-only sample: {only_s}")
                if only_d:
                    problems.append(f"  duckdb-only sample: {only_d}")
        report[name] = {"rows_match": rows_ok, "schema_match": schema_ok,
                        "hash_match": hash_ok, "spark_rows": len(s_rows),
                        "oracle_rows": len(d_rows), "err": None}
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"PASS {name}: rows={len(s_rows)}")

    spark.stop()
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_out} ({len(report)} queries)")
    print(f"\n{len(failed)} failed" if failed else "\nall passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
