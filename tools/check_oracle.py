"""Local replica of the driver's correctness gate.

Runs every ``catalog.queries()`` entry on Spark and its ``oracle_sql()``
on DuckDB over the same parquet (default sf0.01), then compares:
row count, column names/order-insensitive schema, and an
order-insensitive value hash over columns sorted by name.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    from kafka_streams_demo_spark import catalog
    from kafka_streams_demo_spark.session import get_spark

    spark = get_spark(app_name="check-oracle")
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

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
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={len(s_rows)} (no oracle — rows-only check)")
            continue
        try:
            cur = con.execute(oracles[name])
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            continue

        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount: spark={len(s_rows)} duckdb={len(d_rows)}")
        if not problems:
            h1, h2 = canonical(s_rows, s_cols), canonical(d_rows, d_cols)
            if h1 != h2:
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
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"PASS {name}: rows={len(s_rows)}")

    spark.stop()
    print(f"\n{len(failed)} failed" if failed else "\nall passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
