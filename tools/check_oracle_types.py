"""Type-parity audit between Spark queries and their DuckDB oracles.

The driver's correctness gate hashes values after type conversion, so a
DuckDB HUGEINT (what DuckDB promotes SUM(BIGINT) to) against a Spark
BIGINT can hash-mismatch even when the values are numerically equal
(CORRECTNESS_r02: 10 such rows). The local check_oracle.py normalizes
through str() and cannot see this class of bug.

This tool DESCRIBEs every oracle in DuckDB and compares column types to
the Spark result schema, flagging any pair that is not an exact logical
match (int64<->BIGINT, double<->DOUBLE, string<->VARCHAR, ...).

Usage: python tools/check_oracle_types.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb

# Spark simpleString -> acceptable DuckDB type names (exact parity only).
SPARK_TO_DUCK = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "tinyint": {"TINYINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "binary": {"BLOB"},
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    from kafka_streams_demo_spark import catalog
    from kafka_streams_demo_spark.session import get_spark

    spark = get_spark(app_name="check-oracle-types")
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = catalog.queries(), catalog.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            s_schema = {f.name: f.dataType.simpleString()
                        for f in fn(spark, sf_dir).schema.fields}
        except Exception as e:
            print(f"ERR  {name}: spark: {e}")
            bad.append(name)
            continue
        try:
            d_schema = {r[0]: r[1] for r in
                        con.execute(f"DESCRIBE ({oracles[name]})").fetchall()}
        except Exception as e:
            print(f"ERR  {name}: duckdb: {e}")
            bad.append(name)
            continue

        problems = []
        for col, styp in sorted(s_schema.items()):
            dtyp = d_schema.get(col)
            if dtyp is None:
                problems.append(f"{col}: missing in oracle")
                continue
            ok = SPARK_TO_DUCK.get(styp)
            if ok is None:
                # complex type: normalize DuckDB "T[]" to spark "array<t>"
                d_norm = dtyp.strip()
                while d_norm.endswith("[]"):
                    d_norm = f"array<{d_norm[:-2]}>"
                d_norm = d_norm.lower().replace("varchar", "string")
                if d_norm != styp:
                    problems.append(f"{col}: spark={styp} duckdb={dtyp}")
            elif dtyp.upper() not in ok:
                problems.append(f"{col}: spark={styp} duckdb={dtyp}")
        for col in d_schema:
            if col not in s_schema:
                problems.append(f"{col}: oracle-only column")

        if problems:
            print(f"MISMATCH {name}: " + "; ".join(problems))
            bad.append(name)

    spark.stop()
    print(f"\n{len(bad)} queries with type mismatches" if bad else "\nall types match")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
