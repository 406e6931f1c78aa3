"""Spark↔DuckDB output-type parity for every oracle-gated query.

CORRECTNESS_r02 lesson: DuckDB promotes SUM(BIGINT) to HUGEINT and
row_number() to BIGINT, so a value-identical result can still hash-fail a
type-aware comparator. tools/check_oracle_types.py found 36 affected
queries; catalog.ORACLE_CASTS pins them. This test keeps the audit green
as queries are added."""

import duckdb
import pytest

from kafka_streams_demo_spark import catalog

SF = "/root/testdata/sf0.001"

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


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _norm_duck(dtyp: str, styp: str) -> bool:
    ok = SPARK_TO_DUCK.get(styp)
    if ok is not None:
        return dtyp.upper() in ok
    d = dtyp.strip()
    while d.endswith("[]"):
        d = f"array<{d[:-2]}>"
    return d.lower().replace("varchar", "string") == styp


def test_every_oracle_matches_spark_output_types(spark, duck):
    qs, oracles = catalog.queries(), catalog.oracle_sql()
    problems = []
    for name, fn in qs.items():
        if name not in oracles:
            continue
        s_schema = {f.name: f.dataType.simpleString()
                    for f in fn(spark, SF).schema.fields}
        d_schema = {r[0]: r[1] for r in
                    duck.execute(f"DESCRIBE ({oracles[name]})").fetchall()}
        for col, styp in s_schema.items():
            dtyp = d_schema.get(col)
            if dtyp is None:
                problems.append(f"{name}.{col}: missing in oracle")
            elif not _norm_duck(dtyp, styp):
                problems.append(f"{name}.{col}: spark={styp} duckdb={dtyp}")
        problems += [f"{name}.{c}: oracle-only column"
                     for c in d_schema if c not in s_schema]
    assert not problems, "\n".join(problems)


def test_driver_window_integrity():
    """The external gate samples the first 50 queries: DRIVER_PRIORITY must
    be exactly 50 unique registered names, every one with a SQL oracle
    (rows-only entries do not belong in the curated window), so a rotation
    typo can never silently shrink or weaken the gate."""
    from kafka_streams_demo_spark import catalog

    names = catalog.DRIVER_PRIORITY
    assert len(names) == 50
    assert len(set(names)) == 50
    for n in names:
        assert n in catalog.QUERIES, f"{n} not registered"
        assert n in catalog.ORACLES, f"{n} has no oracle"
    assert list(catalog.queries())[:50] == names


def test_catalog_summary_counts_consistent():
    from kafka_streams_demo_spark import catalog

    s = catalog.summary()
    assert s["queries"] == len(catalog.QUERIES)
    assert s["with_oracle"] + len(s["rows_only"]) == s["queries"]
    assert len(s["driver_window"]) == 50
    # every rows-only entry is documented as such (not in the gate window)
    assert not set(s["rows_only"]) & set(s["driver_window"])


def test_readme_counts_match_catalog():
    """ADVICE r6: README's registered/oracled counts must track HEAD —
    derive them from the catalog instead of trusting the prose."""
    import re
    from pathlib import Path

    text = Path(__file__).resolve().parent.parent.joinpath("README.md").read_text()
    m = re.search(r"\((\d+) registered queries[\s\S]{0,120}?(\d+) with DuckDB oracles", text)
    assert m, "README query-count sentence not found"
    assert int(m.group(1)) == len(catalog.QUERIES)
    assert int(m.group(2)) == len(catalog.ORACLES)
