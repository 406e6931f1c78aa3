"""As-of join semantics (operators/asof.py) on crafted frames, plus the
plan property that makes it scale: merge formulation, no nested loop."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from kafka_streams_demo_spark.operators.asof import asof_join
from kafka_streams_demo_spark.plans.explain import audit


def ts(s: int):
    return datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", ts(10)),   # matches r at ts 8 (latest <= 10)
            (2, "u1", ts(5)),    # matches r at ts 5 (equal ts included)
            (3, "u1", ts(2)),    # no right row yet -> nulls
            (4, "u2", ts(30)),   # tie at ts 20: max tie_break (rid 7) wins
            (5, "u3", ts(30)),   # key with no right rows at all -> nulls
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", 5, ts(5), 50.0),
            ("u1", 6, ts(8), 80.0),
            ("u2", 7, ts(20), 77.0),
            ("u2", 8, ts(20), 88.0),
        ],
        "k string, rid long, rts timestamp, rv double",
    )
    # tie rows deliberately listed with the winner (rid 8) NOT last in
    # input order: deterministic tie-break must come from the column, not
    # partition order. rid 8 > 7 -> rid 8 wins.
    return left, right


def test_asof_basic(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, left_on="k", right_on="k",
        left_ts="ts", right_ts="rts", tie_break="rid",
    )
    rows = {r["id"]: (r["rid"], r["rv"]) for r in out.collect()}
    assert rows == {
        1: (6, 80.0),
        2: (5, 50.0),
        3: (None, None),
        4: (8, 88.0),
        5: (None, None),
    }
    assert out.columns == ["id", "k", "ts", "rid", "rts", "rv"]


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, left_on="k", right_on="k",
        left_ts="ts", right_ts="rts", tie_break="rid",
        tolerance="3 seconds",
    )
    rows = {r["id"]: r["rid"] for r in out.collect()}
    # id=1 (ts 10): latest match ts 8 within 3s -> kept.
    # id=4 (ts 30): latest match ts 20, 10s stale -> nulled, row kept.
    assert rows == {1: 6, 2: 5, 3: None, 4: None, 5: None}


def test_asof_column_collision_raises(spark):
    left, right = _frames(spark)
    try:
        asof_join(
            left, right.withColumnRenamed("rts", "ts"),
            left_on="k", right_on="k", left_ts="ts", right_ts="ts",
        )
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "collision" in str(e)


def test_asof_plan_is_merge_not_nested_loop(spark):
    """The scale property: one shuffle on the key, a sort, and NO
    cartesian/broadcast-nested-loop node (what a naive range-join
    formulation degenerates to)."""
    left, right = _frames(spark)
    out = asof_join(
        left, right, left_on="k", right_on="k",
        left_ts="ts", right_ts="rts", tie_break="rid",
    )
    a = audit(out)
    assert a.nested_loop_joins == 0
    assert a.joins == 0  # merge formulation: union + window, no join node
    assert a.sorts >= 1


def test_asof_catalog_matches_duckdb_at_sf0001(spark):
    """End-to-end parity of the registered query vs its oracle at sf0.001
    (the driver gate runs sf0.01; this is the fast local guard)."""
    import duckdb

    from kafka_streams_demo_spark import catalog

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    for name in ("asof_join_purchase", "asof_join_purchase_1h"):
        sdf = catalog.queries()[name](spark, sf_dir)
        s_rows = sorted(tuple(r) for r in sdf.collect())
        d_rows = sorted(tuple(r) for r in con.execute(catalog.oracle_sql()[name]).fetchall())
        assert len(s_rows) == len(d_rows)
        assert s_rows == d_rows, f"{name}: first diff {next((a, b) for a, b in zip(s_rows, d_rows) if a != b)}"


def test_kstream_asof_join_fluent(spark):
    """The fluent KStream surface: enrich each record with the other
    stream's latest value at-or-before it."""
    from pyspark.sql import functions as F

    from kafka_streams_demo_spark import KStream

    left = spark.createDataFrame(
        [("u1", 100, ts(10), 1), ("u1", 200, ts(4), 2), ("u2", 300, ts(9), 3)],
        "key string, value long, timestamp timestamp, offset long",
    )
    right = spark.createDataFrame(
        [("u1", 7, ts(5), 1), ("u1", 9, ts(8), 2)],
        "key string, value long, timestamp timestamp, offset long",
    )
    out = KStream(left).asof_join(
        KStream(right), lambda v, rv: v + F.coalesce(rv, F.lit(0))
    )
    got = {r["offset"]: r["value"] for r in out.to_df().collect()}
    # u1@10 matches rv=9 (ts 8); u1@4 has no match (first right at 5); u2 none
    assert got == {1: 109, 2: 200, 3: 300}
