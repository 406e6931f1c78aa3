"""sf0.001 oracle parity for the analytics/extension batch (the driver
gate runs the same comparison at sf0.01; this keeps plain pytest
self-contained). Exact row-set equality after stringify-normalization."""

from __future__ import annotations

import duckdb
import pytest

from kafka_streams_demo_spark import catalog

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

NEW_QUERIES = [
    "running_sum_per_user",
    "top3_orders_per_cust",
    "rollup_revenue",
    "cube_status_priority",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q17_small_quantity_revenue",
    "percentile_value_by_type",
    "histogram_event_values",
    "sample_split_train",
    "orders_high_value_semi",
    "customers_without_orders_anti",
    "pivot_priority_by_nation",
    "sessionize_gap",
    "set_ops_all_multiset",
    "repetition_ratio",
    "contamination_check",
    "q4_late_ship_priority",
    "q14_promo_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "pii_scan",
    "interarrival_stats",
    "funnel_signup_click_purchase",
    "q7_nation_volume",
    "tfidf_top_terms",
    "embedding_quantize_int8",
    "q8_market_share",
    "q13_custdist",
    "q15_top_supplier",
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q11_important_parts",
    "q12_priority_by_class",
    "q16_supplier_cnt",
    "q20_excess_shippers",
    "q21_waiting_supplier",
    "q22_idle_balances",
    "dedup_clusters",
    "sample_per_source",
    "vocab_token_freq",
    "corr_qty_price",
    "winnow_fingerprints",
    "user_journey_paths",
    "daily_rollup_gapfill",
    "ann_topk_int8",
    "corpus_profile",
    "pii_redact",
    "pipeline_keeplist",
    "funnel_conversion",
    "retention_cohorts",
    "ngram_span_dedup",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_matches_oracle_at_sf0001(spark, ddb, name):
    sdf = catalog.queries()[name](spark, SF_DIR)
    cur = ddb.execute(catalog.oracle_sql()[name])
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()
    s_rows = [tuple(r) for r in sdf.collect()]
    assert sorted(sdf.columns) == sorted(d_cols)
    assert _norm(s_rows, sdf.columns) == _norm(d_rows, d_cols), name


def test_approx_percentile_within_tolerance_of_exact(spark):
    """Sketch percentiles track the exact ones within 2% of the value
    range per event_type. The catalog entry is now the calibration shape
    (event_type, n, ok50, ok95 — oracled since r11), so the raw sketch
    values are asserted directly and the entry's rank-contract booleans
    must all hold."""
    from pyspark.sql import functions as F

    from kafka_streams_demo_spark.catalog._core import cents
    from kafka_streams_demo_spark.sources.registry import load_table

    ev = load_table(spark, "events", SF_DIR)
    approx = {
        r["event_type"]: (r["p50_c"], r["p95_c"])
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_percentile(cents(F.col("value")), F.lit(0.5), F.lit(10000)).alias("p50_c"),
            F.approx_percentile(cents(F.col("value")), F.lit(0.95), F.lit(10000)).alias("p95_c"),
        )
        .collect()
    }
    exact = {
        r["event_type"]: (r["p50_c"], r["p95_c"])
        for r in catalog.queries()["percentile_value_by_type"](spark, SF_DIR).collect()
    }
    assert approx.keys() == exact.keys()
    for et in exact:
        for a, e in zip(approx[et], exact[et]):
            assert abs(a - e) <= 0.02 * 49001 + 1, (et, a, e)  # value range ~490.01*100
    entry = catalog.queries()["approx_percentile_value"](spark, SF_DIR).collect()
    assert {r["event_type"] for r in entry} == exact.keys()
    for r in entry:
        assert r["ok50"] and r["ok95"], r
