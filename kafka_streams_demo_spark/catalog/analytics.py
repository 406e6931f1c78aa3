"""TPC-H-shaped analytics headliners.

Split from the single-module catalog in round 10 (VERDICT r9 task 7) —
entries and oracles are byte-identical to their pre-split form; the
registry lives in ``catalog._core`` and the driver contract in
``catalog/__init__.py``. Registration order is preserved by the
``__init__`` import sequence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from kafka_streams_demo_spark.catalog._core import (  # noqa: F401
    ORACLES,
    QUERIES,
    _events_stream,
    cents,
    register,
)
from kafka_streams_demo_spark.operators.kstream import KStream  # noqa: F401
from kafka_streams_demo_spark.operators.ktable import KTable  # noqa: F401
from kafka_streams_demo_spark.operators.windows import (  # noqa: F401
    JoinWindows,
    SessionWindows,
    TimeWindows,
)
from kafka_streams_demo_spark.sources.registry import load_table  # noqa: F401

# ---------------------------------------------------------------------------
# TPC-H-shaped analytics (bench headliners; same operator inventory at scale)
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    "SELECT l_returnflag, l_linestatus, "
    "SUM(CAST(ROUND(l_quantity*100, 0) AS BIGINT)) AS sum_qty_c, "
    "SUM(CAST(ROUND(l_extendedprice*100, 0) AS BIGINT)) AS sum_base_c, "
    "SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100, 0) AS BIGINT)) AS sum_disc_c, "
    "SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*(1+l_tax)*100, 0) AS BIGINT)) AS sum_charge_c, "
    "count(*) AS count_order "
    "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
    "GROUP BY l_returnflag, l_linestatus",
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-heavy grouped agg. Filter + column pruning push
    to the parquet scan; 6 aggregates in one hash-agg pass, map-side combine
    → the shuffle carries ~|groups| rows regardless of input size."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents(F.col("l_quantity"))).alias("sum_qty_c"),
            F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_c"),
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sum_disc_c"),
            F.sum(
                cents(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")))
            ).alias("sum_charge_c"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    "SELECT l.l_orderkey, SUM(CAST(ROUND(l.l_extendedprice*(1-l.l_discount)*100, 0) AS BIGINT)) AS revenue_c, "
    "epoch_us(o.o_orderdate) AS orderdate_us, o.o_orderpriority "
    "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1998-01-01' "
    "AND l.l_shipdate > TIMESTAMP '1998-01-01' "
    "GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority "
    "ORDER BY revenue_c DESC, l_orderkey LIMIT 10",
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter → fact join → top-k. customer
    broadcasts; the orders⋈lineitem join shuffles on orderkey; global top-10
    via TakeOrderedAndProject (no full sort)."""
    c = load_table(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_c"))
        .select(
            "l_orderkey",
            "revenue_c",
            F.unix_micros("o_orderdate").alias("orderdate_us"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue_c"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_regional_revenue",
    "SELECT n.n_name, SUM(CAST(ROUND(l.l_extendedprice*(1-l.l_discount)*100, 0) AS BIGINT)) AS revenue_c "
    "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey "
    "JOIN nation n ON s.s_nationkey = n.n_nationkey "
    "JOIN region r ON n.n_regionkey = r.r_regionkey "
    "WHERE r.r_name = 'ASIA' GROUP BY n.n_name",
)
def q5_regional_revenue(spark, sf_dir):
    """TPC-H Q5 shape: 6-table star join. All dims (customer/supplier/nation/
    region) broadcast; only orders⋈lineitem shuffles — one exchange on the
    fact key at any scale."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    l = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (l["l_suppkey"] == s["s_suppkey"]) & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_c"))
    )


@register(
    "orders_per_nation",
    "SELECT n.n_name AS key, count(*) AS orders_cnt, "
    "SUM(CAST(ROUND(o.o_totalprice*100, 0) AS BIGINT)) AS total_c "
    "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
    "JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY 1",
)
def orders_per_nation(spark, sf_dir):
    """Star-join rollup: orders enriched through two broadcast dims, grouped
    by nation — the stream-table-join pattern over the TPC-H tables."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("key"))
        .agg(
            F.count(F.lit(1)).alias("orders_cnt"),
            F.sum(cents(F.col("o_totalprice"))).alias("total_c"),
        )
    )


