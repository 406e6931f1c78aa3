"""Scale tooling: bucketed co-located joins (no Exchange) and skew salting."""

import pytest
from pyspark.sql import functions as F

from kafka_streams_demo_spark.functions.skew import salted_count, with_salt
from kafka_streams_demo_spark.plans.explain import audit
from kafka_streams_demo_spark.sources.bucketing import read_table, write_bucketed
from kafka_streams_demo_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Both sides bucketed on the join key with equal bucket counts → the
    sort-merge join reads co-located buckets, zero shuffles in the plan.
    This is the fact⋈fact layout for 100 TB (vs 2 full-table Exchanges)."""
    o = load_table(spark, "orders", SF)
    l = load_table(spark, "lineitem", SF)
    write_bucketed(o, "orders_b", ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"])
    write_bucketed(l, "lineitem_b", ["l_orderkey"], num_buckets=8, sort_cols=["l_orderkey"])
    bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # sf0.001 fits under the broadcast threshold, which would bypass the
    # bucketed layout entirely — force the shuffle-family join the layout
    # is designed for (at real scale neither fact side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ob, lb = read_table(spark, "orders_b"), read_table(spark, "lineitem_b")
        joined = lb.join(ob, lb["l_orderkey"] == ob["o_orderkey"]).groupBy(
            "o_orderstatus"
        ).agg(F.count(F.lit(1)).alias("n"))
        a = audit(joined)
        # the join itself must not shuffle; only the tiny post-join agg may
        assert a.sort_merge_joins + a.shuffled_hash_joins >= 1, a.plan
        assert a.exchanges <= 1, f"bucketed join still shuffles:\n{a.plan}"
        # correctness: same result as the unbucketed join
        plain = (
            l.join(o, l["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_salted_count_matches_plain_count_under_skew(spark):
    """90%-hot-key input: salted two-phase count equals the plain count and
    phase 1 spreads the hot key across salt buckets."""
    rows = [("hot", i) for i in range(900)] + [(f"k{i}", i) for i in range(100)]
    df = spark.createDataFrame(rows, "key string, v long")
    got = {r["key"]: r["value"] for r in salted_count(df, "key", buckets=8).collect()}
    expected = {r["key"]: r["count"] for r in df.groupBy("key").count().collect()}
    assert got == expected
    # the salt actually spreads: the hot key occupies >1 salt bucket
    spread = (
        with_salt(df, 8).filter(F.col("key") == "hot").select("_salt").distinct().count()
    )
    assert spread > 1


def test_partitioned_layout_prunes_at_scan(spark, tmp_path):
    """ANN corpus written partitioned by IVF cell: a probe for 2 cells must
    prune at the directory level (PartitionFilters on the scan) and read
    exactly those cells' rows."""
    from kafka_streams_demo_spark.functions.similarity import ivf_assign, ivf_centroids
    from kafka_streams_demo_spark.sources.layout import read_cells, write_partitioned
    from kafka_streams_demo_spark.sources.registry import load_table

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    cents = ivf_centroids(emb)
    assigned = ivf_assign(emb, cents, n=1)
    path = str(tmp_path / "corpus_by_cell")
    write_partitioned(assigned, path, "cell")

    probe = read_cells(spark, path, "cell", [0, 1])
    a = audit(probe)
    assert a.partition_filters, f"no PartitionFilters on the probe scan:\n{a.plan}"
    assert "cell" in " ".join(a.partition_filters)
    # correctness: pruned read == full read filtered
    full = spark.read.parquet(path)
    assert probe.count() == full.filter(F.col("cell").isin([0, 1])).count()
    assert probe.count() > 0


def test_range_clustered_write_tightens_rowgroup_stats(spark, tmp_path):
    """Range-clustered lineitem: per-row-group shipdate spans shrink to a
    fraction of the global span (the stats parquet skipping feeds on),
    and a range filter still pushes to the scan."""
    import glob

    import pyarrow.parquet as pq

    from kafka_streams_demo_spark.sources.layout import write_range_clustered
    from kafka_streams_demo_spark.sources.registry import load_table

    li = load_table(spark, "lineitem", "/root/testdata/sf0.01").select(
        "l_orderkey", "l_shipdate"
    )
    plain, clustered = str(tmp_path / "plain"), str(tmp_path / "clustered")
    li.write.parquet(plain)
    write_range_clustered(li, clustered, "l_shipdate", files=8)

    def spans(path):
        out = []
        for f in glob.glob(f"{path}/*.parquet"):
            pf = pq.ParquetFile(f)
            idx = pf.schema_arrow.names.index("l_shipdate")
            for rg in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(rg).column(idx).statistics
                out.append((st.max - st.min).total_seconds())
        return out

    p, c = spans(plain), spans(clustered)
    assert p and c
    global_span = max(max(p), max(c))
    assert sum(c) / len(c) < 0.35 * global_span, (sum(c) / len(c), global_span)

    got = spark.read.parquet(clustered).filter(
        F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    a = audit(got)
    assert any("l_shipdate" in pf for pf in a.pushed_filters), a.pushed_filters
    expect = li.filter(F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp")).count()
    assert got.count() == expect


def test_salted_join_matches_plain_join_under_skew(spark):
    """90%-hot-key left side: salted join returns exactly the plain join's
    multiset, and the hot key's rows really spread across salt buckets."""
    from kafka_streams_demo_spark.functions.skew import salted_join, with_salt

    left = spark.createDataFrame(
        [("hot", i) for i in range(400)] + [(f"k{i}", i) for i in range(50)],
        "key string, lv long",
    )
    right = spark.createDataFrame(
        [("hot", 1), ("k1", 2), ("k2", 3), ("zzz", 9)], "rkey string, rv long"
    )
    got = sorted(
        map(tuple, salted_join(left, right, "key", "rkey", buckets=8).collect())
    )
    plain = sorted(
        map(tuple, left.join(right, left["key"] == right["rkey"]).collect())
    )
    assert got == plain and len(got) == 402
    spread = (
        with_salt(left, 8).filter(F.col("key") == "hot").select("_salt").distinct().count()
    )
    assert spread > 1


def test_zorder_write_tightens_both_dims(spark, tmp_path):
    """Z-order vs single-column range clustering on events(ts, value):
    clustering on ts alone leaves value's per-row-group span wide (~75%
    of global measured); the Morton interleave must bring the mean span
    of BOTH dims under 50% (measured: ts 39%, value 30% — each dim
    trades locality for the other's skipping), and data must round-trip
    exactly."""
    import glob

    import pyarrow.parquet as pq

    from kafka_streams_demo_spark.sources.layout import (
        write_range_clustered,
        write_zorder_clustered,
    )
    from kafka_streams_demo_spark.sources.registry import load_table

    ev = load_table(spark, "events", "/root/testdata/sf0.01").select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    lo_ts, hi_ts, lo_v, hi_v = ev.agg(
        F.min("ts_us"), F.max("ts_us"), F.min("value"), F.max("value")
    ).first()
    ts_only, zord = str(tmp_path / "ts_only"), str(tmp_path / "zord")
    write_range_clustered(ev, ts_only, "ts_us", files=8)
    write_zorder_clustered(
        ev, zord, [("ts_us", lo_ts, hi_ts), ("value", lo_v, hi_v)], files=8
    )

    def mean_span(path, col):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            pf = pq.ParquetFile(f)
            idx = pf.schema_arrow.names.index(col)
            for rg in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(rg).column(idx).statistics
                spans.append(float(st.max - st.min))
        assert spans
        return sum(spans) / len(spans)

    g_ts, g_v = float(hi_ts - lo_ts), float(hi_v - lo_v)
    # baseline: ts-only clustering leaves value stats wide
    assert mean_span(ts_only, "value") > 0.6 * g_v
    assert mean_span(zord, "ts_us") < 0.5 * g_ts
    assert mean_span(zord, "value") < 0.5 * g_v
    # exact round-trip
    assert spark.read.parquet(zord).count() == ev.count()
    orig = sorted(r["event_id"] for r in ev.select("event_id").collect())
    back = sorted(r["event_id"] for r in spark.read.parquet(zord).select("event_id").collect())
    assert orig == back


def test_bucketed_running_sum_equals_global_scan(spark):
    """Two-phase prefix scan == plain per-key cumulative sum, including
    hot keys spanning many buckets and ties on the order column."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_streams_demo_spark.functions.skew import bucketed_running_sum

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, "hot" if i % 4 else "cold", (i * 7) % 100,
             t0 + dt.timedelta(minutes=i % 300)) for i in range(400)]
    df = spark.createDataFrame(rows, "rid long, k string, v long, ts timestamp")

    w = (Window.partitionBy("k").orderBy("ts", "rid")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    expected = {r["rid"]: r["run"] for r in
                df.select("rid", F.sum("v").over(w).alias("run")).collect()}
    got = {r["rid"]: r["running"] for r in bucketed_running_sum(
        df, key_col="k", val_col="v", order_cols=["ts", "rid"],
        bucket_col=F.date_trunc("hour", F.col("ts")),
    ).collect()}
    assert got == expected


def test_bucketed_sessionize_merges_chains_across_buckets(spark):
    """A single session spanning ~15 buckets must stitch back into ONE
    session through the connected-components chain merge; separated
    sessions stay separate; output equals the plain lag-chain formulation."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_streams_demo_spark.functions.skew import bucketed_sessionize

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # key "span": events every 50s for 1500s -> one session over ~15
    # buckets of 100s (gap 80s < bucket 100s; 50s spacing keeps it alive)
    rows += [(i, "span", t0 + dt.timedelta(seconds=50 * i)) for i in range(31)]
    # key "multi": three sessions separated by 500s silences
    for s in range(3):
        rows += [(100 + s * 10 + j, "multi",
                  t0 + dt.timedelta(seconds=s * 1000 + j * 30)) for j in range(4)]
    df = spark.createDataFrame(rows, "event_id long, user_id string, ts timestamp")

    got = {(r["user_id"], r["session_id"]): (r["n_events"], r["start_us"], r["end_us"])
           for r in bucketed_sessionize(
               df, key_col="user_id", ts_col="ts",
               order_cols=["ts", "event_id"], gap_s=80, bucket_s=100,
           ).collect()}

    # plain formulation as the model
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g = df.withColumn("new_sess", F.when(
        F.lag("ts").over(w).isNull()
        | ((F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")) > 80), 1
    ).otherwise(0))
    s = g.withColumn("session_id", F.sum("new_sess").over(wrun))
    expected = {(r["user_id"], r["session_id"]): (r["n_events"], r["start_us"], r["end_us"])
                for r in s.groupBy("user_id", "session_id").agg(
                    F.count(F.lit(1)).alias("n_events"),
                    F.unix_micros(F.min("ts")).alias("start_us"),
                    F.unix_micros(F.max("ts")).alias("end_us"),
                ).collect()}
    assert got == expected
    assert got[("span", 1)][0] == 31      # the chain stitched into one session
    assert len([k for k in got if k[0] == "multi"]) == 3


def test_salted_topk_per_key_exact_with_hot_key(spark):
    """Two-phase salted top-k == plain rank window, on a key holding 90%
    of all rows (the shape where the plain window serializes)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_streams_demo_spark.functions.skew import salted_topk_per_key

    rows = [(i, "hot" if i < 900 else f"cold{i % 7}", (i * 37) % 1000)
            for i in range(1000)]
    df = spark.createDataFrame(rows, "rid long, k string, score long")
    w = Window.partitionBy("k").orderBy(F.desc("score"), "rid")
    expected = {(r["k"], r["rn"]): r["rid"] for r in
                df.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= 3).collect()}
    got = {(r["k"], r["rn"]): r["rid"] for r in salted_topk_per_key(
        df, key_col="k", order_cols=[F.desc("score"), F.col("rid")],
        k=3, salt_cols=["rid"],
    ).collect()}
    assert got == expected


def _composite_spread(df, hot_filter, composite_cols, parts=8):
    """(distinct composite groups, distinct physical partitions) the hot
    key's rows occupy once hash-partitioned the way the variant's window
    Exchange partitions (hashpartitioning on the composite key) — the
    quantity that bounds the variant's parallelism on that key."""
    hot = df.filter(hot_filter)
    groups = hot.select(*composite_cols).distinct().count()
    parts_hit = (
        df.repartition(parts, *composite_cols)
        .filter(hot_filter)
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    return groups, parts_hit


def test_bucketed_running_sum_spreads_adversarial_hot_key(spark):
    """VERDICT r4 #6: 90% of rows on ONE key — the shape where the plain
    window serializes. The composite (key, hour-bucket) partitioning must
    spread that key across many groups AND many physical partitions, and
    the result must still equal the global scan."""
    import datetime as dt

    from pyspark.sql import Window

    from kafka_streams_demo_spark.functions.skew import bucketed_running_sum

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, "hot" if i < 900 else f"cold{i % 11}", (i * 7) % 100,
             t0 + dt.timedelta(minutes=i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "rid long, k string, v long, ts timestamp")

    bkt = F.date_trunc("hour", F.col("ts"))
    groups, parts_hit = _composite_spread(
        df, F.col("k") == "hot", [F.col("k"), bkt.alias("_b")]
    )
    assert groups >= 10, f"hot key spans only {groups} buckets"
    assert parts_hit >= 2, "hot key still lands in one physical partition"

    w = (Window.partitionBy("k").orderBy("ts", "rid")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    expected = {r["rid"]: r["run"] for r in
                df.select("rid", F.sum("v").over(w).alias("run")).collect()}
    got = {r["rid"]: r["running"] for r in bucketed_running_sum(
        df, key_col="k", val_col="v", order_cols=["ts", "rid"], bucket_col=bkt,
    ).collect()}
    assert got == expected


def test_bucketed_sessionize_spreads_adversarial_hot_key(spark):
    """90%-hot-key sessionize: the (key, time-bucket) composite must fan
    the hot key across groups/partitions; sessions still match the plain
    lag-chain formulation."""
    import datetime as dt

    from pyspark.sql import Window

    from kafka_streams_demo_spark.functions.skew import bucketed_sessionize

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, "hot", t0 + dt.timedelta(seconds=200 * i)) for i in range(900)]
    rows += [(10_000 + i, f"cold{i % 11}", t0 + dt.timedelta(seconds=37 * i))
             for i in range(100)]
    df = spark.createDataFrame(rows, "event_id long, user_id string, ts timestamp")

    groups, parts_hit = _composite_spread(
        df, F.col("user_id") == "hot",
        [F.col("user_id"), F.floor(F.col("ts").cast("long") / 600).alias("_b")],
    )
    assert groups >= 10 and parts_hit >= 2

    got = {(r["user_id"], r["session_id"]): r["n_events"]
           for r in bucketed_sessionize(
               df, key_col="user_id", ts_col="ts",
               order_cols=["ts", "event_id"], gap_s=100, bucket_s=600,
           ).collect()}
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = df.withColumn("new_sess", F.when(
        F.lag("ts").over(w).isNull()
        | ((F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")) > 100), 1
    ).otherwise(0)).withColumn("session_id", F.sum("new_sess").over(wrun))
    expected = {(r["user_id"], r["session_id"]): r["n_events"]
                for r in s.groupBy("user_id", "session_id")
                .agg(F.count(F.lit(1)).alias("n_events")).collect()}
    assert got == expected


def test_salted_topk_spreads_adversarial_hot_key(spark):
    """90%-hot-key top-k: the (key, salt) composite must fan the hot key
    over most of the ``buckets`` salt values and >1 physical partition;
    ranks stay exact (already pinned separately, re-checked here on the
    adversarial shape)."""
    from pyspark.sql import Window

    from kafka_streams_demo_spark.functions.skew import salted_topk_per_key

    rows = [(i, "hot" if i < 1800 else f"cold{i % 13}", (i * 37) % 997)
            for i in range(2000)]
    df = spark.createDataFrame(rows, "rid long, k string, score long")

    salt = F.pmod(F.xxhash64(F.col("rid")), F.lit(16)).alias("_salt")
    groups, parts_hit = _composite_spread(df, F.col("k") == "hot", [F.col("k"), salt])
    assert groups >= 12, f"salt spread only {groups}/16 buckets"
    assert parts_hit >= 2

    w = Window.partitionBy("k").orderBy(F.desc("score"), "rid")
    expected = {(r["k"], r["rn"]): r["rid"] for r in
                df.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= 5).collect()}
    got = {(r["k"], r["rn"]): r["rid"] for r in salted_topk_per_key(
        df, key_col="k", order_cols=[F.desc("score"), F.col("rid")],
        k=5, salt_cols=["rid"], buckets=16,
    ).collect()}
    assert got == expected


def test_sliding_bucketed_spreads_adversarial_hot_key(spark):
    """90%-hot-key sliding window: the (key, time-bucket) composite the
    bucketed RANGE-frame variant partitions by must spread the hot key;
    output stays bit-identical to the plain single-partition frame."""
    import datetime as dt

    from kafka_streams_demo_spark import KStream
    from kafka_streams_demo_spark.operators.windows import SlidingWindows

    t0 = dt.datetime(2024, 1, 1)
    rows = [("hot" if i < 900 else f"cold{i % 11}", 1,
             t0 + dt.timedelta(seconds=100 * i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "key string, value long, timestamp timestamp")

    # the variant buckets on floor(epoch_ms / bucket_ms): 10-minute buckets
    bkt = F.floor((F.col("timestamp").cast("double") * 1000).cast("long") / 600_000)
    groups, parts_hit = _composite_spread(
        df, F.col("key") == "hot", [F.col("key"), bkt.alias("_b")]
    )
    assert groups >= 10 and parts_hit >= 2

    def run(win):
        return {
            (r["key"], r["window_end"]): r["value"]
            for r in KStream(df).group_by_key().windowed_by(win).count().collect()
        }

    plain = run(SlidingWindows.with_size("5 minutes"))
    bucketed = run(SlidingWindows.with_size("5 minutes").bucketed_by("10 minutes"))
    assert bucketed == plain and len(plain) > 0


def test_bucketed_sessionize_long_chain_converges(spark):
    """Review r4 (confirmed repro): a session chain spanning 35 buckets
    fragmented at connected_components' 25-round ceiling; pointer doubling
    must converge in O(log chain) rounds and return ONE session."""
    import datetime as dt

    from kafka_streams_demo_spark.functions.skew import bucketed_sessionize

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, "u", t0 + dt.timedelta(seconds=10 * i)) for i in range(210)]
    df = spark.createDataFrame(rows, "event_id long, user_id string, ts timestamp")
    out = bucketed_sessionize(
        df, key_col="user_id", ts_col="ts",
        order_cols=["ts", "event_id"], gap_s=10, bucket_s=60,
    ).collect()
    assert len(out) == 1 and out[0]["n_events"] == 210
