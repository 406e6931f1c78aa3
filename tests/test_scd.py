"""SCD2 snapshot / incremental merge (functions/scd.py).

The catalog pins merge ≡ rebuild externally (same-oracle hash gate);
these tests pin the semantics at unit scale: interval chaining, tie
resolution, the watermark-merge identity across several split points,
new-key handling, and the delta-priced plan shape."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_streams_demo_spark.functions.scd import (
    scd2_current,
    scd2_merge,
    scd2_snapshot,
)


def _chg(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, v=v, ts=dt.datetime(2024, 1, d, h), eid=e)
         for (k, v, d, h, e) in rows]
    )


def _us(d, h=0):
    return int(dt.datetime(2024, 1, d, h, tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def test_snapshot_intervals_chain(spark):
    hist = scd2_snapshot(
        _chg(spark, [("a", 1, 1, 0, 1), ("a", 2, 5, 0, 2), ("a", 3, 9, 0, 3)]),
        ["k"], ["v"], ts="ts", tiebreak="eid",
    ).orderBy("valid_from_us").collect()
    assert [(r["v"], r["valid_from_us"], r["valid_to_us"]) for r in hist] == [
        (1, _us(1), _us(5)),
        (2, _us(5), _us(9)),
        (3, _us(9), None),
    ]


def test_snapshot_tiebreak_orders_equal_timestamps(spark):
    hist = scd2_snapshot(
        _chg(spark, [("a", 20, 3, 0, 2), ("a", 10, 3, 0, 1)]),
        ["k"], ["v"], ts="ts", tiebreak="eid",
    ).collect()
    # equal ts: eid=1 version closes, eid=2 stays open
    open_rows = [r for r in hist if r["valid_to_us"] is None]
    assert len(open_rows) == 1 and open_rows[0]["v"] == 20


def test_merge_equals_rebuild_across_splits(spark):
    rows = [
        ("a", 1, 1, 0, 1), ("a", 2, 6, 0, 2), ("a", 3, 12, 0, 3),
        ("b", 7, 2, 0, 4), ("b", 8, 20, 0, 5),
        ("c", 9, 25, 0, 6),  # key born after most splits
    ]
    chg = _chg(spark, rows)
    full = sorted(
        map(tuple, scd2_snapshot(chg, ["k"], ["v"], "ts", "eid").collect())
    )
    for split_day in (4, 10, 15, 24):
        cut = F.lit(f"2024-01-{split_day:02d}").cast("timestamp")
        cur = scd2_snapshot(chg.filter(F.col("ts") < cut), ["k"], ["v"], "ts", "eid")
        merged = scd2_merge(
            cur, chg.filter(F.col("ts") >= cut), ["k"], ["v"], "ts", "eid"
        )
        assert sorted(map(tuple, merged.collect())) == full, split_day


def test_merge_empty_batch_is_identity(spark):
    chg = _chg(spark, [("a", 1, 1, 0, 1), ("a", 2, 5, 0, 2)])
    cur = scd2_snapshot(chg, ["k"], ["v"], "ts", "eid")
    merged = scd2_merge(cur, chg.filter(F.lit(False)), ["k"], ["v"], "ts", "eid")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, cur.collect()))


def test_merge_only_touched_keys_rewindow(spark):
    # the window recompute input must be semi-joined to batch keys:
    # untouched key 'b' flows through the anti-join branch only.
    chg = _chg(spark, [("a", 1, 1, 0, 1), ("b", 2, 1, 0, 2)])
    cur = scd2_snapshot(chg, ["k"], ["v"], "ts", "eid")
    batch = _chg(spark, [("a", 5, 10, 0, 3)])
    plan = scd2_merge(cur, batch, ["k"], ["v"], "ts", "eid")
    opt = plan._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftAnti" in opt and "LeftSemi" in opt
    got = {(r["k"], r["v"], r["valid_to_us"] is None) for r in plan.collect()}
    assert got == {("a", 1, False), ("a", 5, True), ("b", 2, True)}


def test_current_view_is_open_rows(spark):
    chg = _chg(spark, [("a", 1, 1, 0, 1), ("a", 2, 5, 0, 2), ("b", 3, 2, 0, 3)])
    cur = scd2_current(scd2_snapshot(chg, ["k"], ["v"], "ts", "eid"))
    assert {(r["k"], r["v"]) for r in cur.collect()} == {("a", 2), ("b", 3)}
    assert "valid_to_us" not in cur.columns


def test_compact_preserves_asof_after_cutoff(spark):
    from kafka_streams_demo_spark.functions.scd import scd2_compact

    chg = _chg(spark, [("a", 1, 1, 0, 1), ("a", 2, 5, 0, 2), ("a", 3, 9, 0, 3),
                       ("b", 7, 2, 0, 4)])
    hist = scd2_snapshot(chg, ["k"], ["v"], "ts", "eid")
    cutoff = _us(6)
    kept = scd2_compact(hist, cutoff).collect()
    # v=1 expired at day5 (< cutoff): dropped; v=2 straddles: kept;
    # v=3 open: kept; b's open row: kept
    got = {(r["k"], r["v"]) for r in kept}
    assert got == {("a", 2), ("a", 3), ("b", 7)}
    # as-of at the cutoff still answers exactly
    at_cutoff = [r for r in kept
                 if r["k"] == "a" and r["valid_from_us"] <= cutoff
                 and (r["valid_to_us"] is None or cutoff < r["valid_to_us"])]
    assert len(at_cutoff) == 1 and at_cutoff[0]["v"] == 2


def test_bucketed_history_merge_fewer_exchanges(spark):
    """scd2_merge against the bucketed history table carries strictly
    fewer Exchanges than against plain rows, with identical results —
    the persisted-dimension tier's whole point."""
    import datetime as dt

    from pyspark.sql import functions as F

    from kafka_streams_demo_spark.functions.scd import (
        scd2_merge,
        scd2_snapshot,
        write_scd2_history,
    )
    from kafka_streams_demo_spark.plans.explain import audit

    chg = _chg(spark, [("a", 1, 1, 0, 1), ("b", 2, 2, 0, 2), ("c", 3, 3, 0, 3),
                       ("a", 4, 4, 0, 4)])
    cur = scd2_snapshot(chg, ["k"], ["v"], "ts", "eid")
    batch = _chg(spark, [("a", 9, 20, 0, 9), ("d", 8, 21, 0, 10)])

    write_scd2_history(cur, "scd2_hist_test", ["k"], num_buckets=4)
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        # batch keys stay broadcast (the delta side SHOULD broadcast);
        # bucketing must remove the history-side exchanges
        try:
            plain = scd2_merge(cur, batch, ["k"], ["v"], "ts", "eid")
            buck = scd2_merge(
                spark.table("scd2_hist_test"), batch, ["k"], ["v"], "ts", "eid"
            )
            a_plain, a_buck = audit(plain), audit(buck)
            assert a_buck.exchanges < a_plain.exchanges, (
                f"bucketed {a_buck.exchanges} vs plain {a_plain.exchanges}"
            )
            key = lambda df: sorted(map(tuple, df.collect()))
            assert key(plain) == key(buck)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS scd2_hist_test")


def test_watermark_violations_detected(spark):
    from kafka_streams_demo_spark.functions.scd import scd2_watermark_violations

    chg = _chg(spark, [("a", 1, 5, 0, 1), ("b", 2, 5, 0, 2)])
    cur = scd2_snapshot(chg, ["k"], ["v"], "ts", "eid")
    ok_batch = _chg(spark, [("a", 9, 10, 0, 3)])
    assert scd2_watermark_violations(cur, ok_batch, ["k"]).count() == 0
    # a replayed batch at/before the open version must surface
    bad_batch = _chg(spark, [("a", 9, 5, 0, 4), ("b", 3, 3, 0, 5)])
    bad = {r["k"] for r in scd2_watermark_violations(cur, bad_batch, ["k"]).collect()}
    assert bad == {"a", "b"}


def test_bucketed_history_asof_lookup_fewer_exchanges(spark):
    """The persisted tier serves READS too: the point-in-time lookup
    against the bucketed history exchanges strictly less than against
    plain rows (facts still shuffle; the history side comes sorted and
    distributed from storage), identical results."""
    import datetime as dt

    from pyspark.sql import functions as F

    from kafka_streams_demo_spark.functions.scd import (
        scd2_snapshot,
        write_scd2_history,
    )
    from kafka_streams_demo_spark.plans.explain import audit

    chg = _chg(spark, [("a", 1, 1, 0, 1), ("a", 2, 10, 0, 2), ("b", 3, 2, 0, 3)])
    hist = scd2_snapshot(chg, ["k"], ["v"], "ts", "eid")
    facts = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 5)), ("a", dt.datetime(2024, 1, 12)),
         ("b", dt.datetime(2024, 1, 20))],
        "k string, fts timestamp",
    ).withColumn("fts_us", F.unix_micros("fts"))

    def lookup(dim):
        j = facts.join(
            dim,
            (facts["k"] == dim["k"])
            & (dim["valid_from_us"] <= facts["fts_us"])
            & (dim["valid_to_us"].isNull() | (facts["fts_us"] < dim["valid_to_us"])),
            "left",
        )
        return j.select(facts["k"], "fts_us", "v")

    write_scd2_history(hist, "scd2_hist_asof_test", ["k"], num_buckets=4)
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plain, buck = lookup(hist), lookup(spark.table("scd2_hist_asof_test"))
            a_plain, a_buck = audit(plain), audit(buck)
            assert a_buck.exchanges < a_plain.exchanges, (
                f"bucketed {a_buck.exchanges} vs plain {a_plain.exchanges}"
            )
            key = lambda df: sorted(map(tuple, df.collect()))
            assert key(plain) == key(buck)
            got = {(r["k"], r["fts_us"]): r["v"] for r in buck.collect()}
            assert list(got.values()).count(1) == 1 and 2 in got.values()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS scd2_hist_asof_test")


def test_merge_string_tiebreak_preserves_identity(spark):
    """A non-numeric tiebreak column must keep its native type through
    the merge path — the pre-fix cast to long NULLed string event ids,
    making within-batch tie order nondeterministic and breaking
    merge ≡ rebuild for such schemas (ADVICE r7)."""
    import datetime as dt
    from pyspark.sql import Row

    def chg(rows):
        return spark.createDataFrame(
            [Row(k=k, v=v, ts=dt.datetime(2024, 1, d, h), eid=e)
             for (k, v, d, h, e) in rows]
        )

    rows = [
        ("a", 1, 1, 0, "ev-01"),
        ("a", 2, 3, 0, "ev-03"),   # equal-ts tie inside the second batch:
        ("a", 3, 3, 0, "ev-10"),   # string order ev-03 < ev-10 decides
        ("b", 7, 2, 0, "ev-02"),
    ]
    full = sorted(
        scd2_snapshot(chg(rows), ["k"], ["v"], ts="ts", tiebreak="eid").collect(),
        key=lambda r: (r["k"], r["valid_from_us"], r["v"]),
    )
    merged = sorted(
        scd2_merge(
            scd2_snapshot(chg(rows[:1]), ["k"], ["v"], ts="ts", tiebreak="eid"),
            chg(rows[1:]), ["k"], ["v"], ts="ts", tiebreak="eid",
        ).collect(),
        key=lambda r: (r["k"], r["valid_from_us"], r["v"]),
    )
    assert [tuple(r) for r in merged] == [tuple(r) for r in full]
    open_a = [r for r in merged if r["k"] == "a" and r["valid_to_us"] is None]
    assert len(open_a) == 1 and open_a[0]["v"] == 3  # ev-10 wins the tie
