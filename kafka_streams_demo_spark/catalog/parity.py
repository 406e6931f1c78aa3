"""§2 operator parity (stateless / grouping / windows / joins) plus the sketch and graph families.

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
    fixture_fingerprint,
    register,
    session_tmpdir,
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
# §2b stateless transforms
# ---------------------------------------------------------------------------

@register(
    "filter_events",
    "SELECT event_id AS key, event_type AS value FROM events WHERE event_type <> 'error'",
)
def filter_events(spark, sf_dir):
    """filter(p) — DSLStatelessTransformation.scala:56. Predicate reaches the
    parquet scan as a pushed filter (narrow, no shuffle)."""
    ev = load_table(spark, "events", sf_dir)
    s = KStream.from_df(ev, key="event_id", value="event_type")
    return s.filter(lambda k, v: v != F.lit("error")).to_df()


@register(
    "filter_not_low",
    "SELECT event_id AS key, value FROM events WHERE NOT (value < 50)",
)
def filter_not_low(spark, sf_dir):
    """filterNot(p) — DSLStatelessTransformation.scala:58."""
    ev = load_table(spark, "events", sf_dir)
    s = KStream.from_df(ev, key="event_id", value="value")
    return s.filter_not(lambda k, v: v < 50).to_df()


@register(
    "map_values_upper",
    "SELECT event_id AS key, upper(event_type) AS value FROM events",
)
def map_values_upper(spark, sf_dir):
    """mapValues(upper) — MapFunctionScalaExample.scala:117."""
    ev = load_table(spark, "events", sf_dir)
    return KStream.from_df(ev, key="event_id", value="event_type").map_values(F.upper).to_df()


@register(
    "map_rekey",
    "SELECT event_type AS key, event_id AS value FROM events",
)
def map_rekey(spark, sf_dir):
    """map((k,v) => (v,k)) re-key — MapFunctionScalaExample.scala:121."""
    ev = load_table(spark, "events", sf_dir)
    s = KStream.from_df(ev, key="event_id", value="event_type")
    return s.map(lambda k, v: (v, k)).to_df()


@register(
    "select_key_prefix",
    "SELECT substring(event_type, 1, 1) AS key, event_id AS value FROM events",
)
def select_key_prefix(spark, sf_dir):
    """selectKey(charAt(0)) — DSLStatelessTransformation.scala:92."""
    ev = load_table(spark, "events", sf_dir)
    s = KStream.from_df(ev, key="event_type", value="event_id")
    return s.select_key(lambda k, v: F.substring(k, 1, 1)).to_df()


@register(
    "flat_map_pairs",
    "SELECT doc_id AS key, n_chars AS value FROM documents "
    "UNION ALL SELECT doc_id AS key, CAST(len(string_split(text, ' ')) AS BIGINT) AS value FROM documents",
)
def flat_map_pairs(spark, sf_dir):
    """flatMap: 1 record → 2 records (k, len-ish metrics) —
    DSLStatelessTransformation.scala:61-66 (emits (k, len(v)) and (k, len(k)))."""
    docs = load_table(spark, "documents", sf_dir)
    s = KStream.from_df(docs, key="doc_id", value=F.struct(F.col("text"), F.col("n_chars")))
    out = s.flat_map(
        lambda k, v: [
            (k, v["n_chars"]),
            (k, F.size(F.split(v["text"], " ")).cast("long")),
        ]
    )
    return out.to_df()


@register(
    "branch_c",
    "SELECT event_id AS key, event_type AS value FROM events WHERE event_type LIKE 'c%'",
)
def branch_c(spark, sf_dir):
    """branch predicate 1 (first match) — DSLStatelessTransformation.scala:48-53."""
    ev = load_table(spark, "events", sf_dir)
    s = KStream.from_df(ev, key="event_id", value="event_type")
    b = s.branch(lambda k, v: v.startswith("c"), lambda k, v: v.startswith("s"), lambda k, v: F.lit(True))
    return b[0].to_df()


@register(
    "branch_s",
    "SELECT event_id AS key, event_type AS value FROM events "
    "WHERE event_type NOT LIKE 'c%' AND event_type LIKE 's%'",
)
def branch_s(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    s = KStream.from_df(ev, key="event_id", value="event_type")
    b = s.branch(lambda k, v: v.startswith("c"), lambda k, v: v.startswith("s"), lambda k, v: F.lit(True))
    return b[1].to_df()


@register(
    "branch_default",
    "SELECT event_id AS key, event_type AS value FROM events "
    "WHERE event_type NOT LIKE 'c%' AND event_type NOT LIKE 's%'",
)
def branch_default(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    s = KStream.from_df(ev, key="event_id", value="event_type")
    b = s.branch(lambda k, v: v.startswith("c"), lambda k, v: v.startswith("s"), lambda k, v: F.lit(True))
    return b[2].to_df()


@register(
    "word_count",
    "SELECT word AS key, count(*) AS value FROM ("
    "  SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word FROM documents"
    ") t WHERE word <> '' GROUP BY word",
)
def word_count(spark, sf_dir):
    """The flagship: flatMapValues(tokenize) → groupBy(word) → count —
    WordCountScalaExample.scala:111-117. One shuffle (on word); map-side
    partial counts make the exchange tiny at any scale."""
    docs = load_table(spark, "documents", sf_dir)
    s = KStream.from_df(docs, key="doc_id", value="text")
    words = s.flat_map_values(lambda v: F.split(F.lower(v), "[^a-z0-9]+"))
    return (
        words.filter(lambda k, v: v != F.lit(""))
        .group_by(lambda k, v: v)
        .count()
        .to_df()
    )


# ---------------------------------------------------------------------------
# §2c-2d grouping & aggregation
# ---------------------------------------------------------------------------

@register(
    "count_by_key",
    "SELECT user_id AS key, count(*) AS value FROM events GROUP BY user_id",
)
def count_by_key(spark, sf_dir):
    """count() — WordCountScalaExample.scala:116, DSLStatefulTransformation.scala:63."""
    return _events_stream(spark, sf_dir).group_by_key().count().to_df()


@register(
    "aggregate_sum_cents",
    "SELECT user_id AS key, SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS value "
    "FROM events GROUP BY user_id",
)
def aggregate_sum_cents(spark, sf_dir):
    """aggregate(0)(+) — DSLStatefulTransformation.scala:70-71; sums as exact
    integer cents (hash agg, map-side combine)."""
    s = _events_stream(spark, sf_dir).map_values(cents)
    return s.group_by_key().aggregate(lambda v: F.sum(v)).to_df()


@register(
    "reduce_max",
    "SELECT user_id AS key, MAX(value) AS value FROM events GROUP BY user_id",
)
def reduce_max(spark, sf_dir):
    """reduce / custom max-agg — ConfluentKStreamsDemoTest.java:31-52."""
    return _events_stream(spark, sf_dir).group_by_key().reduce(lambda v: F.max(v)).to_df()


@register(
    "ktable_latest",
    "SELECT key, value FROM ("
    "  SELECT user_id AS key, event_type AS value, "
    "         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn "
    "  FROM events) t WHERE rn = 1",
)
def ktable_latest(spark, sf_dir):
    """builder.table / KStream→KTable: latest-per-key via max_by(offset) —
    DSLStatefulTransformation.scala:97-104. One aggregation with map-side
    combine: the exchange carries only latest-per-key rows, never the full
    changelog (the oracle's row_number window is the *slow* formulation we
    deliberately avoid — it shuffles and sorts every input row). String
    values put the agg in partial SortAggregate (per-partition CPU sort);
    fixed-width values get pure HashAggregate from the same API."""
    return _events_stream(spark, sf_dir, value="event_type").to_table().to_df().select("key", "value")


_SCD2_ORACLE = """
SELECT user_id, event_type,
       CAST(ROUND(value*100, 0) AS BIGINT) AS value_cents,
       epoch_us(ts) AS valid_from_us,
       lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to_us
FROM events
"""


@register("scd2_user_history", _SCD2_ORACLE)
def scd2_user_history(spark, sf_dir):
    """SCD2 version history (functions/scd.py) — the other half of the
    reference's `builder.table` latest-view (StreamToTableJoinDemo.
    java:41): every change becomes a validity interval
    [valid_from_us, valid_to_us), open row NULL-terminated. One window
    shuffle on the key; lead() streams, no buffering. This is the
    lakehouse SCD2 dimension-table shape a warehouse derives from the
    same changelog the KTable consumes."""
    from kafka_streams_demo_spark.functions.scd import scd2_snapshot

    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", cents(F.col("value")).alias("value_cents"),
        "ts", "event_id",
    )
    return scd2_snapshot(
        ev, ["user_id"], ["event_type", "value_cents"], ts="ts", tiebreak="event_id"
    )


@register("scd2_merge_incremental", _SCD2_ORACLE)  # SAME oracle: merge ≡ rebuild
def scd2_merge_incremental(spark, sf_dir):
    """Incremental SCD2 MERGE under the external hash gate: the table as
    of Jan 21 plays the existing dimension, the later events play the
    change batch. Closed history passes through untouched; open rows of
    unaffected keys pass through via a delta-sized anti-join; only
    (touched open rows ∪ batch) re-window. Registered against the SAME
    oracle as `scd2_user_history`, so a driver green proves
    merge(scd2(old), batch) == scd2(all) bit-for-bit — the lakehouse
    MERGE priced on |batch|, never on accumulated history."""
    from kafka_streams_demo_spark.functions.scd import scd2_merge, scd2_snapshot

    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", cents(F.col("value")).alias("value_cents"),
        "ts", "event_id",
    )
    split = F.lit("2024-01-21").cast("timestamp")
    current = scd2_snapshot(
        ev.filter(F.col("ts") < split),
        ["user_id"], ["event_type", "value_cents"], ts="ts", tiebreak="event_id",
    )
    return scd2_merge(
        current, ev.filter(F.col("ts") >= split),
        ["user_id"], ["event_type", "value_cents"], ts="ts", tiebreak="event_id",
    )


@register(
    "scd2_compact_retention",
    f"SELECT * FROM ({_SCD2_ORACLE}) v "
    f"WHERE valid_to_us IS NULL OR valid_to_us > 1705276800000000",
)
def scd2_compact_retention(spark, sf_dir):
    """Retention compaction (functions/scd.py:scd2_compact): versions
    fully expired before Jan 15 are dropped; the straddling version
    stays so as-of queries remain exact for any t >= cutoff. A pure
    filter — zero shuffle, partition-prunable when history is stored
    partitioned by valid_to date. merge grows history forward,
    compact bounds it backward."""
    from kafka_streams_demo_spark.functions.scd import scd2_compact, scd2_snapshot

    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", cents(F.col("value")).alias("value_cents"),
        "ts", "event_id",
    )
    hist = scd2_snapshot(
        ev, ["user_id"], ["event_type", "value_cents"], ts="ts", tiebreak="event_id"
    )
    return scd2_compact(hist, 1705276800000000)


@register(
    "scd2_current_view",
    f"SELECT user_id, event_type, value_cents, valid_from_us "
    f"FROM ({_SCD2_ORACLE}) v WHERE valid_to_us IS NULL",
)
def scd2_current_view(spark, sf_dir):
    """Latest view recovered FROM the history table — `scd2_current` is a
    filter on the open rows (zero shuffle), closing the loop with
    `ktable_latest`: changelog → SCD2 history → current dimension, each
    stage a catalog op."""
    from kafka_streams_demo_spark.functions.scd import scd2_current, scd2_snapshot

    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", cents(F.col("value")).alias("value_cents"),
        "ts", "event_id",
    )
    hist = scd2_snapshot(
        ev, ["user_id"], ["event_type", "value_cents"], ts="ts", tiebreak="event_id"
    )
    return scd2_current(hist)


@register(
    "scd2_asof_enrich",
    """
WITH dim AS (SELECT user_id, CAST(ROUND(value*100, 0) AS BIGINT) AS dim_value_c,
                    epoch_us(ts) AS valid_from_us,
                    lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        AS valid_to_us
             FROM events WHERE event_type = 'click'),
f AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             CAST(ROUND(value*100, 0) AS BIGINT) AS purchase_c
      FROM events WHERE event_type = 'purchase')
SELECT f.event_id, f.user_id, f.purchase_c, dim.dim_value_c, dim.valid_from_us
FROM f LEFT JOIN dim ON f.user_id = dim.user_id
   AND dim.valid_from_us <= f.ts_us
   AND (dim.valid_to_us IS NULL OR f.ts_us < dim.valid_to_us)
""",
)
def scd2_asof_enrich(spark, sf_dir):
    """Point-in-time dimension lookup — the query an SCD2 table exists
    to serve: each purchase enriched with the user's click-state AT
    PURCHASE TIME by joining the validity interval that contains the
    fact's timestamp (left join: purchases before any click keep NULLs).
    Every fact matches <= 1 version because the intervals partition each
    key's timeline — the interval-join formulation of `asof_join_
    purchase` (KIP-889 versioned-KTable semantics), here served from a
    PERSISTED history table instead of a windowed buffer. Scale: an
    equi-join on the key with the range predicate evaluated post-match;
    skewed dimension keys fall back to the asof/band-join playbook."""
    from kafka_streams_demo_spark.functions.scd import scd2_snapshot

    ev = load_table(spark, "events", sf_dir)
    dim = scd2_snapshot(
        ev.filter(F.col("event_type") == "click").select(
            "user_id", cents(F.col("value")).alias("dim_value_c"), "ts", "event_id"
        ),
        ["user_id"], ["dim_value_c"], ts="ts", tiebreak="event_id",
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id",
        cents(F.col("value")).alias("purchase_c"),
        F.unix_micros("ts").alias("ts_us"),
    )
    joined = facts.join(
        dim,
        (facts["user_id"] == dim["user_id"])
        & (dim["valid_from_us"] <= facts["ts_us"])
        & (dim["valid_to_us"].isNull() | (facts["ts_us"] < dim["valid_to_us"])),
        "left",
    )
    return joined.select(
        facts["event_id"], facts["user_id"], "purchase_c",
        "dim_value_c", "valid_from_us",
    )


@register(
    "ktable_groupby_count",
    "SELECT value AS key, count(*) AS value FROM ("
    "  SELECT event_type AS value, "
    "         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn "
    "  FROM events) t WHERE rn = 1 GROUP BY 1",
)
def ktable_groupby_count(spark, sf_dir):
    """KTable.groupBy(...).count() over the changelog view —
    DSLStatefulTransformation.scala:105-111 (no subtractor needed: recompute
    over latest-state view, SURVEY §2d)."""
    t = _events_stream(spark, sf_dir, value="event_type").to_table()
    return t.group_by(lambda k, v: v).count().to_df()


@register(
    "ktable_tombstone",
    "SELECT key, value FROM ("
    "  SELECT user_id AS key, "
    "         CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS value, "
    "         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn "
    "  FROM events) t WHERE rn = 1 AND value IS NOT NULL",
)
def ktable_tombstone(spark, sf_dir):
    """KTable delete semantics: a null value is a tombstone — the key leaves
    the table when its *latest* record is a delete (Kafka changelog
    contract, SURVEY §1). 'error' events model the null-value tombstone;
    the latest-per-key max_by runs first, so a key deleted-then-reborn
    correctly survives."""
    s = _events_stream(spark, sf_dir, value="event_type").map_values(
        lambda v: F.when(v == "error", F.lit(None).cast("string")).otherwise(v)
    )
    return KTable.from_stream(s, drop_tombstones=True).to_df().select("key", "value")


@register(
    "processor_running_count",
    "SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS value "
    "FROM events GROUP BY user_id",
)
def processor_running_count(spark, sf_dir):
    """Processor API through the REAL streaming path: per-key GroupState
    counts via applyInPandasWithState, driven with trigger(availableNow) to
    a memory sink (WordCountProcessorExample.scala:23-61 parity). One
    micro-batch over the fixture file → final state per key == count(*).
    The one deliberate Arrow⇄Python boundary in the catalog (SURVEY §3 EP2)."""
    from kafka_streams_demo_spark.sources.registry import read_stream_table
    from kafka_streams_demo_spark.streaming.lifecycle import run_available_now
    from kafka_streams_demo_spark.streaming.processor import running_count_processor

    ev = read_stream_table(spark, "events", sf_dir)
    keyed = ev.select(F.col("user_id").cast("string").alias("key"), F.col("event_type").alias("value"))
    return run_available_now(running_count_processor(keyed), output_mode="update")


_WALLCLOCK_STREAM_DIRS: dict[str, str] = {}


def _batched_events_stream_dir(spark, sf_dir: str, n_batches: int = 4) -> str:
    """Split the events fixture into ``n_batches`` parquet files keyed by
    ``event_id % n_batches``, with strictly increasing mtimes so the file
    stream source (maxFilesPerTrigger=1) replays them as that many
    ordered micro-batches — the deterministic multi-batch drive the
    wall-clock punctuator entry needs. Every user's rows are DROPPED
    from the batches where ``(user_id + k) % 3 == 0`` (gap injection):
    the fixture's users are otherwise active in every batch, which would
    leave the punctuator with nothing to do — with the gaps, every user
    is guaranteed at least one data-less batch after its first
    appearance, so every per-key wall-clock timer provably fires. The
    same closed-form rule is replayed by the entry's oracle. Written
    once per (session, sf_dir fingerprint, n_batches) — the key carries
    the events fixture's mtime+size so a regenerated fixture re-derives
    the batches instead of serving a stale copy, and the dirs are
    atexit-cleaned (ADVICE r11)."""
    import glob
    import os
    import shutil
    import tempfile

    cache_key = (
        f"{sf_dir}::{fixture_fingerprint(sf_dir, 'events')}::{n_batches}"
    )
    path = _WALLCLOCK_STREAM_DIRS.get(cache_key)
    if path is not None and os.path.isdir(path):
        return path
    ev = load_table(spark, "events", sf_dir).select(
        F.col("user_id").cast("string").alias("key"),
        F.col("event_type").alias("value"),
        F.col("user_id"),
        F.col("event_id"),
    )
    path = session_tmpdir("kafka_streams_demo_spark_wallclock_")
    staging = tempfile.mkdtemp(prefix="kafka_streams_demo_spark_wcstage_")
    base = 1_000_000_000  # fixed epoch base; only the ORDER matters
    for k in range(n_batches):
        sub = os.path.join(staging, f"b{k}")
        ev.filter(
            (F.col("event_id") % n_batches == k)
            & (F.pmod(F.col("user_id") + F.lit(k), F.lit(3)) != 0)
        ).select("key", "value").coalesce(1).write.mode("overwrite").parquet(sub)
        (part,) = glob.glob(os.path.join(sub, "part-*.parquet"))
        dst = os.path.join(path, f"{k:04d}.parquet")
        shutil.copyfile(part, dst)
        os.utime(dst, (base + 10 * k, base + 10 * k))
    shutil.rmtree(staging, ignore_errors=True)
    _WALLCLOCK_STREAM_DIRS[cache_key] = path
    return path


@register(
    "wallclock_punctuated_drive",
    # Per-batch running-count prefixes per key: batch k holds the rows
    # with event_id % 4 == k minus the injected gaps ((user_id+k)%3==0,
    # see _batched_events_stream_dir), and each data batch emits the
    # key's count AFTER that batch — so the distinct emission set is the
    # per-key cumulative count at each present-batch boundary. Timer
    # re-fires (the WALL_CLOCK punctuation under test — guaranteed for
    # every key by the gap injection) re-emit the UNCHANGED count and
    # dedup away; their multiplicity is pinned by tests/test_streaming.py
    # (raw sink rows > distinct rows), kept out of the hash because
    # wall-clock fire COUNTS are timing-dependent while fire VALUES are
    # not.
    "WITH b AS (SELECT user_id, event_id % 4 AS k, count(*) AS c "
    "           FROM events WHERE (user_id + event_id % 4) % 3 <> 0 "
    "           GROUP BY 1, 2), "
    "p AS (SELECT user_id, k, SUM(c) OVER (PARTITION BY user_id ORDER BY k) AS v "
    "      FROM b) "
    "SELECT CAST(user_id AS VARCHAR) AS key, CAST(v AS BIGINT) AS value FROM p",
)
def wallclock_punctuated_drive(spark, sf_dir):
    """WALL_CLOCK_TIME punctuator under the external gate (VERDICT r10
    task 8 — the one §2h surface that was streaming-test-only): the
    events fixture replays as 4 ordered micro-batches (file source,
    maxFilesPerTrigger=1, mtime-ordered), through
    streaming/processor.py:wallclock_punctuated_processor with a 1 ms
    punctuation interval — so every key with no data in a later batch
    re-forwards its running count on PROCESSING time, no watermark
    involved (ProcessingTimeTimeout, the PunctuationType the reference
    API offers beyond STREAM_TIME). The hash-gated projection is the
    deterministic part — per-key counts at each present-batch boundary
    (proving multi-batch state accumulation AND batch ordering); the
    timing-dependent fire multiplicity is asserted in
    tests/test_streaming.py.

    Driven via run_punctuated_until_settled (r12): a 1 ms punctuator
    re-registers its timer on every fire, so availableNow never drains
    — the old awaitTermination(120)-expiry drive cost a flat 120 s and
    would have returned a truncated prefix on a box slow enough to not
    finish the data batches in time; the settled drive stops after the
    input is exhausted + 2 pure timer batches (every live key provably
    fired after the last data batch — the punctuation under test)."""
    from kafka_streams_demo_spark.streaming.lifecycle import (
        run_punctuated_until_settled,
    )
    from kafka_streams_demo_spark.streaming.processor import (
        wallclock_punctuated_processor,
    )

    path = _batched_events_stream_dir(spark, sf_dir, n_batches=4)
    stream = (
        spark.readStream.schema("key string, value string")
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = run_punctuated_until_settled(
        wallclock_punctuated_processor(stream, punctuate_interval_ms=1),
        output_mode="update",
    )
    return out.select("key", "value").distinct()


@register(
    "json_extract_sum",
    "SELECT event_type AS key, SUM(CAST(regexp_extract(props, '\"k\": (\\d+)', 1) AS BIGINT)) AS value "
    "FROM events GROUP BY event_type",
)
def json_extract_sum(spark, sf_dir):
    """LogAndContinue-style permissive parse: JSON props → typed column →
    agg (SURVEY §2i maps serde errors to null-and-filter)."""
    ev = load_table(spark, "events", sf_dir)
    s = KStream.from_df(ev, key="event_type", value=F.get_json_object("props", "$.k").cast("long"))
    return s.group_by_key().aggregate(lambda v: F.sum(v)).to_df()


# ---------------------------------------------------------------------------
# §2e windowed aggregation (batch parity of the streaming windows)
# ---------------------------------------------------------------------------

@register(
    "tumbling_window_count",
    "SELECT event_type AS key, epoch_us(date_trunc('hour', ts)) AS window_start_us, "
    "count(*) AS value FROM events GROUP BY 1, 2",
)
def tumbling_window_count(spark, sf_dir):
    """windowedBy(TimeWindows.of(...)).count() — DSLStatefulTransformation.scala:79-81
    (1-hour windows over events.ts; epoch-aligned like F.window)."""
    ev = load_table(spark, "events", sf_dir)
    s = KStream.from_df(ev, key="event_type", value="value", timestamp="ts")
    out = s.group_by_key().windowed_by(TimeWindows.of("1 hour", "3 minutes")).count()
    return out.select(
        "key", F.unix_micros("window_start").alias("window_start_us"), "value"
    )


@register(
    "hopping_window_count",
    "SELECT event_type AS key, "
    "CAST((FLOOR(epoch(ts)/1800) - s.i) * 1800 * 1000000 AS BIGINT) AS window_start_us, "
    "count(*) AS value "
    "FROM events CROSS JOIN (VALUES (0), (1)) AS s(i) GROUP BY 1, 2",
)
def hopping_window_count(spark, sf_dir):
    """Hopping windows (TimeWindows.advanceBy — SURVEY §2e extension):
    1-hour windows advancing 30 min; every event in exactly 2 windows."""
    ev = load_table(spark, "events", sf_dir)
    s = KStream.from_df(ev, key="event_type", value="value", timestamp="ts")
    out = s.group_by_key().windowed_by(TimeWindows.of("1 hour").advance("30 minutes")).count()
    return out.select(
        "key", F.unix_micros("window_start").alias("window_start_us"), "value"
    )


@register(
    "session_window_count",
    """
    WITH marks AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, 1)
    ), sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM marks
    )
    SELECT user_id AS key, epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts) + INTERVAL 30 MINUTE) AS session_end_us,
           count(*) AS value
    FROM sessions GROUP BY user_id, sid
    """,
)
def session_window_count(spark, sf_dir):
    """windowedBy(SessionWindows.with(gap)).count() —
    DSLStatefulTransformation.scala:84-86 (30-min inactivity gap per user)."""
    ev = load_table(spark, "events", sf_dir)
    s = KStream.from_df(ev, key="user_id", value="value", timestamp="ts")
    out = s.group_by_key().windowed_by(SessionWindows.with_gap("30 minutes")).count()
    return out.select(
        "key",
        F.unix_micros("window_start").alias("session_start_us"),
        F.unix_micros("window_end").alias("session_end_us"),
        "value",
    )


# ---------------------------------------------------------------------------
# §2f joins
# ---------------------------------------------------------------------------

@register(
    "stream_stream_join_window",
    "SELECT e1.user_id AS key, e1.event_id AS left_id, e2.event_id AS right_id, "
    "CAST(ROUND((e1.value + e2.value) * 100, 0) AS BIGINT) AS value "
    "FROM events e1 JOIN events e2 ON e1.user_id = e2.user_id "
    "AND e1.event_type = 'purchase' AND e2.event_type = 'error' "
    "AND e2.ts BETWEEN e1.ts - INTERVAL 1 HOUR AND e1.ts + INTERVAL 1 HOUR",
)
def stream_stream_join_window(spark, sf_dir):
    """Windowed stream-stream inner join — StreamToStreamJoinExample.scala:92:
    purchases ⋈ errors same user within ±1 h; combiner v1+v2 (as cents).
    Equi-key + time-bound → Spark plans a range-bounded SMJ/hash join on
    user_id; both sides shuffle once on the key."""
    ev = load_table(spark, "events", sf_dir)
    purchases = KStream.from_df(
        ev.filter(F.col("event_type") == "purchase"),
        key="user_id", value=F.struct(F.col("event_id"), F.col("value")), timestamp="ts",
    )
    errors = KStream.from_df(
        ev.filter(F.col("event_type") == "error"),
        key="user_id", value=F.struct(F.col("event_id"), F.col("value")), timestamp="ts",
    )
    joined = purchases.join(
        errors,
        lambda v1, v2: F.struct(
            v1["event_id"].alias("left_id"),
            v2["event_id"].alias("right_id"),
            cents(v1["value"] + v2["value"]).alias("v"),
        ),
        JoinWindows.of("1 hour"),
    )
    return joined.to_df().select(
        "key",
        F.col("value.left_id").alias("left_id"),
        F.col("value.right_id").alias("right_id"),
        F.col("value.v").alias("value"),
    )


@register(
    "stream_stream_join_asymmetric",
    "SELECT e1.user_id AS key, e1.event_id AS left_id, e2.event_id AS right_id "
    "FROM events e1 JOIN events e2 ON e1.user_id = e2.user_id "
    "AND e1.event_type = 'purchase' AND e2.event_type = 'error' "
    "AND e2.ts BETWEEN e1.ts - INTERVAL 2 HOUR AND e1.ts",
)
def stream_stream_join_asymmetric_q(spark, sf_dir):
    """Asymmetric join window (the Kafka Streams
    ``JoinWindows.of(x).before(d)/.after(d)`` API surface —
    ``with_before``/``with_after`` here): purchases pair only with errors
    in the PRECEDING 2 hours (after = 0), the "what already went wrong
    before this purchase" shape. Same single key-shuffle plan as the
    symmetric join; only the time predicate narrows."""
    ev = load_table(spark, "events", sf_dir)
    purchases = KStream.from_df(
        ev.filter(F.col("event_type") == "purchase"),
        key="user_id", value=F.col("event_id"), timestamp="ts",
    )
    errors = KStream.from_df(
        ev.filter(F.col("event_type") == "error"),
        key="user_id", value=F.col("event_id"), timestamp="ts",
    )
    joined = purchases.join(
        errors,
        lambda v1, v2: F.struct(v1.alias("left_id"), v2.alias("right_id")),
        JoinWindows.of("2 hours").with_after("0 seconds"),
    )
    return joined.to_df().select(
        "key",
        F.col("value.left_id").alias("left_id"),
        F.col("value.right_id").alias("right_id"),
    )


@register(
    "ktable_fk_join",
    "SELECT o_orderkey, c_name AS cust_name, "
    "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS total_c "
    "FROM orders JOIN customer ON o_custkey = c_custkey",
)
def ktable_fk_join_q(spark, sf_dir):
    """KTable foreign-key join (KIP-213, operators/ktable.py:fk_join):
    each order row joins the customer view on a key EXTRACTED FROM ITS
    VALUE (o_custkey), keeping the order key — the many-to-one enrichment
    Kafka Streams needs a subscription-topic round-trip for, expressed as
    one equi-join over latest-state views (customer is dimension-sized →
    Catalyst broadcasts)."""
    from kafka_streams_demo_spark.operators.ktable import KTable

    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    ot = KTable(orders.select(
        F.col("o_orderkey").alias("key"),
        F.struct("o_custkey", "o_totalprice").alias("value"),
    ))
    ct = KTable(cust.select(
        F.col("c_custkey").alias("key"), F.col("c_name").alias("value")
    ))
    out = ot.fk_join(
        ct,
        lambda v: v["o_custkey"],
        lambda lv, rv: F.struct(
            rv.alias("cust_name"), cents(lv["o_totalprice"]).alias("total_c")
        ),
    )
    return out.to_df().select(
        F.col("key").alias("o_orderkey"),
        F.col("value.cust_name").alias("cust_name"),
        F.col("value.total_c").alias("total_c"),
    )


@register(
    "sliding_window_count",
    "SELECT DISTINCT CAST(user_id AS VARCHAR) AS key, "
    "ts - INTERVAL 2 HOUR AS window_start, ts AS window_end, "
    "COUNT(*) OVER (PARTITION BY user_id ORDER BY ts "
    "RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND CURRENT ROW) AS value "
    "FROM events",
)
def sliding_window_count_q(spark, sf_dir):
    """Sliding windows (Kafka Streams 2.7 SlidingWindows, post-reference):
    per-record trailing 2-hour count per user — record-anchored windows,
    no hopping grid. Compiled to a RANGE frame over epoch millis (one key
    shuffle, ordered per-partition scan, no self-join); the oracle is the
    identical SQL range frame."""
    ev = load_table(spark, "events", sf_dir)
    s = KStream.from_df(
        ev, key=F.col("user_id").cast("string"), value="event_type", timestamp="ts"
    )
    from kafka_streams_demo_spark.operators.windows import SlidingWindows

    return s.group_by_key().windowed_by(SlidingWindows.with_size("2 hours")).count()


@register(
    "sliding_window_count_bucketed",
    "SELECT DISTINCT CAST(user_id AS VARCHAR) AS key, "
    "ts - INTERVAL 2 HOUR AS window_start, ts AS window_end, "
    "COUNT(*) OVER (PARTITION BY user_id ORDER BY ts "
    "RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND CURRENT ROW) AS value "
    "FROM events",
)
def sliding_window_count_bucketed_q(spark, sf_dir):
    """The SCALE path for sliding windows: partition by (key, 1-day
    time-bucket) with boundary-context replication instead of by key
    alone — a hot key parallelizes across its time span. SAME oracle SQL
    as `sliding_window_count`: the hash gate proves the bucketed plan
    bit-identical to the global formulation."""
    ev = load_table(spark, "events", sf_dir)
    s = KStream.from_df(
        ev, key=F.col("user_id").cast("string"), value="event_type", timestamp="ts"
    )
    from kafka_streams_demo_spark.operators.windows import SlidingWindows

    w = SlidingWindows.with_size("2 hours").bucketed_by("1 day")
    return s.group_by_key().windowed_by(w).count()


_SLIDING_FULL_ORACLE = (
    "WITH e AS (SELECT CAST(user_id AS VARCHAR) AS key, epoch_ms(ts) AS tms "
    "FROM events), "
    "a AS (SELECT key, tms - 7200000 AS ws, tms AS we FROM e "
    "UNION SELECT key, tms + 1 AS ws, tms + 1 + 7200000 AS we FROM e) "
    "SELECT a.key, a.ws AS start_ms, a.we AS end_ms, COUNT(*) AS value "
    "FROM a JOIN e ON e.key = a.key AND e.tms BETWEEN a.ws AND a.we "
    "GROUP BY 1, 2, 3"
)


@register("sliding_window_full_count", _SLIDING_FULL_ORACLE)
def sliding_window_full_count_q(spark, sf_dir):
    """The FULL Kafka Streams 2.7 sliding-window set (ADVICE r4 closed):
    per-record trailing 2-hour windows PLUS every non-empty expiry-opened
    window [ts+1, ts+1+size] — two RANGE frames (trailing + leading) over
    one key shuffle, no self-join. The oracle materializes the window-set
    definition directly: both anchor families, joined back to the events
    they contain (inner join = the non-empty rule), counted per distinct
    window."""
    ev = load_table(spark, "events", sf_dir)
    s = KStream.from_df(
        ev, key=F.col("user_id").cast("string"), value="event_type", timestamp="ts"
    )
    from kafka_streams_demo_spark.operators.windows import SlidingWindows

    w = SlidingWindows.with_size("2 hours").with_expiry_windows()
    out = s.group_by_key().windowed_by(w).count()
    return out.select(
        "key",
        F.unix_millis("window_start").alias("start_ms"),
        F.unix_millis("window_end").alias("end_ms"),
        "value",
    )


@register("sliding_window_full_count_bucketed", _SLIDING_FULL_ORACLE)
def sliding_window_full_count_bucketed_q(spark, sf_dir):
    """The scale path for the full sliding-window set: (key, 1-day bucket)
    partitioning with BOTH context replications — each bucket's tail into
    its successor (trailing frames) and head into its predecessor
    (leading frames). SAME oracle as `sliding_window_full_count`: the
    hash gate proves the bucketed plan bit-identical."""
    ev = load_table(spark, "events", sf_dir)
    s = KStream.from_df(
        ev, key=F.col("user_id").cast("string"), value="event_type", timestamp="ts"
    )
    from kafka_streams_demo_spark.operators.windows import SlidingWindows

    w = SlidingWindows.with_size("2 hours").bucketed_by("1 day").with_expiry_windows()
    out = s.group_by_key().windowed_by(w).count()
    return out.select(
        "key",
        F.unix_millis("window_start").alias("start_ms"),
        F.unix_millis("window_end").alias("end_ms"),
        "value",
    )


@register(
    "stream_table_join_segment",
    "SELECT c.c_mktsegment AS key, SUM(CAST(ROUND(o.o_totalprice*100, 0) AS BIGINT)) AS value "
    "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY 1",
)
def stream_table_join_segment(spark, sf_dir):
    """The clicks-per-region query shape at testdata scale —
    StreamToTableJoinExample.scala:107 + golden StreamToTableJoinTestData.scala:55-59:
    fact stream ⋈ dimension table → re-key by dimension attr → sum.
    customer is dimension-sized → broadcast join, zero fact shuffle before
    the aggregation."""
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    clicks = KStream.from_df(orders, key="o_custkey", value=F.col("o_totalprice"))
    segments = KTable(
        customer.select(F.col("c_custkey").alias("key"), F.col("c_mktsegment").alias("value"))
    )
    enriched = clicks.join(
        segments, lambda price, seg: F.struct(cents(price).alias("c"), seg.alias("seg"))
    )
    return (
        enriched.group_by(lambda k, v: v["seg"])
        .aggregate(lambda v: F.sum(v["c"]))
        .to_df()
    )


@register(
    "table_table_join_inner",
    "SELECT c.c_custkey AS key, c.c_mktsegment || ':' || lo.o_orderstatus AS value "
    "FROM customer c JOIN ("
    "  SELECT o_custkey, o_orderstatus FROM ("
    "    SELECT o_custkey, o_orderstatus, "
    "           row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rn "
    "    FROM orders) t WHERE rn = 1"
    ") lo ON c.c_custkey = lo.o_custkey",
)
def table_table_join_inner(spark, sf_dir):
    """Table-table inner join — TableToTableJoinExample.scala:115: customers
    (PK table) ⋈ latest-order-status-per-customer (stream→KTable)."""
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust_t = KTable(customer.select(F.col("c_custkey").alias("key"), F.col("c_mktsegment").alias("value")))
    latest_order = KStream.from_df(
        orders, key="o_custkey", value="o_orderstatus", offset="o_orderkey"
    ).to_table()
    joined = cust_t.join(latest_order, lambda seg, st: F.concat(seg, F.lit(":"), st))
    return joined.to_df()


@register(
    "table_table_join_outer",
    "SELECT COALESCE(c.c_custkey, lo.o_custkey) AS key, "
    "concat_ws('-', c.c_mktsegment, lo.o_orderstatus) AS value "
    "FROM customer c FULL OUTER JOIN ("
    "  SELECT o_custkey, o_orderstatus FROM ("
    "    SELECT o_custkey, o_orderstatus, "
    "           row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rn "
    "    FROM orders) t WHERE rn = 1"
    ") lo ON c.c_custkey = lo.o_custkey",
)
def table_table_join_outer(spark, sf_dir):
    """Table-table outer join — TableToTableJoinExample.scala:118."""
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust_t = KTable(customer.select(F.col("c_custkey").alias("key"), F.col("c_mktsegment").alias("value")))
    latest_order = KStream.from_df(
        orders, key="o_custkey", value="o_orderstatus", offset="o_orderkey"
    ).to_table()
    joined = cust_t.outer_join(latest_order, lambda seg, st: F.concat_ws("-", seg, st))
    return joined.to_df()


@register(
    "stream_stream_left_join_window",
    "SELECT e1.user_id AS key, e1.event_id AS left_id, e2.event_id AS right_id, "
    "CAST(ROUND((e1.value + COALESCE(e2.value, 0)) * 100, 0) AS BIGINT) AS value "
    "FROM (SELECT * FROM events WHERE event_type = 'purchase') e1 "
    "LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e2 "
    "ON e1.user_id = e2.user_id "
    "AND e2.ts BETWEEN e1.ts - INTERVAL 1 HOUR AND e1.ts + INTERVAL 1 HOUR",
)
def stream_stream_left_join_window(spark, sf_dir):
    """Windowed stream-stream LEFT join — StreamToStreamJoinExample.scala:93:
    unmatched purchases pass through with a null right side (combiner sees
    null, Kafka Streams semantics). Same range-bounded join plan as the
    inner variant; the outer side adds no extra shuffle."""
    ev = load_table(spark, "events", sf_dir)
    purchases = KStream.from_df(
        ev.filter(F.col("event_type") == "purchase"),
        key="user_id", value=F.struct(F.col("event_id"), F.col("value")), timestamp="ts",
    )
    errors = KStream.from_df(
        ev.filter(F.col("event_type") == "error"),
        key="user_id", value=F.struct(F.col("event_id"), F.col("value")), timestamp="ts",
    )
    joined = purchases.left_join(
        errors,
        lambda v1, v2: F.struct(
            v1["event_id"].alias("left_id"),
            v2["event_id"].alias("right_id"),
            cents(v1["value"] + F.coalesce(v2["value"], F.lit(0.0))).alias("v"),
        ),
        JoinWindows.of("1 hour"),
    )
    return joined.to_df().select(
        "key",
        F.col("value.left_id").alias("left_id"),
        F.col("value.right_id").alias("right_id"),
        F.col("value.v").alias("value"),
    )


@register(
    "stream_stream_outer_join_window",
    "SELECT COALESCE(e1.user_id, e2.user_id) AS key, e1.event_id AS left_id, "
    "e2.event_id AS right_id, "
    "CAST(ROUND((COALESCE(e1.value, 0) + COALESCE(e2.value, 0)) * 100, 0) AS BIGINT) AS value "
    "FROM (SELECT * FROM events WHERE event_type = 'purchase') e1 "
    "FULL OUTER JOIN (SELECT * FROM events WHERE event_type = 'error') e2 "
    "ON e1.user_id = e2.user_id "
    "AND e2.ts BETWEEN e1.ts - INTERVAL 1 HOUR AND e1.ts + INTERVAL 1 HOUR",
)
def stream_stream_outer_join_window(spark, sf_dir):
    """Windowed stream-stream FULL OUTER join — StreamToStreamJoinExample.scala:94."""
    ev = load_table(spark, "events", sf_dir)
    purchases = KStream.from_df(
        ev.filter(F.col("event_type") == "purchase"),
        key="user_id", value=F.struct(F.col("event_id"), F.col("value")), timestamp="ts",
    )
    errors = KStream.from_df(
        ev.filter(F.col("event_type") == "error"),
        key="user_id", value=F.struct(F.col("event_id"), F.col("value")), timestamp="ts",
    )
    joined = purchases.outer_join(
        errors,
        lambda v1, v2: F.struct(
            v1["event_id"].alias("left_id"),
            v2["event_id"].alias("right_id"),
            cents(
                F.coalesce(v1["value"], F.lit(0.0)) + F.coalesce(v2["value"], F.lit(0.0))
            ).alias("v"),
        ),
        JoinWindows.of("1 hour"),
    )
    return joined.to_df().select(
        "key",
        F.col("value.left_id").alias("left_id"),
        F.col("value.right_id").alias("right_id"),
        F.col("value.v").alias("value"),
    )


@register(
    "stream_table_left_join",
    "SELECT o.o_custkey AS key, "
    "CAST(CAST(ROUND(o.o_totalprice*100, 0) AS BIGINT) AS VARCHAR) || ':' || "
    "COALESCE(c.c_mktsegment, 'none') AS value "
    "FROM orders o LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 3 = 0) c "
    "ON o.o_custkey = c.c_custkey",
)
def stream_table_left_join(spark, sf_dir):
    """Stream ⟕ table — StreamToTableJoinExample.scala:108: stream records
    keep flowing when the table has no entry for the key (combiner sees
    null). Table side filtered to 1/3 of keys to exercise the miss path."""
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir).filter(F.col("c_custkey") % 3 == 0)
    clicks = KStream.from_df(orders, key="o_custkey", value=F.col("o_totalprice"))
    segments = KTable(
        customer.select(F.col("c_custkey").alias("key"), F.col("c_mktsegment").alias("value"))
    )
    joined = clicks.left_join(
        segments,
        lambda price, seg: F.concat_ws(
            ":", cents(price).cast("string"), F.coalesce(seg, F.lit("none"))
        ),
    )
    return joined.to_df().select("key", "value")


@register(
    "table_table_left_join",
    "SELECT c.c_custkey AS key, "
    "c.c_mktsegment || '-' || COALESCE(lo.o_orderstatus, 'none') AS value "
    "FROM customer c LEFT JOIN ("
    "  SELECT o_custkey, o_orderstatus FROM ("
    "    SELECT o_custkey, o_orderstatus, "
    "           row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rn "
    "    FROM orders WHERE o_custkey % 2 = 0) t WHERE rn = 1"
    ") lo ON c.c_custkey = lo.o_custkey",
)
def table_table_left_join(spark, sf_dir):
    """Table ⟕ table — TableToTableJoinExample.scala:116-117 (right side
    restricted to even custkeys so the null branch is exercised)."""
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_custkey") % 2 == 0)
    cust_t = KTable(customer.select(F.col("c_custkey").alias("key"), F.col("c_mktsegment").alias("value")))
    latest_order = KStream.from_df(
        orders, key="o_custkey", value="o_orderstatus", offset="o_orderkey"
    ).to_table()
    joined = cust_t.left_join(
        latest_order,
        lambda seg, st: F.concat(seg, F.lit("-"), F.coalesce(st, F.lit("none"))),
    )
    return joined.to_df()


@register(
    "merge_streams",
    "SELECT event_id AS key, event_type AS value FROM events WHERE event_type = 'purchase' "
    "UNION ALL SELECT event_id AS key, event_type AS value FROM events WHERE event_type = 'error'",
)
def merge_streams(spark, sf_dir):
    """KStream#merge (DSL op available but unused in the reference —
    SURVEY §2d note): interleave two streams. Pure union, no shuffle."""
    ev = load_table(spark, "events", sf_dir)
    purchases = KStream.from_df(ev.filter(F.col("event_type") == "purchase"), key="event_id", value="event_type")
    errors = KStream.from_df(ev.filter(F.col("event_type") == "error"), key="event_id", value="event_type")
    return purchases.merge(errors).to_df()


@register(
    "distinct_pairs",
    "SELECT DISTINCT user_id AS key, event_type AS value FROM events",
)
def distinct_pairs(spark, sf_dir):
    """dropDuplicates — engine-completeness op (SURVEY §2d note): exact
    distinct on (key, value). One shuffle on both columns with map-side
    partial dedup."""
    s = _events_stream(spark, sf_dir, value="event_type")
    return s.to_df().select("key", "value").dropDuplicates()


@register(
    "count_distinct_types",
    "SELECT user_id AS key, count(DISTINCT event_type) AS value FROM events GROUP BY user_id",
)
def count_distinct_types(spark, sf_dir):
    """Exact distinct-count per key (approx_count_distinct is the scale
    path — same plan shape with an HLL sketch instead of the dedup)."""
    s = _events_stream(spark, sf_dir, value="event_type")
    return s.group_by_key().aggregate(lambda v: F.count_distinct(v)).to_df()


@register(
    "approx_distinct_users",
    # HLL estimates are engine-specific, so the gate checks the derived
    # invariant instead: exact per-key cardinality (a real data value)
    # plus the sketch's 3σ error contract as a boolean (VERDICT r10
    # task 3 — rows-only entries earn externally checkable oracles).
    "SELECT event_type AS key, count(DISTINCT user_id) AS n_exact, "
    "TRUE AS within_3rsd FROM events GROUP BY 1",
)
def approx_distinct_users(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++, rsd 2%) — the 100 TB-scale
    substitute for exact distinct: no dedup shuffle, constant-size sketch
    merged map-side. The production query is the estimate alone; this
    CALIBRATION entry scores the estimate against the exact count in the
    same pass and emits (key, n_exact, within_3rsd) so the external gate
    hash-verifies the keys, the exact cardinalities, and the 3·rsd error
    bound (tests/test_aggregations.py pins the same bound AND reports
    the raw margin ratio, so a red is diagnosable as statistical vs
    regression).

    STATISTICAL-GATE CONTRACT (ADVICE r11): within_3rsd is a 3σ bound —
    ~0.3% per-key failure mass on an adversarial fixture. It is
    deterministic per fixture (HLL++ is seed-free here) and verified
    green at sf0.001/0.01/0.1 on the driver corpus; before pointing the
    gate at a NEW scale factor or regenerated fixture, re-verify via
    tools/check_oracle.py first — a red on fresh data may be the bound's
    tail, not a code regression (the test's margin print tells which)."""
    ev = load_table(spark, "events", sf_dir)
    agg = ev.groupBy(F.col("event_type").alias("key")).agg(
        F.approx_count_distinct("user_id", 0.02).alias("_est"),
        F.count_distinct("user_id").alias("n_exact"),
    )
    return agg.select(
        "key",
        "n_exact",
        (
            F.abs(F.col("_est") - F.col("n_exact")).cast("double")
            <= F.lit(3 * 0.02) * F.col("n_exact").cast("double") + F.lit(1.0)
        ).alias("within_3rsd"),
    )


def _hll_users_oracle() -> str:
    from kafka_streams_demo_spark.functions.sketches import hll_registers_sql

    return hll_registers_sql(
        "user_id::VARCHAR", "FROM events WHERE user_id IS NOT NULL", p=9, seed=42
    )


_HLL_REGS_ORACLE: str
_CMS_USERS_ORACLE: str


@register("hll_registers_users", None)  # oracle attached below (shared string)
def hll_registers_users(spark, sf_dir):
    """Deterministic HyperLogLog register build (functions/sketches.py) —
    the hash-gated sibling of the rows-only `approx_distinct_users`:
    every hash is the repo's 60-bit md5 integer, so the 512-register
    table is bit-equal between Spark and DuckDB and the FULL value hash
    gate applies (Spark's own HLL++ sketch is engine-private). Scale: one
    groupBy over <= 512 keys, max() map-side combined — reducer state is
    O(registers) no matter how many rows scan in."""
    from kafka_streams_demo_spark.functions.sketches import hll_registers

    ev = load_table(spark, "events", sf_dir)
    return hll_registers(ev, "user_id", p=9, seed=42)


@register("hll_merge_incremental", None)  # SAME oracle as hll_registers_users
def hll_merge_incremental(spark, sf_dir):
    """Mergeable-sketch identity under the external hash gate: build HLL
    registers over two disjoint halves of events (even / odd event_id —
    yesterday's sketch and today's delta), merge with per-bucket max, and
    register against the SAME oracle as `hll_registers_users` — a driver
    green PROVES merge(old, delta) == rebuild(all) bit-for-bit. This is
    the sketch-family member of the index+delta contract (minhash_index,
    bm25_postings_incremental, ann_ivf_assign_incremental): at 100 TB the
    nightly job merges O(registers)-sized state instead of rescanning the
    corpus."""
    from kafka_streams_demo_spark.functions.sketches import hll_merge, hll_registers

    ev = load_table(spark, "events", sf_dir)
    old = hll_registers(ev.filter(F.col("event_id") % 2 == 0), "user_id", p=9, seed=42)
    delta = hll_registers(ev.filter(F.col("event_id") % 2 == 1), "user_id", p=9, seed=42)
    return hll_merge(old, delta)


@register("hll_distinct_users", None)  # oracle attached below (derived string)
def hll_distinct_users(spark, sf_dir):
    """HLL cardinality estimate from the register table — the full
    Flajolet bias-corrected harmonic mean with the small-range
    linear-counting correction, all replayed by the oracle: the 2^-M_j
    terms fold in sorted order (the cross-engine float-sum rule), empty
    buckets contribute (m - nonzero) exactly, alpha is the same literal
    arithmetic both sides. One row out of a 100 TB scan."""
    from kafka_streams_demo_spark.functions.sketches import hll_estimate, hll_registers

    ev = load_table(spark, "events", sf_dir)
    return hll_estimate(hll_registers(ev, "user_id", p=9, seed=42), p=9)


def _cms_users_oracle() -> str:
    from kafka_streams_demo_spark.functions.sketches import cms_sketch_sql

    return cms_sketch_sql(
        "user_id", "FROM events WHERE user_id IS NOT NULL", depth=3, width=128, seed=42
    )


_KMV_SKETCH_ORACLE = """
WITH hs AS (SELECT DISTINCT ('0x' || substr(md5('42:' || user_id), 1, 15))::BIGINT AS hv
            FROM events WHERE user_id IS NOT NULL)
SELECT hv FROM hs ORDER BY hv LIMIT 64
"""


@register("kmv_sketch_users", _KMV_SKETCH_ORACLE)
def kmv_sketch_users(spark, sf_dir):
    """Bottom-k (KMV) sketch build (functions/sketches.py, Bar-Yossef et
    al. 2002): the 64 smallest distinct user hashes — the third
    mergeable-sketch family member (cardinality AND a uniform distinct
    sample, which HLL/CMS can't give). Distinct is map-side combined;
    the bottom-k compiles to TakeOrderedAndProject heaps."""
    from kafka_streams_demo_spark.functions.sketches import kmv_sketch

    ev = load_table(spark, "events", sf_dir)
    return kmv_sketch(ev, "user_id", k=64, seed=42)


@register("kmv_merge_incremental", _KMV_SKETCH_ORACLE)  # SAME oracle: merge == rebuild
def kmv_merge_incremental(spark, sf_dir):
    """KMV mergeability under the hash gate: bottom-64 of the even/odd
    event halves merged (union -> distinct -> bottom-64) equals the
    one-shot sketch exactly — the k smallest of a union are always
    within the union of each side's k smallest. Same-oracle
    registration proves it externally, completing the mergeable-sketch
    triad (HLL max-merge, CMS sum-merge, KMV bottom-k-merge)."""
    from kafka_streams_demo_spark.functions.sketches import kmv_merge, kmv_sketch

    ev = load_table(spark, "events", sf_dir)
    a = kmv_sketch(ev.filter(F.col("event_id") % 2 == 0), "user_id", 64, 42)
    b = kmv_sketch(ev.filter(F.col("event_id") % 2 == 1), "user_id", 64, 42)
    return kmv_merge(64, a, b)


def _qsketch_oracle() -> str:
    # route the hash through sketches._hash60_sql so the oracle can
    # never drift from _hash60's seed-prefix/digit format
    from kafka_streams_demo_spark.functions.sketches import _hash60_sql

    hv = _hash60_sql("CAST(event_id AS VARCHAR)", 42)
    return f"""
SELECT hv, v FROM (
  SELECT {hv} AS hv, CAST(value AS DOUBLE) AS v
  FROM events WHERE event_id IS NOT NULL AND value IS NOT NULL
) ORDER BY hv, v LIMIT 256
"""


_QSKETCH_ORACLE = _qsketch_oracle()


@register("quantile_sketch_value", _QSKETCH_ORACLE)
def quantile_sketch_value_q(spark, sf_dir):
    """Bottom-k-sample quantile sketch build (functions/sketches.py:
    quantile_sketch) — the FOURTH mergeable-sketch family member: the
    256 event rows with smallest row-key hash are a deterministic
    uniform sample whose quantiles estimate the population's with
    O(1/sqrt(k)) error. Unlike GK/KLL (insertion-order state), the
    sample is a pure function of the data, so the sketch sits under the
    hash gate; per-partition TakeOrdered heaps, never a full sort."""
    from kafka_streams_demo_spark.functions.sketches import quantile_sketch

    ev = load_table(spark, "events", sf_dir)
    return quantile_sketch(ev, "value", "event_id", k=256, seed=42)


@register("quantile_merge_incremental", _QSKETCH_ORACLE)  # SAME oracle: merge == rebuild
def quantile_merge_incremental_q(spark, sf_dir):
    """Quantile-sketch mergeability under the hash gate: bottom-256 of
    the even/odd event halves merged equals the one-shot sketch exactly
    (the KMV argument on row-key hashes). Same-oracle registration
    proves merge ≡ rebuild externally — the quartet's fourth member
    joins the HLL/CMS/KMV merge proofs."""
    from kafka_streams_demo_spark.functions.sketches import (
        quantile_sketch,
        quantile_sketch_merge,
    )

    ev = load_table(spark, "events", sf_dir)
    a = quantile_sketch(ev.filter(F.col("event_id") % 2 == 0), "value", "event_id", 256, 42)
    b = quantile_sketch(ev.filter(F.col("event_id") % 2 == 1), "value", "event_id", 256, 42)
    return quantile_sketch_merge(256, a, b)


@register(
    "quantile_estimate_value",
    f"""
    WITH sk AS ({_QSKETCH_ORACLE})
    SELECT CAST(count(*) AS BIGINT) AS n_sample,
           ROUND(quantile_cont(v, 0.25), 6) AS q_25,
           ROUND(quantile_cont(v, 0.5), 6) AS q_50,
           ROUND(quantile_cont(v, 0.75), 6) AS q_75,
           ROUND(quantile_cont(v, 0.9), 6) AS q_90,
           ROUND(quantile_cont(v, 0.99), 6) AS q_99
    FROM sk
    """,
)
def quantile_estimate_value_q(spark, sf_dir):
    """Quantile estimates from the sketch sample: Spark's exact
    interpolated percentile over the 256 sampled values ≡ DuckDB
    quantile_cont at 6 dp (the cross-engine pair the exact-percentile
    entries pin). At 100 TB the population quantile costs a full sort
    or a non-replayable approx sketch; this is O(k) state, mergeable,
    and hash-gated end-to-end."""
    from kafka_streams_demo_spark.functions.sketches import (
        quantile_estimate,
        quantile_sketch,
    )

    ev = load_table(spark, "events", sf_dir)
    return quantile_estimate(quantile_sketch(ev, "value", "event_id", k=256, seed=42))


@register(
    "kmv_distinct_users",
    """
WITH sk AS (WITH hs AS (SELECT DISTINCT ('0x' || substr(md5('42:' || user_id), 1, 15))::BIGINT AS hv
            FROM events WHERE user_id IS NOT NULL)
SELECT hv FROM hs ORDER BY hv LIMIT 64),
agg AS (SELECT count(*) AS n, max(hv) AS kth FROM sk)
SELECT CAST(n AS BIGINT) AS n_hashes,
       ROUND(CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
                  ELSE 63.0 * 1152921504606846976.0 / CAST(kth AS DOUBLE) END,
             6) AS estimate
FROM agg
""",
)
def kmv_distinct_users(spark, sf_dir):
    """KMV cardinality estimate: (k-1) * HASH_SPACE / kth_minimum (exact
    when fewer than k distinct values exist). One integer max + one
    division — the simplest hash-gated distinct estimator, next to the
    HLL register formulation."""
    from kafka_streams_demo_spark.functions.sketches import kmv_estimate, kmv_sketch

    ev = load_table(spark, "events", sf_dir)
    return kmv_estimate(kmv_sketch(ev, "user_id", 64, 42), k=64)


@register(
    "kmv_jaccard_click_purchase",
    """
WITH ha AS (SELECT DISTINCT ('0x' || substr(md5('42:' || user_id), 1, 15))::BIGINT AS hv
            FROM events WHERE user_id IS NOT NULL AND event_type = 'click'),
sa AS (SELECT hv FROM ha ORDER BY hv LIMIT 64),
hb AS (SELECT DISTINCT ('0x' || substr(md5('42:' || user_id), 1, 15))::BIGINT AS hv
            FROM events WHERE user_id IS NOT NULL AND event_type = 'purchase'),
sb AS (SELECT hv FROM hb ORDER BY hv LIMIT 64),
uk AS (SELECT hv FROM (SELECT DISTINCT hv FROM (SELECT hv FROM sa UNION ALL SELECT hv FROM sb))
       ORDER BY hv LIMIT 64),
ib AS (SELECT uk.hv FROM uk
       WHERE uk.hv IN (SELECT hv FROM sa) AND uk.hv IN (SELECT hv FROM sb))
SELECT CAST((SELECT count(*) FROM uk) AS BIGINT) AS sample_size,
       CAST((SELECT count(*) FROM ib) AS BIGINT) AS in_both,
       ROUND(CAST((SELECT count(*) FROM ib) AS DOUBLE)
             / (SELECT count(*) FROM uk), 6) AS jaccard
""",
)
def kmv_jaccard_click_purchase(spark, sf_dir):
    """Audience-overlap estimation from KMV sketches (Beyer et al.
    SIGMOD'07): the bottom-k of A UNION B is a uniform sample of the
    union, so the fraction present in both sketches estimates
    Jaccard(clickers, purchasers) from O(k) state per side — no
    distinct-join over the log. The set-overlap capability that
    motivates bottom-k over HLL."""
    from kafka_streams_demo_spark.functions.sketches import kmv_jaccard

    ev = load_table(spark, "events", sf_dir)
    return kmv_jaccard(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        "user_id", k=64, seed=42,
    )


@register(
    "kmv_overlap_event_types",
    """
WITH d AS (SELECT DISTINCT event_type AS key,
                  ('0x' || substr(md5('42:' || user_id), 1, 15))::BIGINT AS hv
           FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
sk AS (SELECT key, hv FROM
       (SELECT key, hv, row_number() OVER (PARTITION BY key ORDER BY hv) AS rn FROM d)
       WHERE rn <= 64),
keys AS (SELECT DISTINCT key FROM sk),
pairs AS (SELECT a.key AS key_a, b.key AS key_b FROM keys a JOIN keys b ON a.key < b.key),
ra AS (SELECT p.key_a, p.key_b, s.hv, 1 AS ia, 0 AS ib
       FROM pairs p JOIN sk s ON s.key = p.key_a),
rb AS (SELECT p.key_a, p.key_b, s.hv, 0 AS ia, 1 AS ib
       FROM pairs p JOIN sk s ON s.key = p.key_b),
m AS (SELECT key_a, key_b, hv, max(ia) AS in_a, max(ib) AS in_b
      FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY 1, 2, 3),
uk AS (SELECT * FROM
       (SELECT m.*, row_number() OVER (PARTITION BY key_a, key_b ORDER BY hv) AS rn FROM m)
       WHERE rn <= 64)
SELECT key_a, key_b, CAST(count(*) AS BIGINT) AS sample_size,
       CAST(sum(in_a * in_b) AS BIGINT) AS in_both,
       ROUND(CAST(sum(in_a * in_b) AS DOUBLE) / count(*), 6) AS jaccard
FROM uk GROUP BY 1, 2
""",
)
def kmv_overlap_event_types(spark, sf_dir):
    """All-pairs audience-overlap matrix from per-key KMV sketches
    (functions/sketches.py:kmv_overlap_matrix) — the sketch table as
    INFRASTRUCTURE: every event-type pair's Jaccard estimated in ONE
    plan over O(groups x k) sketch rows, where exact answers would cost
    a distinct-join per pair over the raw log. Bottom-k of each pair's
    union via per-pair WindowGroupLimit heaps."""
    from kafka_streams_demo_spark.functions.sketches import kmv_overlap_matrix

    ev = load_table(spark, "events", sf_dir)
    return kmv_overlap_matrix(ev, "event_type", "user_id", k=64, seed=42)


@register("cms_sketch_users", None)  # oracle attached below (shared string)
def cms_sketch_users(spark, sf_dir):
    """Count-min sketch build (functions/sketches.py, Cormode &
    Muthukrishnan 2005) over events.user_id, depth 3 x width 128 — the
    frequency sketch whose cell table is the whole contract: md5-derived
    row hashes make it bit-equal across engines. Build counts per VALUE
    first (one map-side-combined shuffle), then expands depth rows per
    DISTINCT value — the d-fold blowup prices on |distinct|, never on the
    100 TB row count."""
    from kafka_streams_demo_spark.functions.sketches import cms_sketch

    ev = load_table(spark, "events", sf_dir)
    return cms_sketch(ev, "user_id", depth=3, width=128, seed=42)


@register("cms_merge_incremental", None)  # SAME oracle as cms_sketch_users
def cms_merge_incremental(spark, sf_dir):
    """CMS mergeability under the hash gate: sketches of the even / odd
    event halves merged by per-cell SUM (counters are linear), registered
    against the SAME oracle as `cms_sketch_users` — the driver green
    proves merge(old, delta) == rebuild(all) exactly, the count-min half
    of the mergeable-sketch contract."""
    from kafka_streams_demo_spark.functions.sketches import cms_merge, cms_sketch

    ev = load_table(spark, "events", sf_dir)
    old = cms_sketch(ev.filter(F.col("event_id") % 2 == 0), "user_id", 3, 128, 42)
    delta = cms_sketch(ev.filter(F.col("event_id") % 2 == 1), "user_id", 3, 128, 42)
    return cms_merge(old, delta)


@register(
    "cms_point_queries",
    """
WITH sk AS ({CMS_SKETCH}),
items AS (SELECT DISTINCT user_id FROM events WHERE user_id % 13 = 0),
probes AS (SELECT user_id, r.r,
                  ('0x' || substr(md5(':' || '42' || '.' || r.r || ':' || user_id),
                                  1, 15))::BIGINT % 128 AS bucket
           FROM items CROSS JOIN (SELECT unnest(range(0, 3)) AS r) r),
cells AS (SELECT p.user_id, coalesce(sk.cnt, 0) AS cell
          FROM probes p LEFT JOIN sk ON p.r = sk.row AND p.bucket = sk.bucket),
est AS (SELECT user_id, CAST(min(cell) AS BIGINT) AS cms_count
        FROM cells GROUP BY 1),
exact AS (SELECT user_id, count(*) AS exact_count
          FROM events WHERE user_id % 13 = 0 GROUP BY 1)
SELECT est.user_id, est.cms_count, exact.exact_count
FROM est JOIN exact USING (user_id)
""",
)
def cms_point_queries(spark, sf_dir):
    """CMS point queries with the exact counts alongside: est = min over
    the 3 rows of the item's cell (missing cell = 0), always >= exact —
    the classic (eps, delta) overestimate bound, here VISIBLE in the
    gated output. Scale: the probe side joins the <= 384-cell sketch
    (broadcast-sized residue of the corpus); the exact column is one
    combined groupBy for demonstration — production keeps only the
    sketch probe."""
    from kafka_streams_demo_spark.functions.sketches import cms_estimate, cms_sketch

    ev = load_table(spark, "events", sf_dir)
    sketch = cms_sketch(ev, "user_id", 3, 128, 42)
    items = ev.select("user_id").filter(F.col("user_id") % 13 == 0).distinct()
    est = cms_estimate(sketch, items, "user_id", 3, 128, 42).select(
        F.col("item").alias("user_id"), "cms_count"
    )
    exact = (
        ev.filter(F.col("user_id") % 13 == 0)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return est.join(exact, "user_id")


# Shared / derived oracle strings for the sketch family: the two
# incremental entries register the SAME string as their full-build
# sibling (same-oracle bit-equality pattern), and the estimate derives
# from the registers string.
_HLL_REGS_ORACLE = _hll_users_oracle()
_CMS_USERS_ORACLE = _cms_users_oracle()
ORACLES["hll_registers_users"] = _HLL_REGS_ORACLE
ORACLES["hll_merge_incremental"] = _HLL_REGS_ORACLE
ORACLES["cms_sketch_users"] = _CMS_USERS_ORACLE
ORACLES["cms_merge_incremental"] = _CMS_USERS_ORACLE
ORACLES["cms_point_queries"] = ORACLES["cms_point_queries"].replace(
    "{CMS_SKETCH}", _CMS_USERS_ORACLE
)


def _hll_estimate_oracle() -> str:
    from kafka_streams_demo_spark.functions.sketches import hll_estimate_sql

    return hll_estimate_sql(_HLL_REGS_ORACLE, p=9)


ORACLES["hll_distinct_users"] = _hll_estimate_oracle()


@register(
    "hll_distinct_by_type",
    """
WITH hsh AS (SELECT event_type AS key,
                    ('0x' || substr(md5('42:' || user_id), 1, 15))::BIGINT AS hv
             FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
parts AS (SELECT key, hv & 511 AS bucket, hv >> 9 AS suffix FROM hsh),
rho AS (SELECT key, bucket,
               CASE WHEN suffix = 0 THEN 52 ELSE 52 - length(bin(suffix)) END AS r
        FROM parts),
regs AS (SELECT key, bucket, max(r) AS register FROM rho GROUP BY 1, 2),
acc AS (SELECT key, count(*) AS nz,
               list_sum(list_sort(list(pow(2.0, -register)))) AS present
        FROM regs GROUP BY 1),
est AS (SELECT key, nz, (512 - nz) AS zeros,
               (0.7213 / (1.0 + 1.079 / 512.0)) * 512.0 * 512.0
                   / (CAST(512 - nz AS DOUBLE) + present) AS raw
        FROM acc)
SELECT key, CAST(nz AS BIGINT) AS nonzero_buckets,
       ROUND(CASE WHEN raw <= 1280.0 AND zeros > 0
                  THEN 512.0 * ln(512.0 / CAST(zeros AS DOUBLE))
                  ELSE raw END, 6) AS estimate
FROM est
""",
)
def hll_distinct_by_type(spark, sf_dir):
    """Per-key HLL distinct estimates (functions/sketches.py:
    hll_registers_grouped) — the HASH-GATED upgrade of the rows-only
    `approx_distinct_users` (same query shape: distinct users per
    event_type, but the sketch hashing is the repo's own md5 math, so
    the estimates themselves replay in SQL). One groupBy on
    (key, bucket) — reducer state O(groups x 512) regardless of row
    count — then a per-key sorted fold for the estimate."""
    from kafka_streams_demo_spark.functions.sketches import (
        hll_estimate_grouped,
        hll_registers_grouped,
    )

    ev = load_table(spark, "events", sf_dir)
    regs = hll_registers_grouped(ev, "event_type", "user_id", p=9, seed=42)
    return hll_estimate_grouped(regs, p=9)


_PR_EDGES_CTE = """
SELECT src, dst FROM (
  WITH cs AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
  SELECT 'c:' || c AS src, 's:' || s AS dst FROM cs
  UNION ALL
  SELECT 's:' || s AS src, 'c:' || c AS dst FROM cs
) bidir
"""


def _pr_edges(spark, sf_dir, hub_cap: int = 100_000):
    """Bidirectional customer↔supplier trade edges WITH per-row source
    out-degree (src, dst, _od) — feed ``pagerank(..., outdeg_col="_od")``.

    ONE pass over the join output: orders⋈lineitem under a SHUFFLE_HASH
    hint, then ``collect_set(suppkey)`` per customer. The hint pins the
    strategy a 100 TB run needs — per-partition hash build of the 2-int
    orders projection, no sort of either input (the planner's choices
    are broadcast at bench scale, where the projection is ~4 MB, and
    SMJ beyond the broadcast threshold, whose two full sorts nothing
    downstream reuses — guide §3.2); measured equal-or-better than the
    auto pick locally (1.15 vs 1.43 s warm edge build at sf0.1). That one aggregate IS the
    dedup the previous ``.distinct()`` did, and the out-degrees fall
    out for free: deg(c:x) = size of x's supplier set (row-local), and
    deg(s:y) = y's distinct-customer count, a supplier-count-sized
    aggregate over the exploded sets that BROADCAST-joins back. Each
    pair then explodes into both directions row-locally. Versus the
    r12/early-r13 shape (distinct → explode → ``partitionBy(src)``
    window) this removes BOTH edge-wide post-join exchanges — the
    (custkey, suppkey) distinct and the string-keyed window Exchange+
    Sort over 2×|pairs| rows — leaving the custkey collect_set exchange
    (map-side partially aggregated) as the only pair-level shuffle.
    Set- and _od-identical to the window form (A/B exceptAll both ways
    = 0 at sf0.1; tests/test_graph.py pins the outdeg_col contract).

    Hot-key cap (r14, VERDICT r13 task 4 — the r13 caveat wired in, not
    just described): a customer's distinct-supplier set materializes as
    one array row — fine wherever adjacency lists fit (any bipartite
    trade graph; TPC-H: ≤ ~40), but a power-law hub beyond row-size
    comfort must not build one giant row. Customers whose DEGREE UPPER
    BOUND exceeds ``hub_cap`` get their sets split across
    ceil(bound/cap) deterministic salt buckets INSIDE the same
    aggregate (arrays stay ≈cap-bounded; one pair exchange as before),
    and their _odc is the salted sizes summed over a window that
    exchanges ONLY the hub rows. The trigger is conservative and never
    re-runs the pair join: per-customer LINEITEM totals (≥ the distinct
    supplier count) from the |orders|-row (orderkey → custkey)
    projection joined to per-order lineitem counts, COLLECTED (hub sets
    are a handful of rows by the power-law assumption) so that the
    no-hub case — every non-adversarial dataset, TPC-H included —
    compiles to exactly the r13 plan and pays only the one trigger
    aggregate job (skew-fixture parity is test-pinned in
    tests/test_graph.py::test_pr_edges_hub_cap_routes_hot_customers).

    Remaining scale caveats: ``F.broadcast(scnt)`` ships a
    |suppliers|-row table (TPC-H: |customers|/15 — MBs at bench scale,
    GBs at 100 TB where it exceeds the broadcast cap; past that, drop
    the hint and let AQE pick the suppkey-keyed exchange the r12 window
    form paid), and the hot-customer table itself is assumed to be a
    handful of rows (power-law hubs), which is what justifies
    broadcasting it into the trigger join."""
    o = load_table(spark, "orders", sf_dir).hint("shuffle_hash")
    li = load_table(spark, "lineitem", sf_dir)
    licnt = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("_lc"))
    # the hot table is assumed to be a handful of rows (power-law hubs),
    # so COLLECT it: when empty — every non-adversarial dataset — the
    # build below emits exactly the r13 plan and the guard's entire cost
    # is the trigger itself (the lazy-DataFrame form was measured ~10%
    # worse at bench scale: three broadcast builds + the union/anti/semi
    # branches taxed the never-firing path). The trigger is HIERARCHICAL
    # so its common-case cost is one parquet-footer count: a customer's
    # degree is a count of DISTINCT suppliers, so deg ≤ |supplier table|
    # — while |suppliers| ≤ hub_cap NO customer can exceed the cap and
    # the per-customer lineitem-total pass (measured 0.9 s warm at
    # sf0.1) never runs.
    if load_table(spark, "supplier", sf_dir).count() <= hub_cap:
        hot_rows = []
    else:
        hot_rows = (
            load_table(spark, "orders", sf_dir)
            .select("o_orderkey", "o_custkey")
            .join(licnt, F.col("o_orderkey") == licnt["l_orderkey"])
            .groupBy("o_custkey")
            .agg(F.sum("_lc").alias("_ub"))
            .filter(F.col("_ub") > hub_cap)
            .select(
                "o_custkey",
                F.ceil(F.col("_ub") / F.lit(hub_cap)).cast("long").alias("_ns"),
            )
            .collect()
        )
    pj = o.join(li, o["o_orderkey"] == li["l_orderkey"])
    if not hot_rows:
        adj = (
            pj.groupBy("o_custkey")
            .agg(F.collect_set("l_suppkey").alias("_ss"))
            .localCheckpoint(eager=True)
        )
        cs0 = adj.select(
            "o_custkey",
            F.size("_ss").cast("double").alias("_odc"),
            F.explode("_ss").alias("l_suppkey"),
        )
    else:
        hot = F.broadcast(
            spark.createDataFrame(hot_rows, "o_custkey long, _ns long")
        )
        adj = (
            pj.join(hot, "o_custkey", "left")
            .groupBy(
                "o_custkey",
                F.coalesce(
                    F.pmod(F.xxhash64("l_suppkey"), F.col("_ns")), F.lit(0)
                ).alias("_sl"),
            )
            .agg(F.collect_set("l_suppkey").alias("_ss"))
            .localCheckpoint(eager=True)
        )
        # cold customers: exactly the r13 row-local form; hub customers:
        # _odc = Σ salted sizes — the window exchanges hub rows only
        # (salted sets are disjoint by the hash split, so the sum IS the
        # distinct count and explode still yields each pair once)
        from pyspark.sql import Window as _W

        cold_cs = adj.join(hot, "o_custkey", "left_anti").select(
            "o_custkey",
            F.size("_ss").cast("double").alias("_odc"),
            F.explode("_ss").alias("l_suppkey"),
        )
        hot_cs = (
            adj.join(hot, "o_custkey", "left_semi")
            .withColumn(
                "_odc",
                F.sum(F.size("_ss"))
                .over(_W.partitionBy("o_custkey"))
                .cast("double"),
            )
            .select("o_custkey", "_odc", F.explode("_ss").alias("l_suppkey"))
        )
        cs0 = cold_cs.unionByName(hot_cs)
    scnt = (
        adj.select(F.explode("_ss").alias("l_suppkey"))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("double").alias("_ods"))
    )
    cs = cs0.join(F.broadcast(scnt), "l_suppkey")
    c = F.concat(F.lit("c:"), F.col("o_custkey").cast("string"))
    s = F.concat(F.lit("s:"), F.col("l_suppkey").cast("string"))
    return cs.select(
        F.explode(
            F.array(
                F.struct(c.alias("src"), s.alias("dst"), F.col("_odc").alias("_od")),
                F.struct(s.alias("src"), c.alias("dst"), F.col("_ods").alias("_od")),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst", "_e._od")


def _pagerank_oracle() -> str:
    from kafka_streams_demo_spark.functions.graph import pagerank_sql

    return pagerank_sql(_PR_EDGES_CTE, iterations=3, damping=0.85)


@register("pagerank_cust_supp", None)  # oracle attached below (generated)
def pagerank_cust_supp(spark, sf_dir):
    """Fixed-iteration PageRank (functions/graph.py) over the
    customer↔supplier interaction graph (distinct trade pairs from
    orders⋈lineitem, both directions so no node dangles) — an ITERATIVE
    double-valued algorithm under the full hash gate: the oracle unrolls
    the same 3 iterations as CTE stages, contribution sums fold in
    sorted order on both engines, and damping constants are shared
    literals (0.15, never 1-0.85). Per iteration: one edge join + one
    groupBy(dst) shuffle. The sorted collect_list fold exists FOR the
    cross-engine gate; a production run on a power-law graph swaps in
    plain F.sum (order-free, no hot-node list) — same plan shape, and
    the gate has already proven the iteration logic."""
    from kafka_streams_demo_spark.functions.graph import pagerank

    return pagerank(
        _pr_edges(spark, sf_dir), iterations=3, damping=0.85, outdeg_col="_od"
    )


ORACLES["pagerank_cust_supp"] = _pagerank_oracle()


@register("pagerank_cust_supp_prod", None)  # oracle attached below (generated)
def pagerank_cust_supp_prod(spark, sf_dir):
    """The PRODUCTION PageRank plan over the same customer↔supplier
    graph: plain map-side-combined ``F.sum`` per destination
    (``exact_folds=False``) instead of the sorted ``collect_list`` fold
    the gated sibling replays. No per-node contribution list ever
    materializes, so a power-law hot node costs a partial-aggregated
    shuffle, not one reducer holding its full in-degree — the plan a
    100 TB run must use, and the one the bench measures (VERDICT r7
    task 2).

    Registered against the SAME unrolled-CTE oracle as
    ``pagerank_cust_supp`` (VERDICT r11 task 2): the two paths differ
    only in double-addition order (sub-1e-12 per node through 3
    iterations; realistically ~1e-16 for these ~100-term sums), and the
    shared final ``ROUND(rank, 6)`` projection absorbs it — 6dp parity
    is pinned by tests/test_graph.py::test_pagerank_plain_sum_parity_at_6dp,
    and no rank on the gate fixtures sits within 5e-11 of a rounding
    boundary (test_pagerank_prod_oracle_boundary_margin asserts it;
    measured worst 1.4e-10 at sf0.01 — ≥10^5x the noise floor).
    Residual risk: a NEW fixture could park a rank exactly on a .5e-6
    edge, where shuffle-order noise could flip the 6th decimal — the
    margin canary is the tripwire."""
    from kafka_streams_demo_spark.functions.graph import pagerank

    return pagerank(
        _pr_edges(spark, sf_dir),
        iterations=3,
        damping=0.85,
        exact_folds=False,
        outdeg_col="_od",
    )


ORACLES["pagerank_cust_supp_prod"] = _pagerank_oracle()


_TRI_EDGES_CTE = """
SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
FROM lineitem l1
JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
                AND l1.l_partkey < l2.l_partkey
"""


def _tri_oracle() -> str:
    from kafka_streams_demo_spark.functions.graph import triangle_counts_sql

    return triangle_counts_sql(_TRI_EDGES_CTE)


@register("triangle_counts_coorder", None)  # oracle attached below (generated)
def triangle_counts_coorder(spark, sf_dir):
    """Degree-oriented triangle counting (functions/graph.py, Suri &
    Vassilvitskii WWW'11) over the part co-order graph (parts bought in
    the same order). Orienting every edge from its lower-(degree, id)
    endpoint bounds each out-neighborhood at O(sqrt(m)), so the wedge
    shuffle is m^1.5 worst-case instead of sum(deg^2) — on a power-law
    co-occurrence graph at 100 TB that is the difference between a big
    join and an impossible one. Within-order pair expansion is bounded
    by order size (~7 lineitems in TPC-H). Pure integer math: the oracle
    replays orientation, wedges, and closure exactly.

    Edge build (r13): groupBy(order) + in-array pair expansion instead
    of the lineitem⋈lineitem self-join — the self-join shuffled the
    lineitem projection TWICE (both join inputs) and joined before the
    a<b filter could drop half the pairs; collecting each order's
    distinct sorted partkeys into one array row shuffles the table once
    and expands pairs JVM-native inside the row (bounded by order size,
    ~7 in TPC-H). Set-identical to the self-join (A/B exceptAll both
    ways = 0 at sf0.1; the shared oracle replays the self-join form)."""
    from kafka_streams_demo_spark.functions.graph import triangle_counts

    li = load_table(spark, "lineitem", sf_dir)
    arr = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    und = (
        arr.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ps"),
                        lambda x, i: F.transform(
                            F.slice(F.col("ps"), i + F.lit(2), F.size("ps")),
                            lambda y: F.struct(x.alias("a"), y.alias("b")),
                        ),
                    )
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .distinct()
    )
    return triangle_counts(und)


ORACLES["triangle_counts_coorder"] = _tri_oracle()


@register("triangle_counts_incremental", None)  # SAME oracle as batch build
def triangle_counts_incremental_q(spark, sf_dir):
    """Index+delta triangle maintenance (functions/graph.py): lineitems
    shipped before mid-1995 play the indexed graph, later shipments add
    edges. New triangles are found by probing the union adjacency from
    DELTA edges only (every gained triangle holds >= 1 new edge), deduped
    by canonical triple, and added to the old counts. Registered against
    the SAME oracle as `triangle_counts_coorder`, so a driver green
    proves old + delta == rebuild exactly — the graph-analytics member
    of the index+delta contract. Cost prices on delta-edge neighbor
    intersections, never the union wedge space.

    The old/delta split is built in ONE self-join+groupBy pass (r13):
    each co-order pair row carries (ship1 < cutoff AND ship2 < cutoff)
    and an edge is OLD iff any order asserts it — identical to the
    previous pairs(old) / pairs(all) / anti-join construction (old =
    distinct pairs among pre-cutoff lineitems; delta = the rest), which
    ran the lineitem self-join three times and the distinct twice
    inside the checkpoint job (guide §2.4 duplicated subtrees).

    Edge build (r13, second pass): the remaining self-join became a
    groupBy(order) + in-array pair expansion, same as the batch entry —
    per (order, part) the flag collapses first (max over an order's
    lineitem PAIRS of s1∧s2 equals max(s1)∧max(s2), a boolean identity),
    then each order's sorted (part, flag) structs expand to a<b pairs
    inside the row. One lineitem shuffle instead of two join inputs;
    flagged set A/B-identical both ways at sf0.1."""
    from kafka_streams_demo_spark.functions.graph import (
        triangle_counts_incremental,
    )

    li = load_table(spark, "lineitem", sf_dir)
    cutoff = F.lit("1995-06-01")
    # ONE lineitem-wide exchange (r13, third pass): collect every
    # (partkey, pre-cutoff?) struct per order, then collapse each
    # partkey's flag ROW-LOCALLY — array_sort orders runs (partkey asc,
    # s asc: false < true), so a run's LAST element carries max(s), and
    # the indexed filter keeps exactly those. Replaces the previous
    # groupBy(order, part).max(s) → groupBy(order).collect_list chain,
    # whose (order, part) partitioning cannot satisfy the second
    # groupBy's order-only clustering — two full-width lineitem
    # exchanges where one suffices (guide §2.3). Flag set A/B-identical
    # (exceptAll both ways = 0 at sf0.1) and the shared oracle gate
    # replays the (order, part)-max form.
    arr0 = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(
                F.struct("l_partkey", (F.col("l_shipdate") < cutoff).alias("s"))
            )
        ).alias("ps0")
    )
    arr = arr0.select(
        F.filter(
            F.col("ps0"),
            lambda x, i: (i == F.size("ps0") - 1)
            | (F.get(F.col("ps0"), i + 1)["l_partkey"] != x["l_partkey"]),
        ).alias("ps")
    )
    pairs = arr.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ps"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ps"), i + F.lit(2), F.size("ps")),
                        lambda y: F.struct(
                            x["l_partkey"].alias("a"),
                            y["l_partkey"].alias("b"),
                            (x["s"] & y["s"]).alias("f"),
                        ),
                    ),
                )
            )
        ).alias("e")
    ).select("e.a", "e.b", "e.f")
    flagged = pairs.groupBy("a", "b").agg((~F.max("f")).alias("_new"))
    return triangle_counts_incremental(flagged_union=flagged)


ORACLES["triangle_counts_incremental"] = _tri_oracle()


def _powerlaw_und(spark, sf_dir):
    from kafka_streams_demo_spark.functions.graph import powerlaw_edges

    n = load_table(spark, "documents", sf_dir).count()
    return powerlaw_edges(spark, n, edge_factor=4)


def _powerlaw_tri_oracle() -> str:
    from kafka_streams_demo_spark.functions.graph import (
        powerlaw_edges_cte,
        triangle_counts_sql,
    )

    return triangle_counts_sql(powerlaw_edges_cte())


@register("triangle_census_powerlaw", None)  # oracle attached below (generated)
def triangle_census_powerlaw_q(spark, sf_dir):
    """The triangle census on the graph shape it is DESIGNED for
    (VERDICT r10 task 5): a seeded power-law fixture (γ≈3,
    functions/graph.py:powerlaw_edges — |nodes| = |documents|, 4·n edge
    draws) instead of the degenerately dense TPC-H co-order graph. On
    the power-law graph the lower-(degree,id) orientation actually
    earns its keep — hub wedges collapse onto the √m-bounded
    out-neighborhoods, and the measured wedge space is a small multiple
    of the edge count instead of ~n² (measured reduction recorded in
    BASELINE.md r11). Fully SQL-replayable: the fixture is closed-form
    md5 arithmetic, the census pure integer math."""
    from kafka_streams_demo_spark.functions.graph import triangle_counts

    return triangle_counts(_powerlaw_und(spark, sf_dir))


ORACLES["triangle_census_powerlaw"] = _powerlaw_tri_oracle()


@register("triangle_census_powerlaw_incremental", None)  # SAME oracle as batch
def triangle_census_powerlaw_incremental_q(spark, sf_dir):
    """Index+delta triangle maintenance on the power-law fixture: the
    first 3/4 of edge draws play the indexed graph, the final quarter
    the ingest delta (anti-joined to true NEW edges). Registered against
    the SAME oracle as triangle_census_powerlaw, so a driver green
    proves old + delta == rebuild exactly on a realistically-skewed
    graph — delta probing cost prices on delta-edge degree sums, never
    the union wedge space."""
    from kafka_streams_demo_spark.functions.graph import (
        powerlaw_edges,
        triangle_counts_incremental,
    )

    n = load_table(spark, "documents", sf_dir).count()
    all_und = powerlaw_edges(spark, n, edge_factor=4)
    old_und = (
        powerlaw_edges(spark, n, edge_factor=3)
        # edge_factor=3 draws are exactly the t < 3n prefix of the
        # edge_factor=4 sequence (same hash stream), so "old" is a true
        # temporal prefix of the full graph.
    )
    delta_und = all_und.join(old_und, ["a", "b"], "left_anti")
    return triangle_counts_incremental(old_und, delta_und)


ORACLES["triangle_census_powerlaw_incremental"] = _powerlaw_tri_oracle()


def _cc_oracle() -> str:
    from kafka_streams_demo_spark.functions.graph import triangle_counts_sql

    return f"""
WITH und AS ({_TRI_EDGES_CTE}),
bd AS (SELECT node, count(*) AS dg FROM
       (SELECT a AS node FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
tri AS ({triangle_counts_sql(_TRI_EDGES_CTE)})
SELECT bd.node, CAST(bd.dg AS BIGINT) AS degree,
       CAST(coalesce(tri.triangles, 0) AS BIGINT) AS triangles,
       ROUND(2.0 * coalesce(tri.triangles, 0)
             / (bd.dg * (bd.dg - 1)), 6) AS coefficient
FROM bd LEFT JOIN tri ON bd.node = tri.node
WHERE bd.dg >= 2
"""


@register("clustering_coefficient", None)  # oracle attached below (generated)
def clustering_coefficient(spark, sf_dir):
    """Local clustering coefficient — 2T(v) / (deg(v)(deg(v)-1)) for
    deg >= 2 — composed from `triangle_counts` and the degree count, the
    cohesion metric the triangle census exists to feed. Same scale shape
    as the census (the wedge join dominates); the ratio is pure column
    math over the two aggregates."""
    from kafka_streams_demo_spark.functions.graph import triangle_counts

    li = load_table(spark, "lineitem", sf_dir)
    l1 = li.select("l_orderkey", F.col("l_partkey").alias("a"))
    l2 = li.select("l_orderkey", F.col("l_partkey").alias("b"))
    # materialize the co-purchase pair build once: the degree count reads
    # it twice (both union branches) and the census once more — Catalyst
    # replans the lineitem self-join + distinct per reference (r9 lesson)
    und = (
        l1.join(l2, "l_orderkey")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    ).localCheckpoint(eager=True)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangle_counts(und)
    return (
        deg.filter(F.col("degree") >= 2)
        .join(tri, "node", "left")
        .select(
            "node",
            F.col("degree").cast("long").alias("degree"),
            F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
            F.round(
                F.lit(2.0)
                * F.coalesce(F.col("triangles"), F.lit(0))
                / (F.col("degree") * (F.col("degree") - F.lit(1))),
                6,
            ).alias("coefficient"),
        )
    )


ORACLES["clustering_coefficient"] = _cc_oracle()


@register(
    "top_k_spenders",
    "SELECT user_id AS key, SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS total_c "
    "FROM events WHERE event_type = 'purchase' GROUP BY user_id "
    "ORDER BY total_c DESC, key LIMIT 10",
)
def top_k_spenders(spark, sf_dir):
    """Top-k — orderBy(...).limit(k) compiles to TakeOrderedAndProject:
    per-partition heaps + driver merge, never a full sort at scale."""
    ev = load_table(spark, "events", sf_dir).filter(F.col("event_type") == "purchase")
    s = KStream.from_df(ev, key="user_id", value=cents(F.col("value")))
    totals = s.group_by_key().aggregate(lambda v: F.sum(v)).to_df()
    return (
        totals.select("key", F.col("value").alias("total_c"))
        .orderBy(F.desc("total_c"), "key")
        .limit(10)
    )


@register(
    "windowed_key_render",
    "SELECT event_type || '@[' || CAST(date_trunc('hour', ts) AS VARCHAR) || ' : ' || "
    "CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS VARCHAR) || ']' AS key, "
    "count(*) AS value FROM events GROUP BY 1",
)
def windowed_key_render(spark, sf_dir):
    """Windowed-key rendering ``key@[start : end]`` —
    DSLStatefulTransformation.scala:117-123 over a tumbling count."""
    from kafka_streams_demo_spark.operators.grouped import windowed_key_string

    ev = load_table(spark, "events", sf_dir)
    s = KStream.from_df(ev, key="event_type", value="value", timestamp="ts")
    out = s.group_by_key().windowed_by(TimeWindows.of("1 hour")).count()
    return windowed_key_string(out)


@register(
    "tumbling_window_sum_cents",
    "SELECT event_type AS key, epoch_us(date_trunc('hour', ts)) AS window_start_us, "
    "SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS value FROM events GROUP BY 1, 2",
)
def tumbling_window_sum_cents(spark, sf_dir):
    """Windowed aggregate (beyond count) — windowedBy(...).aggregate(sum)."""
    ev = load_table(spark, "events", sf_dir)
    s = KStream.from_df(ev, key="event_type", value=cents(F.col("value")), timestamp="ts")
    out = s.group_by_key().windowed_by(TimeWindows.of("1 hour")).aggregate(lambda v: F.sum(v))
    return out.select("key", F.unix_micros("window_start").alias("window_start_us"), "value")


@register(
    "event_time_extract",
    "SELECT event_id AS key, epoch_us(COALESCE("
    "  CASE WHEN value >= 10 THEN ts END, "
    "  last_value(CASE WHEN value >= 10 THEN ts END IGNORE NULLS) "
    "    OVER (PARTITION BY user_id ORDER BY event_id "
    "          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), "
    "  TIMESTAMP '2020-01-01')) AS value "
    "FROM events",
)
def event_time_extract(spark, sf_dir):
    """TimestampExtractor fallback chain — MyEventTimeExtractor.java:9-25:
    embedded event time if valid (here: value >= 10 stands in for ts > 0),
    else the stream's previous valid timestamp (partition-time), else a
    fixed epoch (wall-clock stand-in, kept deterministic for the oracle)."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    embedded = F.when(F.col("value") >= 10, F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    extracted = F.coalesce(
        embedded,
        F.last(embedded, ignorenulls=True).over(w),
        F.lit("2020-01-01").cast("timestamp"),
    )
    return ev.select(
        F.col("event_id").alias("key"), F.unix_micros(extracted).alias("value")
    )


@register(
    "ktable_reduce_sum",
    "SELECT event_type AS key, SUM(c) AS value FROM ("
    "  SELECT event_type, CAST(ROUND(value*100, 0) AS BIGINT) AS c, "
    "         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn "
    "  FROM events) t WHERE rn = 1 GROUP BY 1",
)
def ktable_reduce_sum(spark, sf_dir):
    """KGroupedTable.reduce(adder, subtractor) —
    DSLStatefulTransformation.scala:107-111. No subtractor primitive needed:
    the agg is recomputed over the latest-state view per batch (SURVEY §2d),
    which is exactly adder/subtractor semantics at a coarser granularity."""
    ev = load_table(spark, "events", sf_dir)
    s = KStream.from_df(
        ev,
        key="user_id",
        value=F.struct(F.col("event_type").alias("t"), cents(F.col("value")).alias("c")),
        offset="event_id",
    )
    t = s.to_table()
    return t.group_by(lambda k, v: v["t"]).reduce(lambda v: F.sum(v["c"])).to_df()


@register(
    "peek_passthrough",
    "SELECT event_id AS key, CAST(ROUND(value*100, 0) AS BIGINT) AS value FROM events",
)
def peek_passthrough(spark, sf_dir):
    """peek/observe — DSLStatelessTransformation.scala:53: zero-cost metric
    tap via df.observe(); records pass through unchanged."""
    ev = load_table(spark, "events", sf_dir)
    s = KStream.from_df(ev, key="event_id", value=cents(F.col("value")))
    return s.observe("tap", F.count(F.lit(1)).alias("n")).to_df()


@register(
    "set_ops_intersect_except",
    "SELECT 'both' AS tag, event_type AS value FROM ("
    "  SELECT event_type FROM events WHERE user_id < 30 "
    "  INTERSECT SELECT event_type FROM events WHERE user_id >= 120) "
    "UNION ALL "
    "SELECT 'only_low' AS tag, event_type AS value FROM ("
    "  SELECT event_type FROM events WHERE value < 5 "
    "  EXCEPT SELECT event_type FROM events WHERE value >= 5)",
)
def set_ops_intersect_except(spark, sf_dir):
    """INTERSECT / EXCEPT — engine-completeness set ops (SURVEY §2d note)."""
    ev = load_table(spark, "events", sf_dir)
    low = ev.filter(F.col("user_id") < 30).select("event_type")
    high = ev.filter(F.col("user_id") >= 120).select("event_type")
    cheap = ev.filter(F.col("value") < 5).select("event_type")
    rich = ev.filter(F.col("value") >= 5).select("event_type")
    both = low.intersect(high).select(F.lit("both").alias("tag"), F.col("event_type").alias("value"))
    only = cheap.exceptAll(rich).distinct().select(
        F.lit("only_low").alias("tag"), F.col("event_type").alias("value")
    )
    return both.unionAll(only)


