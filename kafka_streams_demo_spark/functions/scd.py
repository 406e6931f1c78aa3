"""SCD2 (slowly-changing-dimension type 2) table maintenance.

The reference materializes a changelog's LATEST view as a KTable
(src/main/java/com/github/hosnimed/StreamToTableJoinDemo.java:41 —
`builder.table` keeps only the newest value per key). A warehouse
usually wants the other half too: the full VERSION HISTORY with validity
intervals — (key, value, valid_from, valid_to) where the open row has
valid_to NULL. That is the lakehouse MERGE pattern (Delta/Iceberg SCD2),
expressed here as plain DataFrames with an exact SQL oracle.

Two tiers, following the repo's index+delta contract:

- :func:`scd2_snapshot` — full rebuild from the changelog: one window
  pass (lead over (ts, tiebreak) per key).
- :func:`scd2_merge` — incremental: fold a LATER batch of changes into
  an existing SCD2 table touching only the affected keys. Closed history
  rows pass through untouched; open rows of unaffected keys pass through
  via an anti-join (batch-keys side is delta-sized — AQE broadcasts it
  when small); only (open rows of touched keys ∪ batch rows) enter the
  window recompute. At 100 TB the nightly merge prices on |batch|, not
  on the accumulated history.

Bit-equality with the rebuild: the catalog registers the merge entry
against the SAME oracle as the full snapshot, so a driver green PROVES
merge(scd2(old), batch) == scd2(old ∪ batch) externally. The contract
that makes the identity hold is the standard changelog watermark: every
batch row's timestamp is strictly later than every already-folded row of
the same key (true for any time-split ingest); ties WITHIN a batch or
within the initial build resolve by the caller's tiebreak column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_snapshot(
    changelog: DataFrame,
    keys: list[str],
    values: list[str],
    ts: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Full SCD2 rebuild: every change row becomes a version with
    ``valid_from_us`` = its event time and ``valid_to_us`` = the next
    version's start (NULL for the open row).

    ``values`` is a list of column NAMES carried into the version rows
    (pre-project computed values). Scale: ONE shuffle on the key (the
    window); lead() is a streaming frame, no buffering beyond a row."""
    # order by the projected micros (lossless: parquet ts is already µs)
    order = [F.col("valid_from_us")] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    vf = F.unix_micros(F.col(ts)).alias("valid_from_us")
    return (
        changelog.select(*keys, *values, vf, *([tiebreak] if tiebreak else []))
        .withColumn("valid_to_us", F.lead("valid_from_us").over(w))
        .drop(*([tiebreak] if tiebreak else []))
    )


def scd2_merge(
    current: DataFrame,
    batch: DataFrame,
    keys: list[str],
    values: list[str],
    ts: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Fold a later change batch into an existing SCD2 table.

    Three delta-priced parts, unioned into one lazy plan:
    - closed history rows (valid_to set) — append-only, pass through;
    - open rows of keys ABSENT from the batch — pass through via a
      left_anti join on the batch's distinct keys (delta-sized right
      side; join strategy left to AQE);
    - open rows of touched keys, replayed as changelog rows at their
      valid_from, unioned with the batch and re-windowed. Because every
      batch timestamp is strictly later than any open row of the same
      key (the watermark contract), no tiebreak against the replayed row
      is ever needed — the batch's own ties resolve by ``tiebreak``.
    """
    batch_keys = batch.select(*keys).distinct()
    closed = current.filter(F.col("valid_to_us").isNotNull())
    open_rows = current.filter(F.col("valid_to_us").isNull())
    untouched = open_rows.join(batch_keys, keys, "left_anti")

    # The tiebreak keeps its NATIVE type end-to-end (the replayed rows
    # carry a typed NULL matching the batch column) — a cast to long
    # would NULL out string tiebreaks and break the merge ≡ rebuild
    # identity scd2_snapshot guarantees (it orders by the raw column).
    tb_type = batch.schema[tiebreak].dataType if tiebreak else None
    replayed = open_rows.join(batch_keys, keys, "left_semi").select(
        *keys,
        *values,
        F.col("valid_from_us"),
        *([F.lit(None).cast(tb_type).alias("_tb")] if tiebreak else []),
    )
    batch_rows = batch.select(
        *keys,
        *values,
        F.unix_micros(F.col(ts)).alias("valid_from_us"),
        *([F.col(tiebreak).alias("_tb")] if tiebreak else []),
    )
    order = [F.col("valid_from_us")] + ([F.col("_tb")] if tiebreak else [])
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    recomputed = (
        replayed.unionByName(batch_rows)
        .withColumn("valid_to_us", F.lead("valid_from_us").over(w))
        .drop(*(["_tb"] if tiebreak else []))
    )
    return closed.unionByName(untouched).unionByName(recomputed)


def scd2_current(scd2: DataFrame) -> DataFrame:
    """The KTable-latest view of an SCD2 table: just the open rows —
    a filter, no shuffle (the reference's `builder.table` materialized
    view recovered from the history table)."""
    return scd2.filter(F.col("valid_to_us").isNull()).drop("valid_to_us")


def scd2_compact(scd2: DataFrame, cutoff_us: int) -> DataFrame:
    """Retention compaction: drop versions that EXPIRED before the
    cutoff (valid_to_us <= cutoff), keeping every version alive at or
    after it — including the one straddling the cutoff, so point-in-time
    queries remain exact for any t >= cutoff (and only those; that is
    the retention contract). A pure filter — row-local, zero shuffle,
    partition-prunable when the table is stored partitioned by
    valid_to date. The GDPR/retention half of table maintenance:
    scd2_merge grows history forward, scd2_compact bounds it backward."""
    return scd2.filter(
        F.col("valid_to_us").isNull() | (F.col("valid_to_us") > F.lit(cutoff_us))
    )


def write_scd2_history(
    scd2: DataFrame,
    table: str,
    keys: list[str],
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist an SCD2 history as a catalog table BUCKETED on the key —
    the persisted tier of the dimension family (the minhash/BM25/IVF
    index convention applied to table maintenance): every maintenance
    and query op keys on the dimension key — scd2_merge's anti/semi
    joins, the as-of enrichment join, key-sliced history reads — so
    bucketing lets EnsureRequirements satisfy their distribution from
    storage. With the delta-sized batch side broadcast (AQE does this
    for small batches), the TB-scale history never exchanges: the
    nightly merge reads buckets, rewrites touched rows, passes the rest
    through (plan pinned in tests/test_scd.py). Sorted within buckets by
    (key, valid_from_us) so merge windows and as-of lookups stream."""
    from kafka_streams_demo_spark.sources.bucketing import write_bucketed

    write_bucketed(
        scd2, table, keys, num_buckets,
        sort_cols=[*keys, "valid_from_us"], mode=mode,
    )


def scd2_watermark_violations(
    current: DataFrame,
    batch: DataFrame,
    keys: list[str],
    ts: str = "ts",
) -> DataFrame:
    """Audit the merge precondition: scd2_merge assumes every batch row
    is strictly later than the same key's open version (the changelog
    watermark). Returns the violating keys with both timestamps —
    empty means the merge is safe. Run it as a gate in pipelines whose
    upstream can replay or deliver out of order (Kafka consumers resumed
    from an old offset, backfills): merging a violating batch silently
    back-dates history. Cost: one delta-sized aggregate joined to the
    open rows — the same keys the merge itself touches."""
    open_rows = current.filter(F.col("valid_to_us").isNull()).select(
        *keys, F.col("valid_from_us").alias("open_from_us")
    )
    batch_min = batch.groupBy(*keys).agg(
        F.min(F.unix_micros(F.col(ts))).alias("batch_min_us")
    )
    return open_rows.join(batch_min, keys).filter(
        F.col("batch_min_us") <= F.col("open_from_us")
    )
