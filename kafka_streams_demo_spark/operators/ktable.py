"""KTable — changelog view: latest value per key.

Reference semantics (builder.table, DSLStatefulTransformation.scala:104;
StreamToTableJoinExample.scala:59-67): a new record for an existing key is
an UPDATE; a null value is a DELETE (tombstone). The engine materializes the
view as ``max_by(struct(...), offset)`` — a single hash aggregation with
map-side partial combine. No sort, no row_number window: at 100 TB this is
one shuffle on the key and nothing else.

Tombstones: rows whose latest value is null are dropped from the view
(Kafka's delete semantics), applied AFTER latest-per-key resolution so a
null followed by a re-insert resurrects the key correctly.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KEY, VALUE, TS, OFFSET = "key", "value", "timestamp", "offset"


class KTable:
    """Latest-per-key view over a changelog; wraps a DataFrame (key, value, ...).

    ``global_=True`` marks a GlobalKTable (builder.globalTable in the
    Kafka Streams API; the reference declares only partitioned tables):
    every stream-table join against it pins a BROADCAST of the table
    side, so the stream needs no co-partitioning and never shuffles for
    the join — exactly the GlobalKTable contract (the table is fully
    replicated to every instance). Partitioned KTables leave the
    strategy to Catalyst/AQE (broadcast when dimension-sized, shuffle
    join when it grows)."""

    def __init__(self, df: DataFrame, global_: bool = False):
        if KEY not in df.columns or VALUE not in df.columns:
            raise ValueError(f"KTable requires '{KEY}'/'{VALUE}' columns, got {df.columns}")
        self.df = df
        self.global_ = global_

    @classmethod
    def global_table(cls, df: DataFrame) -> "KTable":
        """builder.globalTable(topic): a fully-replicated (broadcast)
        changelog view — joins against it require no co-partitioning."""
        return cls(df, global_=True)

    # -- construction ------------------------------------------------------
    @classmethod
    def from_stream(cls, stream, drop_tombstones: bool = True) -> "KTable":
        """Materialize latest-per-key from a KStream changelog.

        Ordering column: ``offset`` if present, else ``timestamp``. The
        aggregation is ``max_by(struct(payload), ord)`` — ties broken
        arbitrarily like Kafka's per-partition order would be; fixtures use
        strictly increasing offsets.
        """
        df = stream.df
        if OFFSET in df.columns:
            ord_col = F.col(OFFSET)
        elif TS in df.columns:
            ord_col = F.col(TS)
        else:
            raise ValueError("KTable.from_stream needs an 'offset' or 'timestamp' column for latest-per-key order")

        payload_cols = [c for c in df.columns if c != KEY]
        latest = (
            df.groupBy(KEY)
            .agg(F.max_by(F.struct(*payload_cols), ord_col).alias("_latest"))
            .select(KEY, *[F.col(f"_latest.{c}").alias(c) for c in payload_cols])
        )
        if drop_tombstones:
            latest = latest.filter(F.col(VALUE).isNotNull())
        return cls(latest)

    def to_df(self) -> DataFrame:
        return self.df

    def to_stream(self):
        """KTable → KStream of the current view (toStream,
        DSLStatefulTransformation.scala:103)."""
        from kafka_streams_demo_spark.operators.kstream import KStream

        return KStream(self.df)

    # -- view transforms ---------------------------------------------------
    # Derived views keep ``global_``: filtering or re-mapping a fully-
    # replicated table yields a fully-replicated table, so its pinned-
    # broadcast join contract survives the transformation. (``group_by``
    # intentionally drops it — a re-keyed aggregation result is a new
    # partitioned view, not a replica of the source table.)
    def filter(self, p: Callable[[Column, Column], Column]) -> "KTable":
        return KTable(self.df.filter(p(F.col(KEY), F.col(VALUE))), global_=self.global_)

    def map_values(self, f: Callable[[Column], Column]) -> "KTable":
        return KTable(self.df.withColumn(VALUE, f(F.col(VALUE))), global_=self.global_)

    def group_by(self, f: Callable[[Column, Column], Column]):
        """KTable.groupBy: regroup the changelog view
        (DSLStatefulTransformation.scala:105). The reference needs an
        adder+subtractor to maintain the re-grouped aggregate incrementally
        (:107-111); Spark recomputes over the latest-state view — identical
        results, no subtractor primitive needed (SURVEY §2d)."""
        from kafka_streams_demo_spark.operators.grouped import KGroupedStream

        rekeyed = self.df.withColumn(KEY, f(F.col(KEY), F.col(VALUE)))
        return KGroupedStream(rekeyed)

    # -- joins (§2f) -------------------------------------------------------
    def _join_stream(self, stream, combiner, how: str):
        """Stream-table join: each stream record enriched with the table's
        current value (StreamToTableJoinExample.scala:107-108). The table
        side is a latest-per-key view — typically dimension-sized, so
        Catalyst broadcasts it; AQE demotes if it grows."""
        from kafka_streams_demo_spark.operators.kstream import KStream

        s = stream.df.alias("s")
        t = (F.broadcast(self.df) if self.global_ else self.df).alias("t")
        joined = s.join(t, F.col("s." + KEY) == F.col("t." + KEY), how)
        sel = [
            F.col("s." + KEY).alias(KEY),
            combiner(F.col("s." + VALUE), F.col("t." + VALUE)).alias(VALUE),
        ]
        if TS in stream.df.columns:
            sel.append(F.col("s." + TS).alias(TS))
        if OFFSET in stream.df.columns:
            sel.append(F.col("s." + OFFSET).alias(OFFSET))
        return KStream(joined.select(*sel))

    def _table_join(self, other: "KTable", combiner, how: str) -> "KTable":
        l, r = self.df.alias("l"), other.df.alias("r")
        joined = l.join(r, F.col("l." + KEY) == F.col("r." + KEY), how)
        return KTable(
            joined.select(
                F.coalesce(F.col("l." + KEY), F.col("r." + KEY)).alias(KEY),
                combiner(F.col("l." + VALUE), F.col("r." + VALUE)).alias(VALUE),
            )
        )

    def join(self, other: "KTable", combiner: Callable[[Column, Column], Column]) -> "KTable":
        """Table-table inner join (TableToTableJoinExample.scala:115)."""
        return self._table_join(other, combiner, "inner")

    def left_join(self, other: "KTable", combiner) -> "KTable":
        """TableToTableJoinExample.scala:116-117."""
        return self._table_join(other, combiner, "left")

    def outer_join(self, other: "KTable", combiner) -> "KTable":
        """TableToTableJoinExample.scala:118."""
        return self._table_join(other, combiner, "full_outer")

    def fk_join(
        self,
        other: "KTable",
        fk: Callable[[Column], Column],
        combiner: Callable[[Column, Column], Column],
        how: str = "inner",
    ) -> "KTable":
        """KTable-KTable FOREIGN-KEY join (the KIP-213 DSL surface, added
        to Kafka Streams after the reference's 2.3 — included for API
        completeness): each left row joins ``other`` on ``fk(left.value)``
        = ``other.key``, keeping the LEFT key as the result key (many left
        rows may share one right row).

        Kafka Streams needs a subscription/response topic pair plus two
        repartitions to maintain this incrementally; over latest-state
        views it is one equi-join — Catalyst broadcasts ``other`` when
        dimension-sized, else a single co-shuffle on the FK. ``how``:
        "inner" or "left" (the two KIP-213 variants)."""
        if how not in ("inner", "left"):
            raise ValueError(f"fk_join supports inner/left, got {how!r}")
        l = self.df.select(
            F.col(KEY), F.col(VALUE), fk(F.col(VALUE)).alias("_fk")
        ).alias("l")
        r = (F.broadcast(other.df) if other.global_ else other.df).alias("r")
        joined = l.join(r, F.col("l._fk") == F.col("r." + KEY), how)
        return KTable(
            joined.select(
                F.col("l." + KEY).alias(KEY),
                combiner(F.col("l." + VALUE), F.col("r." + VALUE)).alias(VALUE),
            )
        )
