"""Point-in-time (as-of) join — a temporal operator the reference lacks.

The reference's three join families are symmetric-window stream-stream
joins (StreamToStreamJoinExample.scala:92-94), current-state stream-table
lookups (StreamToTableJoinExample.scala:107-108), and table-table
changelog joins (TableToTableJoinExample.scala:115-118). An as-of join is
the fourth temporal shape large pipelines need: pair each left record
with the *single most recent* right record at-or-before its event time
(price as of trade, user profile as of impression, last purchase before a
click). Neither Kafka Streams nor Spark ships it as a primitive.

Scale design — why this is NOT a range join:

A naive formulation (``l JOIN r ON key AND r.ts <= l.ts`` then keep the
max ``r.ts`` per left row) explodes to |matches| intermediate rows before
the per-row max — quadratic in the per-key history length, and Spark
plans the non-equi conjunct as a post-join filter on a full equi-join.
Instead we use the classic merge formulation:

1. union both sides, tagged ``_side`` (right=0, left=1), aligned on
   ``(_k, _ts)``;
2. one hash Exchange on the key + one per-partition sort by
   ``(_ts, _side, _tb)``;
3. ``last(right_payload, ignorenulls=True)`` over the running window →
   each left row sees exactly the latest right row at-or-before it
   (equal timestamps included, because right sorts before left on the
   ``_side`` tag; ties on ``_ts`` resolved deterministically by the
   ``tie_break`` column, max wins).

Cost at 100 TB: one shuffle + one sort — the same envelope as any keyed
windowed aggregation, with zero pair blow-up and no nested loop.
tests/test_plans.py pins the no-nested-loop property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tie_break: str | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, enriched with the payload of the
    ``right`` row having the greatest ``right_ts`` <= ``left_ts`` for the
    same key (nulls when no such row).

    ``tie_break`` — a right-side column; among right rows sharing
    ``(key, ts)`` the one with the greatest tie_break wins (without it the
    choice is partition-order dependent).
    ``tolerance`` — SQL interval string (e.g. ``"1 hour"``): matches older
    than ``left_ts - tolerance`` are discarded (payload becomes null, the
    left row is kept — left-join semantics throughout).

    Output: all ``left`` columns, then ``right``'s payload columns
    (everything except ``right_on``); names must not collide.
    """
    payload = [c for c in right.columns if c != right_on]
    if right_ts not in payload:
        raise ValueError(f"right_ts {right_ts!r} must be a right payload column")
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")

    rrow = F.struct(*[F.col(c) for c in payload])
    rtype = right.select(rrow.alias("r")).schema["r"].dataType
    lrow = F.struct(*[F.col(c) for c in left.columns])
    ltype = left.select(lrow.alias("l")).schema["l"].dataType
    if tie_break is not None:
        tb_type = right.select(tie_break).schema[0].dataType
        r_tb, l_tb = F.col(tie_break), F.lit(None).cast(tb_type)
    else:
        r_tb, l_tb = F.lit(0), F.lit(0)

    lpart = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        l_tb.alias("_tb"),
        lrow.alias("_lrow"),
        F.lit(None).cast(rtype).alias("_rrow"),
    )
    rpart = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        r_tb.alias("_tb"),
        F.lit(None).cast(ltype).alias("_lrow"),
        rrow.alias("_rrow"),
    )

    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        lpart.unionByName(rpart)
        .withColumn("_m", F.last("_rrow", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        lo = F.col("_ts") - F.expr(f"INTERVAL {tolerance}")
        out = out.withColumn(
            "_m", F.when(F.col("_m").getField(right_ts) >= lo, F.col("_m"))
        )
    return out.select(
        *[F.col("_lrow").getField(c).alias(c) for c in left.columns],
        *[F.col("_m").getField(c).alias(c) for c in payload],
    )
