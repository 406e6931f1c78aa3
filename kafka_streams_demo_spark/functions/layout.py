"""Multi-dimensional data layout: Z-order (Morton) clustering.

The storage-layout primitive behind Delta/Iceberg ``OPTIMIZE ZORDER BY``
(Morton 1966): interleave the bits of several range-bucketed columns so
that sorting by ONE key co-locates rows that are close in ALL of them —
min/max file statistics then prune multi-dimensional predicates, where a
single-column sort only ever prunes its own column.

Everything is integer column math in one Catalyst plan:

- per-dimension range buckets from a one-row global min/max aggregate
  (broadcast back — never collected) using exact integer ``DIV``
  (long/long ``/`` is DOUBLE division in Spark; at 62-bit magnitudes the
  53-bit mantissa misassigns buckets — the round-5 sharding lesson);
- bit interleave as an unrolled shift/mask/or sum (JVM codegen, no UDF);
- ``file_id = zval >> shift``: the top interleaved bits name the target
  file, i.e. a cell of the 2^k × 2^k grid — every file's bounding box
  spans at most (2^bits / 2^k) bucket values PER DIMENSION (the property
  ``tests/test_layout.py`` pins, and the reason multi-dim predicates
  prune).

At 100 TB the write path is ``repartitionByRange(file_id)`` +
``sortWithinPartitions(zval)`` — one range shuffle, and parquet row-group
min/max stats then serve every dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "bucket_expr",
    "zorder_key",
    "zorder_layout",
    "zorder_oracle_terms",
    "compaction_plan",
    "hilbert_stage_exprs",
    "hilbert_key",
    "hilbert_layout",
]


def bucket_expr(v: str, mn: str, mx: str, nb: int, div: str = "DIV") -> str:
    """Range-bucket formula as ENGINE-NEUTRAL SQL (``div`` = "DIV" for
    Spark, "//" for DuckDB — the one dialect difference), mapping v ∈
    [mn, mx] to a bucket in [0, nb).

    Hybrid precision/overflow form: the exact multiply formula
    ``((v - mn) * nb) DIV (span + 1)`` uses ALL nb buckets but overflows
    int64 once span ≥ 2^63/nb; the division formula
    ``(v - mn) DIV (span DIV nb + 1)`` never overflows but can use as few
    as ~nb/2 buckets when span is slightly above a multiple of nb
    (coarsening z-order/Hilbert resolution). The CASE keeps the exact
    form wherever the multiply provably fits (span < 2^63/nb — i.e.
    every realistic key span) and falls back to the overflow-safe form
    only in the 62-bit regime, preserving range safety AND small-span
    exactness. Both engines evaluate the identical string, so catalog
    oracles stay in lockstep by construction."""
    span = f"({mx} - {mn})"
    safe = (1 << 63) // nb
    return (
        f"(CASE WHEN {span} < {safe}"
        f" THEN (({v} - {mn}) * {nb}) {div} ({span} + 1)"
        f" ELSE ({v} - {mn}) {div} ({span} {div} {nb} + 1) END)"
    )


def zorder_key(
    df: DataFrame,
    dims: list[Column],
    bits: int = 8,
    num_files: int | None = None,
) -> DataFrame:
    """Append ``zval`` (and ``file_id`` when ``num_files`` is a power of
    two) computed from ``dims`` — integer-valued Columns (cast dates to
    epoch days first). Original columns pass through untouched."""
    nd = len(dims)
    nb = 1 << bits
    vals = df.select("*", *[d.alias(f"_zv{i}") for i, d in enumerate(dims)])
    stats = vals.agg(
        *[F.min(f"_zv{i}").alias(f"_mn{i}") for i in range(nd)],
        *[F.max(f"_zv{i}").alias(f"_mx{i}") for i in range(nd)],
    )
    j = vals.crossJoin(F.broadcast(stats))
    # hybrid exact-integer bucketing (see bucket_expr): multiply form
    # where it provably fits int64, overflow-safe DIV form in the 62-bit
    # regime — never long/long double division (53-bit mantissa
    # misassigns buckets at 62-bit magnitudes, the round-5 lesson).
    bucketed = j.select(
        "*",
        *[
            F.expr(
                bucket_expr(f"_zv{i}", f"_mn{i}", f"_mx{i}", nb)
            ).alias(f"_zb{i}")
            for i in range(nd)
        ],
    )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i in range(nd):
            z = z + F.shiftleft(
                F.shiftright(F.col(f"_zb{i}"), b).bitwiseAND(F.lit(1)),
                nd * b + i,
            )
    out = bucketed.select(
        *df.columns, z.cast("long").alias("zval")
    )
    if num_files is not None:
        if num_files & (num_files - 1):
            raise ValueError("num_files must be a power of two")
        shift = nd * bits - num_files.bit_length() + 1
        if shift < 0:
            raise ValueError("num_files exceeds 2^(ndims*bits)")
        out = out.withColumn(
            "file_id", F.shiftright("zval", shift).cast("long")
        )
    return out


def zorder_layout(
    df: DataFrame,
    dims: list[Column],
    bits: int = 8,
    num_files: int = 64,
) -> DataFrame:
    """The write-path arrangement: range-partition by file_id, sort each
    partition by zval — ONE range shuffle, after which parquet row-group
    min/max statistics prune predicates on EVERY z-ordered dimension."""
    keyed = zorder_key(df, dims, bits, num_files)
    return keyed.repartitionByRange(num_files, "file_id").sortWithinPartitions(
        "zval"
    )


def zorder_oracle_terms(ndims: int, bits: int = 8) -> str:
    """The unrolled interleave sum as DuckDB SQL over columns b0..b{n-1}
    — kept next to the Spark unroll so catalog oracles replay the exact
    bit math."""
    return " + ".join(
        f"(((b{i} >> {b}) & 1) << {ndims * b + i})"
        for b in range(bits)
        for i in range(ndims)
    )


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    part_cols: tuple = ("part",),
    file_col: str = "file_id",
    size_col: str = "bytes",
) -> DataFrame:
    """Small-files compaction planner — the lakehouse maintenance op
    behind Delta/Iceberg ``OPTIMIZE`` bin-packing: within each
    partition, files accumulate IN FILE ORDER into groups that close
    when the running size crosses ``target_bytes``; each group is one
    rewrite task producing one ~target-sized file. In-order (not
    first-fit-decreasing) packing is deliberate: it keeps each output
    file's rows contiguous in the table's existing sort order, so
    clustering (zorder/time) survives compaction, and it is a pure
    window formula — deterministic and SQL-replayable, where FFD is
    sequential state.

    group assignment = exclusive-running-sum DIV target (exact integer
    ``DIV`` — cumulative bytes exceed the double mantissa at PB scale,
    the round-5 lesson), then a dense renumber so group ids are
    contiguous from 1 per partition. A file larger than ``target_bytes``
    becomes its own group (its successor's running sum skips past it).

    Scale: this plans over the FILE MANIFEST (metadata rows — millions
    of rows for a 100 TB table, not the data); one window shuffle on the
    partition key. Returns (part_cols..., file_col, size_col, group_id).
    """
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    from pyspark.sql.window import Window

    w = Window.partitionBy(*part_cols).orderBy(file_col)
    cum_excl = F.coalesce(
        F.sum(size_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    grouped = files.select(
        *part_cols, file_col, size_col, cum_excl.alias("_cum")
    ).withColumn("_grp", F.expr(f"_cum DIV {int(target_bytes)}"))
    wg = Window.partitionBy(*part_cols).orderBy("_grp")
    return grouped.select(
        *part_cols,
        file_col,
        size_col,
        F.dense_rank().over(wg).cast("long").alias("group_id"),
    )


def hilbert_stage_exprs(
    s: int, x: str = "_hx", y: str = "_hy", d: str = "_hd"
) -> tuple[str, str, str]:
    """One Hilbert level (cell size ``s``) of the classic xy2d
    recurrence as ENGINE-NEUTRAL SQL (CASE + integer arithmetic only —
    the same string parses in Spark SQL and DuckDB, which is what keeps
    the catalog oracle in lockstep with the Spark plan by construction):

        rx = bit s of x;  ry = bit s of y
        d += s² · ((3·rx) XOR ry)      — XOR unrolled to 3-ry when rx=1
        ry=0: reflect within the subcell when rx=1 (s-1-·), then swap

    Returns (d_next, x_next, y_next) expression strings reading columns
    ``x``/``y``/``d``."""
    rx = f"(CASE WHEN ({x} & {s}) <> 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN ({y} & {s}) <> 0 THEN 1 ELSE 0 END)"
    dn = f"{d} + {s * s} * (CASE WHEN {rx} = 1 THEN 3 - {ry} ELSE {ry} END)"
    xn = (
        f"CASE WHEN {ry} = 0 THEN"
        f" (CASE WHEN {rx} = 1 THEN {s - 1} - {y} ELSE {y} END)"
        f" ELSE {x} END"
    )
    yn = (
        f"CASE WHEN {ry} = 0 THEN"
        f" (CASE WHEN {rx} = 1 THEN {s - 1} - {x} ELSE {x} END)"
        f" ELSE {y} END"
    )
    return dn, xn, yn


def hilbert_key(
    df: DataFrame,
    dims: list[Column],
    bits: int = 8,
    num_files: int | None = None,
) -> DataFrame:
    """Append ``hval`` (and ``file_id``) — the HILBERT curve rank of the
    two range-bucketed ``dims`` (Hilbert 1891; the layout Iceberg
    offers beside Z-order): unlike Morton's bit interleave, every
    consecutive pair of ranks is an ADJACENT grid cell (no diagonal
    jumps across half the space), so equal-size files cut from the
    sorted order have strictly tighter per-dimension bounding boxes —
    the property tests/test_layout.py pins against zorder on the same
    grid.

    Same exact-integer range bucketing as ``zorder_key``; the curve
    rank is the xy2d recurrence unrolled into ``bits`` chained
    projections (CASE/arith only — whole-stage codegen, no UDF; the
    per-level state dependency is why this is a chain and not one
    interleave sum). 2-D only — the standard d-dimensional
    generalization (Butz/Lawder) trades the clean recurrence for
    Gray-code state tables; Z-order remains the d>2 path."""
    if len(dims) != 2:
        raise ValueError("hilbert_key supports exactly 2 dims (use zorder_key for d>2)")
    nd, nb = 2, 1 << bits
    vals = df.select("*", *[c.alias(f"_zv{i}") for i, c in enumerate(dims)])
    stats = vals.agg(
        *[F.min(f"_zv{i}").alias(f"_mn{i}") for i in range(nd)],
        *[F.max(f"_zv{i}").alias(f"_mx{i}") for i in range(nd)],
    )
    j = vals.crossJoin(F.broadcast(stats))
    bucketed = j.select(
        "*",
        *[
            F.expr(
                bucket_expr(f"_zv{i}", f"_mn{i}", f"_mx{i}", nb)
            ).alias(f"_zb{i}")
            for i in range(nd)
        ],
    )
    cur = bucketed.select(
        *df.columns,
        F.col("_zb0").cast("long").alias("_hx"),
        F.col("_zb1").cast("long").alias("_hy"),
        F.lit(0).cast("long").alias("_hd"),
    )
    for lvl in reversed(range(bits)):
        dn, xn, yn = hilbert_stage_exprs(1 << lvl)
        cur = cur.select(
            *df.columns,
            F.expr(xn).alias("_hx"),
            F.expr(yn).alias("_hy"),
            F.expr(dn).alias("_hd"),
        )
    out = cur.select(*df.columns, F.col("_hd").cast("long").alias("hval"))
    if num_files is not None:
        if num_files & (num_files - 1):
            raise ValueError("num_files must be a power of two")
        shift = nd * bits - num_files.bit_length() + 1
        if shift < 0:
            raise ValueError("num_files exceeds 2^(2*bits)")
        out = out.withColumn(
            "file_id", F.shiftright("hval", shift).cast("long")
        )
    return out


def hilbert_layout(
    df: DataFrame,
    dims: list[Column],
    bits: int = 8,
    num_files: int = 64,
) -> DataFrame:
    """Write-path arrangement for the Hilbert rank — same ONE range
    shuffle as ``zorder_layout``, tighter file bounding boxes."""
    keyed = hilbert_key(df, dims, bits, num_files)
    return keyed.repartitionByRange(num_files, "file_id").sortWithinPartitions(
        "hval"
    )
