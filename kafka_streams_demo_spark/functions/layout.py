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
    "compaction_apply",
    "content_manifest",
    "hilbert_stage_exprs",
    "hilbert_key",
    "hilbert_layout",
    "hilbert_nd_stages",
    "hilbert_key_nd",
    "hilbert_layout_nd",
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


def compaction_apply(
    data: DataFrame,
    plan: DataFrame,
    path: str,
    part_cols: tuple = ("part",),
    file_col: str = "file_id",
    sort_cols: tuple = (),
    fmt: str = "parquet",
) -> None:
    """Execute a ``compaction_plan``: rewrite the table's rows into one
    ~target-sized file per plan group — the OPTIMIZE rewrite half that
    turns the planner's metadata rows into actual files.

    ``data`` rows must carry ``part_cols`` and ``file_col`` (their
    current file assignment); ``plan`` is the (part, file_id, bytes,
    group_id) planner output, a FILE-MANIFEST-sized relation — always
    broadcast, so tagging each row with its target group is a map pass.
    The write is ONE range shuffle: repartitionByRange on (part_cols,
    group_id) lands every group's rows in a single task, and
    sortWithinPartitions on (group_id, file_id, sort_cols) preserves
    the table's existing file order inside each output file (the reason
    compaction_plan packs in order — zorder/time clustering survives
    the rewrite). Output directories are partitioned by part_cols +
    group_id: exactly one data file per plan group
    (tests/test_layout.py pins file count, content equality via the
    order-independent manifest, and in-file order).

    Refuse-loudly: the plan→data tag is a LEFT join with an
    assert_true on the matched group — a data row whose (part, file)
    is missing from the plan (stale or partial manifest) fails the
    rewrite with a clear error instead of being silently dropped from
    the output table, which would defeat the content-preservation
    guarantee unless the caller happened to run content_manifest
    afterwards (ADVICE r9)."""
    meta = plan.select(*part_cols, file_col, "group_id")
    tagged = data.join(F.broadcast(meta), [*part_cols, file_col], "left").filter(
        F.assert_true(
            F.col("group_id").isNotNull(),
            F.concat(
                F.lit("compaction_apply: data row ("),
                F.concat_ws(
                    ", ", *[F.col(c).cast("string") for c in (*part_cols, file_col)]
                ),
                F.lit(") has no plan group — stale or partial compaction_plan"),
            ),
        ).isNull()
    )
    arranged = tagged.repartitionByRange(
        *[F.col(c) for c in part_cols], F.col("group_id")
    ).sortWithinPartitions(*part_cols, "group_id", file_col, *sort_cols)
    arranged.write.mode("overwrite").partitionBy(*part_cols, "group_id").format(
        fmt
    ).save(path)


def content_manifest(
    df: DataFrame, group_cols: tuple, content_col: Column
) -> DataFrame:
    """(group_cols..., n_rows, content_xor) — the shard_manifest pattern
    as a reusable verifier: per group, the row count and an
    ORDER-INDEPENDENT 60-bit content checksum (bit_xor of md5-prefix
    hashes — commutative, overflow-free, map-side combined). Used to
    prove a compaction rewrite byte-preserving: manifests per table
    partition must match before/after because compaction regroups FILES
    within a partition but never alters rows."""
    ch = F.conv(
        F.substring(F.md5(content_col.cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("long")
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(ch).alias("content_xor"),
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


def _xor(a: str, b: str) -> str:
    """Bitwise XOR of two non-negative ints as ENGINE-NEUTRAL SQL:
    a ⊕ b = a + b − 2·(a & b). Both & and the arithmetic parse
    identically in Spark SQL and DuckDB (Spark's ^ is XOR but DuckDB's
    ^ is POWER — the identity sidesteps the dialect split); operands
    here are < 2^bits, so the doubling cannot overflow."""
    return f"(({a}) + ({b}) - 2 * (({a}) & ({b})))"


def hilbert_nd_stages(nd: int, bits: int) -> list[dict[str, str]]:
    """The Skilling transpose algorithm (J. Skilling, "Programming the
    Hilbert curve", AIP Conf. Proc. 707, 2004 — the public standard for
    d-dimensional Hilbert ranks, used by Iceberg/Delta layout tooling)
    unrolled into CHAINED projection stages of engine-neutral
    CASE/integer-arith SQL, the same style as the 2-D
    ``hilbert_stage_exprs``. Each stage is a {column: expr} dict read
    against the previous stage's columns ``_x0.._x{nd-1}`` (range-
    bucketed axis values) and ``_t``; sequential state between stages
    is why this is a chain and not one expression.

    Stage plan (axes → transpose → rank):
    1. per level Q = 2^(bits−1)..2, per axis i: invert X0 by Q−1 when
       bit Q of Xi is set, else swap the (X0 ⊕ Xi) & (Q−1) bits —
       one stage per (Q, i) because X0 threads through;
    2. Gray-encode: Xi ⊕= X(i−1), ascending i (updated values);
    3. fold t over the bits of X(nd−1) (t ⊕= Q−1 where bit set);
    4. apply: every Xi ⊕= t.
    The final rank is the bit-interleave of the transpose (X0 carries
    each level's most significant bit) — one interleave-sum projection,
    emitted by ``hilbert_key_nd``."""
    stages: list[dict[str, str]] = []
    for s in range(bits - 1, 0, -1):
        q = 1 << s
        p = q - 1
        for i in range(nd):
            if i == 0:
                stages.append({
                    "_x0": (
                        f"CASE WHEN (_x0 & {q}) <> 0"
                        f" THEN {_xor('_x0', str(p))} ELSE _x0 END"
                    )
                })
            else:
                t = f"({_xor('_x0', f'_x{i}')} & {p})"
                stages.append({
                    "_x0": (
                        f"CASE WHEN (_x{i} & {q}) <> 0"
                        f" THEN {_xor('_x0', str(p))}"
                        f" ELSE {_xor('_x0', t)} END"
                    ),
                    f"_x{i}": (
                        f"CASE WHEN (_x{i} & {q}) <> 0"
                        f" THEN _x{i} ELSE {_xor(f'_x{i}', t)} END"
                    ),
                })
    for i in range(1, nd):
        stages.append({f"_x{i}": _xor(f"_x{i}", f"_x{i - 1}")})
    for s in range(bits - 1, 0, -1):
        q = 1 << s
        stages.append({
            "_t": (
                f"CASE WHEN (_x{nd - 1} & {q}) <> 0"
                f" THEN {_xor('_t', str(q - 1))} ELSE _t END"
            )
        })
    stages.append({f"_x{i}": _xor(f"_x{i}", "_t") for i in range(nd)})
    return stages


def hilbert_key_nd(
    df: DataFrame,
    dims: list[Column],
    bits: int = 8,
    num_files: int | None = None,
) -> DataFrame:
    """Append ``hval`` (and ``file_id``) — the d-DIMENSIONAL Hilbert
    rank of the range-bucketed ``dims`` via the Skilling transpose
    (closing ``hilbert_key``'s 2-D limit; real layout tooling offers
    multi-dim Hilbert beside Z-order). Same hybrid exact-integer
    bucketing as ``zorder_key``; the transpose runs as ~bits·nd chained
    CASE/arith projections (whole-stage codegen, no UDF), then one
    interleave-sum emits the rank. Property-pinned against a pure-
    Python Skilling reference on full grids, plus the defining
    adjacency property (consecutive ranks are Manhattan-distance-1
    neighbors) in tests/test_layout.py. NOTE: for nd=2 this yields a
    valid Hilbert curve that may be a reflection/rotation of
    ``hilbert_key``'s classic xy2d orientation — both cluster
    identically; the 2-D entry keeps its oracle-locked form."""
    nd, nb = len(dims), 1 << bits
    if nd < 2:
        raise ValueError("hilbert_key_nd needs at least 2 dims")
    vals = df.select("*", *[c.alias(f"_zv{i}") for i, c in enumerate(dims)])
    stats = vals.agg(
        *[F.min(f"_zv{i}").alias(f"_mn{i}") for i in range(nd)],
        *[F.max(f"_zv{i}").alias(f"_mx{i}") for i in range(nd)],
    )
    j = vals.crossJoin(F.broadcast(stats))
    cur = j.select(
        *df.columns,
        *[
            F.expr(bucket_expr(f"_zv{i}", f"_mn{i}", f"_mx{i}", nb))
            .cast("long")
            .alias(f"_x{i}")
            for i in range(nd)
        ],
        F.lit(0).cast("long").alias("_t"),
    )
    state = [f"_x{i}" for i in range(nd)] + ["_t"]
    for stage in hilbert_nd_stages(nd, bits):
        cur = cur.select(
            *df.columns,
            *[
                F.expr(stage[c]).alias(c) if c in stage else F.col(c)
                for c in state
            ],
        )
    h = F.lit(0).cast("long")
    for q in range(bits):
        for i in range(nd):
            h = h + F.shiftleft(
                F.shiftright(F.col(f"_x{i}"), q).bitwiseAND(F.lit(1)),
                q * nd + (nd - 1 - i),
            )
    out = cur.select(*df.columns, h.cast("long").alias("hval"))
    if num_files is not None:
        if num_files & (num_files - 1):
            raise ValueError("num_files must be a power of two")
        shift = nd * bits - num_files.bit_length() + 1
        if shift < 0:
            raise ValueError("num_files exceeds 2^(ndims*bits)")
        out = out.withColumn(
            "file_id", F.shiftright("hval", shift).cast("long")
        )
    return out


def hilbert_layout_nd(
    df: DataFrame,
    dims: list[Column],
    bits: int = 8,
    num_files: int = 64,
) -> DataFrame:
    """Write-path arrangement for the d-dimensional Hilbert rank — same
    ONE range shuffle as ``zorder_layout``/``hilbert_layout``: range-
    partition by file_id, sort each partition by hval, then parquet
    row-group min/max stats prune predicates on EVERY clustered
    dimension (tighter per-file bounding boxes than Morton for d > 2,
    the same adjacency argument the 2-D tests pin)."""
    keyed = hilbert_key_nd(df, dims, bits, num_files)
    return keyed.repartitionByRange(num_files, "file_id").sortWithinPartitions(
        "hval"
    )
