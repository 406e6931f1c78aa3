"""Cell-partitioned corpus layout — the ANN probe path at 100 TB.

``ivf_topk`` (functions/similarity.py) shows the query shape; this module
is the LAYOUT half of the design: the corpus is written ONCE partitioned
by its IVF cell, so a probe for ``nprobe`` cells scans only those
directories — partition pruning eliminates the other |cells|-nprobe
fractions of the data before any I/O happens. The same helper serves any
categorical partition key (date, language, source bucket).

tests/test_scale_tools.py asserts the pruning actually reaches the scan
(PartitionFilters on the FileScan, not a post-scan Filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str, partition_col: str, mode: str = "overwrite") -> None:
    """Write parquet hive-partitioned by ``partition_col``. One directory
    per value: the physical contract that makes probe-time pruning free."""
    df.write.partitionBy(partition_col).mode(mode).parquet(path)


def read_cells(spark: SparkSession, path: str, partition_col: str, cells: list) -> DataFrame:
    """Read only the named partitions. The ``isin`` on the partition column
    becomes a PartitionFilter (directory pruning), never a row filter."""
    return spark.read.parquet(path).where(F.col(partition_col).isin(cells))


def write_range_clustered(
    df: DataFrame, path: str, cluster_col: str, files: int = 8, mode: str = "overwrite"
) -> None:
    """Range-cluster on ``cluster_col`` before writing: repartitionByRange
    + sortWithinPartitions makes every parquet row-group's min/max stats a
    narrow slice of the value domain, so range predicates skip most
    row-groups at scan time (PushedFilters + statistics = I/O elimination,
    the single biggest lever for time-filtered queries over 100 TB).
    tests/test_scale_tools.py measures the stat tightening directly."""
    (
        df.repartitionByRange(files, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode(mode)
        .parquet(path)
    )


def zvalue(a, b, bits: int = 16):
    """Morton (z-order) interleave of two non-negative ints, ``bits`` bits
    each → one 2·bits-bit locality key. Pure column bit-math (shift/or per
    bit — unrolled, stays in codegen); inputs must already be quantized to
    [0, 2^bits). Interleaving means a range-cluster on the z-value keeps
    BOTH dimensions locally narrow per file/row-group, where clustering on
    (a, b) lexicographically leaves b's stats full-width in every file."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(one), 2 * i + 1))
    return z


def quantize(col, lo, hi, bits: int = 16):
    """Affine-quantize a numeric/timestamp column into [0, 2^bits) for
    ``zvalue``. lo/hi are python scalars in the column's native units."""
    col = F.col(col) if isinstance(col, str) else col
    span = float(hi - lo)
    q = ((col.cast("double") - float(lo)) / span * ((1 << bits) - 1))
    return F.least(
        F.lit((1 << bits) - 1).cast("long"),
        F.greatest(F.lit(0).cast("long"), F.round(q, 0).cast("long")),
    )


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    dims: list[tuple],
    files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order-cluster on two dimensions before writing: quantize each
    ``(col, lo, hi)`` dim, Morton-interleave, range-cluster on the
    z-value. Predicates on EITHER dimension then skip most row-groups
    (range-clustering on one column only serves that column).
    tests/test_scale_tools.py measures per-file stat spans on both dims
    against a single-column clustering."""
    (a, alo, ahi), (b, blo, bhi) = dims
    z = zvalue(quantize(a, alo, ahi, bits), quantize(b, blo, bhi, bits), bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
