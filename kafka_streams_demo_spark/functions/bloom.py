"""DataFrame-native Bloom filter: distributed build, map-side probe.

OSS Spark keeps BloomFilterAggregate internal (it powers
spark.sql.optimizer.runtime.bloomFilter InjectRuntimeFilter, not the
public function registry), so this module provides the same pattern as a
composition of public operators:

- build: each value expands to k (word_index, bit_mask) pairs (row-local
  expressions), then one groupBy(word_index).agg(bit_or(mask)) assembles
  the bitmap distributively with map-side combine. The only driver
  materialization is the bitmap itself — num_bits/64 longs, a size chosen
  by configuration, independent of the input row count (Spark's own
  runtime filter materializes its bloom on the driver the same way).
- probe: the bitmap is embedded as a literal array<long>; membership is k
  xxhash64 + element_at + bitwiseAND column expressions — whole-stage
  codegen, no join, no shuffle, no Python.

False positives pass the probe (callers must verify downstream, e.g. with
the exact join the filter fronts); false negatives are impossible.

Sizing: optimal k ≈ (num_bits/num_items)·ln2; with the default 2²⁰ bits
and k=5, ~10⁵ items give ~1% fpp. At 100 TB scale num_bits as
8-10×expected-distinct-items (the bitmap stays ≤ hundreds of MB for
billions of items — broadcast-able where the item set itself is not).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_BITS = 1 << 20
DEFAULT_NUM_HASHES = 5


def _bit_positions(col: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k independent bit positions via seeded xxhash64 (pmod keeps them
    non-negative; xxhash64 is the same 64-bit hash family Spark's internal
    bloom uses)."""
    return [
        F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(num_bits))
        for seed in range(num_hashes)
    ]


def bloom_build(
    df: DataFrame, col: str,
    num_bits: int = DEFAULT_NUM_BITS, num_hashes: int = DEFAULT_NUM_HASHES,
) -> list[int]:
    """Build the bitmap over df[col] and return it as num_bits/64 longs.

    One narrow generate stage (k rows per input row) + one groupBy on
    word index (≤ num_bits/64 groups — map-side combine collapses each
    partition to at most that many rows before the exchange)."""
    assert num_bits % 64 == 0, "num_bits must be a multiple of 64"
    n_words = num_bits // 64
    c = F.col(col)
    words = (
        df.select(F.explode(F.array(*_bit_positions(c, num_bits, num_hashes))).alias("_h"))
        .select(
            (F.col("_h") / 64).cast("int").alias("_widx"),
            _one_shifted_by(F.col("_h") % 64).alias("_mask"),
        )
        .groupBy("_widx")
        .agg(F.bit_or("_mask").alias("_word"))
        .collect()
    )
    bitmap = [0] * n_words
    for r in words:
        bitmap[r["_widx"]] = r["_word"]
    return bitmap


def _one_shifted_by(shift: Column) -> Column:
    """1L << shift with a COLUMN shift amount (the F.shiftleft wrapper
    only accepts a literal int; the SQL builtin takes expressions)."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), shift.cast("int"))


def bloom_might_contain(
    bitmap: list[int], col: Column,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> Column:
    """Membership test column: true if every one of the k bits is set.
    Pure column math against the bitmap — evaluates map-side inside
    whole-stage codegen.

    The bitmap travels as ONE BinaryType literal and each test slices a
    single byte (substring on binary is an O(1) offset slice, decoded
    with hex/conv). An array<long> literal would be a CreateArray of
    num_bits/64 element expressions, which codegen re-materializes PER
    ROW — measured 10 s for 130k probes at 2²⁰ bits vs ~0.3 s for the
    byte-slice form."""
    num_bits = len(bitmap) * 64
    raw = b"".join(w.to_bytes(8, "little", signed=True) for w in bitmap)
    bm = F.lit(bytearray(raw))
    tests = []
    for pos in _bit_positions(col, num_bits, num_hashes):
        byte = F.conv(F.hex(F.substring(bm, (pos / 8).cast("int") + 1, 1)), 16, 10).cast("int")
        tests.append(byte.bitwiseAND(_one_shifted_by(pos % 8).cast("int")) != 0)
    return reduce(lambda a, b: a & b, tests)
