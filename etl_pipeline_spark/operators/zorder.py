"""Z-order (Morton) clustering for multi-dimensional data skipping.

A z-order key interleaves the bits of two bucketized dimensions so that
rows close in BOTH dimensions land close in the one-dimensional sort
order. Writing a table clustered (partitioned or range-sorted) by a
z-key prefix gives min/max pruning on BOTH dimensions from a single
layout — the standard lakehouse answer to "I filter by customer AND by
price band, which do I partition by?" (reference engines expose this as
OPTIMIZE ... ZORDER BY; Spark expresses it as a computed column +
partitioned/sorted write).

Everything is integer bit arithmetic (exact in any engine); the oracle
SQL twin is generated alongside the Column expression so z-keys are
cross-checkable against DuckDB bit-for-bit.

Scale: the z-key is a per-row narrow expression (no shuffle); the
clustered write is one repartition on the z-prefix. Query-time pruning
reads only the partitions whose prefix intersects the query box —
`covering_prefixes` computes that set CLOSED-FORM on the driver from
the box bounds alone (no data touched), so the partition filter is a
static IN list, pruned at planning time.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 8  # bits per dimension -> 16-bit z-key


def zorder_key(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Interleave the low ``bits`` of integer columns a and b into a
    Morton code (a contributes the odd/high bit positions)."""
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        parts.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i))
    return reduce(lambda x, y: x + y, parts).cast("long")


def zorder_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    """DuckDB SQL twin of :func:`zorder_key` (disjoint bit positions, so
    plain addition assembles the code)."""
    parts = []
    for i in range(bits):
        parts.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        parts.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(parts) + ")"


def covering_prefixes(
    a_lo: int, a_hi: int, b_lo: int, b_hi: int, bits: int = Z_BITS, prefix_bits: int = 8
) -> list[int]:
    """All z-key prefixes (top ``prefix_bits`` of the 2*bits z-key) whose
    z-range intersects the box [a_lo,a_hi] x [b_lo,b_hi]. Closed-form on
    the driver: a prefix fixes the top ceil(prefix_bits/2) bits of a and
    floor(prefix_bits/2) bits of b, i.e. an axis-aligned tile — the tile
    intersects the box iff its per-dimension ranges do."""
    drop = 2 * bits - prefix_bits
    a_bits = (prefix_bits + 1) // 2  # a holds the odd (higher) positions
    b_bits = prefix_bits // 2
    out = []
    for p in range(1 << prefix_bits):
        z = p << drop
        a_hi_bits = _extract(z, 2 * bits, odd=True) >> (bits - a_bits)
        b_hi_bits = _extract(z, 2 * bits, odd=False) >> (bits - b_bits)
        ta_lo = a_hi_bits << (bits - a_bits)
        ta_hi = ta_lo + (1 << (bits - a_bits)) - 1
        tb_lo = b_hi_bits << (bits - b_bits)
        tb_hi = tb_lo + (1 << (bits - b_bits)) - 1
        if ta_lo <= a_hi and ta_hi >= a_lo and tb_lo <= b_hi and tb_hi >= b_lo:
            out.append(p)
    return out


def _extract(z: int, total_bits: int, odd: bool) -> int:
    """De-interleave one dimension from a Morton code."""
    v = 0
    for i in range(total_bits // 2):
        bit = (z >> (2 * i + (1 if odd else 0))) & 1
        v |= bit << i
    return v


def write_zordered(
    df: DataFrame,
    path: str,
    a: Column,
    b: Column,
    bits: int = Z_BITS,
    prefix_bits: int = 8,
) -> None:
    """Cluster df by z-order of (a, b): compute the z-key, partition the
    layout by its top ``prefix_bits`` (the pruning unit) and range-sort
    within partitions by the full key (row-group min/max locality)."""
    z = zorder_key(a, b, bits)
    out = df.withColumn("z_key", z).withColumn(
        "z_prefix", F.shiftright(F.col("z_key"), 2 * bits - prefix_bits)
    )
    (
        out.repartition("z_prefix")
        .sortWithinPartitions("z_prefix", "z_key")
        .write.mode("overwrite")
        .partitionBy("z_prefix")
        .parquet(path)
    )


def read_box(
    spark,
    path: str,
    a_col: str,
    b_col: str,
    a_lo: int,
    a_hi: int,
    b_lo: int,
    b_hi: int,
    bits: int = Z_BITS,
    prefix_bits: int = 8,
) -> DataFrame:
    """Box query over a z-ordered table: static prefix IN-list prunes
    partitions at planning time; the residual per-row predicate finishes
    the exact box."""
    prefixes = covering_prefixes(a_lo, a_hi, b_lo, b_hi, bits, prefix_bits)
    return (
        spark.read.parquet(path)
        .filter(F.col("z_prefix").isin(prefixes))
        .filter(
            (F.col(a_col) >= a_lo)
            & (F.col(a_col) <= a_hi)
            & (F.col(b_col) >= b_lo)
            & (F.col(b_col) <= b_hi)
        )
    )
