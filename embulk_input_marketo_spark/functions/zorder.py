"""Z-order (Morton) clustering keys — multi-dimensional row-group skipping
for the lake, the Delta OPTIMIZE ZORDER BY / Iceberg sort-order pattern.

Within a hash bucket the engine normally sorts by the merge key, which gives
parquet min/max skipping on that one column. Sorting by the interleaved
z-value of TWO dimensions instead keeps both partially clustered, so range
predicates on either dimension (url prefix, warc_ts window) skip row groups
— the standard answer to "my secondary-dimension scans read everything" at
100 TB.

Everything here is shift/mask arithmetic on longs — whole-stage codegen,
no UDF, no HOF — via the classic 5-step bit-spreading sequence (each step
doubles the gap between occupied bits; see e.g. the "Bit Twiddling Hacks"
interleave). The DuckDB oracle replays the identical shifts, so z-values
are engine-independent and gate-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# bit-spreading masks: after step k, value bits sit every 2^k positions
_SPREAD = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def spread_bits32(col: Column) -> Column:
    """Spread a 32-bit value's bits to the even positions of a 64-bit long
    (b_i → bit 2i). Input is masked to its low 32 bits first."""
    x = col.cast("long").bitwiseAND(F.lit(0xFFFFFFFF))
    for shift, mask in _SPREAD:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def zorder_key(dim_a: Column, dim_b: Column) -> Column:
    """64-bit Morton interleave of two 32-bit dimensions: a's bits at even
    positions, b's at odd. Sorting by this clusters BOTH dimensions."""
    return spread_bits32(dim_a).bitwiseOR(
        F.shiftleft(spread_bits32(dim_b), 1)
    )


def dim_from_long(col: Column | str, lo: int = 0) -> Column:
    """Order-preserving dimension from a long: offset by ``lo`` and clip
    into [0, 2^31) — 31 bits, not 32, so the interleaved key's top bit
    stays clear and the z-value is the same non-negative int64 in any
    engine's signed arithmetic (one bit of clustering resolution is
    noise; a sign-flipped sort order is a bug). Callers pick ``lo`` = the
    column's minimum (or a domain constant like an epoch)."""
    c = F.col(col) if isinstance(col, str) else col
    shifted = c.cast("long") - F.lit(int(lo))
    return F.greatest(
        F.lit(0), F.least(shifted, F.lit(0x7FFFFFFF))
    )


def dim_from_timestamp(col: Column | str, epoch: int = 0) -> Column:
    """32-bit dimension from a timestamp: seconds since ``epoch``."""
    c = F.col(col) if isinstance(col, str) else col
    return dim_from_long(c.cast("timestamp").cast("long"), lo=epoch)


def dim_from_string_prefix(col: Column | str) -> Column:
    """Order-preserving 32-bit dimension from a string: the first 4 bytes
    big-endian (lexicographic order on ASCII prefixes survives; ties beyond
    4 chars collapse, which only costs clustering resolution, never
    correctness). NULL/short strings pad with 0."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.lit(0).cast("long")
    for i in range(1, 5):
        byte = F.coalesce(
            F.ascii(F.substring(c, i, 1)).cast("long"), F.lit(0)
        )
        out = F.shiftleft(out, 8).bitwiseOR(
            byte.bitwiseAND(F.lit(0xFF))
        )
    # drop the low bit: 31-bit dimension (see dim_from_long), still
    # order-preserving
    return F.shiftright(out, 1)
