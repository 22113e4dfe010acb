"""Storage-layout keys: Z-order (Morton) interleaving for multi-column
data clustering.

At 100 TB the dominant read-cost lever after partitioning is FILE-LEVEL
pruning: parquet footers carry per-column min/max, and a scan skips a file
when the predicate excludes its range. Sorting by one column gives perfect
pruning on that column and none on any other; interleaving the bits of two
(or more) columns into one sort key bounds EVERY interleaved dimension
within each contiguous file — the Z-order clustering Delta/Iceberg expose
as `OPTIMIZE ZORDER BY`. This module computes the key as pure int64
Catalyst expressions (shift/and/or — whole-stage codegen, engine-portable
bit-for-bit), so `df.repartitionByRange(N, zkey).sortWithinPartitions
(zkey).write...` lays files out z-clustered with no extra machinery.

Reference parity note: the reference's batch storage partitions by entity
key and time (`BatchLogReader.getPartitions`); z-ordering is the natural
extension when reads filter on more than one attribute dimension — a
north-star layout extension, not a reference port.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


# magic-number bit spreading: 16 bits -> even bit positions of 32
# (Morton encoding, standard "Bit Twiddling Hacks" masks)
_SPREAD_STEPS = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def spread_bits_16(col: Column) -> Column:
    """The low 16 bits of ``col`` spread to the even bit positions of a
    32-bit value (b_i → bit 2i). Pure int64 shift/mask expressions."""
    x = col.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def morton_key_2d(col_a: Column, col_b: Column) -> Column:
    """32-bit Morton key interleaving the low 16 bits of two columns —
    a at even positions, b at odd. Monotone locality: keys close in
    z-order are close in BOTH dimensions, so range-partitioning by the
    key bounds both columns' min/max per partition/file."""
    return spread_bits_16(col_a).bitwiseOR(
        F.shiftleft(spread_bits_16(col_b), 1)
    )


def zorder_sql_2d(a_expr: str, b_expr: str) -> str:
    """The same Morton key as ANSI-ish SQL (DuckDB dialect) — the oracle
    twin of ``morton_key_2d``, kept adjacent so the two specs can't
    drift."""

    def spread(e: str) -> str:
        x = f"({e} & 65535)"
        for shift, mask in _SPREAD_STEPS:
            x = f"(({x} | ({x} << {shift})) & {mask})"
        return x

    return f"({spread(a_expr)} | ({spread(b_expr)} << 1))"
