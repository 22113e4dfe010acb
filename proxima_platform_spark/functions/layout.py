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


# -- N-dimensional Morton ------------------------------------------------------
#
# A scan that filters on THREE attributes (entity key x amount x time is the
# canonical triple) wants all three bounded per file; Delta's
# `OPTIMIZE ZORDER BY (a, b, c)` is exactly k-column Morton. The 2D
# magic-mask spread generalizes: to place bit i of a `bits`-wide value at
# position i*k, iterate shift s over halving powers of two — at each step
# blocks of s bits move apart by s*(k-1) and a mask keeps runs of s every
# s*k positions (for k=2, bits=16 this DERIVES the classic 0x00FF00FF /
# 0x0F0F0F0F / 0x33333333 / 0x55555555 constants, which pins the
# generalization to the hand-written 2D path in tests).


def _nd_spread_steps(bits: int, k: int) -> list[tuple[int, int]]:
    """(shift, mask) steps spreading a ``bits``-wide value to stride ``k``
    (bit i -> position i*k). Derived, not hard-coded; shared by the
    Column and SQL builders so the two specs cannot drift."""
    steps = []
    s = 1
    while s < bits:
        s <<= 1
    s >>= 1
    while s >= 1:
        mask = 0
        pos = 0
        while pos < bits:
            run = min(s, bits - pos)
            mask |= ((1 << run) - 1) << (pos * k)
            pos += s
        steps.append((s * (k - 1), mask))
        s >>= 1
    return steps


def morton_key_nd(cols: list[Column], *, bits: int = 16) -> Column:
    """Morton key interleaving the low ``bits`` bits of ``k`` columns —
    column i's bit j lands at output position ``j*k + i`` (for k=2 this
    is bit-identical to :func:`morton_key_2d`). Pure int64 shift/mask
    codegen, zero shuffles; pair with ``repartitionByRange(N, key)
    .sortWithinPartitions(key)`` at write time like the 2D key.

    ``k * bits`` must stay <= 63 so the key is a nonnegative int64
    (range partitioning orders signed longs)."""
    k = len(cols)
    if k < 2:
        raise ValueError(f"morton_key_nd needs >= 2 columns, got {k}")
    if bits < 1:
        raise ValueError(f"bits must be >= 1, got {bits}")
    if k * bits > 63:
        raise ValueError(
            f"k*bits must be <= 63 to fit a nonnegative int64, got "
            f"{k}*{bits} = {k * bits}"
        )
    steps = _nd_spread_steps(bits, k)

    def spread(c: Column) -> Column:
        x = c.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for shift, mask in steps:
            x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
        return x

    out = spread(cols[0])
    for i, c in enumerate(cols[1:], start=1):
        out = out.bitwiseOR(F.shiftleft(spread(c), i))
    return out


def zorder_sql_nd(exprs: list[str], *, bits: int = 16) -> str:
    """The same k-column Morton key as SQL (DuckDB dialect) — generated
    from the SAME derived step table as :func:`morton_key_nd`."""
    k = len(exprs)
    if k < 2 or bits < 1 or k * bits > 63:
        raise ValueError(f"invalid nd-morton shape: k={k}, bits={bits}")
    steps = _nd_spread_steps(bits, k)

    def spread(e: str) -> str:
        x = f"(({e}) & {(1 << bits) - 1})"
        for shift, mask in steps:
            x = f"(({x} | ({x} << {shift})) & {mask})"
        return x

    parts = [spread(exprs[0])]
    parts += [
        f"({spread(e)} << {i})" for i, e in enumerate(exprs[1:], start=1)
    ]
    return "(" + " | ".join(parts) + ")"


# -- Hilbert curve layout -----------------------------------------------------
#
# Z-order's weakness is its "seams": consecutive Morton keys can jump across
# half the space (…0111 -> …1000 flips every interleaved bit), so a file of
# contiguous z-keys occasionally spans a huge rectangle and prunes poorly.
# The Hilbert curve is the locality-optimal space-filling alternative —
# every consecutive pair of keys is ADJACENT in the plane (unit step), so
# contiguous key ranges tile compact squares and per-file min/max bounds
# are tight on both dimensions. It is what Databricks ships as the default
# for Delta liquid clustering; computing it portably makes it a first-class
# layout key here, like `OPTIMIZE ... CLUSTER BY` would.
#
# Encoding: the classic xy2d loop (rotate/flip quadrants MSB-first) is a
# data-dependent iteration — naively unrolled into ONE expression it
# duplicates subtrees exponentially. Instead we run it as a 4-state DFA
# over the 2-bit quadrant stream: the loop's mutable "rotation so far" is a
# bitwise transform (swap, flip-x, flip-y) of the remaining low bits, only
# 4 of the 8 dihedral transforms are reachable, and each step consumes
# (x_bit, y_bit) and emits 2 output bits + the next state. The whole
# transition table packs into ONE int64 literal (4 states x 4 inputs x
# 4-bit nibble = 64 bits), derived at import time by composing the
# transforms (`_derive_hilbert_lut`) — no unexplained magic constant, and
# the derivation is unit-tested against the brute-force xy2d reference.


def _derive_hilbert_lut() -> int:
    """Derive the packed Hilbert DFA transition table.

    State is the accumulated bit transform (swap, flip_x, flip_y) the xy2d
    rotation applies to the remaining low bits; composing one xy2d step in
    transformed coordinates (if ry==0: {if rx==1: flip both}; swap) walks a
    4-element subgroup of the dihedral group. Nibble layout at offset
    ``(state*4 + (x_bit*2 + y_bit)) * 4``: ``out_2bits << 2 | next_state``.
    """
    start = (0, 0, 0)
    ids = {start: 0}
    order = [start]
    lut = 0
    i = 0
    while i < len(order):
        swap, fx, fy = order[i]
        for xb in (0, 1):
            for yb in (0, 1):
                a, b = (yb, xb) if swap else (xb, yb)
                rx, ry = a ^ fx, b ^ fy
                out = (3 * rx) ^ ry
                nswap, nfx, nfy = swap, fx, fy
                if ry == 0:
                    if rx == 1:
                        nfx, nfy = nfx ^ 1, nfy ^ 1
                    nswap, nfx, nfy = nswap ^ 1, nfy, nfx
                nt = (nswap, nfx, nfy)
                if nt not in ids:
                    ids[nt] = len(order)
                    order.append(nt)
                lut |= ((out << 2) | ids[nt]) << ((ids[order[i]] * 4 + (xb * 2 + yb)) * 4)
        i += 1
    assert len(order) == 4, order
    return lut


#: 4-state Hilbert DFA, one nibble per (state, quadrant): 0x27DB3C6A95F08E41
_HILBERT_LUT = _derive_hilbert_lut()


def with_hilbert_key_2d(
    df,
    col_a: Column,
    col_b: Column,
    *,
    out: str = "hkey",
    bits: int = 16,
):
    """``df`` plus a Hilbert-curve key column over the low ``bits`` bits of
    two columns (32-bit key at the default 16).

    Built as one small Project per DFA step carrying an accumulator column
    ``(d << 2) | state``: each step's expressions reference the previous
    accumulator as a plain Attribute, so the plan stays LINEAR in ``bits``
    (Catalyst's CollapseProject will not inline a non-cheap alias that is
    referenced more than once) and whole-stage codegen fuses the chain into
    straight-line int64 bit arithmetic — the same execution shape as the
    Morton key, just 16 fused steps deeper. Returns a DataFrame (not a
    Column) because the step chain needs projections.

    Scale: pure narrow codegen — zero shuffles; the intended use is
    ``df.repartitionByRange(N, "hkey").sortWithinPartitions("hkey")``
    before the write, exactly like :func:`morton_key_2d`.
    """
    acc = "__hilbert_acc"
    # fail fast on working-column collisions: select('*', ...) with a
    # duplicate name yields ambiguous columns downstream, not an error
    # at the point of cause (r12 ADVICE)
    clash = {"__ha", "__hb", acc, out}.intersection(df.columns)
    if clash:
        raise ValueError(
            f"with_hilbert_key_2d: input already has column(s) "
            f"{sorted(clash)} — rename them or pass a different out="
        )
    cur = df.select(
        "*",
        col_a.cast("long").bitwiseAND(F.lit((1 << bits) - 1)).alias("__ha"),
        col_b.cast("long").bitwiseAND(F.lit((1 << bits) - 1)).alias("__hb"),
        F.lit(0).cast("long").alias(acc),
    )
    for i in range(bits - 1, -1, -1):
        inp = (
            F.shiftright(F.col("__ha"), i).bitwiseAND(F.lit(1)) * 2
            + F.shiftright(F.col("__hb"), i).bitwiseAND(F.lit(1))
        )
        idx = (F.col(acc).bitwiseAND(F.lit(3)) * 4 + inp) * 4
        # call_function: the python shiftright wrapper only takes literal
        # shift amounts, but the underlying expression shifts by a column
        val = F.call_function(
            "shiftright", F.lit(_HILBERT_LUT), idx.cast("int")
        ).bitwiseAND(F.lit(15))
        step = F.shiftleft(F.shiftright(F.col(acc), 2), 4).bitwiseOR(val)
        cur = cur.select(
            *[c for c in cur.columns if c != acc], step.alias(acc)
        )
    return cur.select(
        *[c for c in df.columns],
        F.shiftright(F.col(acc), 2).alias(out),
    )


def hilbert_sql_2d_select(
    from_sql: str,
    carry_cols: list[str],
    a_expr: str,
    b_expr: str,
    *,
    out: str = "hkey",
    bits: int = 16,
) -> str:
    """The same Hilbert key as a generated SQL SELECT (DuckDB dialect) —
    the oracle twin of :func:`with_hilbert_key_2d`, one nested subquery per
    DFA step so the SQL text stays linear in ``bits``; driven by the SAME
    ``_HILBERT_LUT`` constant so the two specs cannot drift."""
    carry = ", ".join(carry_cols)
    mask = (1 << bits) - 1
    sql = (
        f"SELECT {carry}, CAST(({a_expr}) AS BIGINT) & {mask} AS __ha,"
        f" CAST(({b_expr}) AS BIGINT) & {mask} AS __hb,"
        f" CAST(0 AS BIGINT) AS __acc FROM {from_sql}"
    )
    for i in range(bits - 1, -1, -1):
        inp = f"(((__ha >> {i}) & 1) * 2 + ((__hb >> {i}) & 1))"
        idx = f"(((__acc & 3) * 4 + {inp}) * 4)"
        val = f"(({_HILBERT_LUT} >> {idx}) & 15)"
        sql = (
            f"SELECT {carry}, __ha, __hb,"
            f" (((__acc >> 2) << 4) | {val}) AS __acc FROM ({sql})"
        )
    return f"SELECT {carry}, (__acc >> 2) AS {out} FROM ({sql})"
