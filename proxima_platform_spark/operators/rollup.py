"""Hypertable-style multi-resolution time rollups (continuous aggregates).

Extension beyond the reference surface (north star). The TimescaleDB /
continuous-aggregate shape: maintain a ladder of time-bucketed aggregates
where each coarser level re-aggregates the *previous level*, never the raw
events. At 100 TB the difference is structural — serving hourly, daily and
monthly resolutions costs one cascading pass (raw → hour → day → month,
each input 24–30× smaller than the last) instead of three full scans of
the raw table, and the fine levels are exactly the frames a dashboard
serves directly.

Exactness contract: only algebraic aggregates ride the ladder — sum
(decimal-accumulated), count, min, max compose associatively, so every
level is bit-identical to aggregating the raw events at that resolution
(the oracle checks the coarsest level against a direct raw aggregation).
Averages are derived at read time as sum/count; quantiles would need a
mergeable sketch and are deliberately not offered here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hypertable_rollup(
    events: DataFrame,
    *,
    ts_ms_col: str,
    keys: list[str],
    value_col: str,
    levels_ms: list[int],
    decimal_scale: int = 2,
) -> dict[int, DataFrame]:
    """Build the rollup ladder. Returns ``{level_ms: frame}`` where each
    frame has ``(*keys, bucket_ms, cnt, total_dec, vmin, vmax)`` —
    ``total_dec`` stays DECIMAL through every level so re-aggregation is
    exact; cast at read time.

    ``levels_ms`` must be ascending and each level must divide the next
    (hour→day→week…), or coarse buckets would straddle fine ones and the
    ladder could not be exact."""
    if not levels_ms or sorted(levels_ms) != levels_ms:
        raise ValueError(f"levels_ms must be ascending, got {levels_ms}")
    for fine, coarse in zip(levels_ms, levels_ms[1:]):
        if coarse % fine != 0:
            raise ValueError(
                f"level {coarse} ms is not a multiple of {fine} ms — coarse "
                f"buckets would straddle fine buckets and break exactness"
            )

    ts = F.col(ts_ms_col)
    l0 = levels_ms[0]
    bucket0 = (ts - F.pmod(ts, F.lit(l0))).alias("bucket_ms")
    out: dict[int, DataFrame] = {}
    dec = f"decimal(28,{decimal_scale})"
    level = events.groupBy(*keys, bucket0).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(value_col).cast(f"decimal(18,{decimal_scale})"))
        .cast(dec)
        .alias("total_dec"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
    )
    out[l0] = level
    for lv in levels_ms[1:]:
        b = F.col("bucket_ms")
        level = level.groupBy(
            *keys, (b - F.pmod(b, F.lit(lv))).alias("bucket_ms")
        ).agg(
            F.sum("cnt").alias("cnt"),
            F.sum("total_dec").cast(dec).alias("total_dec"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
        out[lv] = level
    return out


def histogram_rollup(
    events: DataFrame,
    *,
    ts_ms_col: str,
    keys: list[str],
    value_col: str,
    levels_ms: list[int],
    boundaries: list[float],
) -> dict[int, DataFrame]:
    """Mergeable fixed-bin histogram sketch riding the same rollup ladder —
    the deterministic alternative to probabilistic quantile sketches: with
    *fixed* boundaries the per-bin counts merge by exact element-wise sum,
    so every ladder level is bit-identical to histogramming the raw events
    at that resolution (unlike KLL/t-digest, whose merges are
    order-sensitive and oracle-hostile). Quantile estimates derive from the
    histogram at read time at bounded error = bin width.

    Bins: ``len(boundaries)+1`` — an underflow bin (< boundaries[0]), one
    per ``[b[i], b[i+1])``, and an overflow bin (>= boundaries[-1]).
    Returns ``{level_ms: frame}`` of ``(*keys, bucket_ms, hist)`` with
    ``hist`` an ``array<bigint>`` of per-bin counts."""
    if boundaries != sorted(boundaries) or len(set(boundaries)) != len(boundaries):
        raise ValueError(f"boundaries must be strictly ascending, got {boundaries}")
    for fine, coarse in zip(levels_ms, levels_ms[1:]):
        if coarse % fine != 0:
            raise ValueError(f"level {coarse} ms is not a multiple of {fine} ms")

    v = F.col(value_col)
    conds = []
    lo = None
    for b in boundaries:
        conds.append(v < F.lit(b) if lo is None else (v >= F.lit(lo)) & (v < F.lit(b)))
        lo = b
    conds.append(v >= F.lit(boundaries[-1]))
    n_bins = len(conds)

    ts = F.col(ts_ms_col)
    l0 = levels_ms[0]
    bucket0 = (ts - F.pmod(ts, F.lit(l0))).alias("bucket_ms")
    out: dict[int, DataFrame] = {}
    level = events.groupBy(*keys, bucket0).agg(
        *[
            F.sum(F.when(c, F.lit(1)).otherwise(F.lit(0))).alias(f"__h{i}")
            for i, c in enumerate(conds)
        ]
    )
    pack = F.array(*[F.col(f"__h{i}") for i in range(n_bins)]).alias("hist")
    out[l0] = level.select(*keys, "bucket_ms", pack)
    for lv in levels_ms[1:]:
        b = F.col("bucket_ms")
        level = level.groupBy(
            *keys, (b - F.pmod(b, F.lit(lv))).alias("bucket_ms")
        ).agg(
            *[F.sum(F.col(f"__h{i}")).alias(f"__h{i}") for i in range(n_bins)]
        )
        out[lv] = level.select(*keys, "bucket_ms", pack)
    return out


def histogram_quantile(
    boundaries: list[float], q: float, hist_col: str = "hist"
):
    """Read-time quantile estimate from a fixed-bin histogram column (the
    consumption side of :func:`histogram_rollup`): find the first bin whose
    cumulative count reaches ``q`` of the total and linearly interpolate
    inside it; the underflow/overflow bins clamp to the boundary. Error is
    bounded by bin width — the documented trade for exact mergeability.

    Pure expression (a CASE chain over the n_bins cumulative sums — n_bins
    is small and fixed), so a SQL oracle can replay the estimate
    bit-identically; no sort, no shuffle, evaluated on the LADDER frame.
    """
    if not 0.0 < q < 1.0:
        raise ValueError(f"q must be in (0,1), got {q}")
    # memoized template (exprtools, r13): the CASE chain is a pure
    # function of (boundaries, q, hist_col) — ~100 Column ops of py4j
    # chatter per build otherwise
    from proxima_platform_spark.exprtools import static_template

    return static_template(
        "histogram_quantile",
        f"{tuple(boundaries)!r}|{q!r}|{hist_col}",
        lambda: _histogram_quantile_build(boundaries, q, hist_col),
    )


def _histogram_quantile_build(
    boundaries: list[float], q: float, hist_col: str = "hist"
):
    n_bins = len(boundaries) + 1
    h = [F.element_at(F.col(hist_col), i + 1) for i in range(n_bins)]
    total = h[0]
    for x in h[1:]:
        total = total + x
    target = F.lit(q) * total
    cums = []
    cum = h[0]
    for i in range(n_bins):
        if i > 0:
            cum = cum + h[i]
        cums.append(cum)
    # first bin with cum >= target; interpolate interior bins
    expr = None
    for i in range(n_bins):
        if i == 0:
            est = F.lit(float(boundaries[0]))
        elif i == n_bins - 1:
            est = F.lit(float(boundaries[-1]))
        else:
            lo, hi = boundaries[i - 1], boundaries[i]
            est = F.lit(float(lo)) + (target - cums[i - 1]) / h[i] * F.lit(
                float(hi - lo)
            )
        cond = target <= cums[i]
        expr = F.when(cond, est) if expr is None else expr.when(cond, est)
    return expr.otherwise(F.lit(float(boundaries[-1])))
