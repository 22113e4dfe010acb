"""Event-analytics & time-series operators: funnel, cohort retention,
gap-fill + LOCF, re-aggregable distinct ladder.

These generalize the reference's windowed aggregation toolkit (reference
``core/src/main/java/cz/o2/proxima/core/transform`` element-wise transforms +
``beam/core`` windowed joins) to the event-analytics shapes a hypertable /
training-telemetry deployment runs daily. Everything is expressed as
shuffle-on-key DataFrame plans:

* ``funnel``       — k-step ordered conversion; k joins + group-bys, ALL on
                     the same user key, so AQE/exchange-reuse keeps it at one
                     logical shuffle of the events table per step with no
                     driver state. Never sorts whole partitions.
* ``cohort_retention`` — two shuffles (user → (cohort, week)); distinct
                     counting is the exact two-phase pattern (dedup rows,
                     then count), which is re-aggregable and skew-safe.
* ``gapfill_locf`` — per-key dense hourly grid via ``sequence``/``explode``
                     (rows generated executor-side, proportional to output,
                     nothing on the driver) + ``last(..., ignorenulls)`` over
                     a per-key ordered window. The window never re-sorts raw
                     events — only the already-aggregated per-bucket frame.
* ``distinct_ladder`` — exact distinct-per-bucket by (bucket, key) dedup
                     then count; the HLL variant carries a mergeable sketch
                     column up the rollup ladder (hour → day via
                     ``hll_union_agg``) exactly like the reference's
                     combinable aggregates (windowed Sums/Combine:
                     ``beam/core`` CombineByKey) — constant-size state per
                     bucket at 100 TB.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from typing import Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _round_half_up(x: float, digits: int = 0) -> float:
    """Mirror Spark's ``F.round`` on doubles (Java
    ``BigDecimal.valueOf(double)`` = shortest-repr, then HALF_UP) — NOT
    Python's built-in ``round()``, which is half-to-even and silently
    breaks the streaming twins' row-for-row batch-parity contract on
    exact .5 ties (e.g. value=0.125 at scale 100: batch cents=13,
    ``round()`` cents=12). Python ``repr`` and Java ``Double.toString``
    produce the same shortest round-trip decimal string, so this is
    bit-exact parity (same recipe as functions/text.py round6)."""
    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(x)).quantize(q, ROUND_HALF_UP))


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "tstamp",
) -> DataFrame:
    """Ordered k-step funnel: for each user, the earliest time of step 1,
    then the earliest step-2 event STRICTLY AFTER it, and so on.

    Returns one row per user who completed step 1, with nullable
    ``t1..tk`` timestamps.

    Scale design: the naive per-user sort-and-scan is a full shuffle+sort of
    the raw events; this instead runs one filtered min-aggregate per step —
    each a partial-aggregating (map-side combined) shuffle keyed on
    ``user_col`` — and joins step i's result to step i+1's candidate events
    on the same key. Every exchange in the chain hashes the same key, so
    Spark reuses partitioning across stages instead of re-shuffling, and
    a hot user costs one combiner slot, not a sort buffer.
    """
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    out = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t{i - 1}"
        nxt = (
            events.where(F.col(type_col) == step)
            .select(user_col, ts_col)
            .join(out.select(user_col, prev), user_col)
            .where(F.col(ts_col) > F.col(prev))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        out = out.join(nxt, user_col, "left")
    return out


def funnel_stream(
    stream_events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    stamp_col: str = "tstamp",
    watermark_delay: str = "10 seconds",
    api: str = "auto",
) -> DataFrame:
    """Streaming twin of :func:`funnel`: per-user step times live in the
    keyed state store; every time a user advances a step, an updated funnel
    row (user_id, t1..tk epoch-ms, nulls for steps not yet reached) is
    emitted — a changelog of the batch funnel result.

    Built on ``reduce_value_state_by_key_stream`` (the engine's keyed
    event-time-sorted state machine: transformWithStateInPandas when the
    environment supports it, applyInPandasWithState otherwise). Because the
    machine applies rows in event-time order within the watermark, the
    greedy in-order transition — accept an event iff it is the NEXT step
    and strictly after the last accepted time — computes exactly the batch
    min-chain. State per user is one short list of epoch-ms longs; at
    100 TB of traffic the state store shards by user like any keyed agg.
    """
    k = len(steps)
    if k < 1:
        raise ValueError("funnel needs at least one step")
    step_list = list(steps)

    def state_fn(state, key, row):
        ts_ms = int(row[stamp_col].value // 1_000_000)
        done = len(state)
        if (
            done < k
            and row[type_col] == step_list[done]
            and (done == 0 or ts_ms > state[-1])
        ):
            state = state + [ts_ms]
            out = {"user_id": key}
            for i in range(k):
                out[f"t{i + 1}"] = state[i] if i < len(state) else None
            return state, out
        return state, None

    from proxima_platform_spark.streaming.stateful import (
        reduce_value_state_by_key_stream,
    )

    schema = "user_id long, " + ", ".join(f"t{i + 1} long" for i in range(k))
    return reduce_value_state_by_key_stream(
        stream_events.select(user_col, type_col, stamp_col),
        key=user_col,
        stamp=stamp_col,
        state_fn=state_fn,
        initial_state=[],
        output_schema=schema,
        sorted=True,
        watermark_delay=watermark_delay,
        api=api,
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_ms_col: str = "ts_ms",
    bucket_ms: int = 604_800_000,
) -> DataFrame:
    """Cohort retention triangle: cohort = the user's first-activity bucket
    (epoch-anchored integer buckets — timezone-free and identical across
    engines), cell = distinct users from that cohort active in each bucket.

    Two shuffles: (1) min-bucket per user (map-side combined), (2) exact
    distinct per (cohort, bucket) via dedup-then-count — the re-aggregable
    form of COUNT(DISTINCT) that never holds a per-group set in memory.
    The cohort frame joins back to activity on ``user_col`` — same key as
    shuffle (1), so partitioning is reused.
    """
    # integer DIV floor: ts_ms is non-negative by data contract
    bucket = F.expr(f"({ts_ms_col} DIV {bucket_ms}) * {bucket_ms}")
    activity = events.select(user_col, bucket.alias("bucket_ms"))
    cohorts = activity.groupBy(user_col).agg(F.min("bucket_ms").alias("cohort_ms"))
    return (
        activity.join(cohorts, user_col)
        .select(user_col, "cohort_ms", "bucket_ms")
        .distinct()
        .groupBy("cohort_ms", "bucket_ms")
        .agg(F.count("*").alias("users"))
    )


def gapfill_locf(
    points: DataFrame,
    key_col: str,
    bucket_ms_col: str,
    value_col: str,
    step_ms: int,
) -> DataFrame:
    """Dense per-key time grid with last-observation-carried-forward.

    ``points`` is an already-bucketed frame (one row per (key, bucket));
    the output has one row per key per ``step_ms`` between that key's first
    and last bucket, with ``value`` = the most recent non-null observation
    (the TimescaleDB ``time_bucket_gapfill + locf`` shape).

    Scale design: the grid is generated executor-side with
    ``sequence()``/``explode`` from a per-key (min, max) aggregate — output
    volume is exactly the result size, no driver loop, no cross join. LOCF
    is ``last(ignorenulls)`` over a per-key ordered window; the sort is over
    the BUCKETED frame (|buckets| rows per key, not |raw events|), which at
    100 TB is the 3-orders-smaller ladder level.
    """
    bounds = points.groupBy(key_col).agg(
        F.min(bucket_ms_col).alias("_lo"), F.max(bucket_ms_col).alias("_hi")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step_ms))
        ).alias(bucket_ms_col),
    )
    filled = grid.join(points, [key_col, bucket_ms_col], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(bucket_ms_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.withColumn(
        value_col, F.last(value_col, ignorenulls=True).over(w)
    )


def distinct_ladder(
    events: DataFrame,
    ts_ms_col: str,
    member_col: str,
    levels_ms: Sequence[int],
) -> dict[int, DataFrame]:
    """Exact distinct-count rollup ladder: per level, the number of distinct
    ``member_col`` values per bucket, computed fine→coarse.

    EXACT distinct is NOT mergeable across buckets (a user active in two
    hours of one day must count once for the day), so unlike sum/min/max
    ladders each level re-deduplicates — but from the (bucket, member)
    DEDUPED pairs of the previous level, never from raw. Coarsening the
    bucket of an already-deduped pair frame is a strictly shrinking input:
    at 100 TB the hour→day pass reads |distinct (hour, member)| rows, not
    |events|. For sketch-mergeable rollups (one pass, constant state) see
    ``hll_ladder``.
    """
    out: dict[int, DataFrame] = {}
    step0 = levels_ms[0]
    pairs = events.select(
        F.expr(f"({ts_ms_col} DIV {step0}) * {step0}").alias("bucket_ms"),
        F.col(member_col).alias("_m"),
    ).distinct()
    out[step0] = pairs.groupBy("bucket_ms").agg(F.count("*").alias("uniques"))
    for step in levels_ms[1:]:
        pairs = pairs.select(
            F.expr(f"(bucket_ms DIV {step}) * {step}").alias("bucket_ms"), "_m"
        ).distinct()
        out[step] = pairs.groupBy("bucket_ms").agg(F.count("*").alias("uniques"))
    return out


def hll_ladder(
    events: DataFrame,
    ts_ms_col: str,
    member_col: str,
    levels_ms: Sequence[int],
    lg_k: int = 12,
) -> dict[int, DataFrame]:
    """Mergeable approximate-distinct ladder: per-bucket Datasketches HLL
    sketches at the finest level, coarser levels built by ``hll_union_agg``
    over the FINER level's sketches (never touching raw again).

    This is the sketch analog of ``operators/rollup.py::hypertable_rollup``:
    constant-size per-bucket state, one shuffle per level with map-side
    combine, and the day sketch is the union of 24 hour sketches — the
    continuous-aggregate contract. Columns: ``bucket_ms``, ``sketch``
    (binary, re-mergeable downstream), ``estimate`` (long).
    """
    step0 = levels_ms[0]
    cur = (
        events.select(
            F.expr(f"({ts_ms_col} DIV {step0}) * {step0}").alias("bucket_ms"),
            F.col(member_col).alias("_m"),
        )
        .groupBy("bucket_ms")
        .agg(F.hll_sketch_agg("_m", F.lit(lg_k)).alias("sketch"))
    )
    out = {
        step0: cur.withColumn(
            "estimate", F.hll_sketch_estimate("sketch").cast("long")
        )
    }
    for step in levels_ms[1:]:
        cur = (
            cur.select(
                F.expr(f"(bucket_ms DIV {step}) * {step}").alias("bucket_ms"),
                "sketch",
            )
            .groupBy("bucket_ms")
            .agg(F.hll_union_agg("sketch").alias("sketch"))
        )
        out[step] = cur.withColumn(
            "estimate", F.hll_sketch_estimate("sketch").cast("long")
        )
    return out


def ewma(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    out: str = "ewma",
    max_lag: int = 16,
    value_scale: int = 2,
) -> DataFrame:
    """Exponentially-weighted moving average per key (α = 1/2), truncated to
    the trailing ``max_lag`` observations — the decayed analog of the
    reference's ``integratePerKey`` running sum
    (direct/core ReduceValueStateByKey semantics with geometric decay).

    Exact-arithmetic formulation (engine-portable, hash-oracle-safe): with
    the trailing frame [x_0 … x_{m-1}] oldest-first, the α=1/2 truncated
    normalized weights are 2^i / (2^m − 1), so

        ewma = Σ x_i·2^i / (2^m − 1)

    Values are fixed-decimal (``value_scale`` digits) ⇒ scaled to integers,
    the numerator is an EXACT int64 dot product (m ≤ 16 keeps it far from
    overflow: |x|·10^s·2^16), and the one double division at the end is
    IEEE-correctly-rounded identically in any engine. No float accumulation
    anywhere, so no summation-order noise.

    Plan shape: one shuffle on the key, one sort per partition, a
    ``collect_list`` over a BOUNDED frame (≤ max_lag elements — state is
    O(max_lag), not O(partition)), and a codegen ``aggregate`` lambda.
    At 100 TB this is the standard windowed-analytic plan: Exchange(key) →
    Sort → Window, no driver state, no Python.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(-(max_lag - 1), 0)
    )
    cents = F.round(F.col(value_col) * F.lit(10 ** value_scale)).cast("long")
    # frame order = orderBy order (oldest first); the newest element gets
    # the largest weight 2^(m-1)
    staged = df.withColumn("__l", F.collect_list(cents).over(w))
    num = F.expr(
        "aggregate(zip_with(__l, sequence(0, size(__l) - 1),"
        " (x, i) -> x * shiftleft(1L, i)), 0L, (a, v) -> a + v)"
    )
    den = F.expr("shiftleft(1L, size(__l)) - 1")
    return staged.withColumn(
        out, F.round(num / (den * F.lit(10 ** value_scale)), 6)
    ).drop("__l")


def rolling_zscore(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    window_rows: int = 50,
    min_obs: int = 10,
    value_scale: int = 2,
) -> DataFrame:
    """Rolling anomaly score per key: z = (x − μ)/σ over the trailing
    ``window_rows`` observations (population σ), NULL until ``min_obs``
    points have been seen. The streaming-telemetry outlier primitive.

    Exactness recipe: Σx and Σx² accumulate in DECIMAL over the
    fixed-decimal input (order-independent — no float summation noise; x²
    of a scale-s decimal is a scale-2s decimal, still exact), then μ, σ, z
    are a FIXED sequence of correctly-rounded double ops identical in any
    IEEE engine, rounded to 6 at the end. Columns added: ``n_obs``,
    ``zscore``.

    Plan shape: Exchange(key) → Sort → single Window computing both running
    sums over the same bounded frame — one pass, O(1) state per row.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(-(window_rows - 1), 0)
    )
    s = value_scale
    xd = F.col(value_col).cast(f"decimal(18,{s})")
    sum_x = F.sum(xd).over(w).cast("double")
    sum_x2 = F.sum((xd * xd).cast(f"decimal(38,{2 * s})")).over(w).cast("double")
    n = F.count(F.lit(1)).over(w).cast("double")
    mean = sum_x / n
    var = sum_x2 / n - mean * mean
    x = F.col(value_col).cast("double")
    z = (x - mean) / F.sqrt(var)
    # var > 0 guard (not sqrt(var) > 0): engines disagree on sqrt of the
    # tiny negative a cancellation can produce (NaN vs error)
    return df.withColumn("n_obs", n.cast("long")).withColumn(
        "zscore",
        F.when((F.col("n_obs") >= min_obs) & (var > 0), F.round(z, 6)),
    )


def ewma_stream(
    stream_events: DataFrame,
    *,
    key_col: str = "user_id",
    stamp_col: str = "tstamp",
    value_col: str = "value",
    id_col: str = "event_id",
    max_lag: int = 16,
    value_scale: int = 2,
    watermark_delay: str = "10 seconds",
    api: str = "auto",
) -> DataFrame:
    """Streaming twin of :func:`ewma`: the keyed event-time state machine
    (``reduce_value_state_by_key_stream`` — transformWithStateInPandas
    when available, applyInPandasWithState otherwise) carries the last
    ``max_lag`` scaled-integer observations per key and emits one
    (key, id, ewma) row per input event, equal to the batch operator's
    value for that row. State per key is ≤ max_lag int64s; rows apply in
    event-time order within the watermark, matching the batch
    (stamp, id) frame order."""
    scale = 10 ** value_scale

    def state_fn(state, key, row):
        # half-up cents, matching the batch operator's F.round scaling
        cents = int(_round_half_up(float(row[value_col]) * scale))
        state = (state + [cents])[-max_lag:]
        m = len(state)
        num = sum(c * (1 << i) for i, c in enumerate(state))
        val = _round_half_up(num / (((1 << m) - 1) * float(scale)), 6)
        return state, {key_col: key, id_col: row[id_col], "ewma": val}

    from proxima_platform_spark.streaming.stateful import (
        reduce_value_state_by_key_stream,
    )

    return reduce_value_state_by_key_stream(
        stream_events.select(key_col, stamp_col, value_col, id_col),
        key=key_col,
        stamp=stamp_col,
        state_fn=state_fn,
        initial_state=[],
        output_schema=f"{key_col} long, {id_col} long, ewma double",
        sorted=True,
        watermark_delay=watermark_delay,
        api=api,
    )


def mad_outliers(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    id_cols: Sequence[str],
    k: float = 3.0,
) -> DataFrame:
    """Robust per-key outliers via Median Absolute Deviation: flag rows
    with |x − med| > k·MAD, where both medians are the LOWER median
    (element at position ⌊(n+1)/2⌋ in (value, id) order — exact and
    deterministic; no interpolation, so no engine float-divergence and a
    single extreme value can't drag the threshold the way σ does in
    z-scoring). Columns added: ``med``, ``mad``, ``is_outlier``.

    Plan shape: two rank-the-key passes (value order, then deviation
    order), each Exchange(key) → Sort → Window with row_number + count
    sharing one exchange; the median frames join back on the SAME key, so
    partitioning is reused. All comparisons are on fixed-decimal inputs —
    no float accumulation anywhere.
    """
    kc = list(key_cols)
    ic = list(id_cols)

    def lower_median(frame: DataFrame, col: str, out: str) -> DataFrame:
        wp = Window.partitionBy(*kc)
        w = wp.orderBy(F.col(col), *ic)
        ranked = frame.withColumn("__rn", F.row_number().over(w)).withColumn(
            "__cnt", F.count(F.lit(1)).over(wp)
        )
        return (
            ranked.where(F.col("__rn") == F.expr("(__cnt + 1) DIV 2"))
            .select(*kc, F.col(col).alias(out))
        )

    med = lower_median(df.select(*kc, *ic, value_col), value_col, "med")
    with_med = df.join(med, kc)
    dev = with_med.withColumn(
        "__dev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = lower_median(dev.select(*kc, *ic, "__dev"), "__dev", "mad")
    out = dev.join(mad, kc).withColumn(
        "is_outlier",
        (F.col("mad") > 0) & (F.col("__dev") > F.lit(k) * F.col("mad")),
    )
    return out.drop("__dev")


def rolling_zscore_stream(
    stream_events: DataFrame,
    *,
    key_col: str = "user_id",
    stamp_col: str = "tstamp",
    value_col: str = "value",
    id_col: str = "event_id",
    window_rows: int = 50,
    min_obs: int = 10,
    value_scale: int = 2,
    watermark_delay: str = "10 seconds",
    api: str = "auto",
) -> DataFrame:
    """Streaming twin of :func:`rolling_zscore`: the keyed event-time state
    machine carries the trailing ``window_rows`` scaled-integer
    observations per key and emits (key, id, n_obs, zscore) per event,
    equal to the batch operator row-for-row (the python math mirrors the
    batch recipe: exact integer Σx/Σx², then the same fixed IEEE double
    sequence). State per key is ≤ window_rows int64s — the RocksDB state
    store shards it by key at scale."""
    import math

    scale = 10 ** value_scale

    def state_fn(state, key, row):
        # half-up cents, matching the batch operator's F.round scaling
        cents = int(_round_half_up(float(row[value_col]) * scale))
        state = (state + [cents])[-window_rows:]
        m = len(state)
        sum_x = float(sum(state)) / scale
        sum_x2 = float(sum(c * c for c in state)) / (scale * scale)
        mean = sum_x / m
        var = sum_x2 / m - mean * mean
        z = None
        if m >= min_obs and var > 0:
            z = _round_half_up(
                (float(row[value_col]) - mean) / math.sqrt(var), 6
            )
        return state, {
            key_col: key,
            id_col: row[id_col],
            "n_obs": m,
            "zscore": z,
        }

    from proxima_platform_spark.streaming.stateful import (
        reduce_value_state_by_key_stream,
    )

    return reduce_value_state_by_key_stream(
        stream_events.select(key_col, stamp_col, value_col, id_col),
        key=key_col,
        stamp=stamp_col,
        state_fn=state_fn,
        initial_state=[],
        output_schema=f"{key_col} long, {id_col} long, n_obs long, zscore double",
        sorted=True,
        watermark_delay=watermark_delay,
        api=api,
    )


def drift_chi2(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    split_col: Column,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 100.0,
) -> DataFrame:
    """Distribution-drift detection per group: Pearson χ² between the
    ``value_col`` histograms of the reference slice (``split_col`` false)
    and the current slice (true), over ``n_bins`` fixed-width bins in
    [lo, hi) (clamped). χ² = Σ (o_i − e_i)²/e_i with e_i = n_cur·ref_i/n_ref,
    over bins with ref_i > 0; plus ``extra_bins`` counting current-slice
    bins the reference never saw (those break the e_i formula and are a
    drift signal on their own).

    Determinism recipe: bin counts are exact integers; each per-bin term is
    a FIXED sequence of correctly-rounded double ops; and the Σ over bins
    folds a SORTED array (aggregate over array_sort(collect_list)) — the
    one place a groupBy sum of doubles would introduce engine-dependent
    summation order. Rounded to 6 at the end.

    Why χ² and not PSI/KL: those need log(), whose last-ulp behavior is
    libm-specific — χ² stays in +,−,×,÷ and keeps the oracle exact. Plan:
    two bounded-cardinality count aggs (groups×bins cells, map-side
    combined) + one group-keyed merge — nothing scales with row count but
    the first count pass.
    """
    g = list(group_cols)
    width = (hi - lo) / n_bins
    binned = df.select(
        *g,
        F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int"),
            ),
        ).alias("__bin"),
        split_col.cast("boolean").alias("__cur"),
    )
    counts = binned.groupBy(*g, "__bin").agg(
        F.sum(F.when(F.col("__cur"), 1).otherwise(0)).alias("o"),
        F.sum(F.when(~F.col("__cur"), 1).otherwise(0)).alias("r"),
    )
    totals = counts.groupBy(*g).agg(
        F.sum("o").alias("n_cur"), F.sum("r").alias("n_ref")
    )
    terms = counts.join(totals, g).select(
        *g,
        "__bin",
        F.when(
            F.col("r") > 0,
            (
                (
                    F.col("o").cast("double")
                    - (
                        F.col("n_cur").cast("double")
                        * F.col("r").cast("double")
                        / F.col("n_ref").cast("double")
                    )
                )
                * (
                    F.col("o").cast("double")
                    - (
                        F.col("n_cur").cast("double")
                        * F.col("r").cast("double")
                        / F.col("n_ref").cast("double")
                    )
                )
                / (
                    F.col("n_cur").cast("double")
                    * F.col("r").cast("double")
                    / F.col("n_ref").cast("double")
                )
            ),
        ).alias("__term"),
        ((F.col("o") > 0) & (F.col("r") == 0)).alias("__extra"),
    )
    return (
        terms.groupBy(*g)
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__term").isNotNull(),
                                F.struct("__bin", "__term"),
                            )
                        )
                    ),
                    F.lit(0.0),
                    lambda acc, s: acc + s["__term"],
                ),
                6,
            ).alias("chi2"),
            F.sum(F.when(F.col("__extra"), 1).otherwise(0)).alias("extra_bins"),
        )
    )


def attribution_stream(
    stream_events: DataFrame,
    *,
    marketing_types: Sequence[str] = ("click", "view"),
    conversion_type: str = "purchase",
    key_col: str = "user_id",
    type_col: str = "event_type",
    stamp_col: str = "tstamp",
    id_col: str = "event_id",
    watermark_delay: str = "10 seconds",
    api: str = "auto",
) -> DataFrame:
    """Streaming twin of the batch last-touch attribution query: the keyed
    event-time state machine carries ONE value per user (the most recent
    marketing touch) and emits a credited row per conversion —
    (key, conversion id, channel). Rows apply in event-time order within
    the watermark, so the credit equals the batch carry-forward window's.
    State per key is O(1); conversions stream out as they happen instead
    of waiting for a batch re-scan — the online half of the attribution
    pair."""
    mtypes = set(marketing_types)

    def state_fn(state, key, row):
        t = row[type_col]
        if t in mtypes:
            return [t], None
        if t == conversion_type:
            channel = state[0] if state else "(direct)"
            return state, {
                key_col: key,
                id_col: row[id_col],
                "channel": channel,
            }
        return state, None

    from proxima_platform_spark.streaming.stateful import (
        reduce_value_state_by_key_stream,
    )

    return reduce_value_state_by_key_stream(
        stream_events.select(key_col, type_col, stamp_col, id_col),
        key=key_col,
        stamp=stamp_col,
        state_fn=state_fn,
        initial_state=[],
        output_schema=f"{key_col} long, {id_col} long, channel string",
        sorted=True,
        watermark_delay=watermark_delay,
        api=api,
    )


def time_weighted_average(
    df: DataFrame,
    key_cols: Sequence[str],
    *,
    ts_ms_col: str = "ts_ms",
    value_col: str = "value",
    id_col: str = "event_id",
    day_ms: int = 86400000,
    value_scale: int = 2,
) -> DataFrame:
    """Batch time-weighted average per (keys, day) — the TimescaleDB
    ``time_weight('LOCF', ...)`` primitive: each sample is weighted by its
    holding duration (lead() within the day; the last sample is held to
    midnight). All-integer core: ``value_scale``-decimal values become
    exact scaled-integer "cents", durations are epoch-ms longs, so
    Σ(cents·dur) and Σdur are exact and the TWA is one IEEE double
    division. Output: key cols + ``day_ms``, ``n_samples``,
    ``weighted_cents_ms``, ``twa``. The aggregate groups on the window's
    own (keys, day) partition key so both share one exchange."""
    scale = 10 ** value_scale
    keys = list(key_cols)
    ev = df.withColumn("day", F.expr(f"{ts_ms_col} DIV {day_ms}")).withColumn(
        "cents", F.round(F.col(value_col) * scale, 0).cast("long")
    )
    w = Window.partitionBy(*keys, "day").orderBy(ts_ms_col, id_col)
    d = ev.withColumn(
        "dur",
        F.coalesce(F.lead(ts_ms_col).over(w), (F.col("day") + 1) * day_ms)
        - F.col(ts_ms_col),
    )
    return (
        d.groupBy(*keys, "day")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum(F.col("cents") * F.col("dur")).alias("weighted_cents_ms"),
            F.round(
                F.sum(F.col("cents") * F.col("dur")).cast("double")
                / (F.sum("dur").cast("double") * float(scale)),
                6,
            ).alias("twa"),
        )
        .select(
            *keys,
            (F.col("day") * day_ms).alias("day_ms"),
            "n_samples",
            "weighted_cents_ms",
            "twa",
        )
    )


def twa_stream(
    stream_events: DataFrame,
    *,
    key_col: str = "user_id",
    stamp_col: str = "tstamp",
    value_col: str = "value",
    id_col: str = "event_id",
    day_ms: int = 86400000,
    value_scale: int = 2,
    watermark_delay: str = "10 seconds",
    api: str = "auto",
) -> DataFrame:
    """Streaming twin of :func:`time_weighted_average`, continuously
    maintained: per (key, day) the state machine carries (first_ts,
    closed-interval Σcents·dur, previous sample), and after every event
    emits the day's TWA *as if the day ended now* (last sample held to
    midnight, denominator = midnight − first_ts). The LAST emission per
    (key, day) therefore equals the batch operator's value exactly — the
    same convergence contract as the continuously-maintained heavy-hitter
    sketch. State per key-day is three ints; the composite grouping key is
    key·10⁶ + day (decomposed again in the output)."""
    scale = 10 ** value_scale

    # Composite-key precondition: uk = key·10⁶ + day packs into int64 only
    # for 0 <= key <= ~9.2e12 (negative keys decompose wrong under
    # %/DIV 10⁶ and would silently misattribute state across (key, day)
    # cells). Fail loudly executor-side instead: assert_true raises on the
    # first violating row.
    key_ok = (F.col(key_col) >= 0) & (
        F.col(key_col) <= (9_223_372_036_854_775_807 - 999_999) // 1_000_000
    )
    ev = stream_events.withColumn(
        "uk",
        F.when(
            F.assert_true(
                key_ok, f"twa_stream: {key_col} must be in [0, ~9.2e12]"
            ).isNull(),
            F.col(key_col).cast("long") * F.lit(1_000_000)
            + F.expr(f"unix_millis({stamp_col}) DIV {day_ms}"),
        ),
    )

    def state_fn(state, uk, row):
        ts = int(pd.Timestamp(row[stamp_col]).value // 1_000_000)
        # half-up cents, matching the batch operator's F.round scaling
        cents = int(_round_half_up(float(row[value_col]) * scale))
        if state is None or not state:
            first_ts, closed, prev_ts, prev_cents = ts, 0, ts, cents
        else:
            first_ts, closed, prev_ts, prev_cents = state
            closed += prev_cents * (ts - prev_ts)
            prev_ts, prev_cents = ts, cents
        day = uk % 1_000_000
        day_end = (day + 1) * day_ms
        total = closed + cents * (day_end - ts)
        twa = _round_half_up(total / (float(day_end - first_ts) * scale), 6)
        out = {
            key_col: uk // 1_000_000,
            "day_ms": day * day_ms,
            id_col: int(row[id_col]),
            "twa": twa,
        }
        return [first_ts, closed, prev_ts, prev_cents], out

    from proxima_platform_spark.streaming.stateful import (
        reduce_value_state_by_key_stream,
    )

    return reduce_value_state_by_key_stream(
        ev.select("uk", stamp_col, value_col, id_col),
        key="uk",
        stamp=stamp_col,
        state_fn=state_fn,
        initial_state=[],
        output_schema=f"{key_col} long, day_ms long, {id_col} long, twa double",
        sorted=True,
        watermark_delay=watermark_delay,
        api=api,
    )


def kaplan_meier(
    units: DataFrame,
    *,
    time_col: str = "obs_time",
    event_col: str = "event",
) -> DataFrame:
    """Kaplan-Meier survival curve (the product-limit estimator — THE
    retention/churn curve under right-censoring): at every distinct
    event time t,

        S(t) = Π over event times u <= t of (1 - d_u / n_u)

    with d_u = events at u and n_u = units still at risk (observed time
    >= u). Censored units (``event_col`` = 0, e.g. users still active at
    the analysis horizon) contribute to the at-risk denominators up to
    their observation time but never to the numerators — dropping them
    instead is the classic churn-rate overestimate this estimator exists
    to fix.

    Engine portability (the r08 driver-red lesson): NO transcendentals
    in hashed columns. The earlier form hashed round(ln(1-d/n), 8) and
    round(exp(Σ), 6) — both evaluated independently by JVM Math and
    libm, and on the sf0.01 fixture one step factor sat 7.1e-11 from
    its rounding boundary, so a different libm flipped a digit and the
    whole-result hash died. Now the running product is PURE INTEGER
    arithmetic: survival is held scaled by 1e12 and each step applies

        S' = round_half_up(S * (n - d) / n)
           = (2*S*(n-d) + n) DIV (2*n)

    folded left-to-right over the ordered step list (the ``bpe_encode``
    aggregate-fold recipe) in decimal(38,0) — every engine computes the
    identical integer. The d = n terminal step needs no special case:
    (n-d) = 0 zeroes S exactly and keeps it zero. The exposed
    ``survival`` is one IEEE-754 double division S/1e12 of two exactly
    representable values — correctly rounded, bit-identical everywhere.

    Scale shape: one map-side-combined agg to per-time (d, c) counts —
    the frame is |distinct times| rows, NOT units — then two windows
    over that tiny frame (reverse cumsum for at-risk, prefix-list fold
    for the product; O(T^2) fold work on a T = |distinct times| frame
    — days/weeks: thousands of rows at most — is trivia). At 100 TB the
    unit frame never sorts globally; only the time-domain frame does.

    Returns (t, n_at_risk, n_events, survival) for every distinct EVENT
    time, ordered cumulative semantics by t.
    """
    u = units.select(
        F.col(time_col).cast("long").alias("__t"),
        F.col(event_col).cast("int").alias("__e"),
    )
    per_t = u.groupBy("__t").agg(
        F.sum("__e").alias("__d"),
        F.count(F.lit(1)).alias("__c"),
    )
    w_risk = Window.orderBy(F.col("__t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risked = per_t.withColumn("__n", F.sum("__c").over(w_risk))
    steps = risked.where(F.col("__d") > 0).select("__t", "__n", "__d")
    w_cum = Window.orderBy("__t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # prefix list of (n, d) steps, folded with the exact-integer
    # round-half-up product update; all values positive so DIV (trunc)
    # == floor and matches DuckDB's // exactly
    cum = steps.withColumn(
        "__steps",
        F.collect_list(
            F.struct(F.col("__n").alias("n"), F.col("__d").alias("d"))
        ).over(w_cum),
    )
    return cum.select(
        F.col("__t").alias("t"),
        F.col("__n").alias("n_at_risk"),
        F.col("__d").alias("n_events"),
        (
            F.expr(
                """
                CAST(aggregate(
                    __steps,
                    CAST(1000000000000 AS DECIMAL(38, 0)),
                    (acc, x) -> CAST(
                        (acc * (x.n - x.d) * 2 + x.n) div (x.n * 2)
                        AS DECIMAL(38, 0))
                ) AS DOUBLE)
                """
            )
            / F.lit(1.0e12)
        ).alias("survival"),
    )
