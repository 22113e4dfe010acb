"""Stateful operators — batch forms.

Streaming twins live in proxima_platform_spark.streaming.stateful (built on
transformWithStateInPandas / applyInPandasWithState).

* ``integrate_per_key`` — running per-key prefix combine, one output per
  input element, applied in event-time order (reference:
  tools/.../Stream.java:545-550, BeamStream.integratePerKey:932-974,
  IntegrateDoFn:1498-1542; batch sort guarantee Stream.java:529-534).
  Batch mapping is a **window function** — no Python in the path, a single
  shuffle on the key, and Spark's window exec streams each partition
  (running frame), so it holds at 100 TB as long as single keys fit a
  partition. Skewed keys: ``integrate_per_key_salted`` pre-splits each key's
  timeline into contiguous range buckets and integrates hierarchically —
  no single task ever holds a whole hot key.

* ``reduce_value_state_by_key`` — general keyed state machine (reference:
  Stream.java:496-503, BeamStream.java:997-1070; sorted variant buffers by
  event time via timers, :1633-1677). Batch mapping: per-key
  ``applyInPandas`` with an in-group event-time sort — the group *is* the
  full history of one key, which matches the reference's batch semantics
  (global window, state carried across the whole bounded input).
"""

from __future__ import annotations

from typing import Callable, Iterable

import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F


def integrate_per_key(
    df: DataFrame,
    *,
    key: Column,
    value: Column,
    stamp: Column | None,
    initial: float = 0.0,
    alias: str = "integrated",
) -> DataFrame:
    """sum(value) OVER (PARTITION BY key ORDER BY stamp ROWS UNBOUNDED
    PRECEDING) + initial — one output row per input row.

    Ordering must be (stamp, tiebreak) to mirror the reference's
    event-time-sorted integration (SURVEY §2.10.5); callers with a unique
    id column should pass it via a struct stamp for a total order.
    """
    order = [stamp] if stamp is not None else [F.monotonically_increasing_id()]
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(value).over(w) + F.lit(initial)
    return df.select(
        key.alias("key"),
        *[F.col(c) for c in df.columns],
        running.alias(alias),
    )


def integrate_per_key_salted(
    df: DataFrame,
    *,
    key: Column,
    value: Column,
    stamp: Column,
    initial: float = 0.0,
    alias: str = "integrated",
    num_buckets: int = 32,
    rel_err: float = 0.001,
) -> DataFrame:
    """Hot-key-safe ``integrate_per_key``: hierarchical two-phase prefix sum.

    ``integrate_per_key``'s window puts ALL rows of one key into a single
    window partition — one task, however big the key. This form splits each
    key's timeline into ``num_buckets`` contiguous stamp ranges (global
    range cutpoints from approxQuantile — a bounded, (num_buckets-1)-double
    driver collect, same legitimacy class as IVF centroid sampling):

      phase 1: running sum within (key, bucket) — parallel across buckets,
               so a key holding 50% of all rows spreads over ~num_buckets
               tasks instead of one;
      phase 2: per-(key, bucket) totals (tiny: #keys × #buckets rows) get an
               exclusive per-key prefix over bucket order, joined back as the
               bucket's starting offset. AQE broadcasts the totals side at
               any realistic scale.

    Results are identical to the unsalted form whenever ``stamp`` is a total
    order per key (ties across rows are resolved identically because equal
    stamps always share a bucket). Null keys are dropped (the offset join is
    an equi-join); the plain window form keeps them as their own partition.
    Use for skewed keys; the plain window form is one shuffle cheaper for
    uniform data.

    Plan shape (verified with .explain): phase-1 Window partitioned by
    (key, bucket); offsets side is #keys×#buckets rows so AQE broadcasts it
    at runtime; the big side arrives at the join already sorted by
    (key, bucket) from its own window — no extra sort.
    """
    s = stamp.cast("double")
    probe = df.select(s.alias("__s"))
    cuts = probe.approxQuantile(
        "__s", [i / num_buckets for i in range(1, num_buckets)], rel_err
    )
    # strictly increasing cutpoints only (duplicates collapse empty buckets)
    uniq: list[float] = []
    for c in cuts:
        if not uniq or c > uniq[-1]:
            uniq.append(c)
    if uniq:
        cut_arr = F.array(*[F.lit(c) for c in uniq])
        bucket = F.aggregate(
            cut_arr,
            F.lit(0),
            lambda acc, c: acc + F.when(s >= c, 1).otherwise(0),
        )
    else:  # constant stamp — single bucket, degenerates to the plain form
        bucket = F.lit(0)

    base = df.select(
        key.alias("__key"),
        bucket.alias("__bucket"),
        value.alias("__value"),
        stamp.alias("__stamp"),
        *[F.col(c) for c in df.columns],
    )
    w_local = (
        Window.partitionBy("__key", "__bucket")
        .orderBy("__stamp")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("__local_run", F.sum("__value").over(w_local))

    totals = base.groupBy("__key", "__bucket").agg(F.sum("__value").alias("__tot"))
    w_offset = (
        Window.partitionBy("__key")
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__key",
        "__bucket",
        F.coalesce(F.sum("__tot").over(w_offset), F.lit(0.0)).alias("__offset"),
    )

    joined = local.join(offsets, ["__key", "__bucket"])
    return joined.select(
        F.col("__key").alias("key"),
        *[F.col(c) for c in df.columns],
        (F.col("__local_run") + F.col("__offset") + F.lit(initial)).alias(alias),
    )


def reduce_value_state_by_key(
    df: DataFrame,
    *,
    key: Column,
    value_cols: list[str],
    state_fn: Callable[[object, "pd.DataFrame"], "pd.DataFrame"],
    output_schema: str,
    stamp: str | None,
    sorted: bool = True,
) -> DataFrame:
    """Keyed state machine over the full (bounded) history of each key.

    ``state_fn(key, pdf) -> pdf`` receives one key's rows — pre-sorted by
    event time when ``sorted=True`` (the reference's default; timer-based
    buffering in BeamStream.java:1633-1677) — and returns the output rows
    (a null/omitted output row ≈ the reference's "null → no output").
    """

    def apply(key_tuple: tuple, pdf: "pd.DataFrame") -> "pd.DataFrame":
        if sorted and stamp is not None:
            pdf = pdf.sort_values(stamp, kind="mergesort")  # stable = seq order tiebreak
        return state_fn(key_tuple[0], pdf)

    # ship only the columns the state machine reads (plus the sort stamp)
    # through the Arrow boundary — the shuffle and serialization cost of
    # applyInPandas is per-byte, and callers' frames are often much wider
    needed = list(dict.fromkeys(value_cols + ([stamp] if stamp else [])))
    projected = df.select(key.alias("__key"), *[F.col(c) for c in needed])
    # explicit numbered repartition: AQE would coalesce a small shuffle to 1
    # partition and serialize every key's replay through one Python worker;
    # at scale this is the same key-hash shuffle the groupBy needs anyway
    n = projected.sparkSession.sparkContext.defaultParallelism
    projected = projected.repartition(n, F.col("__key"))
    return projected.groupBy("__key").applyInPandas(apply, schema=output_schema)
