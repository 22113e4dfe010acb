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
  partition (skewed keys: pre-split with a salt and integrate hierarchically).

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

    def apply(key_tuple, pdf: "pd.DataFrame") -> "pd.DataFrame":
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
