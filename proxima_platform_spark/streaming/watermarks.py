"""Watermark estimation: the reference's per-source estimator SPI mapped
onto Spark's built-in watermark machinery.

Reference SPI (core/.../time/WatermarkEstimator.java:22-47, idle policy
WatermarkIdlePolicy.java:21-39; per-partition min in
PartitionedWatermarkEstimator.java) with three shipped estimators:

  * BoundedOutOfOrdernessWatermarkEstimator (direct/core/.../time/
    BoundedOutOfOrdernessWatermarkEstimator.java:38-96;
    ``watermark.max-out-of-orderness``, default 0)
  * ProcessingTimeWatermarkEstimator (same dir)
  * UnboundedOutOfOrdernessWatermarkEstimator (same dir)

Spark already implements the architecture: per-partition watermarks with a
global min, driver-owned (so GlobalWatermarkTracker has no role — DELTAS.md
#8). What remains for us is the *policy* choice, expressed as the
``withWatermark`` configuration these shims produce. Idle-source policies
have no Spark hook (DELTAS.md #3) — ``on_idle`` records the intent and the
mitigation.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class BoundedOutOfOrderness:
    """Event-time watermark lagging the max seen stamp by a fixed bound —
    exactly Spark's withWatermark contract. Default 0 mirrors the
    reference's ``DEFAULT_MAX_OUT_OF_ORDERNESS``."""

    max_out_of_orderness_ms: int = 0

    def apply(self, df: DataFrame, stamp: str) -> DataFrame:
        return df.withWatermark(stamp, f"{self.max_out_of_orderness_ms} milliseconds")


@dataclass(frozen=True)
class ProcessingTime:
    """Watermark = wall clock: elements are never late. In Spark this is
    simply *no* event-time watermark (processing-time semantics), optionally
    stamping arrival time for windowing on it."""

    stamp_arrival_as: str | None = None

    def apply(self, df: DataFrame, stamp: str | None = None) -> DataFrame:
        if self.stamp_arrival_as:
            return df.withColumn(self.stamp_arrival_as, F.current_timestamp())
        return df


@dataclass(frozen=True)
class UnboundedOutOfOrderness:
    """Watermark never advances past the source's committed position — the
    'hold everything' estimator. Spark analog: an effectively-infinite
    delay, so state is retained until the query owner compacts it."""

    delay_ms: int = 365 * 24 * 3600 * 1000  # one year ≈ unbounded for state GC

    def apply(self, df: DataFrame, stamp: str) -> DataFrame:
        return df.withWatermark(stamp, f"{self.delay_ms} milliseconds")


def on_idle_advance_note() -> str:
    """Idle-source policy has no public Structured Streaming hook: Spark
    advances event-time watermarks only when data arrives. Mitigations:
    ``spark.sql.streaming.noDataMicroBatches.enabled`` keeps empty
    micro-batches flowing so processing-time triggers and state timeouts
    still fire, and upstream heartbeat elements advance event time
    explicitly. (Reference: WatermarkIdlePolicy.java; DELTAS.md #3.)"""
    return "see docstring"
