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
have no hook in BUILT-IN ``withWatermark`` queries (DELTAS.md #3) — but the
driver-owned watermark path (foreachBatch maintainers, latecomer split)
implements the full SPI below: per-partition estimators with
NotProgressing / ProcessingTimeShifting / SkewedProcessingTime idle
policies under the reference's monotonic-guard + min-over-partitions
contract.
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


# ---------------------------------------------------------------------------
# Idle-source watermark policies (DELTAS.md #3, upgraded in r09)
#
# Spark's BUILT-IN event-time watermark only advances on data, so the
# policies cannot hook `withWatermark` queries. But the repo's
# foreachBatch maintainer family and the latecomer split
# (streaming/stateful.split_latecomers) consume a DRIVER-OWNED watermark
# — and there the reference's full idle-policy SPI semantics are
# implementable. These classes re-express that public SPI
# (core/.../time/AbstractWatermarkEstimator.java:22-96 — idle() marks
# the source idle and getWatermark() takes max(estimate, idle policy)
# under a monotonic guard; WatermarkIdlePolicy.java:21-39;
# MinimalPartitionWatermarkEstimator.java:24-55 — the global watermark
# is the min over partitions) with the three shipped policies
# (direct/core/.../time/NotProgressingWatermarkIdlePolicy.java,
# ProcessingTimeShiftingWatermarkIdlePolicy.java,
# SkewedProcessingTimeIdlePolicy.java).
# ---------------------------------------------------------------------------

MIN_WATERMARK = -(2**63)


class NotProgressingIdlePolicy:
    """Idle source HOLDS the watermark (the safe default): the idle
    watermark never exceeds the last estimate seen at idle time, so a
    quiet partition keeps pinning the global min until it speaks."""

    def __init__(self) -> None:
        self._wm = MIN_WATERMARK

    def update(self, stamp_ms: int) -> None:  # noqa: ARG002 — SPI shape
        pass

    def idle(self, current_watermark: int) -> None:
        self._wm = max(current_watermark, self._wm)

    def get_idle_watermark(self) -> int:
        return self._wm


class ProcessingTimeShiftingIdlePolicy:
    """While idle, the watermark advances by the PROCESSING-TIME deltas
    between idle signals (starting from the watermark at first idle) —
    wall-clock progress substitutes for event-time progress until data
    returns; any element disables the shift."""

    def __init__(self, time_fn=None) -> None:
        import time as _time

        self._time_fn = time_fn or (lambda: int(_time.time() * 1000))
        self._last_idle_pt = MIN_WATERMARK
        self._last_idle_wm = MIN_WATERMARK

    def update(self, stamp_ms: int) -> None:  # noqa: ARG002
        self._last_idle_pt = MIN_WATERMARK

    def idle(self, current_watermark: int) -> None:
        now = self._time_fn()
        if self._last_idle_pt > 0:
            self._last_idle_wm += now - self._last_idle_pt
        else:
            self._last_idle_wm = current_watermark
        self._last_idle_pt = now

    def get_idle_watermark(self) -> int:
        return self._last_idle_wm


class SkewedProcessingTimeIdlePolicy:
    """While idle, the watermark follows processing time minus a fixed
    skew — the "my clock is roughly event time" sources (IoT feeds,
    logs shipped near-real-time).

    Intentional hardening vs the reference
    (direct/core SkewedProcessingTimeIdlePolicy.java:92): the reference
    overwrites the idle watermark unconditionally, so a regressing
    wall clock regresses get_idle_watermark(); here ``idle`` keeps
    ``max(previous, now - skew)`` so the policy's own output is
    monotonic even before the estimator's never-decrease guard clamps
    it. Downstream watermarks are identical (the estimator guard masks
    the difference); only raw get_idle_watermark parity differs."""

    DEFAULT_TIMESTAMP_SKEW_MS = 100

    def __init__(self, skew_ms: int | None = None, time_fn=None) -> None:
        import time as _time

        self.skew_ms = (
            self.DEFAULT_TIMESTAMP_SKEW_MS if skew_ms is None else skew_ms
        )
        self._time_fn = time_fn or (lambda: int(_time.time() * 1000))
        self._wm = MIN_WATERMARK

    def update(self, stamp_ms: int) -> None:  # noqa: ARG002
        pass

    def idle(self, current_watermark: int) -> None:  # noqa: ARG002
        self._wm = max(self._wm, self._time_fn() - self.skew_ms)

    def get_idle_watermark(self) -> int:
        return self._wm


class BoundedOutOfOrdernessEstimator:
    """Per-source estimator state with an idle policy: watermark =
    max(min_watermark, max_seen_stamp − max_out_of_orderness), lifted by
    the idle policy while idle, under a monotonic never-decrease guard
    — the AbstractWatermarkEstimator contract."""

    def __init__(
        self,
        *,
        max_out_of_orderness_ms: int = 0,
        min_watermark: int = MIN_WATERMARK,
        idle_policy=None,
    ) -> None:
        self.max_out_of_orderness_ms = max_out_of_orderness_ms
        self.min_watermark = min_watermark
        self.idle_policy = idle_policy or NotProgressingIdlePolicy()
        self._max_ts: int | None = None
        self._is_idle = False
        self._last_wm = MIN_WATERMARK

    def update(self, stamp_ms: int) -> None:
        self._is_idle = False
        self.idle_policy.update(stamp_ms)
        self._max_ts = (
            stamp_ms if self._max_ts is None else max(self._max_ts, stamp_ms)
        )

    def idle(self) -> None:
        self._is_idle = True
        self.idle_policy.idle(self.watermark())

    def _estimate(self) -> int:
        if self._max_ts is not None:
            return max(
                self.min_watermark, self._max_ts - self.max_out_of_orderness_ms
            )
        return self.min_watermark

    def watermark(self) -> int:
        wm = self._estimate()
        if self._is_idle:
            wm = max(wm, self.idle_policy.get_idle_watermark())
        if wm < self._last_wm:
            return self._last_wm
        self._last_wm = wm
        return wm


class MinimalPartitionWatermark:
    """Global watermark over per-partition estimators: the MIN across
    partitions (MinimalPartitionWatermarkEstimator semantics). Drive it
    from a foreachBatch loop — ``update(partition, max_stamp)`` for
    partitions that delivered rows, ``idle(partition)`` for the quiet
    ones — and feed ``watermark()`` to ``split_latecomers`` / the
    maintainers' flush decisions. With a shifting/skewed idle policy an
    idle partition stops pinning the global watermark; with
    NotProgressing it holds (the reference's default posture)."""

    def __init__(self, estimators: dict) -> None:
        if not estimators:
            raise ValueError("at least one partition estimator required")
        self._est = dict(estimators)

    def update(self, partition, stamp_ms: int) -> None:
        self._require(partition).update(stamp_ms)

    def idle(self, partition) -> None:
        self._require(partition).idle()

    def watermark(self) -> int:
        return min(e.watermark() for e in self._est.values())

    def partition_watermark(self, partition) -> int:
        return self._require(partition).watermark()

    def _require(self, partition):
        est = self._est.get(partition)
        if est is None:
            raise KeyError(f"no watermark estimator for partition {partition}")
        return est


class ShiftedWatermark:
    """Output watermark held BEHIND a tracker by a fixed shift — the
    reference's WatermarkShift transform
    (beam/core/.../transforms/WatermarkShift.java:43-79: a timer-held
    watermark trailing the input by ``shiftDuration``), re-expressed on
    the driver-owned path: downstream consumers (latecomer split,
    maintainer flushes) get ``shift_ms`` of extra slack before anything
    is declared late. For built-in ``withWatermark`` queries the shift
    folds into the delay constant instead (DELTAS.md #4)."""

    def __init__(self, inner, shift_ms: int) -> None:
        if shift_ms < 0:
            raise ValueError(f"shift_ms must be >= 0, got {shift_ms}")
        self._inner = inner
        self.shift_ms = shift_ms

    def watermark(self) -> int:
        wm = self._inner.watermark()
        return MIN_WATERMARK if wm == MIN_WATERMARK else wm - self.shift_ms
