"""Stream: element-wise + windowing entry points of the DSL.

Re-expression of tools/.../groovy/Stream.java (564 LoC interface) and its
Beam implementation beam/tools/.../BeamStream.java. A Stream wraps a (lazy)
DataFrame — the exact analog of the reference's deferred
``Function<Pipeline, PCollection<X>>`` factory (BeamStream.child:1141-1168) —
plus the designated event-time column.

Element-wise operators take **Column expressions**, not Python closures:
that keeps the hot path inside Catalyst/whole-stage codegen. (The reference
has no scalar-function library either — users pass Groovy closures; our
"closures" are Spark SQL expressions, SURVEY §2.11.)

Scalar streams (the reference DSL's ``Stream<Integer>``) are represented as
single-column DataFrames with column ``value``.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from proxima_platform_spark.operators.windowed import WindowedStream, Windowing


def _col(x: str | Column) -> Column:
    return F.col(x) if isinstance(x, str) else x


class Stream:
    """A (possibly unbounded) stream of rows with an optional event-time column."""

    def __init__(self, df: DataFrame, time_column: str | None = None) -> None:
        self.df = df
        self.time_column = time_column

    # -- construction ------------------------------------------------------

    @classmethod
    def of(cls, spark: SparkSession, values: Iterable, column: str = "value") -> "Stream":
        """In-memory scalar stream, the analog of the test providers
        (reference: tools/src/test/.../StreamTest.java:43-94)."""
        return cls(spark.createDataFrame([(v,) for v in values], [column]))

    @classmethod
    def impulse(cls, spark: SparkSession, stamp_ms: int = 0) -> "Stream":
        """Synthetic one-shot source (BeamStream.impulse:254): a single
        element at `stamp_ms`. Batch analog of Beam's Impulse."""
        df = spark.range(1).select(
            F.col("id").alias("tick"),
            F.timestamp_millis(F.lit(stamp_ms)).alias("stamp"),
        )
        return cls(df, "stamp")

    @classmethod
    def periodic_impulse(
        cls,
        spark: SparkSession,
        *,
        count: int,
        interval_ms: int,
        start_ms: int = 0,
    ) -> "Stream":
        """Periodic synthetic source (BeamStream.periodicImpulse:275-310):
        `count` ticks `interval_ms` apart starting at `start_ms`. Bounded
        form is `spark.range` (parallelized, no driver loop); the unbounded
        analog is `readStream.format("rate")` — see streaming.source."""
        df = spark.range(count).select(
            F.col("id").alias("tick"),
            F.timestamp_millis(F.lit(start_ms) + F.col("id") * interval_ms).alias("stamp"),
        )
        return cls(df, "stamp")

    def _with(self, df: DataFrame) -> "Stream":
        return Stream(df, self.time_column)

    # -- element-wise (Stream.java:57-128; BeamStream.java:371-418) ---------

    def map(self, *exprs: Column | str, **named: Column | str) -> "Stream":
        """Projection: ``map(F.col('x')*2, y=F.col('z'))``
        (reference itf Stream.java:82 → MapElements, BeamStream.map:388)."""
        cols = [_col(e) for e in exprs] + [
            _col(e).alias(name) for name, e in named.items()
        ]
        return self._with(self.df.select(*cols))

    def flat_map(self, expr: Column | str, alias: str = "value") -> "Stream":
        """Explode an array-valued expression
        (reference itf Stream.java:57 → FlatMapElements, BeamStream.flatMap:371)."""
        return self._with(self.df.select(F.explode(_col(expr)).alias(alias)))

    def filter(self, cond: Column | str) -> "Stream":
        """(reference itf Stream.java:105 → Filter.by, BeamStream.filter:405)"""
        return self._with(self.df.where(cond))

    def assign_event_time(self, expr: Column | str, name: str = "__event_time") -> "Stream":
        """Designate the event-time column
        (reference itf Stream.java:128, beam/core/.../transforms/AssignEventTime.java:27-39).
        On a streaming DataFrame follow with ``with_watermark``."""
        if isinstance(expr, str):
            return Stream(self.df, expr)
        return Stream(self.df.withColumn(name, expr), name)

    def with_watermark(self, delay: str) -> "Stream":
        """Bounded out-of-orderness watermark (reference:
        direct/core/.../time/BoundedOutOfOrdernessWatermarkEstimator.java:38-96)."""
        assert self.time_column, "assign_event_time first"
        return Stream(self.df.withWatermark(self.time_column, delay), self.time_column)

    def with_timestamp(self, alias: str = "__timestamp") -> "Stream":
        """Pair element with its event timestamp (Stream.java:164;
        trivially a column in Spark)."""
        assert self.time_column
        return self._with(self.df.withColumn(alias, F.col(self.time_column)))

    def with_window(self, duration_ms: int, alias: str = "__window") -> "Stream":
        """Pair each element with its tumbling window (Stream.java:147 →
        BeamStream.withWindow:427, applyExtractWindow:436 — in Spark the
        window assignment is an ordinary column, no re-grouping)."""
        assert self.time_column
        return self._with(
            self.df.withColumn(
                alias, F.window(F.col(self.time_column), f"{duration_ms} milliseconds")
            )
        )

    def reshuffle(self, num_partitions: int | None = None) -> "Stream":
        """Random redistribution (Stream.java:563 → BeamStream.reshuffle:1072)."""
        df = (
            self.df.repartition(num_partitions)
            if num_partitions
            else self.df.repartition(self.df.sparkSession.sparkContext.defaultParallelism)
        )
        return self._with(df)

    def union(self, *others: "Stream") -> "Stream":
        """Merge streams of the same type (Stream.java:337-369 →
        Flatten.pCollections, BeamStream.union:886-930)."""
        df = self.df
        for o in others:
            df = df.unionByName(o.df)
        return self._with(df)

    def as_unbounded(self) -> "Stream":
        """Marker for bounded-input-with-stream-semantics (Stream.java:194).
        In Spark the same DataFrame code runs in both modes; this is a no-op
        retained for API parity."""
        return self

    # -- windowing (Stream.java:291-329 → BeamStream.java:831-881) ----------

    def time_window(self, duration_ms: int) -> WindowedStream:
        """Tumbling event-time window (FixedWindows ≈ F.window)."""
        return WindowedStream(
            self.df, Windowing.tumbling(self.time_column, duration_ms), self.time_column
        )

    def time_sliding_window(self, duration_ms: int, slide_ms: int) -> WindowedStream:
        """Sliding window (SlidingWindows ≈ F.window with slideDuration)."""
        return WindowedStream(
            self.df,
            Windowing.sliding(self.time_column, duration_ms, slide_ms),
            self.time_column,
        )

    def session_window(self, key: Column | str, gap_ms: int) -> WindowedStream:
        """Per-key session windows; stream becomes keyed
        (Stream.java:310 → Sessions.withGapDuration ≈ F.session_window)."""
        return WindowedStream(
            self.df.withColumn("__key", _col(key)),
            Windowing.session(self.time_column, gap_ms, "__key"),
            self.time_column,
        )

    def calendar_window(
        self, resolution: str, count: int = 1, timezone: str = "UTC"
    ) -> WindowedStream:
        """Calendar windows: days/weeks/months/years, timezone-aware
        (Stream.java:322 → beam/core/.../transforms/CalendarWindows.java:43-291)."""
        return WindowedStream(
            self.df,
            Windowing.calendar(self.time_column, resolution, count, timezone),
            self.time_column,
        )

    def window_all(self) -> WindowedStream:
        """Single global window (Stream.java:329, BeamWindowedStream.windowAll:642)."""
        return WindowedStream(self.df, Windowing.global_(), self.time_column)

    # -- stateful (delegated; Stream.java:496-550) ---------------------------

    def integrate_per_key(
        self,
        key: Column | str,
        value: Column | str,
        initial: float = 0.0,
    ) -> "Stream":
        """Running per-key prefix sum, one output per input element, applied
        in event-time order (Stream.java:545-550 → BeamStream.integratePerKey:932-974,
        IntegrateDoFn:1498-1542; batch sorts per key by stamp — SURVEY §2.10.5).

        Batch mapping: a window function — no Python, one shuffle on key:
        ``sum(value) OVER (PARTITION BY key ORDER BY stamp, seq ROWS UNBOUNDED
        PRECEDING)``.
        """
        from proxima_platform_spark.operators.stateful import integrate_per_key

        return self._with(
            integrate_per_key(
                self.df,
                key=_col(key),
                value=_col(value),
                stamp=F.col(self.time_column) if self.time_column else None,
                initial=initial,
            )
        )

    def integrate_per_key_salted(
        self,
        key: Column | str,
        value: Column | str,
        initial: float = 0.0,
        num_buckets: int = 32,
    ) -> "Stream":
        """Hot-key-safe ``integrate_per_key``: hierarchical two-phase prefix
        sum over contiguous stamp-range buckets, so a key holding half the
        input spreads over ~num_buckets tasks (operators/stateful.py)."""
        from proxima_platform_spark.operators.stateful import (
            integrate_per_key_salted,
        )

        if self.time_column is None:
            raise ValueError("integrate_per_key_salted needs an event-time column")
        return self._with(
            integrate_per_key_salted(
                self.df,
                key=_col(key),
                value=_col(value),
                stamp=F.col(self.time_column),
                initial=initial,
                num_buckets=num_buckets,
            )
        )

    def reduce_value_state_by_key(
        self,
        key: Column | str,
        value_cols: Sequence[str],
        state_fn,
        output_schema: str,
        *,
        sorted: bool = True,
    ) -> "Stream":
        """General keyed state machine (Stream.java:496-503 →
        BeamStream.reduceValueStateByKey:997-1070). Batch: groupBy(key)
        .applyInPandas with per-group event-time sort (sorted=True mirrors the
        reference's timer-based buffering, BeamStream.java:1633-1677)."""
        from proxima_platform_spark.operators.stateful import reduce_value_state_by_key

        return Stream(
            reduce_value_state_by_key(
                self.df,
                key=_col(key),
                value_cols=list(value_cols),
                state_fn=state_fn,
                output_schema=output_schema,
                stamp=self.time_column,
                sorted=sorted,
            )
        )

    # -- terminals (Stream.java:268-275, BeamStream.print:560/collect:581) --

    def collect(self) -> list:
        return self.df.collect()

    def print(self, n: int = 20) -> None:
        self.df.show(n, truncate=False)

    def persist(
        self,
        *,
        entity: str,
        key: Column | str,
        attribute: Column | str,
        value: Column | str,
        stamp: Column | str,
    ) -> DataFrame:
        """Map back to changelog upserts (Stream.java:268-275 →
        BeamStream.persist:752). Returns the canonical changelog DataFrame;
        callers hand it to a sink (sources.registry / streaming.replication)."""
        from proxima_platform_spark.changelog import to_changelog

        return to_changelog(
            self.df,
            entity=entity,
            key=_col(key),
            attribute=_col(attribute),
            stamp=_col(stamp),
            value=_col(value),
        )
