"""WindowedStream: per-window aggregations, joins, distinct, sort.

Re-expression of tools/.../groovy/WindowedStream.java (619 LoC interface) and
beam/tools/.../BeamWindowedStream.java (792 LoC). Every keyed aggregation in
the reference is WithKeys → GroupByKey/Combine.perKey — i.e. partial+final
hash aggregation — which is exactly Spark's ``groupBy().agg()`` (Catalyst
plans partial/final automatically; SURVEY §2.5).

Scale notes
-----------
* window assignment is a pure projection (no shuffle); the single shuffle per
  aggregation happens on (key, window) — at 100 TB the map-side partial agg
  means the shuffle carries one row per key/window per input partition;
* joins carry the window column in the join key so Catalyst can still pick
  broadcast / sort-merge + AQE skew handling per its statistics;
* arbitrary reducers use ``F.aggregate`` over ``collect_list`` only when the
  user opts out of algebraic form — the documented slow path.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def _col(x: str | Column) -> Column:
    return F.col(x) if isinstance(x, str) else x


_CAL_RES = {"day": "day", "week": "week", "month": "month", "year": "year"}


@dataclass(frozen=True)
class Windowing:
    """Window assignment spec → (projection columns, grouping columns).

    kinds mirror BeamStream.java:831-881: tumbling (FixedWindows), sliding
    (SlidingWindows), session (Sessions), calendar
    (beam/core/.../transforms/CalendarWindows.java:43-291), global.
    """

    kind: str
    time_column: str | None = None
    duration_ms: int | None = None
    slide_ms: int | None = None
    gap_ms: int | None = None
    key_column: str | None = None
    resolution: str | None = None
    count: int = 1
    timezone: str = "UTC"
    # streaming-semantics knobs (WindowedStream.java:531-539); consumed by
    # streaming terminals, see proxima_platform_spark.streaming
    early_emitting_ms: int | None = None
    allowed_lateness_ms: int | None = None

    @classmethod
    def tumbling(cls, time_column: str | None, duration_ms: int) -> "Windowing":
        return cls("tumbling", time_column=time_column, duration_ms=duration_ms)

    @classmethod
    def sliding(
        cls, time_column: str | None, duration_ms: int, slide_ms: int
    ) -> "Windowing":
        return cls(
            "sliding", time_column=time_column, duration_ms=duration_ms, slide_ms=slide_ms
        )

    @classmethod
    def session(
        cls, time_column: str | None, gap_ms: int, key_column: str
    ) -> "Windowing":
        return cls("session", time_column=time_column, gap_ms=gap_ms, key_column=key_column)

    @classmethod
    def calendar(
        cls, time_column: str | None, resolution: str, count: int, timezone: str
    ) -> "Windowing":
        if resolution not in _CAL_RES:
            raise ValueError(f"calendar resolution must be one of {list(_CAL_RES)}")
        return cls(
            "calendar",
            time_column=time_column,
            resolution=resolution,
            count=count,
            timezone=timezone,
        )

    @classmethod
    def global_(cls) -> "Windowing":
        return cls("global")

    # -- window column -----------------------------------------------------

    def window_expr(self) -> Column | None:
        """The window column to group by (None for the global window)."""
        if self.kind == "global":
            return None
        assert self.time_column, "windowed op needs assign_event_time first"
        ts = F.col(self.time_column)
        if self.kind == "tumbling":
            return F.window(ts, f"{self.duration_ms} milliseconds")
        if self.kind == "sliding":
            return F.window(
                ts, f"{self.duration_ms} milliseconds", f"{self.slide_ms} milliseconds"
            )
        if self.kind == "session":
            return F.session_window(ts, f"{self.gap_ms} milliseconds")
        if self.kind == "calendar":
            # truncate in the target timezone, then bucket into N-unit groups
            # (mirrors CalendarWindows' Days/Months/Years PartitioningWindowFn)
            local = F.from_utc_timestamp(ts, self.timezone)
            base = F.date_trunc(_CAL_RES[self.resolution], local)
            if self.count == 1:
                return base
            unit_index = {
                "day": F.datediff(base, F.lit("1970-01-01")),
                "week": F.floor(F.datediff(base, F.lit("1970-01-05")) / 7),
                "month": F.year(base) * 12 + F.month(base) - 1,
                "year": F.year(base).cast("long"),
            }[self.resolution]
            bucket = F.floor(unit_index / self.count) * self.count
            origin = {
                "day": F.date_add(F.lit("1970-01-01").cast("date"), bucket.cast("int")),
                "week": F.date_add(
                    F.lit("1970-01-05").cast("date"), (bucket * 7).cast("int")
                ),
                "month": F.make_date(
                    (bucket / 12).cast("int") + 1970, (bucket % 12) + 1, F.lit(1)
                ),
                "year": F.make_date(bucket.cast("int"), F.lit(1), F.lit(1)),
            }[self.resolution]
            return origin.cast("timestamp")
        raise AssertionError(self.kind)

    def group_columns(self, extra_keys: Sequence[Column] = ()) -> list[Column]:
        cols = list(extra_keys)
        w = self.window_expr()
        if w is not None:
            cols.append(w.alias("window"))
        if self.key_column:
            cols.append(F.col(self.key_column))
        return cols


class WindowedStream:
    """A windowed (possibly keyed) stream; all aggregations are per-window."""

    def __init__(self, df: DataFrame, windowing: Windowing, time_column: str | None):
        self.df = df
        self.windowing = windowing
        self.time_column = time_column

    # -- knobs (WindowedStream.java:531-539) --------------------------------

    def with_early_emitting(self, duration_ms: int) -> "WindowedStream":
        """Early trigger (BeamWindowedStream.withEarlyEmitting:598). Spark has
        no per-operator triggers — streaming terminals map this to
        ``outputMode("update")`` + ``Trigger.ProcessingTime`` (documented
        semantic delta, SURVEY §4)."""
        return WindowedStream(
            self.df, replace(self.windowing, early_emitting_ms=duration_ms), self.time_column
        )

    def with_allowed_lateness(self, lateness_ms: int) -> "WindowedStream":
        """Allowed lateness (BeamWindowedStream:612) — in Spark the watermark
        delay plays this role; streaming terminals fold it into
        ``withWatermark``."""
        return WindowedStream(
            self.df, replace(self.windowing, allowed_lateness_ms=lateness_ms), self.time_column
        )

    # -- internals -----------------------------------------------------------

    def _grouped(self, *keys: Column):
        return self.df.groupBy(*self.windowing.group_columns(keys))

    def _agg(self, keys: Sequence[Column], *aggs: Column) -> DataFrame:
        return self._grouped(*keys).agg(*aggs)

    # -- aggregations (WindowedStream.java:61-331,431-565) -------------------

    def combine(
        self,
        key: Column | str | None,
        value: Column | str,
        combiner: Callable[[Column], Column],
        alias: str = "value",
    ) -> DataFrame:
        """Associative/commutative combine per key (WindowedStream.java:189
        → Combine.perKey, BeamWindowedStream.java:246-311). ``combiner`` maps
        a value column to an aggregate expression, e.g. ``F.sum`` / ``F.max``
        — Catalyst runs it partial+final, the same execution shape as Beam's
        Combine.perKey."""
        keys = [_col(key).alias("key")] if key is not None else []
        return self._agg(keys, combiner(_col(value)).alias(alias))

    def reduce(
        self,
        key: Column | str | None,
        value: Column | str,
        initial,
        reducer: Callable[[Column, Column], Column],
        alias: str = "value",
    ) -> DataFrame:
        """Fold values per key per window (WindowedStream.java:61,97 →
        BeamWindowedStream.reduce:93-165). Arbitrary fold → ``F.aggregate``
        over ``collect_list`` (lambda still evaluates JVM-side as a Catalyst
        expression, but materializes the per-group list: the documented slow
        path; prefer :meth:`combine` for algebraic reducers)."""
        keys = [_col(key).alias("key")] if key is not None else []
        # F.aggregate requires the accumulator type to match the lambda's
        # result: anchor the initial literal to the value column's type
        value_type = self.df.select(_col(value).alias("__v")).schema[0].dataType
        folded = F.aggregate(
            F.collect_list(_col(value)),
            F.lit(initial).cast(value_type),
            reducer,
        ).alias(alias)
        return self._agg(keys, folded)

    def group_reduce(
        self,
        key: Column | str,
        fn,
        output_schema: str,
    ) -> DataFrame:
        """Non-algebraic reduce over the full value list per key
        (WindowedStream.java:149 → GroupReduce DoFn, :174-245). Arrow-batched
        ``applyInPandas`` per (key, window) group — the Python boundary is
        explicit and per-group, not per-row."""
        w = self.windowing.window_expr()
        proj = [_col(key).alias("key")] + ([w.alias("window")] if w is not None else [])
        passthrough = [
            F.col(c) for c in self.df.columns if c not in ("key", "window")
        ]
        projected = self.df.select(*proj, *passthrough)
        by = ["key"] + (["window"] if w is not None else [])
        return projected.groupBy(*by).applyInPandas(fn, schema=output_schema)

    def aggregate(self, key: Column | str | None, *aggs: Column) -> DataFrame:
        """Multi-aggregate per key per window — the general ``Combine.perKey``
        form with several outputs at once (same execution shape as
        :meth:`combine`; pre-aliased aggregate Columns)."""
        keys = [_col(key).alias("key")] if key is not None else []
        return self._agg(keys, *aggs)

    def count_by_key(self, key: Column | str, alias: str = "count") -> DataFrame:
        """(WindowedStream.java:250 → Count.perKey)"""
        return self._agg([_col(key).alias("key")], F.count(F.lit(1)).alias(alias))

    def count(self, alias: str = "count") -> DataFrame:
        """(WindowedStream.java:431 → Combine.globally(Count))"""
        return self._agg([], F.count(F.lit(1)).alias(alias))

    def sum(self, value: Column | str, alias: str = "sum") -> DataFrame:
        """(WindowedStream.java:452 → Sum.ofDoubles)"""
        return self._agg([], F.sum(_col(value).cast("double")).alias(alias))

    def sum_by_key(
        self, key: Column | str, value: Column | str, alias: str = "sum"
    ) -> DataFrame:
        """(WindowedStream.java:480)"""
        return self._agg(
            [_col(key).alias("key")], F.sum(_col(value).cast("double")).alias(alias)
        )

    def average(self, value: Column | str, alias: str = "avg") -> DataFrame:
        """(WindowedStream.java:273 → Combine.globally(Mean))"""
        return self._agg([], F.avg(_col(value).cast("double")).alias(alias))

    def average_by_key(
        self, key: Column | str, value: Column | str, alias: str = "avg"
    ) -> DataFrame:
        """(WindowedStream.java:301)"""
        return self._agg(
            [_col(key).alias("key")], F.avg(_col(value).cast("double")).alias(alias)
        )

    def distinct(self, mapper: Column | str | None = None) -> DataFrame:
        """Distinct per window, optionally via representative key
        (WindowedStream.java:500,521 → Beam Distinct / withRepresentativeValueFn).
        With a mapper we keep the *minimal* original per representative for
        determinism (the reference emits an arbitrary one). Streaming:
        ``dropDuplicatesWithinWatermark`` is the terminal's mapping."""
        w = self.windowing.window_expr()
        if mapper is None:
            cols = ([w.alias("window")] if w is not None else []) + [
                F.col(c) for c in self.df.columns
            ]
            return self.df.select(*cols).dropDuplicates()
        rep = _col(mapper).alias("representative")
        group = ([w.alias("window")] if w is not None else []) + [rep]
        originals = F.struct(*[F.col(c) for c in self.df.columns])
        picked = self.df.groupBy(*group).agg(F.min(originals).alias("__orig"))
        return picked.select(
            *([F.col("window")] if w is not None else []),
            *[F.col(f"__orig.{c}").alias(c) for c in self.df.columns],
        )

    def reduce_to_latest(self) -> DataFrame:
        """Per (entity@key#attribute) max-stamp compaction
        (WindowedStream.java:118 → PCollectionTools.reduceAsSnapshot:42-66).
        Requires canonical changelog columns."""
        from proxima_platform_spark.changelog import compact

        return compact(self.df)

    # -- joins (WindowedStream.java:335-370 → BeamWindowedStream.java:371-441)

    def _join(
        self,
        other: "WindowedStream | DataFrame",
        left_key: Column | str,
        right_key: Column | str,
        how: str,
    ) -> DataFrame:
        if isinstance(other, WindowedStream):
            # the reference refuses to join streams with different windowing
            # (BeamWindowedStream.java:512-526); compare the window *function*
            # (kind/duration/slide/gap/resolution), not per-stream columns
            def fn(wd: Windowing):
                return replace(
                    wd,
                    time_column=None,
                    key_column=None,
                    early_emitting_ms=None,
                    allowed_lateness_ms=None,
                )

            if fn(other.windowing) != fn(self.windowing):
                raise ValueError(
                    "cannot join streams with incompatible windowing: "
                    f"{self.windowing.kind} vs {other.windowing.kind} "
                    "(BeamWindowedStream.java:512-526 parity)"
                )
        right_df = other.df if isinstance(other, WindowedStream) else other
        w = self.windowing.window_expr()
        lcols = [F.col(c).alias(f"l_{c}") for c in self.df.columns]
        rcols = [F.col(c).alias(f"r_{c}") for c in right_df.columns]
        left = self.df.select(
            _col(left_key).alias("key"),
            *([w.alias("window")] if w is not None else []),
            *lcols,
        )
        # the right side is windowed by the same strategy — the reference
        # enforces windowing compatibility (BeamWindowedStream.java:512-526)
        rw = (
            replace(self.windowing).window_expr()
            if not isinstance(other, WindowedStream)
            else other.windowing.window_expr()
        )
        right = right_df.select(
            _col(right_key).alias("key"),
            *([rw.alias("window")] if w is not None else []),
            *rcols,
        )
        on = ["key"] + (["window"] if w is not None else [])
        return left.join(right, on=on, how=how)

    def join(
        self, other, left_key: Column | str, right_key: Column | str
    ) -> DataFrame:
        """Per-window equi inner join (WindowedStream.java:335 →
        Join.innerJoin via CoGroupByKey). Catalyst picks broadcast vs
        sort-merge; the window column rides in the join key."""
        return self._join(other, left_key, right_key, "inner")

    def left_join(
        self, other, left_key: Column | str, right_key: Column | str
    ) -> DataFrame:
        """Left outer join; right side null when no match — nulls only on the
        right (WindowedStream.java:370, JoinFn BeamWindowedStream.java:657-692)."""
        return self._join(other, left_key, right_key, "left_outer")

    # -- ordering (WindowedStream.java:395-414) -------------------------------

    def sorted(self, *cols: Column | str, ascending: bool = True) -> DataFrame:
        """Total order within window (BeamWindowedStream.sorted:442-488).
        Spark's sort is a range-partitioned distributed sort — strictly more
        scalable than the reference's per-window in-memory list sort."""
        w = self.windowing.window_expr()
        order = [(_col(c) if ascending else _col(c).desc()) for c in cols] or [
            F.col(c) if ascending else F.col(c).desc() for c in self.df.columns
        ]
        if w is not None:
            return self.df.withColumn("window", w).orderBy(F.col("window"), *order)
        return self.df.orderBy(*order)
