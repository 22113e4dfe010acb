"""Windowed-operator literals mirroring the reference's own operator suite
(FIXTURES.md §B4; reference: tools/src/test/.../AbstractWindowedStreamTest.java:48-283).
"""

import pytest

from pyspark.sql import functions as F

from proxima_platform_spark.operators import Stream


def scalar_stream(spark, values):
    return Stream.of(spark, values)


class TestJoin:
    def test_inner_join_literals(self, spark):
        """[1,2,3,4] ⋈ [3,4] on key=x%2 → {(1,3),(3,3),(2,4),(4,4)}
        (AbstractWindowedStreamTest.java:180-190)."""
        left = scalar_stream(spark, [1, 2, 3, 4]).window_all()
        right = scalar_stream(spark, [3, 4]).window_all()
        out = left.join(right, F.col("value") % 2, F.col("value") % 2)
        pairs = {(r.l_value, r.r_value) for r in out.collect()}
        assert pairs == {(1, 3), (3, 3), (2, 4), (4, 4)}

    def test_left_join_literals(self, spark):
        """[3] leftJoin [1,2,3,4] on key=x%2 → {(3,3),(3,1)}
        (AbstractWindowedStreamTest.java:194-205)."""
        left = scalar_stream(spark, [3]).window_all()
        right = scalar_stream(spark, [1, 2, 3, 4]).window_all()
        out = left.left_join(right, F.col("value") % 2, F.col("value") % 2)
        pairs = {(r.l_value, r.r_value) for r in out.collect()}
        assert pairs == {(3, 3), (3, 1)}

    def test_left_join_no_match_emits_null_right(self, spark):
        """Pair(l, null) on empty right side (BeamWindowedStream.java:657-692)."""
        left = scalar_stream(spark, [2]).window_all()
        right = scalar_stream(spark, [3]).window_all()
        out = left.left_join(right, F.col("value") % 2, F.col("value") % 2)
        pairs = {(r.l_value, r.r_value) for r in out.collect()}
        assert pairs == {(2, None)}


class TestJoinWindowingCompatibility:
    def test_mismatched_windowing_raises(self, spark):
        """The reference throws on joining differently-windowed streams
        (BeamWindowedStream.java:512-526); we must not silently equi-join
        unequal window values."""
        from proxima_platform_spark.operators.windowed import WindowedStream, Windowing

        df = scalar_stream(spark, [1, 2]).df.withColumn(
            "ts", F.timestamp_millis(F.col("value") * 1000)
        )
        tumbling = WindowedStream(df, Windowing.tumbling("ts", 1000), "ts")
        sliding = WindowedStream(df, Windowing.sliding("ts", 2000, 1000), "ts")
        glob = WindowedStream(df, Windowing.global_(), None)
        with pytest.raises(ValueError, match="incompatible windowing"):
            tumbling.join(sliding, F.col("value"), F.col("value"))
        with pytest.raises(ValueError, match="incompatible windowing"):
            glob.join(tumbling, F.col("value"), F.col("value"))

    def test_same_windowing_different_column_joins(self, spark):
        from proxima_platform_spark.operators.windowed import WindowedStream, Windowing

        df = scalar_stream(spark, [1, 2]).df.withColumn(
            "ts", F.timestamp_millis(F.col("value") * 1000)
        )
        a = WindowedStream(df, Windowing.tumbling("ts", 60_000), "ts")
        b = WindowedStream(df, Windowing.tumbling("ts", 60_000), "ts")
        out = a.join(b, F.col("value"), F.col("value"))
        assert out.count() == 2


class TestAggregations:
    def test_sum_by_key(self, spark):
        """sumByKey x%2 over [4,3,2,1] → {(0,6.0),(1,4.0)} (:246-258)."""
        out = scalar_stream(spark, [4, 3, 2, 1]).window_all().sum_by_key(
            F.col("value") % 2, "value"
        )
        assert {(r.key, r.sum) for r in out.collect()} == {(0, 6.0), (1, 4.0)}

    def test_count_and_sum(self, spark):
        """count [4,3,2,1] → 4; sum → 10.0 (:228-244)."""
        ws = scalar_stream(spark, [4, 3, 2, 1]).window_all()
        assert ws.count().collect()[0]["count"] == 4
        assert ws.sum("value").collect()[0]["sum"] == 10.0

    def test_average_of_mapped(self, spark):
        """average of x+1 over [1,2,3,4] → 3.5 (:154-163)."""
        out = (
            scalar_stream(spark, [1, 2, 3, 4])
            .map(value=F.col("value") + 1)
            .window_all()
            .average("value")
        )
        assert out.collect()[0]["avg"] == 3.5

    def test_average_by_key(self, spark):
        out = scalar_stream(spark, [1, 2, 3, 4]).window_all().average_by_key(
            F.col("value") % 2, "value"
        )
        assert {(r.key, r.avg) for r in out.collect()} == {(1, 2.0), (0, 3.0)}

    def test_count_by_key(self, spark):
        out = scalar_stream(spark, [1, 2, 3, 4, 5]).window_all().count_by_key(
            F.col("value") % 2
        )
        assert {(r.key, r["count"]) for r in out.collect()} == {(1, 3), (0, 2)}

    def test_reduce_fold(self, spark):
        """Arbitrary fold: product of [1,2,3,4] per parity key."""
        out = scalar_stream(spark, [1, 2, 3, 4]).window_all().reduce(
            F.col("value") % 2,
            "value",
            1,
            lambda acc, x: acc * x,
        )
        assert {(r.key, r.value) for r in out.collect()} == {(1, 3), (0, 8)}

    def test_combine(self, spark):
        out = scalar_stream(spark, [4, 3, 2, 1]).window_all().combine(
            F.col("value") % 2, "value", F.max
        )
        assert {(r.key, r.value) for r in out.collect()} == {(0, 4), (1, 3)}

    def test_group_reduce(self, spark):
        """Non-algebraic reduce: sorted concat per key (WindowedStream.java:149)."""
        import pandas as pd

        def concat_sorted(key, pdf):
            return pd.DataFrame(
                {"key": [key[0]], "joined": [",".join(map(str, sorted(pdf["value"])))]}
            )

        out = scalar_stream(spark, [4, 1, 3, 2]).window_all().group_reduce(
            F.col("value") % 2, concat_sorted, "key long, joined string"
        )
        assert {(r.key, r.joined) for r in out.collect()} == {(0, "2,4"), (1, "1,3")}


class TestDistinct:
    def test_distinct(self, spark):
        """distinct [4,3,2,1,1,2,3] → {1,2,3,4} (:268-277)."""
        out = scalar_stream(spark, [4, 3, 2, 1, 1, 2, 3]).window_all().distinct()
        assert {r.value for r in out.collect()} == {1, 2, 3, 4}

    def test_distinct_with_mapper(self, spark):
        """distinct by first char over ["4","3","2","1","1.","2.","3."] → 4
        representatives (:278-286)."""
        out = (
            scalar_stream(spark, ["4", "3", "2", "1", "1.", "2.", "3."])
            .window_all()
            .distinct(mapper=F.substring("value", 1, 1))
        )
        rows = [r.value for r in out.collect()]
        assert len(rows) == 4
        assert {v[0] for v in rows} == {"1", "2", "3", "4"}


class TestSorted:
    def test_sorted(self, spark):
        """sorted [4,3,2,1] → [1,2,3,4] (:208-216)."""
        out = scalar_stream(spark, [4, 3, 2, 1]).window_all().sorted("value")
        assert [r.value for r in out.collect()] == [1, 2, 3, 4]

    def test_sorted_descending(self, spark):
        """reversed comparator → [4,3,2,1] (:218-226)."""
        out = scalar_stream(spark, [1, 3, 2, 4]).window_all().sorted(
            "value", ascending=False
        )
        assert [r.value for r in out.collect()] == [4, 3, 2, 1]


class TestElementWise:
    def test_map_filter_flatmap_union(self, spark):
        s = scalar_stream(spark, [1, 2, 3, 4])
        assert {r.value for r in s.map(value=F.col("value") * 2).collect()} == {2, 4, 6, 8}
        assert {r.value for r in s.filter(F.col("value") > 2).collect()} == {3, 4}
        doubled = s.flat_map(F.array(F.col("value"), F.col("value") * 10))
        assert sorted(r.value for r in doubled.collect()) == [1, 2, 3, 4, 10, 20, 30, 40]
        u = s.union(scalar_stream(spark, [5]))
        assert {r.value for r in u.collect()} == {1, 2, 3, 4, 5}


class TestTimeWindows:
    def events(self, spark):
        rows = [(k, v, ms) for k, v, ms in [
            ("a", 1.0, 500), ("a", 2.0, 900), ("a", 4.0, 1500),
            ("b", 8.0, 100), ("b", 16.0, 2500),
        ]]
        df = spark.createDataFrame(rows, "key string, value double, ms long")
        return Stream(df.withColumn("ts", F.timestamp_millis("ms")), "ts")

    def test_tumbling_window_sum(self, spark):
        out = self.events(spark).time_window(1000).sum_by_key("key", "value")
        got = {
            (r.key, r.window.start.second if hasattr(r.window.start, "second") else None, r.sum)
            for r in out.collect()
        }
        assert {(k, s) for k, _, s in got} == {("a", 3.0), ("a", 4.0), ("b", 8.0), ("b", 16.0)}

    def test_sliding_window_count(self, spark):
        out = self.events(spark).time_sliding_window(2000, 1000).count()
        # [-1000,1000)→{500,900,100}, [0,2000)→{500,900,1500,100},
        # [1000,3000)→{1500,2500}, [2000,4000)→{2500}
        counts = sorted(r["count"] for r in out.collect())
        assert counts == [1, 2, 3, 4]

    def test_session_window(self, spark):
        out = self.events(spark).session_window("key", 1000).count_by_key(F.col("__key"))
        # a: 500,900,1500 merge into one session; b: 100 and 2500 separate
        got = sorted((r.key, r["count"]) for r in out.collect())
        assert got == [("a", 3), ("b", 1), ("b", 1)]

    def test_calendar_window_month(self, spark):
        df = spark.createDataFrame(
            [("2024-01-05",), ("2024-01-25",), ("2024-02-10",)], "d string"
        ).withColumn("ts", F.to_timestamp("d"))
        out = Stream(df, "ts").calendar_window("month").count()
        assert sorted(r["count"] for r in out.collect()) == [1, 2]

    def test_calendar_window_multi_month(self, spark):
        df = spark.createDataFrame(
            [("2024-01-05",), ("2024-02-25",), ("2024-03-10",), ("2024-04-01",)], "d string"
        ).withColumn("ts", F.to_timestamp("d"))
        out = Stream(df, "ts").calendar_window("month", count=2).count()
        # bimonthly buckets: [Jan,Feb] → 2, [Mar,Apr] → 2
        assert sorted(r["count"] for r in out.collect()) == [2, 2]


    def test_calendar_window_timezone_dst(self, spark):
        """SURVEY §7 hard-item 5: calendar windows across a DST change.
        Europe/Prague springs forward 2024-03-31 02:00 CET→CEST (UTC+1→+2):
        a UTC instant late on Mar 31 is already April in Prague, and the
        local-midnight month boundary is NOT a fixed UTC offset across the
        transition. Both rows are within one UTC hour of each other but
        must land in different Prague months."""
        df = spark.createDataFrame(
            [
                # 2024-03-31 21:59 UTC = 23:59 CEST → March in Prague
                ("2024-03-31 21:59:00",),
                # 2024-03-31 22:01 UTC = 2024-04-01 00:01 CEST → April
                ("2024-03-31 22:01:00",),
                # 2024-01-15 12:00 UTC → January either way
                ("2024-01-15 12:00:00",),
            ],
            "d string",
        ).withColumn("ts", F.to_timestamp("d"))
        out = Stream(df, "ts").calendar_window("month", timezone="Europe/Prague").count()
        got = sorted(
            (str(r.window)[:10], r["count"]) for r in out.collect()
        )
        assert got == [("2024-01-01", 1), ("2024-03-01", 1), ("2024-04-01", 1)]
        # control: in UTC both Mar 31 rows stay in March
        out_utc = Stream(df, "ts").calendar_window("month").count()
        got_utc = sorted((str(r.window)[:10], r["count"]) for r in out_utc.collect())
        assert got_utc == [("2024-01-01", 1), ("2024-03-01", 2)]

    def test_calendar_window_day_across_fall_back(self, spark):
        """Fall-back (2024-10-27 03:00 CEST→02:00 CET): the Prague day
        2024-10-27 is 25 hours of UTC; both 00:30 CEST and 23:30 CET belong
        to the same local day window."""
        df = spark.createDataFrame(
            [
                ("2024-10-26 22:30:00",),  # 2024-10-27 00:30 CEST
                ("2024-10-27 22:30:00",),  # 2024-10-27 23:30 CET (post-shift)
            ],
            "d string",
        ).withColumn("ts", F.to_timestamp("d"))
        out = Stream(df, "ts").calendar_window("day", timezone="Europe/Prague").count()
        got = [(str(r.window)[:10], r["count"]) for r in out.collect()]
        assert got == [("2024-10-27", 2)]
