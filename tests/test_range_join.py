"""Binned range join (operators/range_join.py): exact equivalence with the
naive theta join, boundary semantics, long intervals across many bins."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from pyspark.sql import functions as F

from proxima_platform_spark.operators.range_join import range_join_binned


def ts(sec: int):
    return datetime.fromtimestamp(sec, tz=timezone.utc).replace(tzinfo=None)


def make(spark, intervals, points):
    iv = spark.createDataFrame(
        [(i, ts(s), ts(e)) for i, (s, e) in enumerate(intervals)],
        "ivl_id long, s timestamp, e timestamp",
    )
    pt = spark.createDataFrame(
        [(j, ts(p)) for j, p in enumerate(points)],
        "pt_id long, p timestamp",
    )
    return iv, pt


class TestRangeJoinBinned:
    def test_matches_naive_theta_join(self, spark):
        intervals = [(0, 100), (50, 150), (500, 520), (90, 1000)]
        points = [0, 49, 50, 99, 100, 149, 510, 519, 520, 999, 1000]
        iv, pt = make(spark, intervals, points)
        got = {
            (r.ivl_id, r.pt_id)
            for r in range_join_binned(
                iv, pt, start_col="s", end_col="e", point_col="p", bin_seconds=60
            ).collect()
        }
        naive = {
            (r.ivl_id, r.pt_id)
            for r in iv.join(pt, (F.col("p") >= F.col("s")) & (F.col("p") < F.col("e"))).collect()
        }
        assert got == naive and len(got) > 0

    def test_half_open_boundaries(self, spark):
        iv, pt = make(spark, [(100, 200)], [100, 199, 200])
        got = sorted(
            r.pt_id
            for r in range_join_binned(
                iv, pt, start_col="s", end_col="e", point_col="p", bin_seconds=1000
            ).collect()
        )
        assert got == [0, 1]  # start inclusive, end exclusive

    def test_long_interval_spans_many_bins(self, spark):
        # interval length 100x the bin width still finds every match
        iv, pt = make(spark, [(0, 10_000)], [5, 4_999, 9_999, 10_000, 20_000])
        got = sorted(
            r.pt_id
            for r in range_join_binned(
                iv, pt, start_col="s", end_col="e", point_col="p", bin_seconds=100
            ).collect()
        )
        assert got == [0, 1, 2]

    def test_no_duplicate_pairs(self, spark):
        iv, pt = make(spark, [(0, 1000)], [500])
        rows = range_join_binned(
            iv, pt, start_col="s", end_col="e", point_col="p", bin_seconds=10
        ).collect()
        assert len(rows) == 1  # point meets the interval in exactly one bin

    def test_rejects_bad_bin(self, spark):
        iv, pt = make(spark, [(0, 10)], [5])
        with pytest.raises(ValueError, match="bin_seconds"):
            range_join_binned(
                iv, pt, start_col="s", end_col="e", point_col="p", bin_seconds=0
            )
