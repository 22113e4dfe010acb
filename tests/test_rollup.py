"""Hypertable rollup ladder (operators/rollup.py): coarse-from-fine must
equal direct aggregation of the raw events at every level."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from proxima_platform_spark.operators.rollup import hypertable_rollup


def raw_df(spark):
    rows = [
        # (ts_ms, k, v) spread over 3 days, 2 keys, hour boundaries crossed
        (h * 3600_000 + m * 60_000, k, float(v))
        for h, m, k, v in [
            (0, 5, "a", 1.25), (0, 50, "a", 2.5), (1, 10, "a", -3.0),
            (25, 0, "a", 4.75), (26, 59, "b", 10.0), (49, 30, "b", 0.25),
            (50, 0, "a", 7.5), (71, 59, "b", -1.5),
        ]
    ]
    return spark.createDataFrame(rows, "ts_ms long, k string, v double")


class TestHypertableRollup:
    def test_every_level_matches_direct_aggregation(self, spark):
        df = raw_df(spark)
        ladder = hypertable_rollup(
            df, ts_ms_col="ts_ms", keys=["k"], value_col="v",
            levels_ms=[3600_000, 86400_000],
        )
        for lv, frame in ladder.items():
            got = {
                (r.k, r.bucket_ms): (r.cnt, float(r.total_dec), r.vmin, r.vmax)
                for r in frame.collect()
            }
            direct = {
                (r.k, r.bucket_ms): (r.cnt, float(r.total), r.vmin, r.vmax)
                for r in df.groupBy(
                    "k", ((F.col("ts_ms") / lv).cast("long") * lv).alias("bucket_ms")
                ).agg(
                    F.count(F.lit(1)).alias("cnt"),
                    F.sum(F.col("v").cast("decimal(18,2)")).alias("total"),
                    F.min("v").alias("vmin"),
                    F.max("v").alias("vmax"),
                ).collect()
            }
            assert got == direct, lv

    def test_three_level_ladder(self, spark):
        df = raw_df(spark)
        ladder = hypertable_rollup(
            df, ts_ms_col="ts_ms", keys=["k"], value_col="v",
            levels_ms=[60_000, 3600_000, 86400_000],
        )
        day = ladder[86400_000]
        total = sum(float(r.total_dec) for r in day.collect())
        assert total == pytest.approx(1.25 + 2.5 - 3.0 + 4.75 + 10.0 + 0.25 + 7.5 - 1.5)

    def test_rejects_non_dividing_levels(self, spark):
        df = raw_df(spark)
        with pytest.raises(ValueError, match="not a multiple"):
            hypertable_rollup(
                df, ts_ms_col="ts_ms", keys=["k"], value_col="v",
                levels_ms=[3600_000, 5000_000],
            )
        with pytest.raises(ValueError, match="ascending"):
            hypertable_rollup(
                df, ts_ms_col="ts_ms", keys=["k"], value_col="v",
                levels_ms=[86400_000, 3600_000],
            )


class TestHistogramRollup:
    def test_merged_level_matches_direct_histogram(self, spark):
        from proxima_platform_spark.operators.rollup import histogram_rollup

        df = raw_df(spark)
        bounds = [0.0, 2.0, 5.0]
        ladder = histogram_rollup(
            df, ts_ms_col="ts_ms", keys=["k"], value_col="v",
            levels_ms=[3600_000, 86400_000], boundaries=bounds,
        )
        day = {
            (r.k, r.bucket_ms): list(r.hist)
            for r in ladder[86400_000].collect()
        }

        def bin_of(v):
            if v < 0.0:
                return 0
            if v < 2.0:
                return 1
            if v < 5.0:
                return 2
            return 3

        direct = {}
        for r in df.collect():
            key = (r.k, (r.ts_ms // 86400_000) * 86400_000)
            h = direct.setdefault(key, [0, 0, 0, 0])
            h[bin_of(r.v)] += 1
        assert day == direct

    def test_rejects_unsorted_boundaries(self, spark):
        from proxima_platform_spark.operators.rollup import histogram_rollup

        with pytest.raises(ValueError, match="ascending"):
            histogram_rollup(
                raw_df(spark), ts_ms_col="ts_ms", keys=["k"], value_col="v",
                levels_ms=[3600_000], boundaries=[5.0, 2.0],
            )


class TestHistogramQuantile:
    def test_estimate_within_bin_width_of_exact(self, spark):
        import random

        from pyspark.sql import functions as F

        from proxima_platform_spark.operators.rollup import (
            histogram_quantile,
            histogram_rollup,
        )

        rnd = random.Random(7)
        rows = [("k", 0, rnd.uniform(0, 400)) for _ in range(2000)]
        df = spark.createDataFrame(rows, "k string, ts_ms long, v double")
        B = [float(x) for x in range(0, 401, 50)]  # width 50
        day = histogram_rollup(
            df, ts_ms_col="ts_ms", keys=["k"], value_col="v",
            levels_ms=[3_600_000], boundaries=B,
        )[3_600_000]
        got = day.select(
            histogram_quantile(B, 0.5).alias("p50"),
            histogram_quantile(B, 0.9).alias("p90"),
        ).collect()[0]
        vals = sorted(v for (_, _, v) in rows)
        exact50 = vals[int(0.5 * len(vals))]
        exact90 = vals[int(0.9 * len(vals))]
        assert abs(got["p50"] - exact50) <= 50.0
        assert abs(got["p90"] - exact90) <= 50.0

    def test_clamps_under_and_overflow(self, spark):
        from proxima_platform_spark.operators.rollup import (
            histogram_quantile,
            histogram_rollup,
        )

        B = [0.0, 10.0]
        df = spark.createDataFrame(
            [("k", 0, -5.0), ("k", 0, -1.0), ("k", 0, 99.0)],
            "k string, ts_ms long, v double",
        )
        lvl = histogram_rollup(
            df, ts_ms_col="ts_ms", keys=["k"], value_col="v",
            levels_ms=[1000], boundaries=B,
        )[1000]
        row = lvl.select(
            histogram_quantile(B, 0.5).alias("lo"),
            histogram_quantile(B, 0.99).alias("hi"),
        ).collect()[0]
        assert row["lo"] == 0.0   # mass in the underflow bin clamps to b0
        assert row["hi"] == 10.0  # overflow clamps to the last boundary
