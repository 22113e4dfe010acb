"""Exact distributed order statistics (functions/selection.py):
histogram-bisection quantile vs the directly-sorted answer."""

import math

import pytest


class TestExactQuantileBisect:
    def _check(self, spark, values, q, scale=1_000_000):
        from proxima_platform_spark.functions.selection import (
            exact_quantile_bisect,
        )

        df = spark.createDataFrame([(v,) for v in values], "x double")
        [row] = exact_quantile_bisect(df, "x", q, scale=scale).collect()
        micro = sorted(round(v * scale) for v in values)
        want_rank = max(math.ceil(round(q * 1_000_000) * len(values) / 1e6), 1)
        assert row.n == len(values)
        assert row.rank == want_rank
        assert row.value == micro[want_rank - 1] / scale
        return row

    def test_median_odd_even(self, spark):
        self._check(spark, [5.0, 1.0, 9.0, 3.0, 7.0], 0.5)
        self._check(spark, [4.0, 2.0, 8.0, 6.0], 0.5)  # type-1: lower

    def test_wide_range_many_passes(self, spark):
        """Range >> slices: several refinement passes needed; still
        exact against the sorted answer, duplicates included."""
        vals = [float((i * 7919) % 100_000) + (i % 3) * 0.25
                for i in range(2_000)]
        for q in (0.01, 0.25, 0.5, 0.9, 1.0):
            self._check(spark, vals, q)

    def test_extreme_quantiles(self, spark):
        vals = [float(i) for i in range(100)]
        r = self._check(spark, vals, 1.0)
        assert r.value == 99.0
        r = self._check(spark, vals, 0.001)  # rank ceil(0.1) -> 1
        assert r.value == 0.0

    def test_validation_and_empty(self, spark):
        from proxima_platform_spark.functions.selection import (
            exact_quantile_bisect,
        )

        df = spark.createDataFrame([(1.0,)], "x double")
        for bad in (0.0, 1.5, -0.2):
            with pytest.raises(ValueError, match="q must"):
                exact_quantile_bisect(df, "x", bad)
        empty = spark.createDataFrame([], "x double")
        assert exact_quantile_bisect(empty, "x", 0.5).count() == 0


class TestExactQuantilesBisectMulti:
    """The lockstep multi-rank bisector must return exactly what the
    single-rank bisector returns for every rank — the r13 optimization
    (one combined histogram scan per pass for the banded pipelines)
    must be value-invisible."""

    def _both(self, spark, values, qs, scale=1_000_000):
        from proxima_platform_spark.functions.selection import (
            exact_quantile_bisect,
            exact_quantiles_bisect,
        )

        df = spark.createDataFrame([(v,) for v in values], "x double")
        multi = exact_quantiles_bisect(df, "x", qs, scale=scale)
        single = [
            exact_quantile_bisect(df, "x", q, scale=scale)
            .collect()[0]
            .value
            for q in qs
        ]
        assert multi == single
        return multi

    def test_band_ends_match_single(self, spark):
        vals = [float((i * 7919) % 100_000) + (i % 3) * 0.25
                for i in range(2_000)]
        self._both(spark, vals, [0.2, 0.9])  # diverging ranges
        self._both(spark, vals, [0.3, 0.7])  # ccnet's band
        self._both(spark, vals, [0.5, 0.5])  # equal ranges share a scan
        self._both(spark, vals, [0.001, 0.25, 0.5, 0.9, 1.0])

    def test_narrow_range_no_passes(self, spark):
        # whole domain fits one histogram: final scan only
        self._both(spark, [5.0, 1.0, 9.0, 3.0, 7.0], [0.25, 0.75])

    def test_validation_and_empty(self, spark):
        from proxima_platform_spark.functions.selection import (
            exact_quantiles_bisect,
        )

        df = spark.createDataFrame([(1.0,)], "x double")
        with pytest.raises(ValueError, match="q must"):
            exact_quantiles_bisect(df, "x", [0.5, 0.0])
        with pytest.raises(ValueError, match="qs must"):
            exact_quantiles_bisect(df, "x", [])
        empty = spark.createDataFrame([], "x double")
        assert exact_quantiles_bisect(empty, "x", [0.5, 0.9]) is None
