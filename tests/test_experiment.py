"""CUPED adjusted means (functions/experiment.py): numpy-model parity,
unbiasedness shape, zero-variance degeneracy."""

import numpy as np

from pyspark.sql import functions as F

from proxima_platform_spark.functions.experiment import cuped_adjusted_means


def _units(spark, seed=11, n=600):
    rng = np.random.RandomState(seed)
    x = np.round(rng.gamma(4.0, 25.0, n), 2)           # pre-period spend
    noise = np.round(rng.normal(0, 10, n), 2)
    variant = (np.arange(n) % 2).astype(int)
    lift = 5.0 * variant                                # true effect on B
    y = np.round(0.8 * x + 20 + lift + noise, 2)        # correlated metric
    rows = [(int(v), float(a), float(b)) for v, a, b in zip(variant, x, y)]
    return (
        spark.createDataFrame(rows, ["variant", "x", "y"]),
        variant,
        x,
        y,
    )


class TestCuped:
    def test_matches_numpy_model(self, spark):
        df, variant, x, y = _units(spark)
        out = {r.variant: r for r in cuped_adjusted_means(df).collect()}
        n = len(x)
        theta = (n * np.sum(x * y) - x.sum() * y.sum()) / (
            n * np.sum(x * x) - x.sum() ** 2
        )
        for v in (0, 1):
            sel = variant == v
            mean_y = y[sel].mean()
            adj = mean_y - theta * (x[sel].mean() - x.mean())
            assert abs(out[v].mean_y - mean_y) < 1e-4
            assert abs(out[v].mean_y_adj - adj) < 1e-4
            assert abs(out[v].theta - theta) < 1e-4

    def test_adjustment_reduces_metric_variance(self, spark):
        """θ is the pooled OLS slope, so the residualized metric's sample
        variance is var(y)·(1-ρ²) — strictly smaller whenever x and y
        correlate. (Variance shrinks on every sample by the OLS identity;
        any single draw's point estimate may move either way.)"""
        df, variant, x, y = _units(spark)
        out = {r.variant: r for r in cuped_adjusted_means(df).collect()}
        theta = out[0].theta
        y_adj = y - theta * (x - x.mean())
        rho2 = np.corrcoef(x, y)[0, 1] ** 2
        assert rho2 > 0.5  # the fixture is strongly correlated on purpose
        assert np.var(y_adj) < 0.6 * np.var(y)
        assert abs(np.var(y_adj) - np.var(y) * (1 - rho2)) < 1e-6 * np.var(y)

    def test_zero_variance_covariate_degenerates_to_raw(self, spark):
        rows = [(i % 2, 10.0, float(50 + (i % 2) * 3)) for i in range(40)]
        df = spark.createDataFrame(rows, ["variant", "x", "y"])
        out = {r.variant: r for r in cuped_adjusted_means(df).collect()}
        for v in (0, 1):
            assert out[v].theta == 0.0
            assert out[v].mean_y_adj == out[v].mean_y
