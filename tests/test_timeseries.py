"""Event-analytics & time-series operators (functions/timeseries.py):
funnel step strictness, cohort retention, gap-fill LOCF, distinct ladder,
HLL sketch ladder mergeability."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from proxima_platform_spark.functions.timeseries import (
    cohort_retention,
    distinct_ladder,
    funnel,
    gapfill_locf,
    hll_ladder,
)


def _events_df(spark, rows):
    return spark.createDataFrame(rows, "user_id long, event_type string, ts_ms long")


class TestFunnel:
    def test_strict_ordering(self, spark):
        # u1 completes all 3 in order; u2 clicks BEFORE its only view (no
        # conversion past step 1); u3 never does step 1 (absent from output).
        df = _events_df(
            spark,
            [
                (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
                (2, "click", 50), (2, "view", 100),
                (3, "click", 10), (3, "purchase", 20),
            ],
        )
        out = {
            r["user_id"]: (r["t1"], r["t2"], r["t3"])
            for r in funnel(df, ["view", "click", "purchase"], ts_col="ts_ms").collect()
        }
        assert out == {1: (100, 200, 300), 2: (100, None, None)}

    def test_earliest_qualifying_not_earliest_overall(self, spark):
        # u1's earliest click (150) is before its second view but after the
        # FIRST view — strictness is vs the step-1 min, so 150 qualifies.
        # u2's clicks straddle the first view: only the later one counts.
        df = _events_df(
            spark,
            [
                (1, "view", 100), (1, "view", 400), (1, "click", 150),
                (2, "view", 100), (2, "click", 90), (2, "click", 110),
            ],
        )
        out = {
            r["user_id"]: r["t2"]
            for r in funnel(df, ["view", "click"], ts_col="ts_ms").collect()
        }
        assert out == {1: 150, 2: 110}

    def test_equal_timestamp_does_not_qualify(self, spark):
        df = _events_df(spark, [(1, "view", 100), (1, "click", 100)])
        row = funnel(df, ["view", "click"], ts_col="ts_ms").collect()[0]
        assert row["t1"] == 100 and row["t2"] is None


class TestCohortRetention:
    def test_triangle(self, spark):
        wk = 604_800_000
        df = _events_df(
            spark,
            [
                # u1: cohort week 0, active weeks 0 and 2 (twice in week 2 —
                # must count once)
                (1, "view", 10), (1, "view", 2 * wk + 5), (1, "click", 2 * wk + 9),
                # u2: cohort week 0, active week 0 only
                (2, "view", 20),
                # u3: cohort week 1
                (3, "view", wk + 1), (3, "view", 2 * wk + 1),
            ],
        )
        out = {
            (r["cohort_ms"], r["bucket_ms"]): r["users"]
            for r in cohort_retention(df, ts_ms_col="ts_ms", bucket_ms=wk).collect()
        }
        assert out == {
            (0, 0): 2,
            (0, 2 * wk): 1,
            (wk, wk): 1,
            (wk, 2 * wk): 1,
        }


class TestGapfillLocf:
    def test_fills_gaps_and_carries_forward(self, spark):
        pts = spark.createDataFrame(
            [(1, 0, 10.0), (1, 30, 13.0), (2, 20, 5.0)],
            "k long, bucket_ms long, value double",
        )
        out = gapfill_locf(
            pts, key_col="k", bucket_ms_col="bucket_ms", value_col="value", step_ms=10
        )
        got = {(r["k"], r["bucket_ms"]): r["value"] for r in out.collect()}
        assert got == {
            (1, 0): 10.0, (1, 10): 10.0, (1, 20): 10.0, (1, 30): 13.0,
            (2, 20): 5.0,
        }

    def test_no_window_over_raw(self, spark):
        # the LOCF window sorts the bucketed frame; the plan must contain a
        # single Window over the grid join, not a sort of the input table
        pts = spark.createDataFrame(
            [(1, 0, 1.0)], "k long, bucket_ms long, value double"
        )
        plan = gapfill_locf(
            pts, key_col="k", bucket_ms_col="bucket_ms", value_col="value", step_ms=10
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Window") == 1


class TestDistinctLadder:
    def test_coarse_from_fine_equals_direct(self, spark, sf_dir):
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from __spark_entry__ import _events

        ev = _events(spark, sf_dir)
        ladder = distinct_ladder(
            ev, ts_ms_col="ts_ms", member_col="user_id",
            levels_ms=[3_600_000, 86_400_000],
        )
        got = {
            r["bucket_ms"]: r["uniques"] for r in ladder[86_400_000].collect()
        }
        direct = {
            r["d"]: r["u"]
            for r in ev.groupBy(
                F.expr("(ts_ms DIV 86400000) * 86400000").alias("d")
            )
            .agg(F.countDistinct("user_id").alias("u"))
            .collect()
        }
        assert got == direct

    def test_hll_ladder_merge_and_accuracy(self, spark, sf_dir):
        from __spark_entry__ import _events

        ev = _events(spark, sf_dir)
        exact = distinct_ladder(
            ev, ts_ms_col="ts_ms", member_col="user_id", levels_ms=[86_400_000]
        )[86_400_000]
        approx = hll_ladder(
            ev, ts_ms_col="ts_ms", member_col="user_id",
            levels_ms=[3_600_000, 86_400_000], lg_k=12,
        )[86_400_000]
        joined = exact.join(approx.select("bucket_ms", "estimate"), "bucket_ms")
        rows = joined.collect()
        assert rows
        for r in rows:
            # lg_k=12 → ~1.6% relative standard error; day cardinalities in
            # the fixture are small enough that unions are near-exact
            assert abs(r["estimate"] - r["uniques"]) <= max(2, 0.05 * r["uniques"])

    def test_day_sketch_equals_union_of_hours(self, spark, sf_dir):
        # the mergeability contract: unioning the 24 hour sketches must give
        # the SAME estimate as sketching the day directly
        from __spark_entry__ import _events

        ev = _events(spark, sf_dir)
        via_hours = hll_ladder(
            ev, ts_ms_col="ts_ms", member_col="user_id",
            levels_ms=[3_600_000, 86_400_000], lg_k=12,
        )[86_400_000]
        direct = hll_ladder(
            ev, ts_ms_col="ts_ms", member_col="user_id",
            levels_ms=[86_400_000], lg_k=12,
        )[86_400_000]
        a = {r["bucket_ms"]: r["estimate"] for r in via_hours.collect()}
        b = {r["bucket_ms"]: r["estimate"] for r in direct.collect()}
        assert a == b


from proxima_platform_spark.functions.timeseries import (  # noqa: E402
    ewma,
    rolling_zscore,
)


class TestEwma:
    """Trailing-K α=1/2 EWMA vs a pure-Python model of the same truncated
    normalized weighting: ewma_n = Σ x_{n-j}·2^{m-1-j} / (2^m − 1)."""

    def _model(self, xs, max_lag=16):
        out = []
        for n in range(len(xs)):
            frame = xs[max(0, n - max_lag + 1) : n + 1]
            m = len(frame)
            cents = [round(x * 100) for x in frame]
            num = sum(c * (1 << i) for i, c in enumerate(cents))
            out.append(round(num / (((1 << m) - 1) * 100.0), 6))
        return out

    def test_matches_model(self, spark):
        xs = [1.25, 2.0, 0.5, 10.0, 3.75, 3.75, 0.01, 99.99, 4.2]
        df = spark.createDataFrame(
            [(1, i, x) for i, x in enumerate(xs)], "k long, i long, v double"
        )
        got = [
            r.ewma
            for r in ewma(df, ["k"], ["i"], "v").orderBy("i").collect()
        ]
        assert got == self._model(xs)

    def test_decay_weights_newest_most(self, spark):
        # a spike decays geometrically: after the spike, each step halves
        # its remaining contribution
        xs = [0.0] * 5 + [100.0] + [0.0] * 5
        df = spark.createDataFrame(
            [(1, i, x) for i, x in enumerate(xs)], "k long, i long, v double"
        )
        got = [r.ewma for r in ewma(df, ["k"], ["i"], "v").orderBy("i").collect()]
        assert got[5] == max(got)  # spike dominates at its own row
        for i in range(6, 10):
            assert got[i + 1] < got[i]  # monotone decay afterwards

    def test_keys_independent(self, spark):
        df = spark.createDataFrame(
            [(1, 0, 5.0), (2, 0, 50.0), (1, 1, 5.0), (2, 1, 50.0)],
            "k long, i long, v double",
        )
        rows = ewma(df, ["k"], ["i"], "v").collect()
        for r in rows:
            assert r.ewma == (5.0 if r.k == 1 else 50.0)

    def test_window_plan_single_exchange(self, spark):
        df = spark.createDataFrame(
            [(1, 0, 5.0), (2, 1, 6.0)], "k long, i long, v double"
        )
        plan = (
            ewma(df, ["k"], ["i"], "v")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") <= 1 + plan.count("Exchange rangepartitioning")
        for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
            assert bad not in plan


class TestRollingZscore:
    def _model(self, xs, window=50, min_obs=10):
        import math

        out = []
        for n in range(len(xs)):
            frame = xs[max(0, n - window + 1) : n + 1]
            m = len(frame)
            sum_x = sum(round(x * 100) for x in frame) / 100.0
            sum_x2 = sum(round(x * 100) ** 2 for x in frame) / 10000.0
            mean = sum_x / m
            var = sum_x2 / m - mean * mean
            if m >= min_obs and var > 0:
                out.append((m, round((xs[n] - mean) / math.sqrt(var), 6)))
            else:
                out.append((m, None))
        return out

    def test_matches_model(self, spark):
        import random

        rng = random.Random(7)
        xs = [round(rng.uniform(0, 50), 2) for _ in range(80)]
        xs[40] = 500.0  # an unmistakable outlier inside the window
        df = spark.createDataFrame(
            [(1, i, x) for i, x in enumerate(xs)], "k long, i long, v double"
        )
        got = [
            (r.n_obs, r.zscore)
            for r in rolling_zscore(df, ["k"], ["i"], "v", window_rows=50)
            .orderBy("i")
            .collect()
        ]
        want = self._model(xs)
        assert [g[0] for g in got] == [w[0] for w in want]
        for (gn, gz), (wn, wz) in zip(got, want):
            if wz is None:
                assert gz is None
            else:
                assert gz == pytest.approx(wz, abs=1e-6)

    def test_warmup_null_and_outlier_flagged(self, spark):
        xs = [10.0] * 20 + [10.5] * 20 + [1000.0]
        df = spark.createDataFrame(
            [(1, i, x) for i, x in enumerate(xs)], "k long, i long, v double"
        )
        rows = rolling_zscore(df, ["k"], ["i"], "v").orderBy("i").collect()
        for r in rows[:9]:
            assert r.zscore is None  # warmup
        # constant prefix → var == 0 → NULL, never a division blowup
        assert rows[9].zscore is None
        assert rows[-1].zscore is not None and rows[-1].zscore > 3


from proxima_platform_spark.functions.timeseries import mad_outliers  # noqa: E402


class TestMadOutliers:
    def _model(self, rows, k=3.0):
        # rows: (id, key, value); lower median at position (n+1)//2 (1-based)
        from collections import defaultdict

        by_key = defaultdict(list)
        for i, g, v in rows:
            by_key[g].append((v, i))
        out = {}
        for g, vals in by_key.items():
            s = sorted(vals)
            med = s[(len(s) + 1) // 2 - 1][0]
            devs = sorted((abs(v - med), i) for v, i in vals)
            mad = devs[(len(devs) + 1) // 2 - 1][0]
            for v, i in vals:
                out[i] = (med, mad, mad > 0 and abs(v - med) > k * mad)
        return out

    def test_matches_model(self, spark):
        rows = [
            (0, 1, 10.0), (1, 1, 11.0), (2, 1, 9.5), (3, 1, 10.25),
            (4, 1, 500.0),  # spike
            (5, 2, 1.0), (6, 2, 2.0), (7, 2, 3.0), (8, 2, 2.5),
        ]
        df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
        got = {
            r.event_id: (r.med, r.mad, r.is_outlier)
            for r in mad_outliers(
                df, ["user_id"], "value", ["event_id"]
            ).collect()
        }
        assert got == self._model(rows)
        assert got[4][2] is True  # the spike is flagged

    def test_robust_where_zscore_is_not(self, spark):
        # one huge spike among 9 near-identical points: the spike inflates
        # σ enough that a 3σ test needs care; the median/MAD don't move
        rows = [(i, 1, 10.0 + i * 0.01) for i in range(9)] + [(9, 1, 10000.0)]
        df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
        res = {r.event_id: r for r in mad_outliers(df, ["user_id"], "value", ["event_id"]).collect()}
        assert res[9].is_outlier is True
        assert abs(res[9].med - 10.04) < 1e-9  # median untouched by the spike
        for i in range(9):
            assert res[i].is_outlier is False

    def test_constant_series_never_divides(self, spark):
        rows = [(i, 1, 7.0) for i in range(5)]
        df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
        res = mad_outliers(df, ["user_id"], "value", ["event_id"]).collect()
        assert all(r.mad == 0.0 and r.is_outlier is False for r in res)


from proxima_platform_spark.functions.timeseries import drift_chi2  # noqa: E402


class TestDriftChi2:
    def test_identical_distributions_score_zero(self, spark):
        rows = [
            (i, "a", float(v), half == 1)
            for half in (0, 1)
            for i, v in enumerate([5, 15, 25, 35] * 25)
        ]
        df = spark.createDataFrame(rows, "id long, g string, v double, cur boolean")
        [r] = drift_chi2(df, ["g"], "v", F.col("cur"), n_bins=10, lo=0, hi=100).collect()
        # both halves see the exact same histogram → chi2 == 0
        assert r.chi2 == 0.0 and r.extra_bins == 0

    def test_shifted_distribution_scores_high(self, spark):
        rows = [(i, "a", 5.0, False) for i in range(100)] + [
            (100 + i, "a", 95.0, True) for i in range(100)
        ]
        df = spark.createDataFrame(rows, "id long, g string, v double, cur boolean")
        [r] = drift_chi2(df, ["g"], "v", F.col("cur"), n_bins=10, lo=0, hi=100).collect()
        # the current slice lands entirely in a bin the reference never
        # populated: flagged via extra_bins, and the reference bin's
        # expected count is wholly missing → large chi2
        assert r.extra_bins == 1
        assert r.chi2 > 50

    def test_matches_model(self, spark):
        import random

        rng = random.Random(3)
        rows = [
            (i, "g%d" % (i % 2), round(rng.uniform(0, 100), 2), rng.random() < 0.5)
            for i in range(400)
        ]
        df = spark.createDataFrame(rows, "id long, g string, v double, cur boolean")
        got = {
            r.g: (r.chi2, r.extra_bins)
            for r in drift_chi2(df, ["g"], "v", F.col("cur"), n_bins=10, lo=0, hi=100).collect()
        }
        for g in ("g0", "g1"):
            o = [0] * 10
            ref = [0] * 10
            for _, gg, v, cur in rows:
                if gg != g:
                    continue
                b = min(9, max(0, int(v // 10)))
                (o if cur else ref)[b] += 1
            n_cur, n_ref = sum(o), sum(ref)
            chi2 = 0.0
            extra = 0
            for b in range(10):
                if ref[b] > 0:
                    e = n_cur * ref[b] / n_ref
                    chi2 += (o[b] - e) ** 2 / e
                elif o[b] > 0:
                    extra += 1
            assert got[g][1] == extra
            assert abs(got[g][0] - round(chi2, 6)) < 1e-6, g


class TestKaplanMeier:
    def test_textbook_curve_with_censoring(self, spark):
        """Classic product-limit example: events at t=1 (1 of 6 at risk),
        t=3 (1 of 4 — the t=2 censored unit left the risk set), censored
        at t=2 and t=4+."""
        from proxima_platform_spark.functions.timeseries import kaplan_meier

        units = spark.createDataFrame(
            [(1, 1), (2, 0), (3, 1), (4, 0), (4, 0), (5, 0)],
            ["obs_time", "event"],
        )
        out = {r.t: r for r in kaplan_meier(units).collect()}
        assert set(out) == {1, 3}
        assert out[1].n_at_risk == 6 and out[1].n_events == 1
        assert out[3].n_at_risk == 4 and out[3].n_events == 1
        # exact-integer stepwise product, scaled by 1e12:
        # S' = round_half_up(S * (n - d) / n) = (2*S*(n-d) + n) // (2*n)
        s = 10**12
        s = (2 * s * (6 - 1) + 6) // (2 * 6)
        assert out[1].survival == s / 1e12
        s = (2 * s * (4 - 1) + 4) // (2 * 4)
        assert out[3].survival == s / 1e12
        # and the exact fold tracks the true product-limit value closely
        assert abs(out[3].survival - (5 / 6) * (3 / 4)) < 1e-9

    def test_censored_never_counted_as_events(self, spark):
        from proxima_platform_spark.functions.timeseries import kaplan_meier

        units = spark.createDataFrame(
            [(2, 0), (2, 0), (3, 1)], ["obs_time", "event"]
        )
        out = kaplan_meier(units).collect()
        assert len(out) == 1 and out[0].t == 3
        # at t=3 only the one surviving unit remains at risk
        assert out[0].n_at_risk == 1 and out[0].n_events == 1

    def test_everyone_dies_pins_zero(self, spark):
        from proxima_platform_spark.functions.timeseries import kaplan_meier

        units = spark.createDataFrame(
            [(1, 1), (2, 1), (2, 1)], ["obs_time", "event"]
        )
        out = {r.t: r for r in kaplan_meier(units).collect()}
        # (n - d) = 0 zeroes the integer product exactly — no special case
        assert out[2].survival == 0.0
        assert out[1].survival > 0.0
