"""Property-based tests: funnel and session-ID assignment must agree with
direct Python models on arbitrary event interleavings (duplicate
timestamps, missing steps, out-of-order arrival)."""

import os
import sys

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from proxima_platform_spark.functions.timeseries import funnel

STEPS = ["a", "b", "c"]

event_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),          # user
        st.sampled_from(STEPS + ["x"]),                  # type (x = noise)
        st.integers(min_value=0, max_value=30),          # ts
    ),
    min_size=0,
    max_size=25,
)


def model_funnel(rows):
    """Earliest step-1; each later step strictly after the previous one."""
    out = {}
    users = {u for (u, t, _) in rows if t == STEPS[0]}
    for u in users:
        mine = [(ts, t) for (uu, t, ts) in rows if uu == u]
        t_prev = min(ts for ts, t in mine if t == STEPS[0])
        result = [t_prev]
        for step in STEPS[1:]:
            cand = [ts for ts, t in mine if t == step and ts > t_prev]
            if not cand:
                result += [None] * (len(STEPS) - len(result))
                break
            t_prev = min(cand)
            result.append(t_prev)
        out[u] = tuple(result)
    return out


def model_sessions(rows, gap):
    """rows: (user, ts, uid). Session seq per (user, uid)."""
    out = {}
    by_user = {}
    for u, ts, uid in rows:
        by_user.setdefault(u, []).append((ts, uid))
    for u, evs in by_user.items():
        evs.sort()
        seq = 0
        prev = None
        for ts, uid in evs:
            if prev is None or ts - prev > gap:
                seq += 1
            out[(u, uid)] = seq
            prev = ts
    return out


class TestFunnelProperty:
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(event_strategy)
    def test_matches_model(self, rows):
        spark = self.spark
        if not rows:
            return
        df = spark.createDataFrame(
            [(u, t, ts) for (u, t, ts) in rows],
            "user_id long, event_type string, ts_ms long",
        )
        got = {
            r["user_id"]: (r["t1"], r["t2"], r["t3"])
            for r in funnel(df, STEPS, ts_col="ts_ms").collect()
        }
        assert got == model_funnel(rows)

    @pytest.fixture(autouse=True)
    def _attach_spark(self, spark):
        type(self).spark = spark


class TestSessionIdsProperty:
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2),   # user
                st.integers(min_value=0, max_value=100), # ts_ms
            ),
            min_size=1,
            max_size=20,
            unique=True,
        )
    )
    def test_matches_model(self, rows):
        # mirror q_session_ids' shape with a 10ms gap on synthetic data
        from pyspark.sql import Window

        spark = self.spark
        data = [(u, ts, i) for i, (u, ts) in enumerate(rows)]
        df = spark.createDataFrame(data, "user_id long, ts_ms long, event_id long")
        w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
        run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        is_start = (F.col("ts_ms") - F.lag("ts_ms").over(w) > 10).cast("long")
        got = {
            (r["user_id"], r["event_id"]): r["session_seq"]
            for r in df.select(
                "user_id",
                "event_id",
                (F.sum(F.coalesce(is_start, F.lit(0))).over(run) + 1).alias(
                    "session_seq"
                ),
            ).collect()
        }
        # model keys on (user, uid); ties on ts broken by event_id in both
        want = model_sessions(
            sorted(data, key=lambda x: (x[0], x[1], x[2])), gap=10
        )
        want = {(u, uid): s for (u, uid), s in want.items()}
        assert got == want

    @pytest.fixture(autouse=True)
    def _attach_spark(self, spark):
        type(self).spark = spark


class TestGapfillProperty:
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2),    # key
                st.integers(min_value=0, max_value=12),   # bucket index
                st.floats(min_value=-5, max_value=5, allow_nan=False),
            ),
            min_size=1,
            max_size=15,
            unique_by=lambda t: (t[0], t[1]),
        )
    )
    def test_matches_model(self, pts):
        from proxima_platform_spark.functions.timeseries import gapfill_locf

        spark = self.spark
        step = 10
        df = spark.createDataFrame(
            [(k, b * step, v) for (k, b, v) in pts],
            "k long, bucket_ms long, value double",
        )
        got = {
            (r["k"], r["bucket_ms"]): r["value"]
            for r in gapfill_locf(
                df, key_col="k", bucket_ms_col="bucket_ms",
                value_col="value", step_ms=step,
            ).collect()
        }
        # model: per key, dense grid lo..hi, carry last value forward
        by_key = {}
        for k, b, v in pts:
            by_key.setdefault(k, {})[b * step] = v
        want = {}
        for k, obs in by_key.items():
            lo, hi = min(obs), max(obs)
            last = None
            for b in range(lo, hi + step, step):
                if b in obs:
                    last = obs[b]
                want[(k, b)] = last
        assert got == want

    @pytest.fixture(autouse=True)
    def _attach_spark(self, spark):
        type(self).spark = spark


class TestContinuousRollupProperty:
    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(  # events: (key, hour-index, value-cents)
            st.tuples(
                st.sampled_from(["a", "b"]),
                st.integers(min_value=0, max_value=40),
                st.integers(min_value=-500, max_value=500),
            ),
            min_size=1,
            max_size=24,
        ),
        st.lists(  # batch split points
            st.integers(min_value=1, max_value=23), max_size=3, unique=True
        ),
    )
    def test_any_batching_matches_batch_ladder(self, tmp_path_factory, events, cuts):
        from proxima_platform_spark.operators.rollup import hypertable_rollup
        from proxima_platform_spark.streaming.rollup_stream import ContinuousRollup

        spark = self.spark
        HOUR, DAY = 3_600_000, 86_400_000
        rows = [(k, h * HOUR + 7, c / 100.0) for (k, h, c) in events]
        bounds = sorted(c for c in cuts if c < len(rows))
        batches, prev = [], 0
        for b in bounds + [len(rows)]:
            if b > prev:
                batches.append(rows[prev:b])
                prev = b
        path = str(tmp_path_factory.mktemp("crp"))
        roll = ContinuousRollup(
            spark, path, ts_ms_col="ts_ms", keys=["k"], value_col="v",
            base_level_ms=HOUR, compact_every=2,
        )
        schema = "k string, ts_ms long, v double"
        for i, b in enumerate(batches):
            roll.update(spark.createDataFrame(b, schema), i)
        raw = spark.createDataFrame(rows, schema)
        want = {
            (r["k"], r["bucket_ms"]): (r["cnt"], str(r["total_dec"]), r["vmin"], r["vmax"])
            for r in hypertable_rollup(
                raw, ts_ms_col="ts_ms", keys=["k"], value_col="v",
                levels_ms=[HOUR, DAY],
            )[DAY].collect()
        }
        got = {
            (r["k"], r["bucket_ms"]): (r["cnt"], str(r["total_dec"]), r["vmin"], r["vmax"])
            for r in roll.level(DAY).collect()
        }
        assert got == want

    @pytest.fixture(autouse=True)
    def _attach_spark(self, spark):
        type(self).spark = spark


def model_twa(rows, day_ms=86_400_000):
    """rows: (user, ts_ms, value). Per (user, day): Σ cents·dur / Σ dur with
    lead-to-next (ties broken by event id = list position) and last-sample
    held to midnight — integer arithmetic, one final double division."""
    out = {}
    by_key = {}
    for i, (u, ts, v) in enumerate(rows):
        by_key.setdefault((u, ts // day_ms), []).append((ts, i, int(round(v * 100))))
    for (u, day), evs in by_key.items():
        evs.sort()
        end = (day + 1) * day_ms
        wsum = dsum = 0
        for j, (ts, _, cents) in enumerate(evs):
            nxt = evs[j + 1][0] if j + 1 < len(evs) else end
            wsum += cents * (nxt - ts)
            dsum += nxt - ts
        out[(u, day * day_ms)] = (len(evs), wsum, round(wsum / (dsum * 100.0), 6))
    return out


class TestTwaProperty:
    @pytest.fixture(autouse=True)
    def _bind(self, spark):
        self.spark = spark

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2),                  # user
                st.integers(min_value=0, max_value=3 * 86_400_000 - 1), # ts_ms
                st.decimals(
                    min_value=-100, max_value=100, places=2
                ).map(float),                                           # value
            ),
            min_size=1,
            max_size=20,
            unique_by=lambda r: (r[0], r[1]),  # unique (user, ts): the model
            # breaks duration ties by id while the operator orders by
            # (ts, event_id) — identical only when stamps are unique
        )
    )
    def test_matches_model(self, rows):
        from proxima_platform_spark.functions.timeseries import time_weighted_average

        spark = self.spark
        df = spark.createDataFrame(
            [(u, ts, float(v), i) for i, (u, ts, v) in enumerate(rows)],
            "user_id long, ts_ms long, value double, event_id long",
        )
        got = {
            (r.user_id, r.day_ms): (r.n_samples, r.weighted_cents_ms, r.twa)
            for r in time_weighted_average(df, ["user_id"]).collect()
        }
        assert got == model_twa(rows)


km_units = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),   # obs_time
        st.integers(min_value=0, max_value=1),   # event flag
    ),
    min_size=1,
    max_size=30,
)


def model_km(units):
    """Kaplan-Meier via the exact integer stepwise product, straight
    from the definition."""
    from collections import Counter

    d = Counter(t for t, e in units if e == 1)
    c = Counter(t for t, _ in units)
    out = {}
    s = 10**12
    at_risk = len(units)
    for t in sorted(c):
        n = at_risk
        if d.get(t, 0) > 0:
            s = (2 * s * (n - d[t]) + n) // (2 * n)
            out[t] = (n, d[t], s / 1e12)
        at_risk -= c[t]
    return out


class TestKaplanMeierProperty:
    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(km_units)
    def test_matches_python_model(self, units):
        from proxima_platform_spark.functions.timeseries import kaplan_meier

        spark = self.spark
        df = spark.createDataFrame(units, "obs_time int, event int")
        got = {
            r.t: (r.n_at_risk, r.n_events, r.survival)
            for r in kaplan_meier(df).collect()
        }
        assert got == model_km(units)

    @pytest.fixture(autouse=True)
    def _attach_spark(self, spark):
        type(self).spark = spark


class TestQuantileBisectProperty:
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.integers(min_value=-(10**7), max_value=10**7),
            min_size=1,
            max_size=60,
        ),
        st.sampled_from([0.01, 0.25, 0.5, 0.75, 1.0]),
    )
    def test_matches_sorted_rank_selection(self, micros, q):
        """Bisection == direct type-1 rank selection on the sorted
        micro values, for arbitrary (negative, duplicated) data."""
        import math

        from proxima_platform_spark.functions.selection import (
            exact_quantile_bisect,
        )

        spark = self.spark
        vals = [m / 1e6 for m in micros]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        [row] = exact_quantile_bisect(df, "x", q, slices=8).collect()
        srt = sorted(round(v * 1e6) for v in vals)
        rank = max(math.ceil(round(q * 1e6) * len(vals) / 1e6), 1)
        assert row.n == len(vals) and row.rank == rank
        assert row.value == srt[rank - 1] / 1e6

    @pytest.fixture(autouse=True)
    def _attach_spark(self, spark):
        type(self).spark = spark
