"""Engine-drift guard: the `_events` projection must analyze and produce
identical epoch integers whether parquet ns-timestamps surface as **long
nanos** (Spark 3.x + spark.sql.legacy.parquet.nanosAsLong=true) or as
**TIMESTAMP_NTZ** (Spark 4.x, where that conf is a silent no-op).

Round 2 post-mortem: the Spark 4.1.2 bump silently flipped `events.ts` from
long to TIMESTAMP_NTZ and every events-based query died at analysis time
with DATATYPE_MISMATCH. This test builds one tiny fixture of EACH dtype via
pyarrow and asserts both branches of `_events` agree exactly — it fails at
commit time on the next such engine move.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry

# ns values chosen to exercise truncation: sub-ms and sub-µs fractions,
# ms boundaries, and a 2260-era value near the int64-ns ceiling.
TS_NANOS = [
    0,
    999_999,                      # < 1 ms
    1_000_000,                    # exactly 1 ms
    1_704_067_798_778_549_123,    # 2024-01-01 00:09:58.778549123
    1_704_067_200_000_000_000,    # exact second boundary
    9_214_646_400_123_456_789,    # 2262-era, near int64-ns max
]


def _fixture_dir(tmp_path, col_type):
    """Write events-shaped parquet with ts as the given arrow type."""
    d = tmp_path / col_type
    os.makedirs(d, exist_ok=True)
    if col_type == "long":
        ts_arr = pa.array(TS_NANOS, type=pa.int64())
    else:
        ts_arr = pa.array(TS_NANOS, type=pa.timestamp("ns"))
    table = pa.table(
        {
            "event_id": pa.array(range(len(TS_NANOS)), type=pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array([1] * len(TS_NANOS), type=pa.int64()),
            "event_type": pa.array(["click"] * len(TS_NANOS)),
            "value": pa.array([1.0] * len(TS_NANOS)),
            "props": pa.array(["{}"] * len(TS_NANOS)),
        }
    )
    pq.write_table(table, d / "events.parquet")
    return str(d)


def _collect(spark, sf_dir):
    ev = entry._events(spark, sf_dir)
    rows = (
        ev.selectExpr("event_id", "ts_ms", "unix_micros(tstamp) AS ts_us")
        .orderBy("event_id")
        .collect()
    )
    return [(r.event_id, r.ts_ms, r.ts_us) for r in rows]


def _expected():
    # parquet ns → µs truncates toward zero (values are non-negative here,
    # so truncation == floor); ms floors from µs. Matches DuckDB epoch_ms().
    return [(i, ns // 1_000_000, ns // 1_000) for i, ns in enumerate(TS_NANOS)]


def test_events_long_ts_branch(spark, tmp_path):
    """ts as long nanos (Spark 3.x world) → exact epoch integers."""
    assert _collect(spark, _fixture_dir(tmp_path, "long")) == _expected()


def test_events_timestamp_ts_branch(spark, tmp_path):
    """ts as parquet timestamp[ns] (reads as NTZ on Spark 4.x, as long on
    3.x w/ nanosAsLong — either way `_events` must produce the same ints)."""
    assert _collect(spark, _fixture_dir(tmp_path, "ts")) == _expected()


def test_events_timestamp_branch_is_tz_independent(spark, tmp_path):
    """The NTZ branch must not shift with the session timezone (an NTZ→LTZ
    cast would). Skipped when the engine reads ns-parquet as long."""
    sf = _fixture_dir(tmp_path, "ts")
    if isinstance(
        spark.read.parquet(f"{sf}/events.parquet").schema["ts"].dataType,
        entry.T.LongType,
    ):
        pytest.skip("engine reads ns-parquet as long; no NTZ branch to test")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        assert _collect(spark, sf) == _expected()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_real_events_table_analyzes(spark, sf_dir):
    """The shipped testdata itself must pass the projection (analysis +
    execution) under whatever dtype the running engine surfaces."""
    ev = entry._events(spark, sf_dir)
    row = ev.selectExpr(
        "count(*) AS n",
        "count(ts_ms) AS n_ms",
        "count(tstamp) AS n_st",
        "min(ts_ms) AS lo",
    ).collect()[0]
    assert row.n > 0 and row.n == row.n_ms == row.n_st
    assert row.lo > 1_500_000_000_000  # epoch-ms magnitude, not µs/ns
