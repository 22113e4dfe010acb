"""Retract join: incremental changelog join emitting retractions.

Reference: beam/core/.../transforms/retract/RetractJoin.java:57-363 (+
RetractPCollection, KeyedRetractPCollection, RetractElement, LeftOrRight,
SequentialInstant) — the reference's hardest operator (SURVEY §2.6): join two
keyed changelogs keeping the most-recent value per key on each side; when a
side updates (or deletes), emit *retractions* of previously-joined outputs
and *additions* of the new ones, in event-time order (SequentialInstant =
(stamp, seq_id) total order).

Two Spark forms, per SURVEY §4 item 2:

  * ``retract_join_batch`` — exact per-element replay. Both changelogs
    co-partition on the join key (one shuffle each); each key's merged
    history replays through an Arrow-batched ``applyInPandas`` state machine
    emitting +/− rows. Per-key history must fit a worker — the same bound the
    reference's per-key state imposes on Beam.
  * ``retract_join_stream`` — the streaming form: the same replay state
    machine, but the per-key (left-latest, right-latest) pair lives in the
    Spark state store via ``applyInPandasWithState`` — state is partitioned
    across executors exactly like the reference keeps keyed state on Beam
    workers (RetractJoin.java:57-363); nothing accumulates on the driver.

Output schema (both forms — unionByName-compatible):
  key string, left_value string, right_value string,
  stamp timestamp, is_addition boolean
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

RETRACT_SCHEMA = (
    "key string, left_value string, right_value string, "
    "stamp timestamp, is_addition boolean"
)


def _normalize_side(df: DataFrame, key, value, stamp, delete, seq, side: str) -> DataFrame:
    cols = [
        (F.col(key) if isinstance(key, str) else key).cast("string").alias("key"),
        (F.col(value) if isinstance(value, str) else value).cast("string").alias("value"),
        (F.col(stamp) if isinstance(stamp, str) else stamp).alias("stamp"),
        (
            (F.col(delete) if isinstance(delete, str) else delete)
            if delete is not None
            else F.lit(False)
        ).cast("boolean").alias("delete"),
        (
            (F.col(seq) if isinstance(seq, str) else seq)
            if seq is not None
            else F.lit(0)
        ).cast("long").alias("seq"),
        F.lit(side).alias("side"),
    ]
    return df.select(*cols)


def _replay_rows(state: dict, key: str, rows: list[dict]) -> list[dict]:
    """Advance the per-key join state machine over ``rows`` (already in
    (stamp, seq) order), mutating ``state`` ({"L": latest, "R": latest}) and
    returning emitted retract-stream rows — the exact step semantics of
    RetractJoin.java:57-363: an update retracts the previously-joined output
    and adds the new one; a delete retracts without adding."""
    out: list[dict] = []

    def emit(lv, rv, stamp, add):
        out.append(
            {
                "key": key,
                "left_value": lv,
                "right_value": rv,
                "stamp": stamp,
                "is_addition": add,
            }
        )

    for row in rows:
        side, other = row["side"], ("R" if row["side"] == "L" else "L")
        old, counterpart = state[side], state[other]
        new = None if row["delete"] else row["value"]
        if counterpart is not None:
            pair = lambda mine: (
                (mine, counterpart) if side == "L" else (counterpart, mine)
            )
            if old is not None:
                lv, rv = pair(old)
                emit(lv, rv, row["stamp"], False)  # retract previous join
            if new is not None:
                lv, rv = pair(new)
                emit(lv, rv, row["stamp"], True)
        state[side] = new
    return out


def retract_join_batch(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str | Column,
    right_key: str | Column,
    left_value: str | Column,
    right_value: str | Column,
    left_stamp: str | Column = "stamp",
    right_stamp: str | Column = "stamp",
    left_delete: str | Column | None = None,
    right_delete: str | Column | None = None,
    left_seq: str | Column | None = None,
    right_seq: str | Column | None = None,
) -> DataFrame:
    """Replay both changelogs per key in (stamp, seq) order — the reference's
    SequentialInstant total order (SequentialInstant.java) — and emit the
    retract stream of the inner join (RetractJoin.java:57-363 semantics:
    most-recent value per side per key; an update retracts the previous
    joined output and adds the new one; a delete retracts without adding)."""
    merged = _normalize_side(
        left, left_key, left_value, left_stamp, left_delete, left_seq, "L"
    ).unionByName(
        _normalize_side(
            right, right_key, right_value, right_stamp, right_delete, right_seq, "R"
        )
    )

    def replay(key_tuple: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["stamp", "seq"], kind="mergesort")
        out = _replay_rows(
            {"L": None, "R": None}, key_tuple[0], pdf.to_dict("records")
        )
        return pd.DataFrame(
            out, columns=["key", "left_value", "right_value", "stamp", "is_addition"]
        )

    # explicit numbered repartition: AQE would coalesce a small shuffle to 1
    # partition and serialize every key's replay through one Python worker
    n = merged.sparkSession.sparkContext.defaultParallelism
    return (
        merged.repartition(n, F.col("key"))
        .groupBy("key")
        .applyInPandas(replay, schema=RETRACT_SCHEMA)
    )


def retract_join_stream(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str | Column,
    right_key: str | Column,
    left_value: str | Column,
    right_value: str | Column,
    left_stamp: str | Column = "stamp",
    right_stamp: str | Column = "stamp",
    left_delete: str | Column | None = None,
    right_delete: str | Column | None = None,
    left_seq: str | Column | None = None,
    right_seq: str | Column | None = None,
    watermark_delay: str = "10 seconds",
    api: str = "auto",
) -> DataFrame:
    """Streaming retract join with *distributed* keyed state.

    The same replay state machine as :func:`retract_join_batch`, hosted by
    the shared keyed engine ``reduce_value_state_by_key_stream`` — the
    reference's exact timer design serves BOTH stateful paths through one
    implementation: ``transformWithStateInPandas`` when the capability
    probe passes (Spark 4 timers + protobuf + RocksDB provider, DELTAS.md
    #12), ``applyInPandasWithState`` otherwise. No duplicated
    buffer/watermark/timer code here — only the join step function.

    Rows BUFFER until the event-time watermark passes their stamp, then
    replay in global (stamp, seq) order via ``order_cols`` — the
    reference's SequentialInstant total order (RetractJoin.java:57-363,
    SequentialInstant.java) at the same millisecond granularity as its
    Joda Instants. Rows older than the watermark at arrival are dropped
    (MAX_ACCEPTABLE_STAMP analog); outputs trail the watermark by
    ``watermark_delay`` — the streaming-correctness price the reference
    also pays; buffered volume per key is bounded by watermark_delay ×
    per-key arrival rate. Per-key state is the (left-latest, right-latest)
    pair, hash-partitioned across executors exactly like the reference
    keeps keyed state on Beam workers; nothing accumulates on the driver.
    """
    from proxima_platform_spark.streaming.stateful import (
        reduce_value_state_by_key_stream,
    )

    merged = _normalize_side(
        left, left_key, left_value, left_stamp, left_delete, left_seq, "L"
    ).unionByName(
        _normalize_side(
            right, right_key, right_value, right_stamp, right_delete, right_seq, "R"
        )
    )

    def state_fn(st, key, row):
        # copy before mutating: the engine shares initial_state across keys
        st = {"L": st.get("L"), "R": st.get("R")}
        out = _replay_rows(
            st,
            key,
            [
                {
                    "side": row["side"],
                    "value": row["value"],
                    "delete": bool(row["delete"]),
                    "stamp": row["stamp"],
                }
            ],
        )
        return st, out

    return reduce_value_state_by_key_stream(
        merged,
        key="key",
        stamp="stamp",
        state_fn=state_fn,
        initial_state={"L": None, "R": None},
        output_schema=RETRACT_SCHEMA,
        sorted=True,
        watermark_delay=watermark_delay,
        order_cols=("seq",),
        api=api,
    )
