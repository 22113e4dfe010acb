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

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

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
) -> DataFrame:
    """Streaming retract join with *distributed* keyed state.

    The same replay state machine as :func:`retract_join_batch`, but the
    per-key (left-latest, right-latest) pair lives in Spark's state store
    (``applyInPandasWithState``), hash-partitioned on the join key across
    executors — the reference keeps this state on Beam workers
    (RetractJoin.java:57-363); at 100 TB of keyed state nothing accumulates
    on the driver, and micro-batch work scales with batch size.

    Rows BUFFER until the event-time watermark passes their stamp, then
    replay in global (stamp, seq) order — the reference's timer-on-watermark
    design (and the same buffering the sibling
    ``reduce_value_state_by_key_stream`` uses). Without the buffer, a row
    arriving one micro-batch later than a higher-stamped row (legal within
    the watermark bound) would apply as if newest and corrupt the per-key
    state. Rows already older than the watermark at arrival are dropped
    (MAX_ACCEPTABLE_STAMP analog). Outputs therefore trail the watermark by
    ``watermark_delay`` — the streaming-correctness price the reference also
    pays; buffered volume per key is bounded by watermark_delay × per-key
    arrival rate.
    """
    merged = _normalize_side(
        left, left_key, left_value, left_stamp, left_delete, left_seq, "L"
    ).unionByName(
        _normalize_side(
            right, right_key, right_value, right_stamp, right_delete, right_seq, "R"
        )
    ).withWatermark("stamp", watermark_delay)

    def process(
        key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import json

        st = {"L": None, "R": None}
        buffered: list = []
        if state.exists:
            packed = state.get
            if packed[0] is not None:
                st = json.loads(packed[0])
            if packed[1] is not None:
                buffered = json.loads(packed[1])

        wm_ms = state.getCurrentWatermarkMs()
        for pdf in pdfs:
            for row in pdf.to_dict("records"):
                stamp_ns = int(pd.Timestamp(row["stamp"]).value)
                if wm_ms > 0 and stamp_ns // 1_000_000 < wm_ms:
                    continue  # late beyond the watermark at arrival: drop
                buffered.append(
                    {
                        "stamp_ns": stamp_ns,
                        "seq": int(row["seq"]),
                        "side": row["side"],
                        "value": row["value"],
                        "delete": bool(row["delete"]),
                    }
                )

        buffered.sort(key=lambda r: (r["stamp_ns"], r["seq"]))
        flush = [r for r in buffered if r["stamp_ns"] // 1_000_000 <= wm_ms]
        hold = [r for r in buffered if r["stamp_ns"] // 1_000_000 > wm_ms]
        out = _replay_rows(
            st,
            key_tuple[0],
            [
                {
                    "side": r["side"],
                    "value": r["value"],
                    "delete": r["delete"],
                    "stamp": pd.Timestamp(r["stamp_ns"]),
                }
                for r in flush
            ],
        )
        state.update((json.dumps(st), json.dumps(hold) if hold else None))
        # wake this key when the watermark next advances so held rows flush
        # even if no further data arrives for it
        state.setTimeoutTimestamp(max(wm_ms + 1, 1))
        if out:
            yield pd.DataFrame(
                out,
                columns=["key", "left_value", "right_value", "stamp", "is_addition"],
            )

    return merged.groupBy("key").applyInPandasWithState(
        process,
        outputStructType=RETRACT_SCHEMA,
        stateStructType="state string, buffered string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
