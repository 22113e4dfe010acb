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
  * ``RetractJoinMaintainer`` — micro-batch incremental form for streams:
    maintains latest-value tables for both sides in ``foreachBatch`` and
    emits the diff (adds + retracts) of the materialized join between
    consecutive batches — the Delta-CDF recompute strategy, dependency-free.

Output schema (both forms):
  key string, left_value string, right_value string,
  stamp timestamp, is_addition boolean
"""

from __future__ import annotations

from typing import Iterator

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
        state = {"L": None, "R": None}
        out: list[dict] = []

        def emit(lv, rv, stamp, add):
            out.append(
                {
                    "key": key_tuple[0],
                    "left_value": lv,
                    "right_value": rv,
                    "stamp": stamp,
                    "is_addition": add,
                }
            )

        for row in pdf.to_dict("records"):
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


class RetractJoinMaintainer:
    """Micro-batch incremental retract join for streams (foreachBatch form).

    Keeps the latest live value per key for both sides; after applying each
    micro-batch, the change in the materialized inner join is emitted as
    adds/retracts. Coarser timing than the per-element replay (retraction
    stamps collapse to the batch watermark) — the documented semantic delta
    of the micro-batch strategy; the per-element form is
    :func:`retract_join_batch`.
    """

    def __init__(self, spark) -> None:
        self.spark = spark
        self._left: pd.DataFrame | None = None  # driver-side latest tables
        self._right: pd.DataFrame | None = None
        self._joined: pd.DataFrame | None = None
        self.emitted: list[pd.DataFrame] = []

    @staticmethod
    def _apply(cur: pd.DataFrame | None, batch: pd.DataFrame) -> pd.DataFrame:
        if cur is not None:
            batch = pd.concat([cur.assign(delete=False), batch], ignore_index=True)
        allrows = batch.sort_values("stamp", kind="mergesort")
        allrows["delete"] = allrows["delete"].fillna(False).astype(bool)
        latest = allrows.groupby("key", as_index=False).last()
        return latest[~latest["delete"]][["key", "value", "stamp"]]

    def update(
        self, left_batch: pd.DataFrame | None, right_batch: pd.DataFrame | None
    ) -> pd.DataFrame:
        """Apply one micro-batch per side (either may be None/empty); returns
        the emitted retract-stream rows."""
        if left_batch is not None and len(left_batch):
            self._left = self._apply(self._left, left_batch)
        if right_batch is not None and len(right_batch):
            self._right = self._apply(self._right, right_batch)

        if self._left is None or self._right is None:
            new_join = pd.DataFrame(columns=["key", "left_value", "right_value", "stamp"])
        else:
            j = self._left.merge(self._right, on="key", suffixes=("_l", "_r"))
            new_join = pd.DataFrame(
                {
                    "key": j["key"],
                    "left_value": j["value_l"],
                    "right_value": j["value_r"],
                    "stamp": j[["stamp_l", "stamp_r"]].max(axis=1),
                }
            )

        old = (
            self._joined
            if self._joined is not None
            else pd.DataFrame(columns=["key", "left_value", "right_value", "stamp"])
        )
        on = ["key", "left_value", "right_value"]
        merged = old.merge(new_join, on=on, how="outer", indicator=True, suffixes=("_old", "_new"))
        retracts = merged[merged["_merge"] == "left_only"]
        adds = merged[merged["_merge"] == "right_only"]
        out = pd.concat(
            [
                pd.DataFrame(
                    {
                        "key": retracts["key"],
                        "left_value": retracts["left_value"],
                        "right_value": retracts["right_value"],
                        "is_addition": False,
                    }
                ),
                pd.DataFrame(
                    {
                        "key": adds["key"],
                        "left_value": adds["left_value"],
                        "right_value": adds["right_value"],
                        "is_addition": True,
                    }
                ),
            ],
            ignore_index=True,
        )
        self._joined = new_join
        self.emitted.append(out)
        return out
