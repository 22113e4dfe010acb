"""Retract-join semantics (reference: beam/core/.../transforms/retract/
RetractJoin.java:57-363 — most-recent value per key per side; updates retract
previously-emitted joins; deletes retract without adding)."""

from datetime import datetime, timezone

import pandas as pd
import pytest

from proxima_platform_spark.operators.retract import (
    retract_join_batch,
    retract_join_stream,
)


def ts(ms):
    return datetime.fromtimestamp(ms / 1000, tz=timezone.utc)


def changelog(spark, rows):
    return spark.createDataFrame(
        rows, "key string, value string, stamp timestamp, delete boolean"
    )


class TestRetractJoinBatch:
    def test_update_emits_retraction(self, spark):
        """L: k=a v1@1000, v2@3000; R: k=a w1@2000 →
        add (v1,w1)@2000, retract (v1,w1)@3000, add (v2,w1)@3000."""
        left = changelog(spark, [("a", "v1", ts(1000), False), ("a", "v2", ts(3000), False)])
        right = changelog(spark, [("a", "w1", ts(2000), False)])
        out = retract_join_batch(
            left, right,
            left_key="key", right_key="key",
            left_value="value", right_value="value",
            left_delete="delete", right_delete="delete",
        )
        got = [
            (r.left_value, r.right_value, r.is_addition)
            for r in out.orderBy("stamp", "is_addition").collect()
        ]
        assert got == [("v1", "w1", True), ("v1", "w1", False), ("v2", "w1", True)]

    def test_delete_retracts_without_adding(self, spark):
        left = changelog(spark, [("a", "v1", ts(1000), False), ("a", None, ts(3000), True)])
        right = changelog(spark, [("a", "w1", ts(2000), False)])
        out = retract_join_batch(
            left, right,
            left_key="key", right_key="key",
            left_value="value", right_value="value",
            left_delete="delete", right_delete="delete",
        )
        got = [
            (r.left_value, r.right_value, r.is_addition)
            for r in out.orderBy("stamp", "is_addition").collect()
        ]
        assert got == [("v1", "w1", True), ("v1", "w1", False)]

    def test_no_counterpart_no_output(self, spark):
        left = changelog(spark, [("a", "v1", ts(1000), False)])
        right = changelog(spark, [("b", "w1", ts(2000), False)])
        out = retract_join_batch(
            left, right,
            left_key="key", right_key="key",
            left_value="value", right_value="value",
        )
        assert out.count() == 0

    def test_both_sides_update(self, spark):
        """Right side updating also retracts (symmetry)."""
        left = changelog(spark, [("a", "v1", ts(1000), False)])
        right = changelog(
            spark, [("a", "w1", ts(2000), False), ("a", "w2", ts(4000), False)]
        )
        out = retract_join_batch(
            left, right,
            left_key="key", right_key="key",
            left_value="value", right_value="value",
        )
        got = [
            (r.left_value, r.right_value, r.is_addition)
            for r in out.orderBy("stamp", "is_addition").collect()
        ]
        assert got == [
            ("v1", "w1", True),
            ("v1", "w1", False),
            ("v1", "w2", True),
        ]


class TestRetractJoinStream:
    """Distributed streaming form: per-key (L, R) latest state lives in the
    Spark state store (applyInPandasWithState), not on the driver — parity
    with the reference's worker-kept keyed state (RetractJoin.java:57-363)."""

    SCHEMA = "key string, value string, stamp timestamp, delete boolean"

    def test_stream_matches_batch_replay(self, spark, tmp_path):
        """≥2 time-ordered micro-batches through the streaming form produce
        exactly the adds/retracts of the batch per-element replay."""
        l_rows_b1 = [("a", "v1", ts(1000), False)]
        r_rows_b1 = [("a", "w1", ts(2000), False)]
        l_rows_b2 = [("a", "v2", ts(3000), False), ("a", None, ts(5000), True)]
        r_rows_b2 = [("a", "w2", ts(4000), False)]

        l_src, r_src = str(tmp_path / "l"), str(tmp_path / "r")
        for src, batches in ((l_src, (l_rows_b1, l_rows_b2)), (r_src, (r_rows_b1, r_rows_b2))):
            for i, rows in enumerate(batches):
                spark.createDataFrame(rows, self.SCHEMA).coalesce(1).write.parquet(
                    f"{src}/f{i}"
                )

        def file_stream(src):
            return (
                spark.readStream.schema(self.SCHEMA)
                .option("maxFilesPerTrigger", "1")
                .parquet(f"{src}/f*")
            )

        out = retract_join_stream(
            file_stream(l_src), file_stream(r_src),
            left_key="key", right_key="key",
            left_value="value", right_value="value",
            left_delete="delete", right_delete="delete",
            watermark_delay="0 seconds",
        )
        q = (
            out.writeStream.format("memory").queryName("retract_stream_out")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        batches_with_rows = sum(
            1 for p in q.recentProgress if p["numInputRows"] > 0
        )
        assert batches_with_rows >= 2, "must exercise cross-batch state carry-over"

        got = spark.sql(
            "SELECT key, left_value, right_value, stamp, is_addition "
            "FROM retract_stream_out"
        )
        expect = retract_join_batch(
            changelog(spark, l_rows_b1 + l_rows_b2),
            changelog(spark, r_rows_b1 + r_rows_b2),
            left_key="key", right_key="key",
            left_value="value", right_value="value",
            left_delete="delete", right_delete="delete",
        )

        def canon(df):
            return sorted(
                (r.key, r.left_value, r.right_value, r.stamp, r.is_addition)
                for r in df.collect()
            )

        assert canon(got) == canon(expect)
        assert got.count() == 6

    def test_out_of_order_across_batches_matches_batch_replay(self, spark, tmp_path):
        """Regression (r02 review): a row arriving one micro-batch LATER than
        a higher-stamped row — legal within the watermark bound — must apply
        in global (stamp, seq) order, not arrival order. Without the
        watermark buffer, L v1@1000 arriving after L v2@5000 was applied as
        if newest, leaving stale state and emitting wrong retractions."""
        # batch 1: the NEWER left row + a right row; batch 2: an OLDER left
        # row whose stamp is still above batch 1's watermark (10s delay)
        l_rows_b1 = [("a", "v2", ts(5000), False)]
        r_rows_b1 = [("a", "w1", ts(2000), False)]
        l_rows_b2 = [("a", "v1", ts(1000), False)]
        # w2 is the interesting event; the single-sided "zz" sentinel only
        # pushes the final watermark past w2 so it flushes before stream end
        r_rows_b2 = [("a", "w2", ts(60_000), False), ("zz", "s", ts(120_000), False)]

        l_src, r_src = str(tmp_path / "l2"), str(tmp_path / "r2")
        for src, batches in ((l_src, (l_rows_b1, l_rows_b2)), (r_src, (r_rows_b1, r_rows_b2))):
            for i, rows in enumerate(batches):
                spark.createDataFrame(rows, self.SCHEMA).coalesce(1).write.parquet(
                    f"{src}/f{i}"
                )

        def file_stream(src):
            return (
                spark.readStream.schema(self.SCHEMA)
                .option("maxFilesPerTrigger", "1")
                .parquet(f"{src}/f*")
            )

        out = retract_join_stream(
            file_stream(l_src), file_stream(r_src),
            left_key="key", right_key="key",
            left_value="value", right_value="value",
            left_delete="delete", right_delete="delete",
            watermark_delay="10 seconds",
        )
        q = (
            out.writeStream.format("memory").queryName("retract_ooo_out")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

        got = spark.sql(
            "SELECT key, left_value, right_value, stamp, is_addition FROM retract_ooo_out"
        )
        expect = retract_join_batch(
            changelog(spark, l_rows_b1 + l_rows_b2),
            changelog(spark, r_rows_b1 + r_rows_b2),
            left_key="key", right_key="key",
            left_value="value", right_value="value",
            left_delete="delete", right_delete="delete",
        )

        def canon(df):
            return sorted(
                (r.key, r.left_value, r.right_value, r.stamp, r.is_addition)
                for r in df.collect()
            )

        assert canon(got) == canon(expect)
        # the final joined state must reflect v2 (newest by STAMP), i.e. the
        # last addition for w2 pairs with v2, not the late-arriving v1
        adds = [r for r in canon(got) if r[4]]
        assert adds[-1][1] == "v2"

    def test_schemas_union_compatible(self, spark, tmp_path):
        """Both forms share RETRACT_SCHEMA (incl. stamp) — unionByName works."""
        batch_out = retract_join_batch(
            changelog(spark, [("a", "v1", ts(1000), False)]),
            changelog(spark, [("a", "w1", ts(2000), False)]),
            left_key="key", right_key="key",
            left_value="value", right_value="value",
        )
        src = str(tmp_path / "u")
        spark.createDataFrame(
            [("a", "v1", ts(1000), False)], self.SCHEMA
        ).write.parquet(f"{src}/f0")
        stream_out = retract_join_stream(
            spark.readStream.schema(self.SCHEMA).parquet(f"{src}/f*"),
            spark.readStream.schema(self.SCHEMA).parquet(f"{src}/f*"),
            left_key="key", right_key="key",
            left_value="value", right_value="value",
        )
        assert [f.name for f in stream_out.schema.fields] == [
            f.name for f in batch_out.schema.fields
        ]
        assert [f.dataType for f in stream_out.schema.fields] == [
            f.dataType for f in batch_out.schema.fields
        ]

    def test_event_time_timer_flushes_quiet_key(self, spark, tmp_path):
        """Held rows for a key that receives NO further input must still
        flush when the watermark advances past their stamps — the
        state.setTimeoutTimestamp wakeup path (analog of the reference's
        event-time timer in RetractJoin; the property suite only covers
        keys that keep receiving data)."""
        # batch 0: key "a" only — wm is 0 during the batch, so both rows are
        # held in state. Key "a" NEVER appears again.
        l_b0 = [("a", "v1", ts(1000), False)]
        r_b0 = [("a", "w1", ts(2000), False)]
        # batches 1..2: key "b" only — each advances the watermark; key "a"'s
        # held rows can only flush via its registered event-time timer.
        l_b1 = [("b", "x1", ts(10_000), False)]
        r_b1 = [("b", "y1", ts(10_000), False)]
        l_b2 = [("b", "x2", ts(20_000), False)]
        r_b2 = [("b", "y2", ts(20_000), False)]

        l_src, r_src = str(tmp_path / "l"), str(tmp_path / "r")
        for src, batches in (
            (l_src, (l_b0, l_b1, l_b2)),
            (r_src, (r_b0, r_b1, r_b2)),
        ):
            for i, rows in enumerate(batches):
                spark.createDataFrame(rows, self.SCHEMA).coalesce(1).write.parquet(
                    f"{src}/f{i}"
                )

        def file_stream(src):
            return (
                spark.readStream.schema(self.SCHEMA)
                .option("maxFilesPerTrigger", "1")
                .parquet(f"{src}/f*")
            )

        out = retract_join_stream(
            file_stream(l_src), file_stream(r_src),
            left_key="key", right_key="key",
            left_value="value", right_value="value",
            left_delete="delete", right_delete="delete",
            watermark_delay="0 seconds",
        )
        q = (
            out.writeStream.format("memory").queryName("retract_timer_out")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

        got = spark.sql(
            "SELECT key, left_value, right_value, stamp, is_addition "
            "FROM retract_timer_out"
        )
        a_rows = sorted(
            (r.left_value, r.right_value, r.stamp, r.is_addition)
            for r in got.where("key = 'a'").collect()
        )
        # the quiet key's join output exists and is exactly the batch replay
        assert a_rows == [("v1", "w1", ts(2000).replace(tzinfo=None), True)]

        expect = retract_join_batch(
            changelog(spark, l_b0 + l_b1 + l_b2),
            changelog(spark, r_b0 + r_b1 + r_b2),
            left_key="key", right_key="key",
            left_value="value", right_value="value",
            left_delete="delete", right_delete="delete",
        )

        def canon(df):
            return sorted(
                (r.key, r.left_value, r.right_value, r.stamp, r.is_addition)
                for r in df.collect()
            )

        assert canon(got) == canon(expect)
