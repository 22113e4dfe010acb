"""Retract-join semantics (reference: beam/core/.../transforms/retract/
RetractJoin.java:57-363 — most-recent value per key per side; updates retract
previously-emitted joins; deletes retract without adding)."""

from datetime import datetime, timezone

import pandas as pd
import pytest

from proxima_platform_spark.operators.retract import (
    RetractJoinMaintainer,
    retract_join_batch,
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


class TestRetractJoinMaintainer:
    def pdf(self, rows):
        return pd.DataFrame(rows, columns=["key", "value", "stamp", "delete"])

    def test_incremental_diffs(self, spark):
        m = RetractJoinMaintainer(spark)
        out1 = m.update(self.pdf([("a", "v1", 1000, False)]), self.pdf([("a", "w1", 1000, False)]))
        assert [(r.key, r.left_value, r.right_value, r.is_addition) for r in out1.itertuples()] == [
            ("a", "v1", "w1", True)
        ]
        # left updates → retract old pair, add new
        out2 = m.update(self.pdf([("a", "v2", 2000, False)]), None)
        got = sorted(
            (r.left_value, r.right_value, r.is_addition) for r in out2.itertuples()
        )
        assert got == [("v1", "w1", False), ("v2", "w1", True)]
        # right deletes → retract only
        out3 = m.update(None, self.pdf([("a", None, 3000, True)]))
        assert [(r.left_value, r.right_value, r.is_addition) for r in out3.itertuples()] == [
            ("v2", "w1", False)
        ]
