"""Incremental view maintenance (operators/ivm.py): the incremental
aggregate must be BIT-equal to a full snapshot recompute — including under
updates, inserts, deletes, and wildcard tombstones, which exercise the
retraction rule through the shared snapshot() semantics."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from proxima_platform_spark.changelog import snapshot, to_changelog
from proxima_platform_spark.operators.ivm import (
    cell_contributions,
    incremental_snapshot_agg,
)


def _clog(spark, rows):
    """rows: (key, attribute, stamp_ms, value, op) with op in
    ('upsert','delete','delete_wildcard')."""
    df = spark.createDataFrame(
        rows, "key string, attribute string, stamp_ms long, value double, op string"
    ).select(
        "key",
        "attribute",
        F.timestamp_millis(F.col("stamp_ms")).alias("ts"),
        "value",
        "op",
        F.monotonically_increasing_id().alias("seq"),
    )
    return to_changelog(
        df,
        entity="e",
        key="key",
        attribute="attribute",
        stamp="ts",
        value=F.encode(F.col("value").cast("string"), "UTF-8"),
        seq_id="seq",
        delete=F.col("op") == "delete",
        delete_wildcard=F.col("op") == "delete_wildcard",
    )


def VAL():
    return F.decode(F.col("value"), "UTF-8").cast("decimal(18,2)")


def _full(clog, at_ms):
    cells = snapshot(clog, at=F.timestamp_millis(F.lit(at_ms)))
    return {
        (r.attribute, r.n_cells, r.total)
        for r in cell_contributions(cells, VAL(), ["attribute"]).collect()
    }


def _incr(clog, t0_ms, t1_ms):
    ts0 = F.timestamp_millis(F.lit(t0_ms))
    ts1 = F.timestamp_millis(F.lit(t1_ms))
    base = snapshot(clog, at=ts0)
    delta = clog.where((F.col("stamp") > ts0) & (F.col("stamp") <= ts1))
    out = incremental_snapshot_agg(
        base, delta, group_cols=["attribute"], value=VAL()
    )
    return {(r.attribute, r.n_cells, r.total) for r in out.collect()}


class TestIvm:
    def test_updates_inserts_deletes(self, spark):
        rows = [
            # cell updated across the boundary: retract 1.00, add 5.00
            ("u1", "a", 100, 1.00, "upsert"),
            ("u1", "a", 900, 5.00, "upsert"),
            # untouched cell: contributes via base only
            ("u2", "a", 100, 2.25, "upsert"),
            # new cell in the delta window
            ("u3", "a", 800, 3.50, "upsert"),
            # cell deleted in the delta window: full retraction
            ("u4", "b", 100, 7.00, "upsert"),
            ("u4", "b", 700, 0.00, "delete"),
            # delete then re-insert inside the window: final value wins
            ("u5", "b", 200, 4.00, "upsert"),
            ("u5", "b", 600, 0.00, "delete"),
            ("u5", "b", 650, 9.75, "upsert"),
            # event after t1 must not leak in
            ("u1", "a", 2000, 99.0, "upsert"),
        ]
        clog = _clog(spark, rows)
        got = _incr(clog, 500, 1000)
        want = _full(clog, 1000)
        assert got == want
        # and the values are the obviously-right ones
        assert got == {
            ("a", 3, Decimal("10.75")),  # 5.00 + 2.25 + 3.50
            ("b", 1, Decimal("9.75")),  # u4 deleted, u5 reborn
        }

    def test_group_vanishes_when_all_cells_deleted(self, spark):
        rows = [
            ("u1", "only", 100, 3.00, "upsert"),
            ("u1", "only", 700, 0.00, "delete"),
        ]
        clog = _clog(spark, rows)
        got = _incr(clog, 500, 1000)
        assert got == _full(clog, 1000) == set()

    def test_wildcard_tombstone_retracts_prefix(self, spark):
        rows = [
            ("u1", "m.x", 100, 1.00, "upsert"),
            ("u1", "m.y", 100, 2.00, "upsert"),
            # wildcard delete of u1's m.* inside the window
            ("u1", "m.*", 700, 0.00, "delete_wildcard"),
            # written after the tombstone stamp: survives
            ("u1", "m.z", 800, 4.00, "upsert"),
            ("u2", "m.x", 100, 8.00, "upsert"),
        ]
        clog = _clog(spark, rows)
        got = _incr(clog, 500, 1000)
        want = _full(clog, 1000)
        assert got == want

    def test_base_agg_passthrough(self, spark):
        """Steady-state deployment shape: feeding the materialized base
        aggregate gives the identical result (no recompute of base)."""
        rows = [
            ("u1", "a", 100, 1.50, "upsert"),
            ("u2", "a", 100, 2.50, "upsert"),
            ("u1", "a", 900, 9.00, "upsert"),
        ]
        clog = _clog(spark, rows)
        ts0 = F.timestamp_millis(F.lit(500))
        base = snapshot(clog, at=ts0)
        base_agg = cell_contributions(base, VAL(), ["attribute"])
        delta = clog.where(
            (F.col("stamp") > ts0)
            & (F.col("stamp") <= F.timestamp_millis(F.lit(1000)))
        )
        out = incremental_snapshot_agg(
            base, delta, group_cols=["attribute"], value=VAL(), base_agg=base_agg
        )
        assert {(r.attribute, r.n_cells, r.total) for r in out.collect()} == {
            ("a", 2, Decimal("11.50"))
        }

    def test_empty_delta_is_identity(self, spark):
        rows = [("u1", "a", 100, 1.00, "upsert")]
        clog = _clog(spark, rows)
        assert _incr(clog, 500, 1000) == _full(clog, 500) == _full(clog, 1000)

    def test_wildcard_only_in_window_with_no_tombstone_rescan(self, spark):
        """A wildcard tombstone whose prefix had cells ONLY in the base:
        the changed-cell detection must pick the tombstone row itself up
        as a delta row so base cells under the prefix retract."""
        rows = [
            ("u1", "m.x", 100, 5.00, "upsert"),
            ("u1", "m.*", 700, 0.00, "delete_wildcard"),
        ]
        clog = _clog(spark, rows)
        got = _incr(clog, 500, 1000)
        want = _full(clog, 1000)
        assert got == want
