"""Changelog → snapshot semantics (FIXTURES.md §B1-B3; reference:
docs/.../book/datamodel.md:100-149, LocalCachedPartitionedView.java:268-286,
TimeBoundedVersionedCache.java:214)."""

from datetime import datetime, timezone

import pytest

from pyspark.sql import Row, functions as F

from proxima_platform_spark.changelog import (
    CHANGELOG_SCHEMA,
    compact,
    snapshot,
    to_changelog,
)


def ts(ms: int) -> datetime:
    return datetime.fromtimestamp(ms / 1000, tz=timezone.utc)


from conftest import changelog_element as element


def make_changelog(spark, rows):
    return spark.createDataFrame(rows, CHANGELOG_SCHEMA)


def snap_keys(df):
    return {
        (r.entity, r.key, r.attribute, r.value and bytes(r.value).decode())
        for r in df.collect()
    }


class TestDatamodelCompaction:
    """B1 — the datamodel doc's worked example (datamodel.md:100-149)."""

    def fixture(self, spark):
        rows = [
            element("user", "other", "details", 1234567890000, "v0"),
            element("product", "car", "details", 1234567880100, "v1"),
            element("product", "book", "category.books", 1234567870000, "v2"),
            element("user", "me", "details", 1234567890500, "v3"),
            element("user", "you", "preferences", 1234567890400, "v4"),
            element("event", "uuid-1", "data", 1234567890900, "v5"),
            element("user", "other", "details", 1234567890300, None, delete=True),
            element(
                "product", "book", "category.*", 1234567890900, None, delete_wildcard=True
            ),
        ]
        return make_changelog(spark, rows)

    def test_snapshot_matches_reference_doc(self, spark):
        result = snap_keys(snapshot(self.fixture(spark)))
        assert result == {
            ("product", "car", "details", "v1"),
            ("user", "me", "details", "v3"),
            ("user", "you", "preferences", "v4"),
            ("event", "uuid-1", "data", "v5"),
        }

    def test_snapshot_before_delete_keeps_row(self, spark):
        """Time travel: snapshot at T before the delete sees the old value."""
        result = snap_keys(snapshot(self.fixture(spark), at=F.lit(ts(1234567890200))))
        assert ("user", "other", "details", "v0") in result
        assert ("product", "book", "category.books", "v2") in result

    def test_compact_keeps_tombstones(self, spark):
        compacted = compact(self.fixture(spark))
        deletes = compacted.where("delete").count()
        assert deletes == 2  # delete + deleteWildcard survive compaction


class TestWildcardTombstone:
    """B2 — stamp >= tombstone survives (LocalCachedPartitionedView:268-286)."""

    def test_equal_stamp_survives(self, spark):
        rows = [
            element("e", "k", "a.x", 100, "x"),
            element("e", "k", "a.*", 200, None, delete_wildcard=True),
            element("e", "k", "a.y", 200, "y"),
            element("e", "k", "a.z", 300, "z"),
        ]
        result = snap_keys(snapshot(make_changelog(spark, rows)))
        assert result == {("e", "k", "a.y", "y"), ("e", "k", "a.z", "z")}


class TestEqualStampTiebreak:
    """B3 — equal stamp resolves by seq_id (TimeBoundedVersionedCache:214)."""

    def test_higher_seq_id_wins(self, spark):
        rows = [
            element("e", "k", "a", 100, "first", seq_id=1),
            element("e", "k", "a", 100, "second", seq_id=2),
        ]
        result = snap_keys(snapshot(make_changelog(spark, rows)))
        assert result == {("e", "k", "a", "second")}


class TestToChangelog:
    def test_maps_arbitrary_df(self, spark):
        df = spark.createDataFrame(
            [(7, "click", 1.5, ts(1000))], "user_id long, et string, v double, t timestamp"
        )
        out = to_changelog(
            df,
            entity="user",
            key="user_id",
            attribute="et",
            stamp="t",
            value=F.to_binary(F.col("v").cast("string"), F.lit("utf-8")),
        )
        row = out.collect()[0]
        assert row.entity == "user" and row.key == "7" and row.attribute == "click"
        assert row.attribute_base == "click" and not row.delete

    def test_wildcard_attribute_base(self, spark):
        df = spark.createDataFrame([("k1", "device.mobile", ts(1))], "k string, a string, t timestamp")
        out = to_changelog(df, entity="user", key="k", attribute="a", stamp="t")
        assert out.collect()[0].attribute_base == "device.*"


class TestSnapshotMap:
    """Wildcard attribute in MapType snapshot form (SURVEY §1.1:
    datamodel.md:92-99 models a wildcard as an unbounded key→value map)."""

    def fixture(self, spark):
        rows = [
            element("product", "book", "category.fiction", 1000, "f"),
            element("product", "book", "category.scifi", 2000, "s"),
            element("product", "book", "category.scifi", 3000, "s2"),  # upsert
            element("product", "car", "category.auto", 1000, "a"),
            element("product", "car", "category.auto", 2000, None, delete=True),
            element("product", "car", "details", 1000, "ignored-scalar"),
        ]
        return make_changelog(spark, rows)

    def test_map_form(self, spark):
        from proxima_platform_spark.changelog import snapshot_map

        snap = snapshot(self.fixture(spark))
        got = {
            r.key: {k: bytes(v).decode() for k, v in r.category.items()}
            for r in snapshot_map(snap, "category.*").collect()
        }
        # book: latest per suffix; car: its only instance was deleted, and
        # the scalar "details" attribute never leaks into the map
        assert got == {"book": {"fiction": "f", "scifi": "s2"}}

    def test_deterministic_entry_order(self, spark):
        from proxima_platform_spark.changelog import snapshot_map

        snap = snapshot(self.fixture(spark))
        rows = snapshot_map(snap, "category.*").collect()
        keys = [list(r.category.keys()) for r in rows]
        assert all(k == sorted(k) for k in keys)


class TestVacuumChangelog:
    def _clog(self, spark):
        import datetime as dt

        from proxima_platform_spark.changelog import to_changelog

        rows = [
            # (key, attr, seq, stamp_s, value, delete)
            (1, "a", 1, 10, "v1", False),
            (1, "a", 2, 20, "v2", False),
            (1, "a", 3, 30, "v3", False),
            (1, "b", 4, 15, "w1", False),
            (2, "a", 5, 40, "x1", True),  # newest is a delete tombstone
            (2, "a", 6, 5, "x0", False),
        ]
        df = spark.createDataFrame(
            [
                (k, a, s, dt.datetime(2024, 1, 1, 0, 0, t), v, d)
                for k, a, s, t, v, d in rows
            ],
            "k long, a string, seq long, ts timestamp, v string, del boolean",
        )
        from pyspark.sql import functions as F

        return to_changelog(
            df, entity="e", key="k", attribute="a", stamp="ts",
            value=F.encode("v", "UTF-8"), seq_id="seq", delete=F.col("del"),
        )

    def test_keeps_newest_k_and_snapshot_invariant(self, spark):
        from proxima_platform_spark.changelog import snapshot, vacuum_changelog

        clog = self._clog(spark)
        for k in (1, 2, 3):
            kept = vacuum_changelog(clog, keep_versions=k)
            per_cell = (
                kept.groupBy("key", "attribute").count().collect()
            )
            assert all(r["count"] <= k for r in per_cell)
            # the retention invariant: snapshot is unchanged
            a = sorted(
                (r.key, r.attribute, bytes(r.value))
                for r in snapshot(clog).collect()
            )
            b = sorted(
                (r.key, r.attribute, bytes(r.value))
                for r in snapshot(kept).collect()
            )
            assert a == b, k
        kept1 = vacuum_changelog(clog, keep_versions=1)
        assert sorted(r.seq_id for r in kept1.collect()) == [3, 4, 5]

    def test_ttl_drops_old_non_newest_only(self, spark):
        from proxima_platform_spark.changelog import vacuum_changelog

        clog = self._clog(spark)
        # now = 60s after epoch day start; ttl = 25s → cutoff at 35s:
        # only stamps >= 35s survive EXCEPT each cell's newest (always kept)
        base_ms = 1704067200000  # 2024-01-01T00:00:00Z
        kept = vacuum_changelog(
            clog, keep_versions=3, ttl_ms=25_000, now_ms=base_ms + 60_000
        )
        assert sorted(r.seq_id for r in kept.collect()) == [3, 4, 5]

    def test_rejects_bad_args(self, spark):
        import pytest as _pytest

        from proxima_platform_spark.changelog import vacuum_changelog

        clog = self._clog(spark)
        with _pytest.raises(ValueError):
            vacuum_changelog(clog, keep_versions=0)
        with _pytest.raises(ValueError):
            vacuum_changelog(clog, ttl_ms=1000)  # now_ms required


class TestEraseKeys:
    def _clog(self, spark):
        import datetime as dt

        from pyspark.sql import functions as F

        from proxima_platform_spark.changelog import to_changelog

        rows = [
            (1, "a", 1, 10, "v1"), (1, "a", 2, 20, "v2"), (1, "b", 3, 15, "w"),
            (2, "a", 4, 40, "x"), (3, "a", 5, 30, "y"),
        ]
        df = spark.createDataFrame(
            [(k, a, s, dt.datetime(2024, 1, 1, 0, 0, t), v) for k, a, s, t, v in rows],
            "k long, a string, seq long, ts timestamp, v string",
        )
        return to_changelog(
            df, entity="e", key="k", attribute="a", stamp="ts",
            value=F.encode("v", "UTF-8"), seq_id="seq",
        )

    def test_erased_gone_others_untouched_tombstones_visible(self, spark):
        from pyspark.sql import functions as F

        from proxima_platform_spark.changelog import erase_keys, snapshot

        clog = self._clog(spark)
        keys = spark.createDataFrame([("1",)], "key string")
        erased = erase_keys(clog, keys, erase_stamp_us=1706000000000000)
        # no payload rows for key 1 remain anywhere in the changelog
        remaining = erased.where((F.col("key") == "1") & ~F.col("delete"))
        assert remaining.count() == 0
        # tombstones: one per erased cell, winning seq order
        tombs = {
            (r.attribute, r.seq_id)
            for r in erased.where((F.col("key") == "1") & F.col("delete")).collect()
        }
        assert tombs == {("a", 3), ("b", 4)}  # max erased seq + 1 per cell
        # snapshot: erased key absent, others identical to pre-erasure
        snap = {(r.key, r.attribute): bytes(r.value) for r in snapshot(erased).collect()}
        want = {
            (r.key, r.attribute): bytes(r.value)
            for r in snapshot(clog).collect()
            if r.key != "1"
        }
        assert snap == want and ("2", "a") in snap

    def test_changelog_stays_valid_for_replication(self, spark):
        # erase → snapshot and erase → compact → snapshot agree (the
        # tombstones behave like ordinary reference deletes)
        from proxima_platform_spark.changelog import compact, erase_keys, snapshot

        clog = self._clog(spark)
        keys = spark.createDataFrame([("1",), ("3",)], "key string")
        erased = erase_keys(clog, keys, erase_stamp_us=1706000000000000)
        a = sorted((r.key, r.attribute) for r in snapshot(erased).collect())
        b = sorted((r.key, r.attribute) for r in snapshot(compact(erased)).collect())
        assert a == b == [("2", "a")]


class TestSnapshotDiff:
    def test_added_updated_deleted(self, spark):
        import datetime as dt

        from pyspark.sql import functions as F

        from proxima_platform_spark.changelog import snapshot_diff, to_changelog

        rows = [
            # (key, attr, seq, second, value, delete)
            (1, "a", 1, 10, "v1", False),
            (1, "a", 2, 30, "v2", False),   # updated after t0
            (2, "a", 3, 5, "x", False),     # deleted after t0
            (2, "a", 4, 40, None, True),
            (3, "a", 5, 35, "new", False),  # added after t0
            (4, "a", 6, 12, "same", False), # unchanged → excluded
        ]
        df = spark.createDataFrame(
            [
                (k, a, s, dt.datetime(2024, 1, 1, 0, 0, t), v, d)
                for k, a, s, t, v, d in rows
            ],
            "k long, a string, seq long, ts timestamp, v string, del boolean",
        )
        clog = to_changelog(
            df, entity="e", key="k", attribute="a", stamp="ts",
            value=F.encode("v", "UTF-8"), seq_id="seq", delete=F.col("del"),
        )
        t0 = dt.datetime(2024, 1, 1, 0, 0, 20)
        t1 = dt.datetime(2024, 1, 1, 0, 1, 0)
        got = {
            (r.key, r.attribute): (
                r.status,
                bytes(r.value_from) if r.value_from else None,
                bytes(r.value_to) if r.value_to else None,
            )
            for r in snapshot_diff(
                clog, at_from=F.lit(t0), at_to=F.lit(t1)
            ).collect()
        }
        assert got == {
            ("1", "a"): ("updated", b"v1", b"v2"),
            ("2", "a"): ("deleted", b"x", None),
            ("3", "a"): ("added", None, b"new"),
        }


class TestHistoryIntervals:
    """SCD2 validity intervals (changelog.history_intervals): half-open
    [valid_from, valid_to) per cell version; deletes and wildcard
    tombstones close intervals; is_current rows == snapshot()."""

    def _hist(self, spark, rows):
        from proxima_platform_spark.changelog import history_intervals

        return {
            (
                r.key, r.attribute,
                r.value and bytes(r.value).decode(),
                int(r.valid_from.timestamp() * 1000),
                r.valid_to and int(r.valid_to.timestamp() * 1000),
                r.is_current,
            )
            for r in history_intervals(make_changelog(spark, rows)).collect()
        }

    def test_upsert_delete_and_wildcard_close_intervals(self, spark):
        rows = [
            element("e", "k", "a.x", 100, "v1", seq_id=1),
            element("e", "k", "a.x", 200, "v2", seq_id=2),   # closes v1
            element("e", "k", "a.y", 150, "w1", seq_id=3),
            element("e", "k", "a.*", 300, None, delete_wildcard=True, seq_id=4),
            element("e", "k", "a.y", 300, "w2", seq_id=5),   # same-stamp write survives
            element("e", "k", "b", 100, "b1", seq_id=6),
            element("e", "k", "b", 250, None, delete=True, seq_id=7),
            element("e", "k", "b", 400, "b2", seq_id=8),     # reopens after delete
        ]
        assert self._hist(spark, rows) == {
            ("k", "a.x", "v1", 100, 200, False),
            ("k", "a.x", "v2", 200, 300, False),   # closed by the tombstone
            ("k", "a.y", "w1", 150, 300, False),
            ("k", "a.y", "w2", 300, None, True),   # stamp == tombstone survives
            ("k", "b", "b1", 100, 250, False),     # closed by direct delete
            ("k", "b", "b2", 400, None, True),
        }

    def test_equal_stamp_seq_tiebreak(self, spark):
        rows = [
            element("e", "k", "a", 100, "first", seq_id=1),
            element("e", "k", "a", 100, "second", seq_id=2),
        ]
        assert self._hist(spark, rows) == {
            ("k", "a", "first", 100, 100, False),  # zero-length interval
            ("k", "a", "second", 100, None, True),
        }

    def test_is_current_equals_snapshot(self, spark):
        """The datamodel worked-example fixture: current intervals must
        reproduce snapshot() cell-for-cell."""
        from proxima_platform_spark.changelog import history_intervals

        rows = TestDatamodelCompaction().fixture(spark)
        cur = {
            (r.entity, r.key, r.attribute, r.value and bytes(r.value).decode())
            for r in history_intervals(rows).where("is_current").collect()
        }
        assert cur == snap_keys(snapshot(rows))
