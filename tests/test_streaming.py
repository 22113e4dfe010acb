"""Structured Streaming parity tests (SURVEY §2.8, Phase 3).

All tests use file sources with Trigger.AvailableNow + memory/parquet sinks —
in-process, deterministic, mirroring the reference's in-memory operator tests
(InMemStorage-based suites).
"""

import os
import time
from datetime import datetime, timezone

import pytest

from pyspark.sql import Row, functions as F

from proxima_platform_spark.changelog import CHANGELOG_SCHEMA
from proxima_platform_spark.catalog.descriptors import (
    AccessType,
    AttributeFamilyDescriptor,
    StorageType,
)
from proxima_platform_spark.streaming.cached_view import CachedView
from proxima_platform_spark.streaming.replication import (
    ReplicationController,
    ReplicationTarget,
    rename_transform,
)
from proxima_platform_spark.streaming.stateful import (
    distinct_within_watermark,
    integrate_per_key_stream,
)


def ts(ms: int) -> datetime:
    return datetime.fromtimestamp(ms / 1000, tz=timezone.utc)


def element(entity, key, attribute, stamp_ms, value=None, delete=False, delete_wildcard=False, seq_id=None):
    base = attribute.split(".", 1)[0] + ".*" if "." in attribute else attribute
    return Row(
        entity=entity, key=key, attribute=attribute, attribute_base=base,
        seq_id=seq_id, uuid=None, stamp=ts(stamp_ms),
        delete=delete or delete_wildcard, delete_wildcard=delete_wildcard,
        value=value.encode() if isinstance(value, str) else value,
    )


class TestWindowedStreamingAgg:
    def test_tumbling_window_append_mode(self, spark, tmp_path):
        """Windowed agg on a stream with watermark — closed windows emit in
        append mode once the watermark passes (SURVEY §2.4)."""
        src = str(tmp_path / "src")
        rows1 = [(1, ts(500), 1.0), (2, ts(900), 2.0)]
        rows2 = [(3, ts(1500), 4.0)]
        rows3 = [(4, ts(10_000), 8.0)]  # sentinel advancing the watermark
        schema = "id long, ts timestamp, value double"
        for i, rows in enumerate([rows1, rows2, rows3]):
            # one file per micro-batch: multi-part writes would split across
            # triggers in arbitrary mtime order and late-drop rows
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(f"{src}/f{i}")
            time.sleep(0.05)

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/f*")
        )
        agg = (
            stream.withWatermark("ts", "0 seconds")
            .groupBy(F.window("ts", "1 second"))
            .agg(F.sum("value").alias("total"))
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("win_agg")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.window.start.second, r.total)
            for r in spark.sql("SELECT * FROM win_agg").collect()
        }
        # windows [0,1) and [1,2) closed by the sentinel; [10,11) still open
        assert (0, 3.0) in got and (1, 4.0) in got
        assert all(s != 10 for s, _ in got)


class TestReplication:
    def test_fanout_with_filter_and_rename(self, spark, tmp_path):
        """ReplicationController: one source commit log → replica family with
        StorageFilter + proxy rename (ReplicationController.java, replication.md)."""
        src = str(tmp_path / "commit-log")
        spark.createDataFrame(
            [
                element("user", "u1", "clicks", 1000, "a"),
                element("user", "u2", "views", 2000, "b"),
                element("user", "u3", "clicks", 3000, "c"),
            ],
            CHANGELOG_SCHEMA,
        ).write.parquet(src)

        stream = spark.readStream.schema(CHANGELOG_SCHEMA).parquet(src)
        replica = AttributeFamilyDescriptor(
            name="clicks-replica",
            entity="user",
            attributes=("clicks_renamed",),
            storage_uri=f"parquet://{tmp_path}/replica",
            storage_type=StorageType.REPLICA,
            access=frozenset({AccessType.BATCH_UPDATES}),
        )
        ctl = ReplicationController(stream, checkpoint_root=str(tmp_path / "ckpt"))
        ctl.replicate(
            ReplicationTarget(
                family=replica,
                storage_filter=F.col("attribute") == "clicks",
                transformations=(rename_transform({"clicks": "clicks_renamed"}),),
            )
        )
        ctl.await_all(120)

        out = spark.read.parquet(f"{tmp_path}/replica")
        rows = {(r.key, r.attribute) for r in out.collect()}
        assert rows == {("u1", "clicks_renamed"), ("u3", "clicks_renamed")}


class TestCachedView:
    def test_update_get_time_travel(self, spark, tmp_path):
        """CachedView MVCC semantics: latest value, time travel, wildcard
        tombstone (LocalCachedPartitionedView.java:99-121,268-286)."""
        view = CachedView(spark, str(tmp_path / "view"))
        batch1 = spark.createDataFrame(
            [
                element("user", "u1", "score", 1000, "10"),
                element("user", "u1", "device.a", 1000, "phone"),
            ],
            CHANGELOG_SCHEMA,
        )
        view.update(batch1, 0)
        batch2 = spark.createDataFrame(
            [
                element("user", "u1", "score", 2000, "20"),
                element("user", "u1", "device.*", 1500, None, delete_wildcard=True),
                element("user", "u1", "device.b", 2000, "tablet"),
            ],
            CHANGELOG_SCHEMA,
        )
        view.update(batch2, 1)

        assert bytes(view.get("u1", "score").value).decode() == "20"
        # time travel to before the second batch
        assert bytes(view.get("u1", "score", stamp=ts(1500)).value).decode() == "10"
        # wildcard tombstone at 1500 kills device.a (1000), keeps device.b (2000)
        wild = view.scan_wildcard("u1", "device.")
        assert [(r.attribute, bytes(r.value).decode()) for r in wild] == [
            ("device.b", "tablet")
        ]
        # versions retained
        assert view.current_version() == 2


class TestStreamingDedup:
    def test_drop_duplicates_within_watermark(self, spark, tmp_path):
        src = str(tmp_path / "dup-src")
        schema = "id long, ts timestamp, k string"
        spark.createDataFrame(
            [(1, ts(1000), "a"), (2, ts(1100), "a"), (3, ts(1200), "b")], schema
        ).write.parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        dedup = distinct_within_watermark(stream, stamp="ts", delay="1 minute", subset=["k"])
        q = (
            dedup.writeStream.format("memory").queryName("dedup_out")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = {r.k for r in spark.sql("SELECT k FROM dedup_out").collect()}
        assert got == {"a", "b"}
        assert spark.sql("SELECT count(*) n FROM dedup_out").first().n == 2


class TestStreamingIntegrate:
    def test_integrate_per_key_event_time_order(self, spark, tmp_path):
        """Streaming integratePerKey: out-of-order arrivals within a batch
        integrate in event-time order after the watermark passes
        (IntegrateDoFn:1498, sorted buffering BeamStream.java:1633-1677)."""
        src = str(tmp_path / "int-src")
        schema = "k string, ts timestamp, v double"
        # batch 1: out-of-order events for key a
        spark.createDataFrame(
            [("a", ts(2000), 2.0), ("a", ts(1000), 1.0), ("b", ts(1000), 5.0)], schema
        ).coalesce(1).write.parquet(f"{src}/f0")
        time.sleep(0.05)
        # batch 2: watermark-advancing sentinel far in the future
        spark.createDataFrame([("z", ts(10_000_000), 0.0)], schema).coalesce(1).write.parquet(
            f"{src}/f1"
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/f*")
        )
        out = integrate_per_key_stream(
            stream, key="k", value="v", stamp="ts", watermark_delay="0 seconds"
        )
        q = (
            out.writeStream.format("memory").queryName("integ_out")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT key, integrated FROM integ_out").collect()
        got = {(r.key, r.integrated) for r in rows}
        # a: 1.0 then 3.0 (event-time order despite arrival order); b: 5.0
        assert {("a", 1.0), ("a", 3.0), ("b", 5.0)} <= got


class TestStreamStreamJoin:
    def test_windowed_stream_stream_join(self, spark, tmp_path):
        """Per-window equi join of two streams: window column in the join key
        + watermarks on both sides (SURVEY §2.6 — the streaming mapping of
        BeamWindowedStream.join:371-404)."""
        left_src, right_src = str(tmp_path / "l"), str(tmp_path / "r")
        schema = "k string, ts timestamp, v double"
        spark.createDataFrame(
            [("a", ts(500), 1.0), ("b", ts(700), 2.0), ("a", ts(1500), 3.0)],
            schema,
        ).coalesce(1).write.parquet(left_src)
        spark.createDataFrame(
            [("a", ts(600), 10.0), ("a", ts(1600), 30.0), ("c", ts(800), 99.0)],
            schema,
        ).coalesce(1).write.parquet(right_src)

        def windowed(path):
            s = spark.readStream.schema(schema).parquet(path)
            return s.withWatermark("ts", "0 seconds").select(
                "k", "v", F.window("ts", "1 second").alias("w")
            )

        l = windowed(left_src).withColumnRenamed("v", "lv")
        r = windowed(right_src).withColumnRenamed("v", "rv")
        joined = l.join(r, on=["k", "w"], how="inner")

        q = (
            joined.writeStream.format("memory")
            .queryName("ss_join")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.k, r.lv, r.rv)
            for r in spark.sql("SELECT * FROM ss_join").collect()
        }
        # same key AND same tumbling window only; 'b'/'c' have no partner
        assert got == {("a", 1.0, 10.0), ("a", 3.0, 30.0)}
