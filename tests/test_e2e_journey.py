"""The reference user's full journey, end to end on this engine.

Mirrors the README walkthrough a Proxima user follows (HOCON config →
console writes → commit log → replication → snapshot / random access /
cached view / windowed analytics), composed across module boundaries the
unit suites test in isolation. A user of the reference switching to this
repo runs exactly this flow.

Reference trail: core/src/test/resources/test-readme.conf (config),
GroovyEnv put/get/stream (tools/), ReplicationController
(direct/ingest-server/), LocalCachedPartitionedView (direct/core/),
PCollectionTools.reduceAsSnapshot (beam/core/).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from proxima_platform_spark.catalog.repository import Repository
from proxima_platform_spark.changelog import CHANGELOG_SCHEMA
from proxima_platform_spark.env import make_env
from proxima_platform_spark.streaming.cached_view import CachedView
from proxima_platform_spark.streaming.replication import (
    ReplicationController,
    ReplicationTarget,
    rename_transform,
)


def journey_conf(root: str) -> str:
    return (
        """
entities {
  user {
    attributes {
      # current account state, updated independently
      status { scheme: "string" }
      # per-device wildcard map
      "device.*" { scheme: "bytes" }
    }
  }
}

attributeFamilies {
  user-commit-log {
    entity: user
    attributes: [ "*" ]
    storage: "parquet://"${paths.root}/commit-log
    type: primary
    access: [ commit-log, batch-updates ]
  }
  status-replica {
    entity: user
    attributes: [ "status" ]
    storage: "parquet://"${paths.root}/replica
    type: replica
    access: [ read-only ]
  }
}

paths { root = """
        + f'"{root}"'
        + " }\n"
    )


@pytest.fixture()
def env_and_repo(spark, tmp_path):
    repo = Repository.from_hocon(journey_conf(str(tmp_path)))
    return make_env(repo, spark), repo, str(tmp_path)


class TestUserJourney:
    def test_full_flow(self, spark, env_and_repo):
        env, repo, root = env_and_repo

        # -- 1. console writes into the commit log (primary family) --------
        env.user.status.put("alice", b"active", stamp_ms=1_000)
        env.user.status.put("bob", b"active", stamp_ms=2_000)
        env.user.status.put("alice", b"idle", stamp_ms=5_000)
        env.user.device.put("alice", b"phone", stamp_ms=1_500, attribute="device.p1")
        env.user.device.put("alice", b"tablet", stamp_ms=2_500, attribute="device.t1")
        env.user.device.delete_all("alice", stamp_ms=2_000)  # tombstone < t1 only
        env.user.status.delete("bob", stamp_ms=9_000)

        # -- 2. snapshot = stream-table duality over the changelog ---------
        snap = env.user.status.batch_snapshot()
        state = {
            r.key: bytes(r.value).decode() for r in snap.collect() if not r.delete
        }
        assert state == {"alice": "idle"}  # bob deleted, alice latest wins

        # random access + wildcard scan resolve through the same compaction
        got = env.user.status.get("alice")
        assert bytes(got.value).decode() == "idle"
        devices = env.user.device.list("alice")
        assert [(r.attribute, bytes(r.value).decode()) for r in devices] == [
            ("device.t1", "tablet")  # p1 (1500) killed by tombstone at 2000
        ]

        # -- 3. replication: commit log -> filtered replica + cached view --
        stream = spark.readStream.schema(CHANGELOG_SCHEMA).parquet(
            f"{root}/commit-log"
        )
        view = CachedView(spark, f"{root}/view")
        ctl = ReplicationController(stream, checkpoint_root=f"{root}/ckpt")
        ctl.replicate(
            ReplicationTarget(
                family=repo.families["status-replica"],
                storage_filter=F.col("attribute_base") == "status",
            )
        )
        ctl.replicate_with("cached-view", view.update)
        ctl.await_all(120)

        replica = spark.read.parquet(f"{root}/replica")
        assert replica.where("attribute_base != 'status'").count() == 0
        assert replica.count() == 4  # 3 status upserts + 1 delete, no device rows

        # the cached view serves the same answers as the batch snapshot,
        # plus MVCC time travel to before the tombstone
        assert bytes(view.get("alice", "status").value).decode() == "idle"
        assert view.get("bob", "status") is None  # tombstoned
        import datetime as dt

        t1800 = dt.datetime.fromtimestamp(1.8, dt.timezone.utc)
        early = view.scan_wildcard("alice", "device.", stamp=t1800)
        assert [(r.attribute, bytes(r.value).decode()) for r in early] == [
            ("device.p1", "phone")
        ]

        # -- 4. analytics: windowed aggregation over the replayed stream ---
        counts = (
            env.user.status.stream_from_oldest()
            .filter(~F.col("delete"))
            .time_window(4_000)
            .count_by_key(F.col("key"), alias="n")
        )
        got = {
            (r.key, r.window_start.timestamp()): r.n
            for r in counts.withColumn(
                "window_start", F.col("window").getField("start")
            ).collect()
        }
        assert got == {("alice", 0.0): 1, ("bob", 0.0): 1, ("alice", 4.0): 1}


class TestStreamEnrichment:
    def test_foreachbatch_enrich_sees_evolving_view(self, spark, tmp_path):
        """Each micro-batch enriches against the view AS OF that batch —
        the reference reads its cached view from inside stream transforms
        (LocalCachedPartitionedView), which a pinned stream-static join
        cannot express."""
        from conftest import changelog_element as element  # canonical row builder

        view = CachedView(spark, str(tmp_path / "enrich-view"))
        view.update(
            spark.createDataFrame(
                [element("user", "u1", "status", 1000, "bronze")], CHANGELOG_SCHEMA
            ),
            0,
        )

        src = str(tmp_path / "events")
        for i, (key, ts_ms) in enumerate([("u1", 2000), ("u1", 3000)]):
            spark.createDataFrame(
                [(key, ts_ms)], "key string, ts_ms long"
            ).coalesce(1).write.parquet(f"{src}/f{i}")

        results = []

        def process(batch, batch_id):
            enriched = view.enrich(batch, attribute="status", value_alias="status")
            results.extend(
                (r.key, r.ts_ms, bytes(r.status).decode() if r.status else None)
                for r in enriched.collect()
            )
            # the view evolves BETWEEN batches; batch 2 must see 'gold'
            view.update(
                spark.createDataFrame(
                    [element("user", "u1", "status", 5000, "gold")], CHANGELOG_SCHEMA
                ),
                batch_id + 1,
            )

        q = (
            spark.readStream.schema("key string, ts_ms long")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/f*")
            .writeStream.foreachBatch(process)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        assert sorted(results) == [
            ("u1", 2000, "bronze"),
            ("u1", 3000, "gold"),
        ]


class TestEventAnalyticsJourney:
    def test_changelog_to_dashboard(self, spark, tmp_path):
        """The r04 analytics journey end to end: raw events stream in as
        micro-batches → the continuous rollup ladder absorbs them →
        read-time dashboard surfaces (hourly revenue, daily distinct
        actives, funnel, session ids) agree with one-shot batch computation
        over the same events. The composition a telemetry deployment runs:
        ingestion is incremental, analytics read the maintained state."""
        from proxima_platform_spark.functions.timeseries import (
            distinct_ladder,
            funnel,
        )
        from proxima_platform_spark.operators.rollup import hypertable_rollup
        from proxima_platform_spark.streaming.rollup_stream import ContinuousRollup

        HOUR, DAY = 3_600_000, 86_400_000
        schema = "user_id long, event_type string, ts_ms long, value double"
        rows = []
        for u in range(6):
            base = u * 17_000_000
            rows += [
                (u, "view", base + 1_000, 1.0),
                (u, "click", base + 120_000, 2.5),
                (u, "purchase", base + 600_000, 40.0 + u),
                (u, "view", base + DAY + 5_000, 1.0),
            ]
        batches = [rows[:8], rows[8:15], rows[15:]]

        roll = ContinuousRollup(
            spark, str(tmp_path / "ladder"), ts_ms_col="ts_ms",
            keys=["event_type"], value_col="value", base_level_ms=HOUR,
            compact_every=2,
        )
        for i, b in enumerate(batches):
            roll.update(spark.createDataFrame(b, schema), i)

        all_df = spark.createDataFrame(rows, schema)

        # 1. hourly revenue from the maintained ladder == batch rollup
        got_hour = {
            (r["event_type"], r["bucket_ms"]): (r["cnt"], str(r["total_dec"]))
            for r in roll.level(HOUR).collect()
        }
        want_hour = {
            (r["event_type"], r["bucket_ms"]): (r["cnt"], str(r["total_dec"]))
            for r in hypertable_rollup(
                all_df, ts_ms_col="ts_ms", keys=["event_type"],
                value_col="value", levels_ms=[HOUR],
            )[HOUR].collect()
        }
        assert got_hour == want_hour

        # 2. daily distinct actives (exact two-phase ladder)
        daily = {
            r["bucket_ms"]: r["uniques"]
            for r in distinct_ladder(
                all_df, ts_ms_col="ts_ms", member_col="user_id",
                levels_ms=[HOUR, DAY],
            )[DAY].collect()
        }
        assert all(v == 6 for v in daily.values()) and len(daily) >= 2

        # 3. every user converts through the funnel in order
        fun = {
            r["user_id"]: (r["t1"], r["t2"], r["t3"])
            for r in funnel(
                all_df, ["view", "click", "purchase"], ts_col="ts_ms"
            ).collect()
        }
        assert len(fun) == 6
        for u, (t1, t2, t3) in fun.items():
            assert t1 < t2 < t3

        # 4. session assignment splits each user's two bursts
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("ts_ms")
        run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        is_start = (
            F.col("ts_ms") - F.lag("ts_ms").over(w) > 30 * 60 * 1000
        ).cast("long")
        sess = all_df.select(
            "user_id",
            (F.sum(F.coalesce(is_start, F.lit(0))).over(run) + 1).alias("s"),
        )
        per_user = {
            r["user_id"]: r["m"]
            for r in sess.groupBy("user_id").agg(F.max("s").alias("m")).collect()
        }
        assert all(m == 2 for m in per_user.values())
