"""Console Env + Repository/DataOperator end-to-end (ref GroovyEnv /
class-entitydesc.ftlh accessor surface; ConfigRepository.java:372-401
config parsing; BeamDataOperator access-path selection)."""

import pytest

from pyspark.sql import functions as F

from proxima_platform_spark.catalog.descriptors import AccessType
from proxima_platform_spark.catalog.repository import Repository
from proxima_platform_spark.env import make_env
from proxima_platform_spark.sources.registry import DataOperator


def config():
    return {
        "entities": {
            "user": {
                "attributes": {
                    "status": {"scheme": "string"},
                    "device.*": {"scheme": "bytes"},
                }
            }
        },
        "attributeFamilies": {
            "user-log": {
                "entity": "user",
                "attributes": ["*"],
                "storage": "inmem://user-log",
                "type": "primary",
                "access": ["commit-log", "batch-updates"],
            }
        },
    }


@pytest.fixture()
def env(spark):
    from proxima_platform_spark.changelog import CHANGELOG_SCHEMA

    repo = Repository.of(config())
    e = make_env(repo, spark)
    # seed the in-memory family with an empty changelog
    e._op.register_inmem("user-log", spark.createDataFrame([], CHANGELOG_SCHEMA))
    return e


class TestRepository:
    def test_parses_entities_and_families(self):
        repo = Repository.of(config())
        assert repo.entity("user").attribute("status").scheme == "string"
        assert repo.entity("user").attribute("device.*").is_wildcard
        fam = repo.find_accessor("user", "status", AccessType.COMMIT_LOG)
        assert fam.name == "user-log"

    def test_unknown_entity_rejected(self):
        bad = config()
        bad["attributeFamilies"]["user-log"]["entity"] = "ghost"
        with pytest.raises(ValueError):
            Repository.of(bad)

    def test_snapshot_plan_falls_back_to_updates(self):
        repo = Repository.of(config())
        path, fams = repo.snapshot_plan("user", ["status"])
        assert path == "updates" and fams[0].name == "user-log"

    def test_snapshot_plan_dedupes_repeated_family(self, spark):
        """Two attributes served by the same non-first snapshot family must
        not union that family's rows twice (BeamDataOperator caches identical
        reads, getOrCreatePCollection:74-116)."""
        from proxima_platform_spark.changelog import CHANGELOG_SCHEMA

        cfg = {
            "entities": {
                "user": {
                    "attributes": {
                        "a": {"scheme": "string"},
                        "b": {"scheme": "string"},
                        "c": {"scheme": "string"},
                    }
                }
            },
            "attributeFamilies": {
                "snap-a": {
                    "entity": "user",
                    "attributes": ["a"],
                    "storage": "inmem://snap-a",
                    "type": "replica",
                    "access": ["batch-snapshot", "batch-updates"],
                },
                "snap-bc": {
                    "entity": "user",
                    "attributes": ["b", "c"],
                    "storage": "inmem://snap-bc",
                    "type": "replica",
                    "access": ["batch-snapshot", "batch-updates"],
                },
            },
        }
        repo = Repository.of(cfg)
        path, fams = repo.snapshot_plan("user", ["a", "b", "c"])
        assert path == "snapshot" and [f.name for f in fams] == [
            "snap-a",
            "snap-bc",
            "snap-bc",
        ]
        op = DataOperator(repo, spark)

        import datetime

        def elem(key, attribute, value):
            return (
                "user", key, attribute, attribute, 1, f"u-{key}-{attribute}",
                datetime.datetime(2024, 1, 1), False, False, value,
            )

        op.register_inmem(
            "snap-a", spark.createDataFrame([elem("k1", "a", b"x")], CHANGELOG_SCHEMA)
        )
        op.register_inmem(
            "snap-bc",
            spark.createDataFrame(
                [elem("k1", "b", b"y"), elem("k1", "c", b"z")], CHANGELOG_SCHEMA
            ),
        )
        snap = op.batch_snapshot("user", ["a", "b", "c"])
        assert snap.count() == 3  # was 5 before dedupe (snap-bc unioned twice)

    def test_missing_access_raises(self):
        repo = Repository.of(config())
        with pytest.raises(LookupError):
            repo.find_accessor("user", "status", AccessType.RANDOM_ACCESS)


class TestEnvConsole:
    def test_put_get_roundtrip(self, env):
        env.user.status.put("k1", b"online", stamp_ms=1000)
        env.user.status.put("k1", b"away", stamp_ms=2000)
        row = env.user.status.get("k1")
        assert row is not None and bytes(row.value) == b"away"

    def test_get_time_travel(self, env):
        env.user.status.put("k1", b"online", stamp_ms=1000)
        env.user.status.put("k1", b"away", stamp_ms=2000)
        row = env.user.status.get("k1", stamp_ms=1500)
        assert bytes(row.value) == b"online"

    def test_delete_removes(self, env):
        env.user.status.put("k1", b"online", stamp_ms=1000)
        env.user.status.delete("k1", stamp_ms=2000)
        assert env.user.status.get("k1") is None

    def test_wildcard_list_and_delete_all(self, env):
        env.user.device.put("k1", b"a", stamp_ms=1000, attribute="device.a")
        env.user.device.put("k1", b"b", stamp_ms=1500, attribute="device.b")
        got = [r.attribute for r in env.user.device.list("k1")]
        assert got == ["device.a", "device.b"]
        env.user.device.delete_all("k1", stamp_ms=2000)
        assert env.user.device.list("k1") == []

    def test_stream_from_oldest_replays(self, env):
        env.user.status.put("k1", b"x", stamp_ms=1000)
        env.user.status.put("k2", b"y", stamp_ms=2000)
        s = env.user.status.stream_from_oldest()
        assert s.df.count() == 2

    def test_batch_snapshot_compacts(self, env):
        env.user.status.put("k1", b"old", stamp_ms=1000)
        env.user.status.put("k1", b"new", stamp_ms=2000)
        snap = env.user.status.batch_snapshot()
        assert snap.count() == 1

    def test_unknown_attribute(self, env):
        with pytest.raises(AttributeError):
            env.user.nosuch

    def test_unknown_entity(self, env):
        with pytest.raises(AttributeError):
            env.ghost
