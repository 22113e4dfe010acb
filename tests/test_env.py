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
