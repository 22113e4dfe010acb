"""Env: the interactive console environment generated from the catalog.

The reference boots a Groovy shell whose Environment class is code-generated
per attribute from the repository config (tools/.../groovy/GroovyEnv.java,
Console.java:44-64; FreeMarker template class-entitydesc.ftlh:78-176 emits
``stream() / streamFromOldest() / batchSnapshot() / batchUpdates() /
get / list / listPrefix / put / delete`` per attribute). Python needs no
codegen — attribute access resolves dynamically against the repository:

    env = make_env(repo, spark)
    env.user.status.stream()             # unbounded changelog Stream
    env.user.status.stream_from_oldest() # bounded replay as a Stream
    env.user.status.batch_snapshot()     # compacted table DataFrame
    env.user.device.list("key1")         # wildcard instance scan
    env.user.status.put("key1", b"v", stamp_ms=...)  # random-access write

Every accessor returns a lazily-composed DataFrame/Stream — the analog of
the deferred PCollection factory (BeamStream.child:1141-1168) — so chaining
DSL calls builds one Catalyst plan, executed only at a terminal op.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Iterable, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from proxima_platform_spark.catalog.descriptors import (
    AccessType,
    AttributeDescriptor,
    EntityDescriptor,
)
from proxima_platform_spark.catalog.repository import Repository
from proxima_platform_spark.changelog import to_changelog
from proxima_platform_spark.operators import Stream
from proxima_platform_spark.sources import batch as batch_src
from proxima_platform_spark.sources.registry import DataOperator


def _ts(stamp_ms: int) -> datetime:
    return datetime.fromtimestamp(stamp_ms / 1000, tz=timezone.utc)


class AttributeEnv:
    """Accessors of one attribute (console template class-entitydesc.ftlh:78-176)."""

    def __init__(
        self, op: DataOperator, entity: EntityDescriptor, attr: AttributeDescriptor
    ) -> None:
        self._op = op
        self._entity = entity
        self._attr = attr

    @property
    def _names(self) -> list[str]:
        return [self._attr.name]

    # -- reads -------------------------------------------------------------

    def stream(self, position: str = "NEWEST") -> Stream:
        """Unbounded changelog read (ftlh:90; BeamDataOperator.getStream)."""
        return Stream(
            self._op.stream(self._entity.name, self._names, position=position),
            "stamp",
        )

    def stream_from_oldest(self) -> Stream:
        """Bounded replay of the commit log as a Stream (ftlh:90-99)."""
        return Stream(self.batch_updates(), "stamp")

    def batch_updates(self, start=None, end=None) -> DataFrame:
        return self._op.batch_updates(
            self._entity.name, self._names, start=start, end=end
        )

    def batch_snapshot(self, start=None, end=None) -> DataFrame:
        return self._op.batch_snapshot(
            self._entity.name, self._names, start=start, end=end
        )

    # -- random access (RandomAccessReader.java:172-340) --------------------

    def get(self, key: str, attribute: str | None = None, stamp_ms: int | None = None):
        """Point lookup; wildcard attributes pass the full instance name."""
        snap = self._op.batch_snapshot(
            self._entity.name,
            self._names,
            end=_ts(stamp_ms) if stamp_ms is not None else None,
        )
        rows = batch_src.get(snap, key, attribute or self._attr.name).collect()
        return rows[0] if rows else None

    def list(self, key: str, *, limit: int = 100, offset: str | None = None):
        """Wildcard instance scan of one key (scanWildcard, ftlh:130-150)."""
        snap = self._op.batch_snapshot(self._entity.name, self._names)
        return batch_src.scan_wildcard(
            snap, key, self._attr.prefix, limit=limit, offset=offset
        ).collect()

    def list_keys(self, *, limit: int = 100, offset: str | None = None):
        snap = self._op.batch_snapshot(self._entity.name, self._names)
        return batch_src.list_entities(snap, limit=limit, offset=offset).collect()

    # -- writes (console put/delete, ftlh:151-176) ---------------------------

    def _write(self, key: str, attribute: str, value, stamp_ms: int, **flags) -> None:
        fam = self._op.repo.find_accessor(
            self._entity.name, self._attr.name, AccessType.COMMIT_LOG
        )
        spark = self._op.spark
        row_df = spark.createDataFrame(
            [(self._entity.name, key, attribute, _ts(stamp_ms), value)],
            "entity string, key string, attribute string, stamp timestamp, value binary",
        )
        element = to_changelog(
            row_df,
            entity=F.col("entity"),
            key="key",
            attribute="attribute",
            stamp="stamp",
            value="value",
            delete=F.lit(flags.get("delete", False)),
            delete_wildcard=F.lit(flags.get("delete_wildcard", False)),
        )
        if fam.storage_format == "inmem":
            cur = self._op._inmem.get(fam.path)
            self._op.register_inmem(
                fam.path, element if cur is None else cur.unionByName(element)
            )
        elif fam.storage_format == "parquet":
            element.write.mode("append").parquet(fam.path)
        else:
            raise NotImplementedError(
                f"console write for {fam.storage_format!r} families"
            )
        self._op._read_cache.pop((fam.name,), None)

    def put(self, key: str, value: bytes, *, stamp_ms: int, attribute: str | None = None) -> None:
        self._write(key, attribute or self._attr.name, value, stamp_ms)

    def delete(self, key: str, *, stamp_ms: int, attribute: str | None = None) -> None:
        self._write(key, attribute or self._attr.name, None, stamp_ms, delete=True)

    def delete_all(self, key: str, *, stamp_ms: int) -> None:
        """Wildcard tombstone (deleteWildcard, StreamElement.java:145-230)."""
        if not self._attr.is_wildcard:
            raise ValueError("delete_all applies to wildcard attributes")
        self._write(
            key, self._attr.name, None, stamp_ms, delete=True, delete_wildcard=True
        )


class EntityEnv:
    def __init__(self, op: DataOperator, entity: EntityDescriptor) -> None:
        self._op = op
        self._entity = entity

    def __getattr__(self, name: str) -> AttributeEnv:
        for attr in self._entity.attributes:
            if attr.name == name or (attr.is_wildcard and attr.prefix[:-1] == name):
                return AttributeEnv(self._op, self._entity, attr)
        raise AttributeError(f"entity {self._entity.name!r} has no attribute {name!r}")

    def union_stream(self, *names: str) -> Stream:
        """unionStream of several attribute changelogs (ftlh:206-213)."""
        streams = [getattr(self, n).stream_from_oldest() for n in names]
        return streams[0].union(*streams[1:])


class Env:
    """Root console object: one attribute per entity (GroovyEnv analog)."""

    def __init__(self, op: DataOperator) -> None:
        self._op = op

    def __getattr__(self, name: str) -> EntityEnv:
        if name in self._op.repo.entities:
            return EntityEnv(self._op, self._op.repo.entities[name])
        raise AttributeError(f"no entity {name!r}")


def make_env(repo: Repository, spark: SparkSession) -> Env:
    return Env(DataOperator(repo, spark))
