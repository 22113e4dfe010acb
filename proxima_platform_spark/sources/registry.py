"""DataOperator: family-aware reads/writes — the engine's access layer.

The analog of BeamDataOperator (beam/core/.../BeamDataOperator.java): resolve
the attribute family able to serve a read (capability-based access-path
selection, :217,298,345), construct the DataFrame, cache identical reads
(getOrCreatePCollection :74-116 — here Spark's exchange/subquery reuse plus an
explicit descriptor cache), and apply the attribute filter after family
fan-in (:236,317,393 — Catalyst pushes it down).

Storage URIs map to Spark reader formats:
    parquet:///path     → spark.read.parquet          (batch family)
    delta:///path       → spark.read.format("delta")  (if delta available)
    kafka://broker/topic→ readStream.format("kafka")  (commit log)
    inmem://name        → registered in-session DataFrame (tests; the analog
                          of direct/core/src/test/.../storage/InMemStorage.java)
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession, functions as F

from proxima_platform_spark.catalog.descriptors import (
    AccessType,
    AttributeFamilyDescriptor,
)
from proxima_platform_spark.catalog.repository import Repository
from proxima_platform_spark.changelog import snapshot as _snapshot
from proxima_platform_spark.sources import batch as _batch


class DataOperator:
    """Entry point for family-aware reads, bound to one SparkSession."""

    def __init__(self, repo: Repository, spark: SparkSession) -> None:
        self.repo = repo
        self.spark = spark
        self._inmem: dict[str, DataFrame] = {}
        self._read_cache: dict[tuple, DataFrame] = {}

    # -- storage binding -----------------------------------------------------

    def register_inmem(self, name: str, df: DataFrame) -> None:
        """Bind an ``inmem://name`` storage to a DataFrame (test double,
        mirrors InMemStorage)."""
        self._inmem[name] = df

    def _read_family(self, fam: AttributeFamilyDescriptor) -> DataFrame:
        key = (fam.name,)
        if key in self._read_cache:
            return self._read_cache[key]
        fmt = fam.storage_format
        if fmt == "inmem":
            df = self._inmem[fam.path]
        elif fmt == "parquet":
            df = self.spark.read.options(**dict(fam.format_options)).parquet(fam.path)
        else:
            df = (
                self.spark.read.format(fmt)
                .options(**dict(fam.format_options))
                .load(fam.path)
            )
        self._read_cache[key] = df
        return df

    # -- reads (BeamDataOperator.getBatchUpdates / getBatchSnapshot) ----------

    def batch_updates(
        self,
        entity: str,
        attributes: Iterable[str] | None = None,
        *,
        start=None,
        end=None,
    ) -> DataFrame:
        attrs = list(attributes) if attributes is not None else None
        fams = {
            self.repo.find_accessor(entity, a, AccessType.BATCH_UPDATES).name
            for a in (attrs or [None])
        }
        dfs = [self._read_family(self.repo.families[f]) for f in sorted(fams)]
        df = dfs[0]
        for other in dfs[1:]:
            df = df.unionByName(other)
        return _batch.batch_updates(df, start=start, end=end, attributes=attrs)

    def batch_snapshot(
        self,
        entity: str,
        attributes: Iterable[str] | None = None,
        *,
        start=None,
        end=None,
    ) -> DataFrame:
        """Two-path plan (BeamDataOperator.java:366-397): materialized
        snapshot family if every attribute has one, else compact updates."""
        attrs = list(attributes) if attributes is not None else None
        path, fams = (
            self.repo.snapshot_plan(entity, attrs)
            if attrs is not None
            else ("updates", None)
        )
        if path == "snapshot":
            # dedupe the whole plan (snapshot_plan may map several attributes
            # onto the same family anywhere in the list, not just fams[0])
            uniq = list({fam.name: fam for fam in fams}.values())
            df = self._read_family(uniq[0])
            for fam in uniq[1:]:
                df = df.unionByName(self._read_family(fam))
            if attrs is not None:
                df = df.where(F.col("attribute_base").isin(attrs))
            return df
        return _batch.batch_snapshot(
            self.batch_updates(entity, attrs), start=start, end=end, attributes=attrs
        )

    # -- streaming (BeamDataOperator.getStream:160-237) ------------------------

    def stream(
        self,
        entity: str,
        attributes: Iterable[str] | None = None,
        *,
        position: str = "NEWEST",
        stop_at_current: bool = False,
    ):
        """Unbounded read of the commit log; see streaming.source for the
        position semantics (NEWEST/OLDEST/CURRENT ≈ startingOffsets /
        checkpointed offsets; stop_at_current ≈ Trigger.AvailableNow)."""
        from proxima_platform_spark.streaming.source import commit_log_stream

        fam = self.repo.find_accessor(
            entity,
            next(iter(attributes), None) if attributes else None,
            AccessType.COMMIT_LOG,
        )
        return commit_log_stream(
            self.spark, fam, attributes=attributes, position=position
        )
