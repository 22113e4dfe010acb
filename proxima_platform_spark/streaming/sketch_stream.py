"""Continuously-maintained frequency sketch: Count-Min + candidate set
folded per micro-batch — streaming heavy hitters with the classic
superset guarantee.

Why the batch two-phase (`functions/sketch.cms_frequent_items`) can't run
online unchanged: its exact confirm re-scans all rows, and a stream can't
revisit history. The streaming maintainer keeps instead

* the merged CMS counter frame (base+delta parquet generations, compacted
  — the ``ContinuousRollup`` manifest pattern; state is O(width·depth)
  CELLS regardless of key cardinality), and
* a CANDIDATE key table: every batch, the batch's distinct keys are probed
  against the merged sketch and the ones whose estimate clears the
  threshold are appended. A key's count only grows in batches where it
  appears, and CMS never undercounts — so the batch in which a key's true
  running count crosses T is a batch that contains it, and the probe in
  that batch catches it. Hence candidates ⊇ every key truly frequent so
  far (no false negatives, ever); impostors are bounded by the standard
  CMS collision mass εN and can be confirmed exactly offline.

This is the reference's StorageFilter idea run forward continuously:
cheap online pruning with a hard no-miss guarantee, exactness restored by
a bounded offline confirm. State and I/O per batch: the batch's cell
partials (≤ w·d rows) + its crossing keys — never the raw history.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from proxima_platform_spark.functions.sketch import _cms_cells


class ContinuousHeavyHitters:
    """``update(batch)`` is usable directly as a ``foreachBatch``
    callback; ``hitters()`` returns the current candidate keys with their
    sketch estimates (a superset of the truly-frequent keys)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        key_cols: list[str],
        threshold: int,
        width: int = 2048,
        depth: int = 4,
        compact_every: int = 4,
    ) -> None:
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.threshold = threshold
        self.width = width
        self.depth = depth
        self.compact_every = compact_every
        os.makedirs(path, exist_ok=True)

    # -- manifest (the ContinuousRollup pattern) ----------------------------

    def _manifest(self) -> dict:
        p = f"{self.path}/manifest.json"
        if not os.path.exists(p):
            return {
                "version": 0,
                "base": None,
                "deltas": [],
                "cands": [],
                "max_batch_id": None,
            }
        with open(p) as f:
            m = json.load(f)
        # migrate pre-r06 manifests that recorded every batch_id: ids are
        # monotonic, so the max is all the replay guard ever needed (O(1)
        # state + O(1) membership instead of unbounded list + linear scan)
        if "seen_batches" in m:
            seen = m.pop("seen_batches")
            m["max_batch_id"] = max(seen) if seen else None
        m.setdefault("max_batch_id", None)
        return m

    def _write_manifest(self, m: dict) -> None:
        tmp = f"{self.path}/manifest.json.tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, f"{self.path}/manifest.json")

    # -- sketch frames -------------------------------------------------------

    def _batch_cells(self, batch: DataFrame) -> DataFrame:
        key = [F.col(c) for c in self.key_cols]
        cells = _cms_cells(key, self.width, self.depth)
        return (
            batch.select(F.explode(F.array(*cells)).alias("cell"))
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def _merged_cells(self, paths: list[str]) -> DataFrame | None:
        if not paths:
            return None
        df = self.spark.read.parquet(*[f"{self.path}/{p}" for p in paths])
        return df.groupBy("cell").agg(F.sum("n").alias("n"))

    def _estimate(self, keys: DataFrame, cells: DataFrame) -> DataFrame:
        key = [F.col(c) for c in self.key_cols]
        cell_exprs = _cms_cells(key, self.width, self.depth)
        one_row = cells.agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(F.struct(F.col("cell").cast("int"), "n"))
                )
            ).alias("cells")
        )
        lookups = [
            F.coalesce(
                F.element_at(F.col("__cms.cells"), c.cast("int")),
                F.lit(0).cast("long"),
            )
            for c in cell_exprs
        ]
        est = lookups[0] if self.depth == 1 else F.least(*lookups)
        return (
            keys.crossJoin(
                F.broadcast(one_row.select(F.struct("cells").alias("__cms")))
            )
            .withColumn("freq_est", est)
            .drop("__cms")
        )

    # -- maintenance ---------------------------------------------------------

    def update(self, batch: DataFrame, batch_id: int | None = None) -> None:
        m = self._manifest()
        # foreachBatch is at-least-once: after a failure between the delta
        # write and the sink commit, Structured Streaming REPLAYS the
        # micro-batch with the same batch_id. Without this no-op guard the
        # replay would write a second delta and double-count every key in
        # the batch — the superset guarantee survives (counters only grow)
        # but freq_est would exceed the documented εN collision bound. The
        # manifest records the max committed batch_id — Structured Streaming
        # batch ids are monotonically increasing, so "already seen" is
        # exactly "≤ max committed"; this is the exactly-once idempotence
        # convention foreachBatch callbacks are expected to implement.
        if batch_id is not None:
            if m["max_batch_id"] is not None and batch_id <= m["max_batch_id"]:
                return
            m["max_batch_id"] = batch_id
        v = m["version"] + 1
        delta = f"delta/d{v}"
        # overwrite: a crash after this write but before the manifest write
        # leaves an orphan dir at this same versioned path; the replay must
        # be able to rewrite it (the manifest is the commit point)
        self._batch_cells(batch).write.mode("overwrite").parquet(
            f"{self.path}/{delta}"
        )
        m["version"] = v
        m["deltas"] = m["deltas"] + [delta]

        # probe THIS batch's keys against the merged-so-far sketch; the
        # crossing batch always contains the key, so no hitter is missed
        merged = self._merged_cells(
            ([m["base"]] if m["base"] else []) + m["deltas"]
        )
        crossers = (
            self._estimate(batch.select(*self.key_cols).distinct(), merged)
            .where(F.col("freq_est") >= self.threshold)
            .select(*self.key_cols)
        )
        cand = f"cand/c{v}"
        crossers.write.mode("overwrite").parquet(f"{self.path}/{cand}")
        m["cands"] = m["cands"] + [cand]
        self._write_manifest(m)
        if len(m["deltas"]) >= self.compact_every:
            self._compact()

    def _compact(self) -> None:
        m = self._manifest()
        merged = self._merged_cells(
            ([m["base"]] if m["base"] else []) + m["deltas"]
        )
        if merged is None:
            return
        # overwrite: a crash between these writes and the manifest commit
        # leaves orphan dirs at the same versioned paths; the retried
        # compaction must be able to rewrite them (same contract as the
        # delta writes above — the manifest is the only commit point)
        new_base = f"base/g{m['version']}"
        merged.write.mode("overwrite").parquet(f"{self.path}/{new_base}")
        cand_paths = [f"{self.path}/{p}" for p in m["cands"]]
        new_cand = f"cand/g{m['version']}"
        (
            self.spark.read.parquet(*cand_paths)
            .distinct()
            .write.mode("overwrite")
            .parquet(f"{self.path}/{new_cand}")
        )
        old = ([m["base"]] if m["base"] else []) + m["deltas"] + m["cands"]
        m["base"], m["deltas"], m["cands"] = new_base, [], [new_cand]
        self._write_manifest(m)
        for p in old:
            shutil.rmtree(f"{self.path}/{p}", ignore_errors=True)
        self._gc_unreferenced(m)

    def _gc_unreferenced(self, m: dict) -> None:
        """Remove generation dirs no manifest references — a crash between
        a compaction's parquet writes and its manifest commit leaves
        orphan base/g{N} + cand/g{N} dirs the replayed batch never
        revisits (it no-ops on the batch_id guard). The manifest is the
        only commit point, so after a successful commit anything else on
        disk is garbage; update/_compact run sequentially inside
        foreachBatch, so no write is in flight here."""
        referenced = {
            p for p in [m["base"], *m["deltas"], *m["cands"]] if p
        }
        for sub in ("base", "delta", "cand"):
            d = f"{self.path}/{sub}"
            if not os.path.isdir(d):
                continue
            for g in os.listdir(d):
                if f"{sub}/{g}" not in referenced:
                    shutil.rmtree(f"{d}/{g}", ignore_errors=True)

    # -- reads ---------------------------------------------------------------

    def hitters(self) -> DataFrame:
        """Candidate keys with estimate ≥ threshold NOW — a superset of
        every key whose true running count is ≥ threshold. Exactness, if
        needed, is one bounded confirm join over the candidates offline."""
        m = self._manifest()
        if not m["cands"]:
            raise LookupError("continuous heavy hitters is empty")
        cands = self.spark.read.parquet(
            *[f"{self.path}/{p}" for p in m["cands"]]
        ).distinct()
        merged = self._merged_cells(
            ([m["base"]] if m["base"] else []) + m["deltas"]
        )
        return self._estimate(cands, merged).where(
            F.col("freq_est") >= self.threshold
        )


class ContinuousDistinct:
    """Continuously-maintained HyperLogLog distinct count.

    ``update(batch)`` folds each micro-batch's register frame into the
    running sketch (``foreachBatch``-compatible); ``estimate()`` returns
    the current distinct-count estimate, ``registers()`` the merged
    register frame. Register merge is MAX — associative, commutative and
    idempotent — so compaction order, replay of a crashed compaction, and
    overlap across deltas are all harmless by algebra; the only replay
    hazard left is appending the same batch twice, closed by the same
    max-committed-batch_id guard as :class:`ContinuousHeavyHitters`.

    State is O(m) register CELLS per generation regardless of key
    cardinality (m = 2^b, default 256) — the sketch the reference-style
    continuous rollup wants for COUNT DISTINCT, where the exact answer
    would require unbounded key state. Same storage contract as the other
    continuous maintainers here: ``path`` must be one shared POSIX
    filesystem visible to driver and executors (manifest/GC are
    driver-local file I/O).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        key_cols: list[str],
        b: int = 8,
        salt: str = "hll-v1",
        compact_every: int = 4,
    ) -> None:
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.b = b
        self.salt = salt
        self.compact_every = compact_every
        os.makedirs(path, exist_ok=True)

    def _manifest(self) -> dict:
        p = f"{self.path}/manifest.json"
        if not os.path.exists(p):
            return {"version": 0, "base": None, "deltas": [], "max_batch_id": None}
        with open(p) as f:
            return json.load(f)

    def _write_manifest(self, m: dict) -> None:
        tmp = f"{self.path}/manifest.json.tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, f"{self.path}/manifest.json")

    def _merged(self, paths: list[str]) -> DataFrame | None:
        if not paths:
            return None
        df = self.spark.read.parquet(*[f"{self.path}/{p}" for p in paths])
        return df.groupBy("bucket").agg(F.max("rho").alias("rho"))

    def update(self, batch: DataFrame, batch_id: int | None = None) -> None:
        from proxima_platform_spark.functions.sketch import hll_build

        m = self._manifest()
        if batch_id is not None:
            if m["max_batch_id"] is not None and batch_id <= m["max_batch_id"]:
                return
            m["max_batch_id"] = batch_id
        v = m["version"] + 1
        delta = f"delta/d{v}"
        hll_build(batch, self.key_cols, b=self.b, salt=self.salt).write.mode(
            "overwrite"
        ).parquet(f"{self.path}/{delta}")
        m["version"] = v
        m["deltas"] = m["deltas"] + [delta]
        self._write_manifest(m)
        if len(m["deltas"]) >= self.compact_every:
            self._compact()

    def _compact(self) -> None:
        m = self._manifest()
        merged = self._merged(([m["base"]] if m["base"] else []) + m["deltas"])
        if merged is None:
            return
        new_base = f"base/g{m['version']}"
        merged.write.mode("overwrite").parquet(f"{self.path}/{new_base}")
        old = ([m["base"]] if m["base"] else []) + m["deltas"]
        m["base"], m["deltas"] = new_base, []
        self._write_manifest(m)
        for p in old:
            shutil.rmtree(f"{self.path}/{p}", ignore_errors=True)

    def registers(self) -> DataFrame | None:
        m = self._manifest()
        return self._merged(([m["base"]] if m["base"] else []) + m["deltas"])

    def estimate(self) -> DataFrame | None:
        from proxima_platform_spark.functions.sketch import hll_estimate

        regs = self.registers()
        return None if regs is None else hll_estimate(regs, b=self.b)


class ContinuousQuantileSketch:
    """Continuously-maintained bottom-k quantile sketch
    (``functions/sketch.quantile_sketch_*`` run online).

    ``update(batch)`` folds each micro-batch's per-group bottom-k frame
    into the running sketch (``foreachBatch``-compatible);
    ``quantiles(qs)`` returns the current type-1 sample-quantile
    estimates, ``sketch()`` the merged ``(group..., h, v)`` frame.

    The merge is bottom-k of the deduplicated union — associative,
    commutative and idempotent (tags are a deterministic md5 over row
    identity, so re-delivered ROWS collapse in the dedup and replayed
    batch_ids are closed by the same max-committed guard as the other
    maintainers). By the exact merge law the maintained sketch equals the
    batch build over the union of everything ingested — not just
    approximately: the streaming and batch estimates are the SAME rows.

    State is ≤ k rows per group per generation regardless of input
    volume; compaction folds generations back to one bottom-k frame.
    Same shared-POSIX-path storage contract as the other maintainers.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        value_col: str,
        tag_cols: list[str],
        group_cols: list[str] | None = None,
        k: int = 256,
        salt: str = "qsk-v1",
        compact_every: int = 4,
    ) -> None:
        self.spark = spark
        self.path = path
        self.value_col = value_col
        self.tag_cols = list(tag_cols)
        self.group_cols = list(group_cols or [])
        self.k = k
        self.salt = salt
        self.compact_every = compact_every
        os.makedirs(path, exist_ok=True)

    def _manifest(self) -> dict:
        p = f"{self.path}/manifest.json"
        if not os.path.exists(p):
            return {"version": 0, "base": None, "deltas": [], "max_batch_id": None}
        with open(p) as f:
            return json.load(f)

    def _write_manifest(self, m: dict) -> None:
        tmp = f"{self.path}/manifest.json.tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, f"{self.path}/manifest.json")

    def _bottom_k(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        w = Window.partitionBy(
            *[F.col(g) for g in self.group_cols]
        ).orderBy("h", "v")
        return (
            df.dropDuplicates(df.columns)
            .withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") <= self.k)
            .drop("__r")
        )

    def _merged(self, paths: list[str]) -> DataFrame | None:
        if not paths:
            return None
        df = self.spark.read.parquet(*[f"{self.path}/{p}" for p in paths])
        return self._bottom_k(df)

    def update(self, batch: DataFrame, batch_id: int | None = None) -> None:
        from proxima_platform_spark.functions.sketch import (
            quantile_sketch_build,
        )

        m = self._manifest()
        if batch_id is not None:
            if m["max_batch_id"] is not None and batch_id <= m["max_batch_id"]:
                return
            m["max_batch_id"] = batch_id
        v = m["version"] + 1
        delta = f"delta/d{v}"
        quantile_sketch_build(
            batch,
            self.value_col,
            self.tag_cols,
            group_cols=self.group_cols,
            k=self.k,
            salt=self.salt,
        ).write.mode("overwrite").parquet(f"{self.path}/{delta}")
        m["version"] = v
        m["deltas"] = m["deltas"] + [delta]
        self._write_manifest(m)
        if len(m["deltas"]) >= self.compact_every:
            self._compact()

    def _compact(self) -> None:
        m = self._manifest()
        merged = self._merged(([m["base"]] if m["base"] else []) + m["deltas"])
        if merged is None:
            return
        new_base = f"base/g{m['version']}"
        merged.write.mode("overwrite").parquet(f"{self.path}/{new_base}")
        old = ([m["base"]] if m["base"] else []) + m["deltas"]
        m["base"], m["deltas"] = new_base, []
        self._write_manifest(m)
        for p in old:
            shutil.rmtree(f"{self.path}/{p}", ignore_errors=True)

    def sketch(self) -> DataFrame | None:
        m = self._manifest()
        return self._merged(([m["base"]] if m["base"] else []) + m["deltas"])

    def quantiles(self, qs: list[float]) -> DataFrame | None:
        from proxima_platform_spark.functions.sketch import (
            quantile_sketch_estimate,
        )

        sk = self.sketch()
        return None if sk is None else quantile_sketch_estimate(sk, qs)
