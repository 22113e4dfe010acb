"""Continuously-maintained winnowing fingerprint index: online
copy-detection over an unbounded document stream.

The ``ContinuousAnnIndex``/``ContinuousDistinct`` manifest pattern applied
to the MOSS fingerprint family (``functions/text.winnow_fingerprints``):
each micro-batch's documents are fingerprinted by the SAME expression
stage the batch operator uses, probed against the index-so-far for shared
fingerprints, and appended as a delta parquet generation.

Report semantics (the exact-twin argument): a document's fingerprint set
arrives ATOMICALLY with its batch, and the probe joins the batch against
the UNION of the index and the batch itself — so every pair (a, b) is
reported exactly once, in the batch where its LATER member arrives, with
the same ``shared`` count the batch operator computes (all of a's
fingerprints are already indexed when b shows up). Accumulated reports
over any batch sequence therefore equal ``winnow_overlap`` over the
union — EXACTLY — as long as no fingerprint crosses ``max_docs_per_fp``
mid-stream. Under saturation the operators necessarily diverge: the batch
operator drops ALL pairs of a saturated fingerprint retroactively, while
an append-only report stream cannot retract — online, a fingerprint
stops contributing to NEW pairs from the batch its count reaches the cap
(pre-saturation reports stand). Both behaviors are pinned in
``tests/test_streaming.py::TestContinuousWinnowIndex``.

Delivery is the standard at-least-once foreachBatch contract: the sink is
called BEFORE ``index.update`` (a crash between the two replays the batch
against an unchanged index → identical verdicts, which the sink dedups on
batch_id; the union-probe also makes the reversed order produce identical
rows because the batch side is distinct-folded into the probe frame — the
convention is kept anyway so all maintainers share one ordering rule).

At scale: state per generation is O(docs · density) rows (density
≈ 2/(w+1) of gram count); the per-batch probe is one equi-join ON fp
(batch side small — AQE broadcasts it), one count-distinct per candidate
pair. Same shared-POSIX-path storage contract as the other maintainers.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F


class ContinuousWinnowIndex:
    """Append-only ``(doc_id, fp)`` fingerprint index with base+delta
    parquet generations, replay-safe via the max-committed-batch_id
    guard, compacted every ``compact_every`` deltas.

    ``ingest(batch_df, batch_id)`` runs the full online step — fingerprint
    the batch, report overlap pairs to ``sink``, fold into the index — and
    is usable directly as a ``foreachBatch`` callback (the
    ``ContinuousDomainCap.update`` shape)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        w: int = 4,
        min_shared: int = 2,
        max_docs_per_fp: int = 64,
        sink=None,
        compact_every: int = 4,
    ) -> None:
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.text_col = text_col
        self.w = w
        self.min_shared = min_shared
        self.max_docs_per_fp = max_docs_per_fp
        self.sink = sink
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
        return self.spark.read.parquet(
            *[f"{self.path}/{p}" for p in paths]
        ).distinct()

    def seen(self, batch_id: int | None) -> bool:
        m = self._manifest()
        return (
            batch_id is not None
            and m["max_batch_id"] is not None
            and batch_id <= m["max_batch_id"]
        )

    def update(self, fps: DataFrame, batch_id: int | None = None) -> None:
        """Append a batch's distinct ``(doc_id, fp)`` rows as a delta."""
        m = self._manifest()
        if batch_id is not None:
            if m["max_batch_id"] is not None and batch_id <= m["max_batch_id"]:
                return
            m["max_batch_id"] = batch_id
        v = m["version"] + 1
        delta = f"delta/d{v}"
        fps.write.mode("overwrite").parquet(f"{self.path}/{delta}")
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

    def fingerprints(self) -> DataFrame | None:
        m = self._manifest()
        return self._merged(([m["base"]] if m["base"] else []) + m["deltas"])

    def ingest(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        """One online step: fingerprint the batch, report every (doc_a,
        doc_b, shared) pair in which at least one member is in THIS batch
        (new-vs-accepted AND within-batch — module docstring's exact-twin
        argument) to ``sink(pairs_df, batch_id)``, then fold the batch's
        fingerprints into the index. The sink must no-op on replayed
        batch_ids (≤ max committed) — at-least-once foreachBatch
        discipline; ``ingest`` itself is a valid foreachBatch callback.

        Delivery caveat (ADVICE r11): pair reports are exactly-once only
        for UNIQUE doc ids — a committed document re-delivered under a
        NEW batch id re-reports all of its pairs, so a
        non-set-accumulating sink must dedup on (doc_a, doc_b) or the
        upstream must dedup deliveries. The band family's anti-join fix
        does not transfer here: ``shared`` is counted over the batch
        side's fingerprint rows, and an anti-join would count a
        partially-updated document over its fresh rows only."""
        from proxima_platform_spark.functions.text import winnow_fingerprints

        fps_b = (
            winnow_fingerprints(batch_df, self.id_col, self.text_col, w=self.w)
            .select(self.id_col, "fp")
            .distinct()
            .localCheckpoint(eager=False)
        )
        idx = self.fingerprints()
        probe = fps_b if idx is None else idx.unionByName(fps_b).distinct()
        eligible = probe.join(
            probe.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") <= self.max_docs_per_fp)
            .select("fp"),
            "fp",
        )
        a = eligible.select(F.col(self.id_col).alias("__pa"), "fp")
        b = fps_b.select(F.col(self.id_col).alias("__pb"), "fp")
        pairs = (
            a.join(b, "fp")
            .where(F.col("__pa") != F.col("__pb"))
            .select(
                F.least("__pa", "__pb").alias("doc_a"),
                F.greatest("__pa", "__pb").alias("doc_b"),
                "fp",
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count_distinct("fp").alias("shared"))
            .where(F.col("shared") >= self.min_shared)
        )
        # sink BEFORE update: replay after a crash between the two probes
        # an unchanged index and reproduces identical verdicts (module
        # docstring); the sink dedups on batch_id
        if self.sink is not None:
            self.sink(pairs, batch_id)
        self.update(fps_b, batch_id)


def winnow_overlap_stream(
    stream_docs: DataFrame,
    index: ContinuousWinnowIndex,
):
    """Structured-Streaming wrapper: ``ingest`` per micro-batch. Returns
    a ``DataStreamWriter`` — caller adds trigger/checkpoint and
    ``start()``."""
    return stream_docs.writeStream.foreachBatch(index.ingest)
