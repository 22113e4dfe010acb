"""Streaming retrieval-eval maintainer — the online twin of the batch
eval trio (``functions/evalmetrics``: rank_auc / precision_at_k /
ndcg_at_k), VERDICT r08 'Next round' #6.

Real pipelines monitor retrieval quality ONLINE: labeled judgments
arrive in micro-batches (human ratings, click-derived labels, freshly
scored candidates) and each batch should move the exact metrics, not an
approximation. :class:`ContinuousEvalMetrics` maintains the growing
labeled set with the base+delta generation layout shared by the other
maintainers (``sketch_stream.ContinuousQuantileSketch`` shape) and
computes metrics over the union — EXACTLY equal to the batch functions
on everything ingested, because the maintained state IS the
deduplicated union (rank metrics have no mergeable sketch form; the
labeled set itself is the sufficient statistic, and eval sets are
top-N/judged frames by contract — thousands of rows, never the
corpus).

Reference parity: the reference serves this shape with a cached-view
over a commit-log attribute plus user-side aggregation
(direct/core/.../view/CachedView.java via tools/groovy console
streams); here the maintainer is a foreachBatch-compatible object with
exact replay idempotence.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ContinuousEvalMetrics:
    """Continuously-maintained exact rank metrics over a growing labeled
    set.

    ``update(batch)`` folds a micro-batch of labeled scored rows
    ``(group..., id, score, rel)`` into the running set
    (``foreachBatch``-compatible; replayed ``batch_id``s are closed by
    the max-committed guard, re-delivered ROWS collapse in the
    whole-row dedup — re-labeling an id with a DIFFERENT score/rel is a
    contract violation, not a supported update). ``auc()``,
    ``precision(ks)`` and ``ndcg(ks)`` return the current exact metrics
    — row-for-row equal to running the batch functions over the union
    of everything ingested, across any batch split (pinned in tests).

    ``rel`` doubles as the binary label for auc/precision (label =
    rel >= ``pos_threshold``), so one ingested frame serves the whole
    trio.

    State is the deduplicated labeled set: base+delta parquet
    generations under a shared POSIX path, compacted every
    ``compact_every`` deltas. Eval sets are bounded by contract (judged
    top-N frames); the maintainer never holds more than the distinct
    labeled rows.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        id_col: str = "id",
        score_col: str = "score",
        rel_col: str = "rel",
        group_cols: list[str] | None = None,
        pos_threshold: int = 1,
        compact_every: int = 4,
    ) -> None:
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.score_col = score_col
        self.rel_col = rel_col
        self.group_cols = list(group_cols or [])
        self.pos_threshold = pos_threshold
        self.compact_every = compact_every
        os.makedirs(path, exist_ok=True)

    # -- manifest / generation plumbing (the maintainer family shape) --
    def _manifest(self) -> dict:
        p = f"{self.path}/manifest.json"
        if not os.path.exists(p):
            return {
                "version": 0,
                "base": None,
                "deltas": [],
                "max_batch_id": None,
            }
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
        return df.dropDuplicates(df.columns)

    def update(self, batch: DataFrame, batch_id: int | None = None) -> None:
        m = self._manifest()
        if batch_id is not None:
            if m["max_batch_id"] is not None and batch_id <= m["max_batch_id"]:
                return
            m["max_batch_id"] = batch_id
        v = m["version"] + 1
        delta = f"delta/d{v}"
        cols = [
            *self.group_cols,
            self.id_col,
            self.score_col,
            self.rel_col,
        ]
        batch.select(*cols).dropDuplicates(cols).write.mode(
            "overwrite"
        ).parquet(f"{self.path}/{delta}")
        m["version"] = v
        m["deltas"] = m["deltas"] + [delta]
        self._write_manifest(m)
        if len(m["deltas"]) >= self.compact_every:
            self._compact()

    def _compact(self) -> None:
        m = self._manifest()
        merged = self._merged(
            ([m["base"]] if m["base"] else []) + m["deltas"]
        )
        if merged is None:
            return
        new_base = f"base/g{m['version']}"
        merged.write.mode("overwrite").parquet(f"{self.path}/{new_base}")
        old = ([m["base"]] if m["base"] else []) + m["deltas"]
        m["base"], m["deltas"] = new_base, []
        self._write_manifest(m)
        for p in old:
            shutil.rmtree(f"{self.path}/{p}", ignore_errors=True)

    # -- reads -----------------------------------------------------------
    def labeled(self) -> DataFrame | None:
        """The maintained labeled set: the deduplicated union of every
        ingested batch."""
        m = self._manifest()
        return self._merged(([m["base"]] if m["base"] else []) + m["deltas"])

    def _with_label(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "__label",
            (F.col(self.rel_col) >= self.pos_threshold).cast("int"),
        )

    def auc(self) -> DataFrame | None:
        """Exact tie-aware Mann-Whitney AUC over the maintained set
        (``functions/evalmetrics.rank_auc``); label = rel >= threshold."""
        from proxima_platform_spark.functions.evalmetrics import rank_auc

        cur = self.labeled()
        if cur is None:
            return None
        return rank_auc(
            self._with_label(cur), score=self.score_col, label="__label"
        )

    def precision(self, ks: list[int]) -> DataFrame | None:
        """Exact precision@k over the maintained set
        (``functions/evalmetrics.precision_at_k``)."""
        from proxima_platform_spark.functions.evalmetrics import (
            precision_at_k,
        )

        cur = self.labeled()
        if cur is None:
            return None
        return precision_at_k(
            self._with_label(cur),
            ks,
            id_col=self.id_col,
            score=self.score_col,
            label="__label",
        )

    def ndcg(self, ks: list[int]) -> DataFrame | None:
        """Exact graded NDCG@k over the maintained set
        (``functions/evalmetrics.ndcg_at_k``), per group when
        ``group_cols`` were declared."""
        from proxima_platform_spark.functions.evalmetrics import ndcg_at_k

        cur = self.labeled()
        if cur is None:
            return None
        return ndcg_at_k(
            cur,
            ks,
            id_col=self.id_col,
            score=self.score_col,
            rel=self.rel_col,
            group_cols=self.group_cols or None,
        )
