"""Streaming vocabulary-growth maintainer — the online twin of
``functions/text.vocab_growth`` (Heaps-law curve).

A live ingestion pipeline wants "is this source still adding
vocabulary" as a MONITOR, not a batch job: each micro-batch of
documents folds into two sufficient-statistic frames and the current
curve is exactly the batch ``vocab_growth`` over everything ingested.

State is NOT token occurrences (unbounded) but the two frames the
curve actually needs:

* per-doc ``(doc_id, bucket, n_tokens)`` — one row per document
  (whole-row dedup makes re-delivery a no-op);
* per-token ``(token, first_bucket)`` — min-merged across generations
  (min is associative/commutative/idempotent, the HLL-register law),
  bounded by VOCABULARY, which Heaps' law itself says grows
  sublinearly.

Base+delta parquet generations under a shared POSIX path with the
max-committed batch-id guard — the maintainer family shape
(``sketch_stream.ContinuousQuantileSketch``).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ContinuousVocabGrowth:
    """Continuously-maintained Heaps-law vocabulary-growth curve.

    ``update(batch)`` folds a micro-batch of ``(id_col, text_col)``
    documents; ``curve()`` returns (checkpoint, cum_docs, cum_tokens,
    cum_types) — row-for-row equal to batch ``vocab_growth`` over the
    union of everything ingested, across any batch split (pinned in
    tests). Documents are identified by ``id_col``: re-delivering a doc
    is a no-op; delivering a DIFFERENT text under an existing id is a
    contract violation (id collisions would double-count the per-doc
    frame).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        every: int = 100,
        compact_every: int = 4,
    ) -> None:
        if every < 1:
            raise ValueError(f"every must be >= 1, got {every}")
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.text_col = text_col
        self.every = every
        self.compact_every = compact_every
        os.makedirs(path, exist_ok=True)

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

    def _gen_frames(self, gen: str) -> tuple[DataFrame, DataFrame]:
        return (
            self.spark.read.parquet(f"{self.path}/{gen}/docs"),
            self.spark.read.parquet(f"{self.path}/{gen}/toks"),
        )

    def _merged(self, gens: list[str]) -> tuple[DataFrame, DataFrame] | None:
        if not gens:
            return None
        docs = self.spark.read.parquet(
            *[f"{self.path}/{g}/docs" for g in gens]
        ).dropDuplicates(["doc_id"])
        toks = (
            self.spark.read.parquet(
                *[f"{self.path}/{g}/toks" for g in gens]
            )
            .groupBy("w")
            .agg(F.min("fb").alias("fb"))
        )
        return docs, toks

    def update(self, batch: DataFrame, batch_id: int | None = None) -> None:
        from proxima_platform_spark.functions.dedup import tokens

        m = self._manifest()
        if batch_id is not None:
            if m["max_batch_id"] is not None and batch_id <= m["max_batch_id"]:
                return
            m["max_batch_id"] = batch_id
        v = m["version"] + 1
        delta = f"delta/d{v}"
        # id_col must be integral: a non-numeric id would cast to NULL and
        # dropDuplicates(['doc_id']) would then collapse every such doc
        # into one row — raise per-row instead (fail-loud convention,
        # r09 ADVICE; same guard as batch vocab_growth).
        raw_id = F.col(self.id_col).try_cast("long")
        checked_id = F.when(
            raw_id.isNull(),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"ContinuousVocabGrowth: {self.id_col} must cast"
                        " to long, got "
                    ),
                    F.coalesce(
                        F.col(self.id_col).cast("string"), F.lit("NULL")
                    ),
                )
            ),
        ).otherwise(raw_id)
        base = batch.select(
            checked_id.alias("doc_id"),
            tokens(F.col(self.text_col)).alias("__t"),
        ).localCheckpoint(eager=False)
        per_doc = base.select(
            "doc_id",
            (F.col("doc_id") - (F.col("doc_id") % self.every)).alias("b"),
            F.size("__t").alias("n_toks"),
        ).dropDuplicates(["doc_id"])
        first = (
            base.select(
                (F.col("doc_id") - (F.col("doc_id") % self.every)).alias(
                    "b"
                ),
                F.explode("__t").alias("w"),
            )
            .groupBy("w")
            .agg(F.min("b").alias("fb"))
        )
        per_doc.write.mode("overwrite").parquet(
            f"{self.path}/{delta}/docs"
        )
        first.write.mode("overwrite").parquet(f"{self.path}/{delta}/toks")
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
        docs, toks = merged
        new_base = f"base/g{m['version']}"
        docs.write.mode("overwrite").parquet(f"{self.path}/{new_base}/docs")
        toks.write.mode("overwrite").parquet(f"{self.path}/{new_base}/toks")
        old = ([m["base"]] if m["base"] else []) + m["deltas"]
        m["base"], m["deltas"] = new_base, []
        self._write_manifest(m)
        for p in old:
            shutil.rmtree(f"{self.path}/{p}", ignore_errors=True)

    def curve(self) -> DataFrame | None:
        """The current growth curve — exactly batch ``vocab_growth``
        over the union of everything ingested."""
        from pyspark.sql import Window

        m = self._manifest()
        merged = self._merged(
            ([m["base"]] if m["base"] else []) + m["deltas"]
        )
        if merged is None:
            return None
        docs, toks = merged
        per_bucket = docs.groupBy("b").agg(
            F.count(F.lit(1)).alias("__docs"),
            F.sum("n_toks").alias("__toks"),
        )
        new_types = toks.groupBy(F.col("fb").alias("b")).agg(
            F.count(F.lit(1)).alias("__new")
        )
        w = Window.orderBy("b").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return (
            per_bucket.join(new_types, "b", "left")
            .select(
                (F.col("b") + self.every).alias("checkpoint"),
                F.col("b"),
                "__docs",
                "__toks",
                F.coalesce("__new", F.lit(0)).alias("__new"),
            )
            .select(
                "checkpoint",
                F.sum("__docs").over(w).alias("cum_docs"),
                F.sum("__toks").over(w).alias("cum_tokens"),
                F.sum("__new").over(w).alias("cum_types"),
            )
        )
