"""Streaming WordPiece-vocabulary maintainer — the online twin of
``functions/wordpiece.wordpiece_vocab`` (VERDICT r12 'Next round' #5).

A live ingestion pipeline wants the tokenizer vocabulary to FOLLOW the
corpus (new domains push new substrings into the top-K) without
re-scanning everything ingested: each micro-batch folds into one
``(piece, cnt)`` substring-count frame — the vocabulary's sufficient
statistic, which is ADDITIVE across corpus slices — and the current
vocabulary is exactly batch ``wordpiece_vocab`` over the union of
everything ingested:

* per batch: ``wordpiece_substring_counts(batch)`` (the SAME stage
  function the batch builder runs, so per-slice counts agree by
  construction);
* merge across generations: ``groupBy(piece).sum(cnt)`` — sum is
  associative/commutative, so base+delta order never matters;
* ``vocab()``: ``wordpiece_select_vocab(merged)`` — the (cnt desc,
  piece asc) rank is a PURE FUNCTION of the merged counts, so
  batch-on-union equality holds by construction (pinned in
  ``TestContinuousWordpieceVocab``).

Maintainer-family contract (``sketch_stream.ContinuousQuantileSketch``
shape): base+delta parquet generations under a POSIX path with a
``manifest.json`` whose ``max_batch_id`` makes same-batch-id replay a
no-op (sink BEFORE manifest update, so a failed sink replays identical
rows). This is a COUNT-CARRYING member: re-delivering rows under a NEW
batch id double-counts and is a contract violation — the band-family
anti-join hardening does NOT apply here (same exemption as winnow's
``shared`` counts; see band_stream.py).

Scale (100 TB): per ingest one narrow explode + one map-side-combined
count agg; state is bounded by the distinct-substring count (Heaps-law
sublinear in the corpus); ``vocab()`` is one bounded-frame top-K —
no stage ever rescans ingested text.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ContinuousWordpieceVocab:
    """Continuously-maintained WordPiece vocabulary.

    ``update(batch)`` folds a micro-batch of documents;
    ``counts()`` returns the merged ``(piece, cnt)`` sufficient
    statistic; ``vocab()`` returns the one-column ``(piece)`` frame —
    row-for-row equal to batch ``wordpiece_vocab`` over the union of
    everything ingested, across any batch split.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        text_col: str = "text",
        vocab_size: int = 1000,
        max_piece_len: int = 8,
        compact_every: int = 4,
    ) -> None:
        if vocab_size < 0:
            raise ValueError(f"vocab_size must be >= 0, got {vocab_size}")
        if max_piece_len < 1:
            raise ValueError(
                f"max_piece_len must be >= 1, got {max_piece_len}"
            )
        self.spark = spark
        self.path = path
        self.text_col = text_col
        self.vocab_size = vocab_size
        self.max_piece_len = max_piece_len
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

    def _merged(self, gens: list[str]) -> DataFrame | None:
        if not gens:
            return None
        return (
            self.spark.read.parquet(
                *[f"{self.path}/{g}" for g in gens]
            )
            .groupBy("piece")
            .agg(F.sum("cnt").alias("cnt"))
        )

    def update(self, batch: DataFrame, batch_id: int | None = None) -> None:
        from proxima_platform_spark.functions.wordpiece import (
            wordpiece_substring_counts,
        )

        m = self._manifest()
        if batch_id is not None:
            if m["max_batch_id"] is not None and batch_id <= m["max_batch_id"]:
                return  # replay of a committed batch: no-op
            m["max_batch_id"] = batch_id
        v = m["version"] + 1
        delta = f"delta/d{v}"
        counts = wordpiece_substring_counts(
            batch, text_col=self.text_col, max_piece_len=self.max_piece_len
        )
        # sink BEFORE the manifest update: a crash between the two leaves
        # an unreferenced delta dir, and the replayed batch rewrites it
        counts.write.mode("overwrite").parquet(f"{self.path}/{delta}")
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

    def counts(self) -> DataFrame | None:
        """The merged ``(piece, cnt)`` sufficient statistic — equal to
        ``wordpiece_substring_counts`` over the ingested union."""
        m = self._manifest()
        return self._merged(
            ([m["base"]] if m["base"] else []) + m["deltas"]
        )

    def vocab(self) -> DataFrame | None:
        """The current vocabulary — exactly batch ``wordpiece_vocab``
        over the union of everything ingested."""
        from proxima_platform_spark.functions.wordpiece import (
            wordpiece_select_vocab,
        )

        merged = self.counts()
        if merged is None:
            return None
        return wordpiece_select_vocab(merged, vocab_size=self.vocab_size)

    def foreach_batch(self):
        """Adapter for ``writeStream.foreachBatch``."""

        def fn(batch: DataFrame, batch_id: int) -> None:
            self.update(batch, batch_id=batch_id)

        return fn
