"""Continuously-maintained ICWS (weighted-MinHash) band index: online
tf-WEIGHTED near-duplicate detection over an unbounded document stream —
the streaming twin of ``functions/dedup.icws_candidate_pairs``, closing
the tf-weighted axis of the streaming dedup tier (exact / minhash /
winnow / containment / weighted).

The ``ContinuousWinnowIndex`` manifest pattern applied to 0-bit
Improved Consistent Weighted Sampling (Ioffe ICDM'10; Li KDD'15): each
micro-batch's documents are banded by the SAME expression stage the
batch operator uses (``dedup.icws_band_rows`` — one code path, so batch
and maintained band keys are identical by construction), probed against
the union of the index-so-far and the batch itself, and appended as a
delta parquet generation.

Report semantics (the exact-twin argument): a document's band keys are
a pure per-document function of its text — they arrive ATOMICALLY with
the batch and never change. A candidate pair (a, b) exists in the batch
operator iff the two docs share at least one band key; with the probe
joining the batch side against the union, that pair is reported exactly
once, in the batch where its LATER member arrives (all of a's bands are
already indexed when b shows up; a within-batch pair is caught by the
batch side being folded into the probe). There is no cap/saturation
regime in the batch operator, so accumulated reports over ANY batch
sequence equal ``icws_candidate_pairs`` over the union — exactly,
with no divergence case (unlike winnow/containment, whose
``max_docs_per_*`` caps retroact). Pinned in
``tests/test_streaming.py::TestContinuousIcwsIndex``.

Delivery is the standard at-least-once foreachBatch contract: sink
BEFORE ``update`` (a replayed batch probes an unchanged index and
reproduces identical rows; the sink dedups on batch_id).

At scale: state is O(docs · bands) rows — ``bands`` strings per doc,
the smallest per-doc state of any maintainer in the tier; the per-batch
probe is one equi-join ON the band key (batch side small — AQE
broadcasts it) and one distinct. Signature computation is joinless
(min_by aggregation per (doc, seed)); no all-pairs anywhere. Same
shared-POSIX-path storage contract as the other maintainers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from proxima_platform_spark.streaming.winnow_stream import (
    ContinuousWinnowIndex,
)


class ContinuousIcwsIndex(ContinuousWinnowIndex):
    """Append-only ``(doc_id, fp)`` band-key index with base+delta
    parquet generations (manifest machinery inherited from
    :class:`ContinuousWinnowIndex`), replay-safe via the
    max-committed-batch_id guard.

    ``ingest(batch_df, batch_id)`` runs the full online step — band the
    batch with the batch operator's own expression stage, report every
    tf-weighted candidate pair in which at least one member is in THIS
    batch to ``sink(pairs_df, batch_id)``, fold the batch's band rows
    into the index — and is usable directly as a ``foreachBatch``
    callback."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        num_hashes: int = 6,
        bands: int = 3,
        sink=None,
        compact_every: int = 4,
    ) -> None:
        if num_hashes % bands:
            raise ValueError("bands must divide num_hashes")
        super().__init__(
            spark,
            path,
            id_col=id_col,
            text_col=text_col,
            sink=sink,
            compact_every=compact_every,
        )
        self.num_hashes = num_hashes
        self.bands = bands

    def band_rows(self) -> DataFrame | None:
        """The maintained distinct ``(doc_id, fp)`` band-key index."""
        return self.fingerprints()

    def ingest(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        """One online step: band the batch, report every (id_a, id_b)
        candidate pair (id_a < id_b, distinct) in which at least one
        member is in THIS batch — new-vs-accepted AND within-batch, the
        module docstring's exact-twin argument — to
        ``sink(pairs_df, batch_id)``, then fold the batch's band rows
        into the index."""
        from proxima_platform_spark.functions.dedup import icws_band_rows

        bands_b = (
            icws_band_rows(
                batch_df,
                self.id_col,
                self.text_col,
                num_hashes=self.num_hashes,
                bands=self.bands,
            )
            .select(F.col("id").alias(self.id_col), F.col("band").alias("fp"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        idx = self.fingerprints()
        probe = bands_b if idx is None else idx.unionByName(bands_b).distinct()
        a = probe.select(F.col(self.id_col).alias("__pa"), "fp")
        b = bands_b.select(F.col(self.id_col).alias("__pb"), "fp")
        pairs = (
            a.join(b, "fp")
            .where(F.col("__pa") != F.col("__pb"))
            .select(
                F.least("__pa", "__pb").alias("id_a"),
                F.greatest("__pa", "__pb").alias("id_b"),
            )
            .distinct()
        )
        # sink BEFORE update: a replayed batch probes an unchanged index
        # and reproduces identical rows; the sink dedups on batch_id
        if self.sink is not None:
            self.sink(pairs, batch_id)
        self.update(bands_b, batch_id)


def icws_pairs_stream(
    stream_docs: DataFrame,
    index: ContinuousIcwsIndex,
):
    """Structured-Streaming wrapper: ``ingest`` per micro-batch. Returns
    a ``DataStreamWriter`` — caller adds trigger/checkpoint and
    ``start()``."""
    return stream_docs.writeStream.foreachBatch(index.ingest)
