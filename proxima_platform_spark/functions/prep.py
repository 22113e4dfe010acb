"""Pretraining-preparation pipeline: gate → chunk → pack → manifest.

Batch and streaming forms of the same chain (north-star extension; the
streaming form mirrors the reference's defining property that any derived
computation also runs over the changelog — ReplicationController semantics,
`direct/ingest-server/.../ReplicationController.java`):

  * quality + repetition gate — the repetition counts ride an Arrow
    ``mapInPandas`` stage with the text carried through (no re-join);
  * 16-token chunking (stride 12) — narrow posexplode;
  * deterministic packing of chunks into fixed-token-budget bins over hash
    shards — one per-shard window cumsum;
  * per-(shard, bin) manifest — the unit a trainer would stream.

At 100 TB the batch form is gate (narrow) → chunk (narrow) → pack (one
shuffle per shard partition) → manifest agg (one shuffle). The streaming
form applies the identical chain per micro-batch via ``foreachBatch`` —
packing is batch-local (bins never span micro-batches), the deliberate
trade for unbounded input: a trainer consumes sealed bins as they land.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from proxima_platform_spark.functions.sampling import sequence_pack
from proxima_platform_spark.functions.text import (
    chunk_documents,
    quality_score,
    repetition_counts_arrow,
)


def pretraining_prep(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_min: float = 0.5,
    dup_word_max: float = 0.8,
    chunk_tokens: int = 16,
    stride: int = 12,
    budget: int = 256,
    n_shards: int = 8,
    chunks_per_doc_cap: int = 64,
    model_quality_min: float | None = None,
) -> DataFrame:
    """The batch manifest: one row per packed (shard, bin) with chunk and
    token counts. Chunk unit ids are ``doc_id * chunks_per_doc_cap +
    chunk_id`` (corpus contract: fewer than ``chunks_per_doc_cap`` chunks
    per document).

    ``model_quality_min``: optional model-based gate — additionally
    require ``quality_model_score(text) >= model_quality_min`` (the
    linear-classifier keep-probability; another literal-weight projection,
    so the gate adds zero shuffles to the plan)."""
    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        quality_score(F.col(text_col)).alias("quality"),
    )
    if model_quality_min is not None:
        from proxima_platform_spark.functions.text import quality_model_score

        scored = scored.where(
            quality_model_score(F.col("text")) >= model_quality_min
        )
    counts = repetition_counts_arrow(scored, keep=("text", "quality"))
    gated = counts.where(
        (F.col("quality") >= quality_min)
        & (
            F.round(
                F.when(
                    F.col("n_tok") > 0,
                    1.0
                    - F.col("n_tok_distinct").cast("double")
                    / F.col("n_tok").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            )
            <= dup_word_max
        )
    ).select("doc_id", "text")
    chunks = chunk_documents(gated, chunk_tokens=chunk_tokens, stride=stride)
    units = chunks.select(
        (F.col("doc_id") * chunks_per_doc_cap + F.col("chunk_id")).alias("unit_id"),
        "n_tokens",
    )
    packed = sequence_pack(
        units,
        id_col="unit_id",
        token_count_col="n_tokens",
        budget=budget,
        n_shards=n_shards,
    )
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def pretraining_prep_stream(
    stream_docs: DataFrame,
    sink,
    **prep_kwargs,
):
    """Run the identical gate→chunk→pack chain over a documents *stream*.

    ``sink(manifest_df, batch_id)`` receives each micro-batch's manifest —
    the same rows ``pretraining_prep`` produces on that micro-batch's data
    slice (pinned by TestStreamingPretrainingPrep). Returns a
    ``DataStreamWriter``; caller adds trigger/checkpoint and ``start()``.

    Packing is batch-local by design: bins seal at micro-batch boundaries
    so output is append-only and a trainer can consume bins as they land —
    the streaming analog of a bulk writer's time-windowed flush
    (AbstractBulkFileSystemAttributeWriter semantics).
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        sink(pretraining_prep(batch_df, **prep_kwargs), batch_id)

    return stream_docs.writeStream.foreachBatch(handle)


def curation_pipeline(
    docs: DataFrame,
    *,
    threshold: float = 0.65,
    span_tokens: int = 2,
) -> DataFrame:
    """Composed curation chain — model-based quality gate (logistic
    ``quality_model_score`` ≥ ``threshold``) → within-document
    repeated-span removal (:func:`dedup.self_dedup_spans`) → per-source
    summary ``(source, n_docs, spans_dropped, clean_tokens, avg_score)``
    with a decimal-exact average score.

    The shared engine behind the certified ``curation_pipeline`` query
    AND :func:`curation_pipeline_stream` — one implementation, two
    execution modes (the ``pretraining_prep`` pattern). Plan: one
    zero-shuffle gate projection (staged once via a lazy localCheckpoint
    so the span chain's consumers don't re-run the interpreted
    model-score stack), the span operator's keyed shuffles, one
    source-bounded agg."""
    from proxima_platform_spark.functions.dedup import self_dedup_spans
    from proxima_platform_spark.functions.text import (
        quality_model_score,
        token_count,
    )

    gated = (
        docs.select(
            "doc_id", "source", "text",
            quality_model_score(F.col("text")).alias("score"),
        )
        .where(F.col("score") >= threshold)
        .localCheckpoint(eager=False)
    )
    sd = self_dedup_spans(gated, span_tokens=span_tokens)
    # project the gate frame to the three columns the summary consumes
    # before the join — the raw text would otherwise ride the join
    # exchange only to be dropped by the aggregate (guide §2.3: project
    # before the exchange; the span operator still sees full text via sd)
    joined = gated.select("doc_id", "source", "score").join(sd, "doc_id")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_spans") - F.col("n_kept")).alias("spans_dropped"),
        F.sum(token_count(F.col("text_dedup")).cast("long")).alias(
            "clean_tokens"
        ),
        F.round(
            F.sum(F.col("score").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_score"),
    )


def ccnet_pipeline(
    docs: DataFrame,
    lang_train: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    lo_q: float = 0.3,
    hi_q: float = 0.7,
) -> DataFrame:
    """The CCNet curation chain (Wenzek'20), end to end in one plan —
    the signature modern-LLM corpus-curation recipe, composed from the
    individually-certified operators in this package, in CCNet's order:

      1. paragraph-level exact dedup with reassembly
         (:func:`dedup.dedup_paragraphs`); documents whose every
         paragraph was a corpus-wide duplicate drop out;
      2. language identification over the DEDUPED text via multinomial
         Naive Bayes (:func:`classify.nb_counts` /
         ``nb_classify_from_counts``) trained on ``lang_train`` — the
         stand-in for CCNet's pretrained fastText model (training uses
         the ORIGINAL labeled text; classification sees only cleaned
         text, like CCNet classifies post-dedup);
      3. 5-gram Kneser-Ney fluency per deduped document
         (:func:`ranking.kneser_ney5_scores` — the KenLM order CCNet
         runs), then EXACT ``[lo_q, hi_q]`` global thresholds via
         histogram bisection (:func:`selection.exact_quantile_bisect`,
         no global sort) split the corpus into CCNet's head / middle /
         tail perplexity buckets (head = most fluent; membership
         compares integer micro-units, never raw doubles);
      4. per-(predicted language, bucket) intake summary —
         ``(pred_lang, bucket, n_docs, clean_tokens, avg_kn5)`` with a
         decimal-exact average score.

    Scale shape: dedup is three keyed shuffles; NB is two bounded-model
    joins (model frames bounded by classes×vocab, broadcast); KN5 is
    two type-table window cascades + ONE occurrence join; the bisection
    reads ≤256-cell histograms driver-side; the final agg is bounded by
    langs×3. Docs shorter than 5 tokens after dedup carry no 5-gram and
    drop out of the banded summary (same contract as
    ``kneser_ney5_scores``)."""
    from proxima_platform_spark.functions.classify import (
        nb_best_from_counts,
        nb_counts,
    )
    from proxima_platform_spark.functions.dedup import dedup_paragraphs
    from proxima_platform_spark.functions.ranking import kneser_ney5_scores

    dd = dedup_paragraphs(docs, id_col=id_col, text_col=text_col)
    # staged once: the cleaned frame feeds NB scoring, the KN5 gram
    # explosion, AND the summary token counts — without the checkpoint
    # Catalyst re-derives the whole dedup chain per consumer
    clean = (
        dd.where(F.col("n_kept") > 0)
        .select(F.col(id_col), F.col("text_dedup").alias(text_col))
        .localCheckpoint(eager=False)
    )

    cwc, cdocs = nb_counts(
        lang_train, id_col=id_col, text_col=text_col, label_col=label_col
    )
    # the classifier needs no true label (CCNet classifies raw crawl
    # text) and this pipeline never surfaces one — the label-free
    # scoring core skips both the docs-label passthrough join and the
    # final label re-attach join (two corpus-sized joins that carried a
    # column the summary discards; r13)
    pred = nb_best_from_counts(
        cwc, cdocs, clean, id_col=id_col, text_col=text_col
    ).select(F.col("id").alias(id_col), "pred")

    kn = kneser_ney5_scores(clean, id_col=id_col, text=text_col)
    return ccnet_summary_from_scores(
        clean, pred, kn, lo_q=lo_q, hi_q=hi_q,
        id_col=id_col, text_col=text_col,
    )


def ccnet_summary_from_scores(
    clean: DataFrame,
    pred: DataFrame,
    kn: DataFrame,
    *,
    lo_q: float,
    hi_q: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Steps 3b-4 of the CCNet chain from already-built frames: exact
    global ``[lo_q, hi_q]`` thresholds over ``kn.kn5_score`` via histogram
    bisection, head/middle/tail bucketing in integer micro-units, and the
    per-(predicted language, bucket) intake summary. Shared VERBATIM by
    batch :func:`ccnet_pipeline` and the cross-batch maintained
    ``streaming/ccnet_stream.ContinuousCcnet`` — the banding/summary
    stage is identical by construction, so the maintained summary can
    only differ from batch-on-union through its input frames (which the
    maintainer pins equal in tests)."""
    from proxima_platform_spark.functions.selection import (
        exact_quantiles_bisect,
    )
    from proxima_platform_spark.functions.text import token_count

    kn = kn.localCheckpoint(eager=False)
    # both band ends from ONE lockstep bisection — half the histogram
    # scans and driver round-trips of two sequential bisect calls,
    # value-identical by construction (selection.exact_quantiles_bisect)
    band = exact_quantiles_bisect(kn, "kn5_score", [lo_q, hi_q])
    if band is None:
        # every document dropped before scoring (empty input, fully
        # duplicate corpus, or all docs < 5 tokens after dedup) — a
        # realistic micro-batch for the streaming twin: return the
        # empty summary with the output schema instead of crashing on
        # the quantile collect
        return clean.sparkSession.createDataFrame(
            [],
            "pred_lang string, bucket string, n_docs bigint,"
            " clean_tokens bigint, avg_kn5 double",
        )
    lo, hi = band
    lo_m, hi_m = int(round(lo * 1_000_000)), int(round(hi * 1_000_000))
    sm = F.round(F.col("kn5_score") * 1_000_000).cast("long")
    bucketed = kn.select(
        id_col,
        "kn5_score",
        F.when(sm > hi_m, F.lit("head"))
        .when(sm >= lo_m, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
    # per-doc token counts BEFORE the join: the summary only ever sums
    # them, so the two id-keyed joins exchange (id, long) instead of the
    # full cleaned text (guide §2.3 — shuffle metadata, not payloads)
    tc = clean.select(
        F.col(id_col),
        token_count(F.col(text_col)).cast("long").alias("__tc"),
    )
    return (
        bucketed.join(pred, id_col)
        .join(tc, id_col)
        .groupBy(F.col("pred").alias("pred_lang"), F.col("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__tc").alias("clean_tokens"),
            F.round(
                F.sum(F.col("kn5_score").cast("decimal(18,6)")).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("avg_kn5"),
        )
    )


def ccnet_pipeline_stream(
    stream_docs: DataFrame,
    lang_train: DataFrame,
    sink,
    **ccnet_kwargs,
):
    """Run the identical dedup→lang-ID→perplexity-band chain over a
    documents *stream*: ``sink(summary_df, batch_id)`` receives each
    micro-batch's per-(lang, bucket) summary — the same rows
    :func:`ccnet_pipeline` produces on that micro-batch's slice (pinned
    by TestStreamingCcnet). ``lang_train`` is the fixed labeled corpus
    (CCNet's model is pretrained — it does NOT drift with the stream);
    dedup scope and band thresholds are batch-local by design, the same
    seal-at-batch-boundary trade the other ``*_stream`` twins make. For
    cross-batch maintained models see ``ContinuousNaiveBayes`` and
    ``ContinuousKneserNey``, which maintain both models' sufficient
    statistics exactly over the union. Returns a ``DataStreamWriter``;
    caller adds trigger/checkpoint and ``start()``."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        sink(ccnet_pipeline(batch_df, lang_train, **ccnet_kwargs), batch_id)

    return stream_docs.writeStream.foreachBatch(handle)


def curation_pipeline_stream(
    stream_docs: DataFrame,
    sink,
    **curation_kwargs,
):
    """Run the identical gate→span-dedup→summary chain over a documents
    *stream*: ``sink(summary_df, batch_id)`` receives each micro-batch's
    per-source summary — the same rows :func:`curation_pipeline` produces
    on that micro-batch's slice (pinned by TestStreamingCuration).
    Summaries are batch-local by design (a monitor consumes per-batch
    curation health; cross-batch totals are one rollup away) — the same
    seal-at-batch-boundary trade ``pretraining_prep_stream`` makes.
    Returns a ``DataStreamWriter``; caller adds trigger/checkpoint and
    ``start()``."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        sink(curation_pipeline(batch_df, **curation_kwargs), batch_id)

    return stream_docs.writeStream.foreachBatch(handle)
