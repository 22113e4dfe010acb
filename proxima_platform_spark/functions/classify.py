"""Count-based text classification: multinomial Naive Bayes.

Extension beyond the reference surface (north star: LLM training-data
pipelines). A fastText/CLD-class language or quality classifier reduced to
its exactly-reproducible core: multinomial Naive Bayes with Laplace
smoothing (McCallum & Nigam AAAI'98 workshop) is pure counting —
class priors from document counts, per-class token likelihoods from token
counts — which makes it the one classifier family whose training AND
inference are exact integer/decimal arithmetic end-to-end (engine-portable,
oracle-checkable), while still being the standard first-pass lang-ID /
domain-filter in data pipelines.

The model factors into SUFFICIENT STATISTICS (token counts per (class,
token) and document counts per class — both additive) plus a scoring step;
:func:`nb_counts` / :func:`nb_classify_from_counts` expose that split so
the streaming maintainer (streaming/classify_stream.py) folds micro-batches
into the same count frames and classifies identically to the batch path.

Scale shape:
  * training is two token-stream aggregations — groupBy(class, token) and
    groupBy(class) — both map-side combined; the model size is bounded by
    |classes| x |vocab|, independent of corpus size;
  * scoring joins the test token stream against the model on (token, class)
    after a x|classes| expansion. |classes| is small for lang-ID/quality
    gates (<= tens); for large label spaces prune the model to per-class
    top-K features first;
  * every ln is quantized (round 8dp -> decimal(18,10); with the count
    factor at decimal(9,0) the product stays inside precision 38, so Spark
    never triggers its silent overflow scale-reduction) before summation —
    scores are exact decimals, order-independent, identical cross-engine
    (the margin audit in tools/margin_check.py covers the rounding sites).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from proxima_platform_spark.functions.dedup import tokens


def nb_counts(
    train: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    top_k_features: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The model's sufficient statistics: (cwc, cdocs) where cwc =
    (c, w, cnt) token counts per (class, token) and cdocs = (c, nc)
    document counts per class. Both are ADDITIVE — a union of corpora sums
    them — which is what makes the streaming maintainer exact.

    ``top_k_features``: prune the model to each class's K most frequent
    tokens (ties by smallest token — a total order, so the pruned model
    is deterministic). This is the web-scale path for large label
    spaces: the model frame shrinks from |classes|×|vocab| to
    |classes|×K, and everything downstream (class token totals,
    vocabulary size, unseen likelihood) derives from the PRUNED frame,
    so the pruned model is self-consistent — a test token outside the
    kept features scores as unseen. One bounded window over the cwc
    frame (partitioned by class), nothing corpus-sized. NOTE: pruned
    counts are NOT additive (top-K of a union ≠ union of top-Ks) — a
    streaming maintainer must merge RAW counts and prune after the
    merge, which is what ``ContinuousNaiveBayes`` does when given the
    knob."""
    tr_tok = train.select(
        F.col(label_col).alias("c"), F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("w"),
    )
    cwc = tr_tok.groupBy("c", "w").agg(F.count(F.lit(1)).alias("cnt"))
    if top_k_features is not None:
        if top_k_features < 1:
            raise ValueError(
                f"top_k_features must be >= 1, got {top_k_features}"
            )
        from pyspark.sql import Window

        w = Window.partitionBy("c").orderBy(
            F.col("cnt").desc(), F.col("w").asc()
        )
        cwc = (
            cwc.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= top_k_features)
            .drop("__rn")
        )
    cdocs = train.groupBy(F.col(label_col).alias("c")).agg(
        F.count(F.lit(1)).alias("nc")
    )
    return cwc, cdocs


def nb_best_from_counts(
    cwc: DataFrame,
    cdocs: DataFrame,
    test: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score ``test`` from the sufficient-statistic frames — the label-free
    core of :func:`nb_classify_from_counts`.

    Model (Laplace add-1):
        log P(c)   = ln(docs_c / docs_total)
        log P(w|c) = ln((count(w,c) + 1) / (tokens_c + V))
    with V = |train vocabulary|; a test token unseen in class c (or in the
    whole vocabulary) takes the unseen likelihood ln(1 / (tokens_c + V)).
    score(d,c) = log P(c) + sum_w n_w(d) * log P(w|c); prediction is the
    argmax, ties broken by smallest label.

    Returns one row per scoreable test doc: (id, pred, score) with score
    the winning class's log-score as double. Pipelines that never surface
    the true label (ccnet classifies unlabeled crawl text) call this
    directly and skip the corpus-sized label passthrough join
    :func:`nb_classify_from_counts` adds."""
    class_tokens = cwc.groupBy("c").agg(F.sum("cnt").alias("tc"))
    vocab = cwc.select("w").distinct().agg(F.count(F.lit(1)).alias("v"))
    total_docs = cdocs.agg(F.sum("nc").alias("nd"))

    # per-class frame: prior + unseen likelihood (|classes| rows, broadcast)
    classes = (
        cdocs.crossJoin(F.broadcast(total_docs))
        .join(class_tokens, "c")
        .crossJoin(F.broadcast(vocab))
        .select(
            "c", "tc", "v",
            F.round(F.log(F.col("nc") / F.col("nd")), 8)
            .cast("decimal(18,10)").alias("log_prior"),
            F.round(F.log(F.lit(1.0) / (F.col("tc") + F.col("v"))), 8)
            .cast("decimal(18,10)").alias("lp_unseen"),
        )
    )
    # per-(class, token) log likelihood
    model = (
        cwc.join(class_tokens, "c")
        .crossJoin(F.broadcast(vocab))
        .select(
            "c", "w",
            F.round(F.log((F.col("cnt") + 1) / (F.col("tc") + F.col("v"))), 8)
            .cast("decimal(18,10)").alias("lp"),
        )
    )

    te_tok = (
        test.select(F.col(id_col).alias("id"),
                    F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("id", "w").agg(F.count(F.lit(1)).alias("n"))
    )
    scored = (
        te_tok.crossJoin(F.broadcast(classes.select("c", "lp_unseen")))
        .join(model, ["c", "w"], "left")
        .select(
            "id", "c",
            (F.col("n").cast("decimal(9,0)")
             * F.coalesce(F.col("lp"), F.col("lp_unseen")))
            .alias("term"),
        )
        .groupBy("id", "c").agg(F.sum("term").alias("ll"))
        .join(classes.select("c", "log_prior"), "c")
        .select("id", "c", (F.col("ll") + F.col("log_prior")).alias("score"))
    )
    # argmax with smallest-label tiebreak: min over (-score, label)
    return scored.groupBy("id").agg(
        F.min(F.struct((-F.col("score")).alias("ns"), F.col("c"))).alias("b")
    ).select(
        "id",
        F.col("b.c").alias("pred"),
        (-F.col("b.ns")).cast("double").alias("score"),
    )


def nb_classify_from_counts(
    cwc: DataFrame,
    cdocs: DataFrame,
    test: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
) -> DataFrame:
    """Classify ``test`` from the sufficient-statistic frames (see
    :func:`nb_best_from_counts` for the model): one row per test doc —
    (id, label (true), pred, score) — the label riding through for
    accuracy evaluation."""
    best = nb_best_from_counts(
        cwc, cdocs, test, id_col=id_col, text_col=text_col
    )
    return (
        test.select(F.col(id_col).alias("id"), F.col(label_col).alias("label"))
        .join(best, "id")
    )


def naive_bayes_classify(
    train: DataFrame,
    test: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    top_k_features: int | None = None,
) -> DataFrame:
    """Train multinomial NB on ``train`` and classify ``test`` (the one-shot
    batch form; see :func:`nb_counts` / :func:`nb_classify_from_counts` for
    the factored path the streaming maintainer shares).
    ``top_k_features`` prunes the model to per-class top-K tokens — the
    web-scale path for large label spaces (see :func:`nb_counts`)."""
    cwc, cdocs = nb_counts(
        train, id_col=id_col, text_col=text_col, label_col=label_col,
        top_k_features=top_k_features,
    )
    return nb_classify_from_counts(
        cwc, cdocs, test, id_col=id_col, text_col=text_col,
        label_col=label_col,
    )
