"""Exact ranking-quality metrics: Mann-Whitney AUC and precision@k.

Extension beyond the reference surface (north star operators). Embedding
and quality-model pipelines need their rankings SCORED — does
similarity-to-anchor actually retrieve same-label items, does the quality
gate rank good documents above bad ones. Both metrics here are exact and
engine-replayable:

* AUC via the rank-sum identity (Mann-Whitney U): with tie-averaged ranks
  r_i over the pooled scores,

      AUC = (Σ_{i∈pos} r_i − n_pos(n_pos+1)/2) / (n_pos · n_neg)

  Every quantity is an integer or a .5-decimal (tie-averaged ranks), so
  the numerator is EXACT decimal arithmetic; only the final division is
  a double op. No sampling, no trapezoids over threshold sweeps.

* precision@k: fraction of positives among the k best-scored rows under a
  total (score desc, id) order — deterministic under score ties.

Scale shape: ranks come from ONE window over the scored frame — if the
scored population is huge, pre-aggregate to (score, n_pos, n_neg) groups
first (the rank-sum identity only needs per-distinct-score counts, which
is what the implementation does: the window runs over |distinct scores|
rows, not rows). precision@k is a TakeOrderedAndProject-shaped top-k.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def rank_auc(
    scored: DataFrame, *, score: str = "score", label: str = "label"
) -> DataFrame:
    """One-row (n_pos, n_neg, auc) — exact tie-aware Mann-Whitney AUC of
    ``score`` predicting boolean/0-1 ``label``.

    The per-distinct-score tie group [c+1, c+cnt] (c = rows strictly
    below) has average rank (2c + cnt + 1)/2; the implementation carries
    DOUBLED ranks so every quantity is a plain int64 —

        auc = (Σ_{pos} 2·r_i − n_pos(n_pos+1)) / (2 · n_pos · n_neg)

    — and the ONLY non-integer op is the final double division.
    """
    g = (
        scored.select(
            F.col(score).alias("__s"),
            F.col(label).cast("int").alias("__l"),
        )
        .groupBy("__s")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.sum("__l").alias("__pos"),
        )
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = g.select(
        "__pos",
        "__cnt",
        F.coalesce(F.sum("__cnt").over(w), F.lit(0)).alias("__below"),
    )
    rank_x2 = F.lit(2) * F.col("__below") + F.col("__cnt") + F.lit(1)
    agg = ranked.agg(
        F.sum(F.col("__pos")).alias("n_pos"),
        F.sum(F.col("__cnt") - F.col("__pos")).alias("n_neg"),
        F.sum(rank_x2 * F.col("__pos")).alias("__rsum2"),
    )
    u2 = F.col("__rsum2") - F.col("n_pos") * (F.col("n_pos") + 1)
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(
            u2.cast("double")
            / (
                F.lit(2.0)
                * F.col("n_pos").cast("double")
                * F.col("n_neg").cast("double")
            ),
            6,
        ).alias("auc"),
    )


def precision_at_k(
    scored: DataFrame,
    ks: Sequence[int],
    *,
    id_col: str = "id",
    score: str = "score",
    label: str = "label",
) -> DataFrame:
    """One row per k in ``ks``: (k, n_hits, precision) of the k
    best-scored rows under the total (score desc, id) order. A single
    rank window over the scored frame serves every k; callers with huge
    populations bound it by pre-filtering to the max(k) candidates per
    partition (TakeOrdered shape)."""
    if not ks or any(k < 1 for k in ks):
        raise ValueError(f"ks must be non-empty positive ints, got {ks}")
    w = Window.orderBy(F.col("__s").desc(), F.col("__id"))
    ranked = scored.select(
        F.col(id_col).alias("__id"),
        F.col(score).alias("__s"),
        F.col(label).cast("int").alias("__l"),
    ).withColumn("__r", F.row_number().over(w))
    mx = max(ks)
    top = ranked.where(F.col("__r") <= mx)
    per_k = None
    for k in sorted(ks):
        row = top.where(F.col("__r") <= k).agg(
            F.lit(k).alias("k"),
            F.sum("__l").alias("n_hits"),
            F.round(
                F.sum("__l").cast("double") / F.count(F.lit(1)), 6
            ).alias("precision"),
        )
        per_k = row if per_k is None else per_k.unionAll(row)
    return per_k


def ndcg_at_k(
    scored: DataFrame,
    ks: Sequence[int],
    *,
    id_col: str = "id",
    score: str = "score",
    rel: str = "rel",
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Exact NDCG@k with graded relevance — the third leg of the
    retrieval-eval trio next to :func:`rank_auc` and
    :func:`precision_at_k`.

    One row per (group, k): ``(group..., k, dcg, idcg, ndcg)`` with

        dcg@k  = Σ_{r ≤ k} (2^rel_r − 1) / log2(r + 1)
        idcg@k = the same sum over relevance sorted descending
        ndcg   = dcg / idcg   (NULL when idcg = 0 — no relevant item)

    Determinism: the ranking is the total (score desc, id) order and the
    ideal ranking the total (rel desc, id) order, so both engines pick
    identical term sets; gains 2^rel − 1 are exact int64 (rel outside
    [0, 62] or NULL FAILS LOUDLY — silently dropping such rows would
    shift every rank below them and diverge from any SQL twin in
    exactly the regime the guard targets), and dcg/idcg/ndcg are
    rounded to 6 dp, absorbing aggregation-order ulps in the double sum
    (the bm25/tpch rounding convention). Scale shape: two rank windows
    per group bounded by max(k) rows retained, one aggregation —
    rankings at eval time are top-N frames by contract, never the
    corpus.
    """
    if not ks or any(k < 1 for k in ks):
        raise ValueError(f"ks must be non-empty positive ints, got {ks}")
    groups = [F.col(g) for g in (group_cols or [])]
    gnames = list(group_cols or [])
    raw_rel = F.col(rel).cast("long")
    base = scored.select(
        *gnames,
        F.col(id_col).alias("__id"),
        F.col(score).alias("__s"),
        # 2^rel must fit int64: any NULL / negative / >= 63 relevance is
        # a data bug — raise per-row instead of silently re-ranking
        F.when(
            raw_rel.isNull() | (raw_rel < 0) | (raw_rel >= 63),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"ndcg_at_k: {rel} must be a non-null int"
                        " in [0, 62], got "
                    ),
                    F.coalesce(raw_rel.cast("string"), F.lit("NULL")),
                )
            ),
        )
        .otherwise(raw_rel)
        .alias("__rel"),
    )
    # SQL form: the Python F.shiftleft only takes a literal bit count
    gain = F.expr("shiftleft(1L, CAST(__rel AS INT)) - 1L")
    wr = Window.partitionBy(*groups).orderBy(F.col("__s").desc(), "__id")
    wi = Window.partitionBy(*groups).orderBy(F.col("__rel").desc(), "__id")
    ranked = base.select(
        *gnames,
        gain.alias("__g"),
        F.row_number().over(wr).alias("__r"),
        F.row_number().over(wi).alias("__ri"),
    )
    mx = max(ks)
    top = ranked.where((F.col("__r") <= mx) | (F.col("__ri") <= mx))
    out = None
    for k in sorted(ks):
        dcg = F.sum(
            F.when(
                F.col("__r") <= k,
                F.col("__g").cast("double")
                / F.log2(F.col("__r").cast("double") + 1.0),
            ).otherwise(F.lit(0.0))
        )
        idcg = F.sum(
            F.when(
                F.col("__ri") <= k,
                F.col("__g").cast("double")
                / F.log2(F.col("__ri").cast("double") + 1.0),
            ).otherwise(F.lit(0.0))
        )
        row = top.groupBy(*groups).agg(
            F.lit(k).alias("k"),
            F.round(dcg, 6).alias("dcg"),
            F.round(idcg, 6).alias("idcg"),
            F.round(
                F.when(idcg > 0, dcg / idcg).otherwise(F.lit(None)), 6
            ).alias("ndcg"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def cohens_kappa(
    rated: DataFrame, *, rater_a: str, rater_b: str
) -> DataFrame:
    """Cohen's kappa — chance-corrected inter-annotator agreement between
    two categorical raters (Cohen'60), THE acceptance gate on labeling
    runs before labels feed an eval set or a quality model.

    With N items, diagonal agreement count S = Σ_k c_kk and marginal
    products M = Σ_k row_k · col_k,

        kappa = (p_o − p_e) / (1 − p_e) = (N·S − M) / (N² − M)

    — a ratio of two pure int64 quantities, so the ONLY floating-point
    op is the final correctly-rounded double division: exact and
    engine-identical, no intermediate probability ever materializes.
    Degenerate chance agreement (p_e = 1, i.e. N² = M: both raters
    constant) returns NULL.

    Output: one row (n_items, observed_agree, kappa).

    Scale shape: one map-side-combined count agg keyed by the label pair
    (cardinality = |categories|², not items), then an O(|categories|)
    driver-free reduction — at 100 TB the only shuffle is the tiny pair
    histogram.
    """
    def _checked(col: str, tag: str):
        # A NULL rater label would be counted in N but fall out of both
        # the agreement diagonal (NULL == NULL is NULL) and the marginal
        # join, silently skewing kappa — raise per-row instead, matching
        # the ndcg_at_k / calibration fail-loud convention.
        raw = F.col(col)
        return F.when(
            raw.isNull(),
            F.raise_error(
                F.lit(f"cohens_kappa: {tag} column {col} must be non-null")
            ),
        ).otherwise(raw)

    # the |categories|²-cell histogram is consumed by THREE branches
    # (row marginals, col marginals, the N/S base agg); without the pin
    # Catalyst inlines the whole upstream — scan, gates, any Arrow
    # stage — into each branch, tripling the corpus scans (observed as
    # arrow=3 in the plan guard). Bounded frame: safe to checkpoint.
    pairs = rated.groupBy(
        _checked(rater_a, "rater_a").alias("__a"),
        _checked(rater_b, "rater_b").alias("__b"),
    ).agg(F.count(F.lit(1)).alias("__c")).localCheckpoint(eager=False)
    rows = pairs.groupBy("__a").agg(F.sum("__c").alias("__ra"))
    cols = pairs.groupBy("__b").agg(F.sum("__c").alias("__cb"))
    marg = (
        rows.join(cols, rows["__a"] == cols["__b"])
        .agg(F.sum(F.col("__ra") * F.col("__cb")).alias("m"))
    )
    base = pairs.agg(
        F.sum("__c").alias("n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__c"))).alias("s"),
    )
    return base.crossJoin(F.broadcast(marg)).select(
        F.col("n").alias("n_items"),
        F.coalesce("s", F.lit(0)).alias("observed_agree"),
        F.when(
            F.col("n") * F.col("n") != F.col("m"),
            F.round(
                (
                    F.col("n") * F.coalesce("s", F.lit(0)) - F.col("m")
                ).cast("double")
                / (F.col("n") * F.col("n") - F.col("m")).cast("double"),
                6,
            ),
        ).alias("kappa"),
    )


def _calibration_binned(
    scored: DataFrame, score: str, label: str, bins: int
) -> DataFrame:
    """(bin, __sm, __l) with the pure-integer equal-width bin assignment
    shared by :func:`calibration_ece` and :func:`calibration_bins`:
    s_micro = round(score·1e6) int64, bin = min(s_micro·bins div 1e6,
    bins−1) — integral division, no float floor whose boundary could
    drift between engines.

    Scores outside [0, 1] (or NULL) FAIL LOUDLY: a calibration score is
    a probability by contract — silently clamping >1 into the top bin
    hides the bug being measured, and a NEGATIVE micro value would hit
    the one true engine divergence here (Spark ``div`` truncates toward
    zero, SQL ``//`` floors)."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    raw = F.col(score).cast("double")
    checked = F.when(
        raw.isNull() | (raw < 0.0) | (raw > 1.0),
        F.raise_error(
            F.concat(
                F.lit(
                    f"calibration: {score} must be a non-null"
                    " probability in [0, 1], got "
                ),
                F.coalesce(raw.cast("string"), F.lit("NULL")),
            )
        ),
    ).otherwise(raw)
    return scored.select(
        F.round(checked * 1_000_000).cast("long").alias("__sm"),
        F.col(label).cast("long").alias("__l"),
    ).select(
        F.least(
            F.expr(f"(__sm * {bins}) div 1000000").cast("int"),
            F.lit(bins - 1),
        ).alias("bin"),
        "__sm",
        "__l",
    )


def calibration_ece(
    scored: DataFrame,
    *,
    score: str = "score",
    label: str = "label",
    bins: int = 10,
) -> DataFrame:
    """Expected calibration error of a probabilistic scorer (Naeini'15 /
    Guo'17 ECE) — the go/no-go check before a model-based quality gate's
    scores are trusted as probabilities (a miscalibrated gate silently
    shifts the kept-corpus mix at any fixed threshold):

        ECE = Σ_b (n_b / N) · |acc_b − conf_b|

    over ``bins`` equal-width score bins. Output is ONE row
    (n_items, ece); :func:`calibration_bins` returns the per-bin
    reliability-diagram frame.

    Engine portability: bin assignment is pure integer arithmetic on
    micro-unit scores (round(score·1e6) int64, bin = min(s_micro·bins
    div 1e6, bins−1) — no float-boundary floor); conf sums accumulate
    the micro-units exactly; each bin's term rounds at 8 dp into exact
    decimals before the cross-bin sum, so the final ECE never depends
    on double summation order.

    Scale shape: one map-side-combined agg to ``bins`` cells, then an
    O(bins) reduction. The scored population never sorts.
    """
    binned = _calibration_binned(scored, score, label, bins)
    # the bins-cell frame feeds both the total agg and the term select;
    # pin it so the corpus-sized binning subtree runs once, not per
    # branch (the cohens_kappa duplication shape). Bounded: bins rows.
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__sm").alias("__sms"),
        F.sum("__l").alias("__pos"),
    ).localCheckpoint(eager=False)
    tot = per_bin.agg(F.sum("n").alias("nn"))
    term = F.round(
        (F.col("n").cast("double") / F.col("nn"))
        * F.abs(
            F.col("__pos").cast("double") / F.col("n")
            - F.col("__sms").cast("double") / F.lit(1_000_000.0) / F.col("n")
        ),
        8,
    ).cast("decimal(28,10)")
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .select(F.col("nn"), term.alias("__term"))
        .groupBy("nn")
        .agg(F.round(F.sum("__term").cast("double"), 6).alias("ece"))
        .select(F.col("nn").alias("n_items"), "ece")
    )


def calibration_bins(
    scored: DataFrame,
    *,
    score: str = "score",
    label: str = "label",
    bins: int = 10,
) -> DataFrame:
    """Reliability-diagram frame for :func:`calibration_ece`: one row per
    non-empty equal-width score bin — (bin, n, conf, acc). Same integer
    micro-unit binning and exactness contract as the ECE scalar."""
    binned = _calibration_binned(scored, score, label, bins)
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum("__sm").cast("double") / 1_000_000.0 / F.count(F.lit(1)), 6
        ).alias("conf"),
        F.round(
            F.sum("__l").cast("double") / F.count(F.lit(1)), 6
        ).alias("acc"),
    )


def log_bleu2_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """log-BLEU-2 of candidate ``id_b`` against reference ``id_a`` for each
    pair (Papineni et al. ACL'02) — the verification metric for near-dup
    candidate pairs: a high modified-n-gram precision confirms the LSH
    candidate as a true near-verbatim pair; a low one exposes a banding
    false positive.

        p_n   = clipped n-gram matches / candidate n-gram count (n = 1, 2)
        BP    = min(1, e^(1 - r/c))  (r = ref length, c = cand length)
        log BLEU-2 = ln BP + (ln p_1 + ln p_2) / 2

    The score stays in LOG space: ln BP = least(0, 1 - r/c) is exact
    rational arithmetic (no transcendental), and each ln p_n quantizes to
    8dp decimal before the mean — deterministic, engine-portable doubles.
    Pairs with zero bigram overlap (ln undefined) are dropped; exact
    duplicates score 0.

    Scale shape: per-doc n-gram multisets come from one explode→groupBy
    per order; the pair scoring joins candidate grams to the (bounded) pair
    list first and left-joins reference counts — work is
    O(Σ_pairs |grams(cand)|), never corpus-quadratic (pairs are LSH
    candidates by construction).

    Output: (id_a, id_b, clip1, tot1, clip2, tot2, log_bleu2).
    """
    from proxima_platform_spark.functions.dedup import (
        shingles_from_tokens,
        tokens,
    )

    toked = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks")
    )

    def gram_counts(n: int) -> DataFrame:
        src = toked.select(
            "id",
            F.explode(
                F.col("__toks") if n == 1
                else shingles_from_tokens(F.col("__toks"), n)
            ).alias("g"),
        )
        return src.groupBy("id", "g").agg(F.count(F.lit(1)).alias("cnt"))

    lens = toked.select("id", F.size("__toks").alias("len"))
    p = pairs.select(F.col(a_col).alias("id_a"), F.col(b_col).alias("id_b"))

    def order_stats(n: int, clip_name: str, tot_name: str) -> DataFrame:
        grams = gram_counts(n)
        cand = p.join(grams.withColumnRenamed("id", "id_b"), "id_b").select(
            "id_a", "id_b", "g", F.col("cnt").alias("cb")
        )
        ref = grams.select(
            F.col("id").alias("id_a"), "g", F.col("cnt").alias("ca")
        )
        return (
            cand.join(ref, ["id_a", "g"], "left")
            .groupBy("id_a", "id_b")
            .agg(
                F.sum(F.least(F.col("cb"), F.coalesce(F.col("ca"), F.lit(0))))
                .alias(clip_name),
                F.sum("cb").alias(tot_name),
            )
        )
    s1 = order_stats(1, "clip1", "tot1")
    s2 = order_stats(2, "clip2", "tot2")
    joined = (
        s1.join(s2, ["id_a", "id_b"])
        .join(lens.withColumnRenamed("id", "id_a")
                  .withColumnRenamed("len", "rlen"), "id_a")
        .join(lens.withColumnRenamed("id", "id_b")
                  .withColumnRenamed("len", "clen"), "id_b")
        .where((F.col("clip1") > 0) & (F.col("clip2") > 0))
    )
    lp1 = F.round(F.log(F.col("clip1") / F.col("tot1")), 8).cast(
        "decimal(18,10)"
    )
    lp2 = F.round(F.log(F.col("clip2") / F.col("tot2")), 8).cast(
        "decimal(18,10)"
    )
    bp_log = F.least(F.lit(0.0), F.lit(1.0) - F.col("rlen") / F.col("clen"))
    return joined.select(
        "id_a", "id_b", "clip1", "tot1", "clip2", "tot2",
        F.round(
            bp_log + ((lp1 + lp2).cast("double") / F.lit(2.0)), 6
        ).alias("log_bleu2"),
    )
