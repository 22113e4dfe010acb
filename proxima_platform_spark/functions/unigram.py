"""Unigram-LM (SentencePiece-style) subword tokenization: Viterbi
encoding against a piece-probability table, and EM training of that
table from a corpus (Kudo'18, "Subword Regularization") — the third and
last member of the tokenizer tier (BPE = merge-list, WordPiece =
longest-match, unigram = probabilistic segmentation).

Reference parity note: north-star scope, like ``bpe.py``/``wordpiece.py``.

Semantics:

* model = a piece → probability table; P(segmentation) = Π p(piece);
* **encode** = Viterbi: the max-probability segmentation, ties broken by
  fewer pieces then lexicographically smallest piece sequence (a total
  order — encoding is deterministic); a word with no segmentation over
  the vocabulary is UNK (all-or-nothing, like WordPiece);
* **train** = EM: the E-step computes expected piece counts over ALL
  segmentations by forward–backward in log space (alpha/beta with
  logsumexp — a 64-char word at p≈1e-6 underflows raw doubles), the
  M-step renormalizes. Seeding and pruning are FREQUENCY-based
  deterministic simplifications of Kudo'18's loss-based prune (seed =
  single chars + top-K substrings; prune = single chars + top expected
  counts, ties by piece) — the EM core is exact.

Engine/replay determinism: per-word expected counts are QUANTIZED to
9-dp decimals at the UDF boundary, so the distributed M-step sum is an
EXACT decimal aggregation — independent of partition/summation order;
re-running training yields the bit-identical model. (The raw float sum
would make the model depend on task scheduling.)

Scale design (100 TB):

* all per-word DP (Viterbi, forward–backward) runs on the DISTINCT-word
  frame (Zipf: vocabulary ≪ corpus), weighted by word counts, as
  Arrow-batched ``mapInPandas`` — the documented "genuinely not
  expressible with built-ins" case (a position DP is not a fold);
* the model is bounded by ``vocab_size`` rows: it broadcasts to the UDF
  workers (the same driver-held-bounded-model contract as BPE's merge
  table), and every M-step is one map-side-combined decimal agg of at
  most |seed vocab| cells;
* per EM iteration: one UDF pass over distinct words + one bounded agg —
  no shuffles proportional to the corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def _logsumexp(xs):
    m = max(xs)
    if m == -math.inf:
        return -math.inf
    return m + math.log(sum(math.exp(x - m) for x in xs))


def unigram_seed_probs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    seed_size: int = 2000,
    max_piece_len: int = 8,
) -> DataFrame:
    """Deterministic frequency seed model: ``(piece, lp)`` — all observed
    single characters plus the ``seed_size`` most frequent substrings
    (count desc, piece asc), probabilities ∝ substring counts over the
    selected set, ``lp = ln p`` as double. No ``##`` position marking —
    the unigram model is position-free (Kudo'18)."""
    if seed_size < 0:
        raise ValueError(f"seed_size must be >= 0, got {seed_size}")
    if max_piece_len < 1:
        raise ValueError(f"max_piece_len must be >= 1, got {max_piece_len}")
    from proxima_platform_spark.functions.dedup import tokens

    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    subs = words.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, length(w)), s -> "
                "transform(sequence(s, least(length(w), s + "
                f"{max_piece_len - 1})), e -> substring(w, s, e - s + 1))))"
            )
        ).alias("piece"),
        "wc",
    )
    counts = subs.groupBy("piece").agg(F.sum("wc").alias("cnt"))
    chars = counts.where(F.length("piece") == 1)
    multi = (
        counts.where(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(seed_size)
    )
    sel = chars.unionByName(multi)
    tot = sel.agg(F.sum("cnt").alias("t"))
    return sel.crossJoin(F.broadcast(tot)).select(
        "piece", F.log(F.col("cnt") / F.col("t")).alias("lp")
    )


def _viterbi(word: str, lp: dict, max_piece_len: int):
    """Best segmentation by (sum lp desc, n_pieces asc, pieces lex asc).
    Returns (pieces tuple, total lp) or None when unsegmentable.

    Works over float OR ``decimal.Decimal`` log-probs: with decimals the
    sums are EXACT, so the argmax is engine-replayable (a SQL oracle
    summing the same quantized decimals makes identical choices) — the
    float path keeps the plain in-python tokenizer fast."""
    from decimal import Decimal

    n = len(word)
    # best[i] = (lp_sum, n_pieces, pieces) for the prefix of length i;
    # the tie order is a prefix-composable total order, so local
    # dominance is globally valid (equal-n suffix extensions preserve it)
    best = [None] * (n + 1)
    zero = (
        Decimal(0)
        if lp and isinstance(next(iter(lp.values())), Decimal)
        else 0.0
    )
    best[0] = (zero, 0, ())
    for i in range(1, n + 1):
        cand = None
        for j in range(max(0, i - max_piece_len), i):
            if best[j] is None:
                continue
            piece = word[j:i]
            p = lp.get(piece)
            if p is None:
                continue
            b = best[j]
            c = (b[0] + p, b[1] + 1, b[2] + (piece,))
            if cand is None:
                cand = c
            else:
                # maximize lp; then fewer pieces; then lex-smallest pieces
                if (c[0], -c[1]) > (cand[0], -cand[1]) or (
                    (c[0], -c[1]) == (cand[0], -cand[1]) and c[2] < cand[2]
                ):
                    cand = c
        best[i] = cand
    if best[n] is None:
        return None
    return best[n][2], best[n][0]


def unigram_viterbi_encode(
    words: DataFrame,
    probs: DataFrame,
    *,
    word_col: str = "w",
    max_piece_len: int = 8,
    max_word_chars: int = 64,
) -> DataFrame:
    """Viterbi encoding of one row per DISTINCT word against the bounded
    ``(piece, lp)`` model: ``(word_col, pieces, n_pieces, lp, is_unk)``.
    UNK (no segmentation, or longer than ``max_word_chars``): pieces = [],
    n_pieces = 1, lp = NULL."""
    import pandas as pd

    spark = words.sparkSession
    # preserve the lp column's type: DecimalType collects as Decimal and
    # switches the DP to exact arithmetic (see _viterbi); DoubleType
    # collects as float and keeps the fast path
    model = {r["piece"]: r["lp"] for r in probs.collect()}
    bc = spark.sparkContext.broadcast(model)
    wc = word_col

    def run(batches):
        lp = bc.value
        for pdf in batches:
            out = []
            for w in pdf[wc]:
                if w is None or len(w) == 0:
                    continue
                if len(w) > max_word_chars:
                    out.append((w, [], 1, None, True))
                    continue
                r = _viterbi(w, lp, max_piece_len)
                if r is None:
                    out.append((w, [], 1, None, True))
                else:
                    # float() is exact for doubles and correctly-rounded
                    # for decimals — deterministic either way
                    out.append((w, list(r[0]), len(r[0]), float(r[1]), False))
            yield pd.DataFrame(
                out, columns=[wc, "pieces", "n_pieces", "lp", "is_unk"]
            )

    return words.select(wc).where(F.length(wc) > 0).distinct().mapInPandas(
        run,
        schema=(
            f"{wc} string, pieces array<string>, n_pieces bigint,"
            " lp double, is_unk boolean"
        ),
    )


def _expected_counts(word: str, lp: dict, max_piece_len: int):
    """Forward–backward expected piece counts over ALL segmentations of
    ``word`` (log-domain), plus the word's log-evidence. Returns
    (dict piece -> expected count, logZ) or None when unsegmentable."""
    n = len(word)
    alpha = [-math.inf] * (n + 1)
    beta = [-math.inf] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        terms = []
        for j in range(max(0, i - max_piece_len), i):
            p = lp.get(word[j:i])
            if p is not None and alpha[j] != -math.inf:
                terms.append(alpha[j] + p)
        if terms:
            alpha[i] = _logsumexp(terms)
    if alpha[n] == -math.inf:
        return None
    beta[n] = 0.0
    for j in range(n - 1, -1, -1):
        terms = []
        for i in range(j + 1, min(n, j + max_piece_len) + 1):
            p = lp.get(word[j:i])
            if p is not None and beta[i] != -math.inf:
                terms.append(p + beta[i])
        if terms:
            beta[j] = _logsumexp(terms)
    z = alpha[n]
    ec: dict = {}
    for j in range(n):
        if alpha[j] == -math.inf:
            continue
        for i in range(j + 1, min(n, j + max_piece_len) + 1):
            piece = word[j:i]
            p = lp.get(piece)
            if p is None or beta[i] == -math.inf:
                continue
            ec[piece] = ec.get(piece, 0.0) + math.exp(alpha[j] + p + beta[i] - z)
    return ec, z


def unigram_em_step(
    words: DataFrame,
    probs: DataFrame,
    *,
    word_col: str = "w",
    count_col: str = "wc",
    max_piece_len: int = 8,
    max_word_chars: int = 64,
) -> DataFrame:
    """One EM iteration: expected piece counts over the weighted distinct
    -word frame (forward–backward per word, quantized to 9-dp decimals at
    the UDF boundary so the distributed sum is exact and deterministic),
    then the renormalized ``(piece, lp)`` model. Unsegmentable or overlong
    words contribute nothing (their mass is invisible to this vocabulary,
    matching the likelihood objective restricted to segmentable words)."""
    import pandas as pd
    from decimal import Decimal

    spark = words.sparkSession
    model = {r["piece"]: float(r["lp"]) for r in probs.collect()}
    bc = spark.sparkContext.broadcast(model)
    wc_w, wc_c = word_col, count_col

    def estep(batches):
        lp = bc.value
        for pdf in batches:
            rows = []
            for w, c in zip(pdf[wc_w], pdf[wc_c]):
                if w is None or len(w) == 0 or len(w) > max_word_chars:
                    continue
                r = _expected_counts(w, lp, max_piece_len)
                if r is None:
                    continue
                for piece, e in r[0].items():
                    # quantize BEFORE the distributed sum: exact decimal
                    # aggregation is summation-order independent
                    rows.append((piece, str(Decimal(repr(e * int(c)))
                                            .quantize(Decimal("1e-9")))))
            yield pd.DataFrame(rows, columns=["piece", "ec"])

    ecs = (
        words.select(wc_w, wc_c)
        .mapInPandas(estep, schema="piece string, ec string")
        .select("piece", F.col("ec").cast("decimal(30,9)").alias("ec"))
        .groupBy("piece")
        .agg(F.sum("ec").alias("ec"))
        .where(F.col("ec") > 0)
    )
    tot = ecs.agg(F.sum("ec").alias("t"))
    return ecs.crossJoin(F.broadcast(tot)).select(
        "piece",
        F.log(F.col("ec").cast("double") / F.col("t").cast("double")).alias(
            "lp"
        ),
    )


def unigram_em_train(
    docs: DataFrame,
    *,
    text_col: str = "text",
    vocab_size: int = 1000,
    seed_size: int = 4000,
    max_piece_len: int = 8,
    iters: int = 2,
    max_word_chars: int = 64,
) -> DataFrame:
    """EM-train a unigram tokenizer model: frequency seed at ``seed_size``
    → ``iters`` full EM iterations → deterministic prune to all single
    characters + the top ``vocab_size`` multi-char pieces by expected
    count (ties by piece) → one final EM step on the pruned vocabulary to
    renormalize. Returns the bounded ``(piece, lp)`` model frame. Every
    single character OBSERVED in the corpus is kept (hard coverage, the
    SentencePiece required-chars rule): chars the EM steps zeroed out —
    chars occurring only in overlong words — re-enter at the final
    model's floor score, so encodability never regresses under pruning.

    Each iteration is one distinct-word UDF pass + one bounded decimal
    agg (module docstring); the corpus is never reshuffled."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if vocab_size < 0:
        raise ValueError(f"vocab_size must be >= 0, got {vocab_size}")
    from proxima_platform_spark.functions.dedup import tokens

    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .localCheckpoint(eager=False)
    )
    seed = unigram_seed_probs(
        docs, text_col=text_col, seed_size=seed_size,
        max_piece_len=max_piece_len,
    ).localCheckpoint(eager=False)
    probs = seed
    for _ in range(iters):
        # materialize the bounded EC frame per round: the model is
        # collected next round anyway, and this keeps lineage flat
        probs = unigram_em_step(
            words, probs, max_piece_len=max_piece_len,
            max_word_chars=max_word_chars,
        ).localCheckpoint(eager=False)
    # prune: keep every single char (coverage) + top multi by the LAST
    # E-step's expected counts — recompute them once against `probs`
    ec = (
        unigram_em_step(
            words, probs, max_piece_len=max_piece_len,
            max_word_chars=max_word_chars,
        )
        # em_step returns lp ∝ ln(ec/t); ranking by lp IS ranking by ec
        .withColumnRenamed("lp", "rank_lp")
    )
    # coverage keep comes from the SEED model (every observed single
    # char), not the E-step output: each EM step drops zero-expected-
    # count pieces, so a char whose every containing word is overlong
    # (> max_word_chars) or unsegmentable would silently vanish and turn
    # those words UNK after pruning (r12 ADVICE)
    chars = seed.where(F.length("piece") == 1).select("piece")
    multi = (
        ec.where(F.length("piece") > 1)
        .orderBy(F.col("rank_lp").desc(), F.col("piece").asc())
        .limit(vocab_size)
        .select("piece")
    )
    kept = chars.unionByName(multi).distinct()
    pruned = probs.join(kept, "piece")
    # final renormalizing EM step on the pruned vocabulary
    final = unigram_em_step(
        words, pruned, max_piece_len=max_piece_len,
        max_word_chars=max_word_chars,
    )
    # hard coverage (SentencePiece's required-chars rule): observed single
    # chars the EM steps zeroed out re-enter at the model's FLOOR score —
    # deterministic, and it keeps "every word over observed chars is
    # encodable" true unconditionally. The 0.0 fallback only fires in the
    # fully-degenerate corpus (no segmentable word at all).
    floor = final.agg(F.coalesce(F.min("lp"), F.lit(0.0)).alias("flp"))
    missing = (
        chars.join(final.select("piece"), "piece", "left_anti")
        .crossJoin(F.broadcast(floor))
        .select("piece", F.col("flp").alias("lp"))
    )
    return final.unionByName(missing)


def unigram_corpus_loglik(
    words: DataFrame,
    probs: DataFrame,
    *,
    word_col: str = "w",
    count_col: str = "wc",
    max_piece_len: int = 8,
    max_word_chars: int = 64,
) -> float:
    """Total marginal log-likelihood Σ wc·ln Σ_seg P(seg) of the weighted
    word frame under the model — the quantity EM must not decrease
    (monotonicity is the classic EM invariant the tests pin). Driver-side
    scalar; the per-word evidence runs in the same UDF shape."""
    import pandas as pd

    spark = words.sparkSession
    model = {r["piece"]: float(r["lp"]) for r in probs.collect()}
    bc = spark.sparkContext.broadcast(model)
    wc_w, wc_c = word_col, count_col

    def ev(batches):
        lp = bc.value
        for pdf in batches:
            rows = []
            for w, c in zip(pdf[wc_w], pdf[wc_c]):
                if w is None or len(w) == 0 or len(w) > max_word_chars:
                    continue
                r = _expected_counts(w, lp, max_piece_len)
                if r is not None:
                    rows.append((float(r[1]) * int(c),))
            yield pd.DataFrame(rows, columns=["ll"])

    out = (
        words.select(wc_w, wc_c)
        .mapInPandas(ev, schema="ll double")
        .agg(F.sum("ll").alias("ll"))
        .first()
    )
    return float(out["ll"]) if out["ll"] is not None else 0.0
