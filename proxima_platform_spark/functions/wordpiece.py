"""WordPiece tokenization: greedy longest-match-first encoding against a
corpus-derived subword vocabulary — the BERT-family tokenizer, completing
the tokenizer tier (BPE encode/learn, byte-level BPE, fertility; this adds
the longest-match family).

Reference parity note: like ``bpe.py``, north-star scope — the reference
platform has no tokenizer surface.

Semantics (BERT / HuggingFace ``WordPieceTokenizer``):

* a word is consumed left to right; at each position the LONGEST prefix of
  the remainder that is in the vocabulary is emitted (non-initial pieces
  carry the ``##`` continuation marker);
* if no prefix at some position is in the vocabulary, the WHOLE word
  encodes as the unknown token (``is_unk``) — the all-or-nothing contract
  of the reference implementation;
* vocabulary construction here is FREQUENCY-based: every initial/
  continuation single character (guaranteeing per-character coverage for
  words made of seen characters) plus the top-``vocab_size`` most frequent
  substrings up to ``max_piece_len`` (ties by smallest piece — a total
  order, so the vocab is deterministic and engine-replayable). Real
  WordPiece TRAINING maximizes corpus likelihood (pair score
  freq(ab)/freq(a)·freq(b)); the frequency builder is the documented
  simplification — the ENCODER accepts any vocabulary frame, so a
  likelihood-trained vocab drops in unchanged.

Scale design (100 TB):

* encoding cost is paid per DISTINCT word (the ``bpe_encode_docs`` lesson:
  Zipf makes the vocabulary orders of magnitude smaller than the corpus);
  occurrences join the encoded vocabulary back on the word;
* the greedy loop is DRIVER-COORDINATED but DATA-DISTRIBUTED: iteration i
  extends every still-unfinished word by one piece via one equi-join
  against the vocabulary FRAME (bounded rows → AQE broadcasts it). The
  vocabulary is never collected, there is no per-row python, and the
  unfinished frame SHRINKS geometrically (most words finish in 1-2
  pieces). Iteration count is bounded by the max piece count of any word
  — ``max_word_chars`` caps it for adversarial inputs (longer words
  encode as UNK, mirroring BERT's ``max_input_chars_per_word=100``);
* per-iteration ``localCheckpoint(eager=False)`` cuts the compounding
  join lineage, the same discipline as ``connected_components``.

Engine parity: substring arithmetic and (count desc, piece asc) ranking
only — no floats, no hash functions; a DuckDB oracle replays the greedy
loop as a recursive CTE joining the same vocabulary table (planned as the
r13 driver query `wordpiece_fertility`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def wordpiece_vocab(
    docs: DataFrame,
    *,
    text_col: str = "text",
    vocab_size: int = 1000,
    max_piece_len: int = 8,
) -> DataFrame:
    """Deterministic frequency-based WordPiece vocabulary: one row per
    piece, ``(piece)`` with the ``##`` continuation convention already
    applied. All single characters observed in the corpus (both initial
    and ``##`` forms) are always included; the top ``vocab_size``
    multi-character substrings by (count desc, piece asc) fill the rest.

    Scale: words dedup before substring explosion; substring rows per
    distinct word are bounded by len·max_piece_len; one
    map-side-combined count agg; the top-K is a single
    TakeOrderedAndProject-shaped selection, never a global sort of the
    corpus.
    """
    return wordpiece_select_vocab(
        wordpiece_substring_counts(
            docs, text_col=text_col, max_piece_len=max_piece_len
        ),
        vocab_size=vocab_size,
    )


def wordpiece_substring_counts(
    docs: DataFrame,
    *,
    text_col: str = "text",
    max_piece_len: int = 8,
) -> DataFrame:
    """The vocabulary's sufficient statistic: ``(piece, cnt)`` — every
    initial/``##``-continuation substring up to ``max_piece_len``, weighted
    by word occurrence counts. ADDITIVE across corpus slices (cnt is a
    plain weighted count), which is exactly what lets
    ``ContinuousWordpieceVocab`` maintain it as summed base+delta
    generations with batch-on-union equality by construction."""
    if max_piece_len < 1:
        raise ValueError(f"max_piece_len must be >= 1, got {max_piece_len}")
    from proxima_platform_spark.functions.dedup import tokens

    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    # every (start, len) substring with len <= max_piece_len, weighted by
    # the word's occurrence count; start==1 is the initial form, the rest
    # carry '##'
    subs = words.select(
        "wc",
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, length(w)), s -> "
                "transform(sequence(s, least(length(w), s + "
                f"{max_piece_len - 1})), e -> "
                "struct(s AS s, substring(w, s, e - s + 1) AS sub))))"
            )
        ).alias("x"),
    ).select(
        F.when(F.col("x.s") == 1, F.col("x.sub"))
        .otherwise(F.concat(F.lit("##"), F.col("x.sub")))
        .alias("piece"),
        "wc",
    )
    return subs.groupBy("piece").agg(F.sum("wc").alias("cnt"))


def wordpiece_select_vocab(
    counts: DataFrame, *, vocab_size: int = 1000
) -> DataFrame:
    """Deterministic selection over a ``(piece, cnt)`` frame: all single
    characters (initial and ``##`` forms) plus the top ``vocab_size``
    multi-char pieces by (cnt desc, piece asc) — a pure function of the
    counts, so any maintainer that merges counts additively reproduces
    the batch vocabulary exactly."""
    if vocab_size < 0:
        raise ValueError(f"vocab_size must be >= 0, got {vocab_size}")
    chars = counts.where(
        F.length(F.regexp_replace("piece", "^##", "")) == 1
    ).select("piece")
    multi = (
        counts.where(F.length(F.regexp_replace("piece", "^##", "")) > 1)
        .orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(vocab_size)
        .select("piece")
    )
    return chars.unionByName(multi).distinct()


def wordpiece_encode_words(
    words: DataFrame,
    vocab: DataFrame,
    *,
    word_col: str = "w",
    max_piece_len: int = 8,
    max_word_chars: int = 64,
) -> DataFrame:
    """Greedy longest-match-first encoding of one row per DISTINCT word:
    ``(word_col, pieces array<string>, n_pieces, is_unk)``. Words longer
    than ``max_word_chars`` (or hitting a position with no vocabulary
    prefix) are all-or-nothing UNK: ``pieces = []``, ``n_pieces = 1``
    (the single unknown token a trainer budget counts), ``is_unk``.

    One vocabulary equi-join per emitted piece over the SHRINKING
    unfinished frame — see the module docstring's scale argument.
    """
    spark = words.sparkSession
    w = F.col(word_col)
    base = words.select(word_col).where(F.length(w) > 0).distinct()
    too_long = base.where(F.length(w) > max_word_chars)
    state = base.where(F.length(w) <= max_word_chars).select(
        word_col,
        F.lit(1).alias("pos"),
        F.array().cast("array<string>").alias("pieces"),
    ).localCheckpoint(eager=False)

    unk = too_long.select(
        word_col,
        F.array().cast("array<string>").alias("pieces"),
        F.lit(1).cast("bigint").alias("n_pieces"),
        F.lit(True).alias("is_unk"),
    )
    done = None

    # each word emits >= 1 character per iteration, so max_word_chars
    # iterations always suffice; the frame usually empties far earlier
    for _ in range(max_word_chars):
        if state.isEmpty():
            break
        # candidate piece lengths at the current position, longest wins
        cand = state.select(
            word_col,
            "pos",
            "pieces",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.lit(max_piece_len), F.length(w) - F.col("pos") + 1
                    ),
                )
            ).alias("plen"),
        ).select(
            word_col,
            "pos",
            "pieces",
            "plen",
            F.when(
                F.col("pos") == 1, F.expr(f"substring({word_col}, pos, plen)")
            )
            .otherwise(
                F.concat(
                    F.lit("##"), F.expr(f"substring({word_col}, pos, plen)")
                )
            )
            .alias("piece"),
        )
        matched = (
            cand.join(vocab, "piece")
            .groupBy(word_col, "pos", "pieces")
            .agg(F.max(F.struct("plen", "piece")).alias("m"))
            .select(
                word_col,
                (F.col("pos") + F.col("m.plen")).alias("pos"),
                F.array_append("pieces", F.col("m.piece")).alias("pieces"),
            )
        ).localCheckpoint(eager=False)
        # no vocabulary prefix at this position -> whole word is UNK
        failed = state.join(
            matched.select(word_col), word_col, "left_anti"
        ).select(
            word_col,
            F.array().cast("array<string>").alias("pieces"),
            F.lit(1).cast("bigint").alias("n_pieces"),
            F.lit(True).alias("is_unk"),
        )
        unk = unk.unionByName(failed)
        fin = matched.where(F.col("pos") > F.length(w)).select(
            word_col,
            "pieces",
            F.size("pieces").cast("bigint").alias("n_pieces"),
            F.lit(False).alias("is_unk"),
        )
        done = fin if done is None else done.unionByName(fin)
        state = matched.where(F.col("pos") <= F.length(w)).localCheckpoint(
            eager=False
        )
    out = unk if done is None else done.unionByName(unk)
    return out


def wordpiece_fertility(
    docs: DataFrame,
    vocab: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 8,
    max_word_chars: int = 64,
) -> DataFrame:
    """Per-document WordPiece budget summary against ``vocab``:
    ``(id_col, n_words, n_pieces, n_unk_words, fertility)`` where
    fertility = pieces per word rounded to 6 dp (UNK words cost one
    piece, the unknown token). The standard tokenizer-intake health
    metric next to ``tokenizer_fertility`` (BPE) — a rising WordPiece
    fertility or UNK rate flags vocabulary drift against a new corpus
    slice.

    Scale shape: distinct-word encode (Zipf-bounded) + one occurrence
    join + one per-doc agg — the ``bpe_encode_docs`` shape with the
    greedy-join encoder inside.
    """
    from proxima_platform_spark.functions.dedup import tokens

    occ = (
        docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w"))
        .where(F.length("w") > 0)
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    enc = wordpiece_encode_words(
        occ.select("w").distinct(),
        vocab,
        word_col="w",
        max_piece_len=max_piece_len,
        max_word_chars=max_word_chars,
    )
    joined = occ.join(enc, "w")
    return (
        joined.groupBy(id_col)
        .agg(
            F.sum("n").cast("bigint").alias("n_words"),
            F.sum(F.col("n") * F.col("n_pieces")).cast("bigint").alias(
                "n_pieces"
            ),
            F.sum(F.when(F.col("is_unk"), F.col("n")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_unk_words"),
            F.round(
                F.sum(F.col("n") * F.col("n_pieces"))
                / F.sum("n").cast("double"),
                6,
            ).alias("fertility"),
        )
    )
