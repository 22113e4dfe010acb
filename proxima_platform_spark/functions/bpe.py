"""Byte-pair-encoding tokenization: apply a learned merge table to a
corpus, and learn such a table from one (extension beyond the reference
surface; the standard LLM-pretraining token-budget primitive, completing
the induction half shipped in r04 as ``bpe_merge_candidates``).

Reference parity note: the reference platform has no tokenizer (its
element-wise transforms at
``core/src/main/java/cz/o2/proxima/core/transform`` are the closest
surface); this module is north-star scope like the rest of the
LLM-pipeline operators.

Semantics — GPT-2-style leftmost-greedy BPE:

* a word is pre-tokenized to its codepoints;
* merges apply IN RANK ORDER; one merge rule (a, b) applies
  EXHAUSTIVELY, leftmost-first: scanning the token list once and fusing
  the current token into the previous one whenever (prev, cur) == (a, b)
  is exactly the leftmost-greedy fixpoint (a freshly-merged ``ab`` can
  immediately fuse with the NEXT token when a==ab-shaped rules exist, and
  never re-splits);
* rank-order application equals the find-min-rank-pair loop whenever the
  merge table is *learned* (a rule over a merged token always ranks after
  the rule that created the token — the monotonicity every BPE learner
  guarantees). Tables violating that precondition are rejected.

Engine parity (the oracle replays every step bit-for-bit):

* the token list is carried as ONE ``\\x1f``-joined string — tokens come
  from \\x1f-free text, so the separator is unambiguous;
* one merge = one left fold over ``split(s, \\x1f)`` with a string
  accumulator:  ``acc || b`` when the accumulator's last token is ``a``
  and the element is ``b`` (string-append IS merge — the trailing ``a``
  becomes ``ab``), else ``acc || \\x1f || t``.  Spark: ``F.aggregate``
  with an empty-string init consumed by the first element; DuckDB:
  ``list_reduce`` (first element is the init) — identical folds;
* "last token is a" = ``acc == a OR acc ends_with \\x1f||a`` — exact
  because tokens cannot contain the separator.

Scale design (100 TB): encoding cost is paid per DISTINCT word, never per
occurrence — ``bpe_encode_docs`` explodes words with position, encodes the
deduplicated vocabulary (Zipf: orders of magnitude smaller than the
corpus), joins the encodings back on the word (plain equi-join; the
frequent-word skew sits on the small build side) and re-aggregates per
document. The merge fold itself is a narrow projection over the vocab
frame. ``bpe_learn`` keeps the vocabulary distributed: each iteration is
one weighted pair-count aggregation over the vocab frame plus ONE bounded
1-row ``first()`` (the argmax pair) — the same lazy iteration chain as
``cluster.kmeans_lloyd``, with a persist/unpersist handoff so plan depth
stays O(1) per iteration instead of O(iterations).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from proxima_platform_spark.functions.text import BPE_PATTERN

#: token separator inside the carried encoding string; \x1f (ASCII unit
#: separator) never appears in text columns
SEP = "\x1f"


def byte_alphabet() -> dict[int, str]:
    """GPT-2-style byte→unicode alphabet (public BPE recipes): every one
    of the 256 byte values gets a DISTINCT single printable codepoint —
    visible ASCII and Latin-1 printables map to themselves; the remaining
    68 bytes (controls, space, DEL, 0x80-0xA0, 0xAD) map to 256+k in
    first-seen order (space 0x20 → U+0120 'Ġ', newline 0x0A → U+010A).
    Working over this alphabet instead of codepoints is what makes the
    tokenizer byte-level: any UTF-8 input is representable, multi-byte
    codepoints become multiple alphabet chars, and merges can cross
    codepoint boundaries — the tiktoken/GPT-2 production shape."""
    printable = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAD))
        + list(range(0xAE, 0x100))
    )
    table: dict[int, str] = {b: chr(b) for b in printable}
    shift = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(256 + shift)
            shift += 1
    return table


#: hex pair ("00".."FF", uppercase — what hex(binary) yields in both
#: engines) → byte-alphabet char
BYTE_HEX_CHARS: dict[str, str] = {
    f"{b:02X}": c for b, c in byte_alphabet().items()
}


def _byte_map_expr() -> Column:
    """The fixed 256-entry hex-pair→char remap as a map literal — one
    foldable expression both engines can replay (the DuckDB oracle uses
    an equivalent 256-row VALUES join)."""
    items: list[Column] = []
    for hx, ch in sorted(BYTE_HEX_CHARS.items()):
        items.append(F.lit(hx))
        items.append(F.lit(ch))
    return F.create_map(*items)


def byte_tokens_expr(word: Column) -> Column:
    """\\x1f-joined byte-alphabet chars of ``word``'s UTF-8 bytes — the
    byte-level analog of the codepoint split: hex the encoded bytes
    (2 chars per byte, uppercase in both engines), remap each pair
    through the fixed table."""
    pairs = F.regexp_extract_all(F.hex(F.encode(word, "UTF-8")), F.lit(".."), 0)
    return F.array_join(
        F.transform(pairs, lambda h: F.element_at(_byte_map_expr(), h)), SEP
    )


def _check_monotone(merges: Sequence[tuple[str, str]]) -> None:
    """Reject non-learned tables: every multi-codepoint side of a rule
    must have been produced by an EARLIER rule, otherwise rank-order
    application diverges from the find-min-rank loop and the rule could
    never fire anyway (the token never exists)."""
    produced: set[str] = set()
    for i, (a, b) in enumerate(merges):
        for side in (a, b):
            if len(side) > 1 and side not in produced:
                raise ValueError(
                    f"merge #{i} {(a, b)!r}: token {side!r} is not produced "
                    "by any earlier merge — not a learned (rank-monotone) "
                    "BPE table"
                )
        produced.add(a + b)


def _fold_step(s: Column, a: str, b: str) -> Column:
    """One merge rule applied exhaustively (leftmost-greedy) to the
    \\x1f-joined token string ``s``."""
    toks = F.split(s, SEP)
    return F.aggregate(
        toks,
        F.lit(""),
        lambda acc, t: F.when(acc == F.lit(""), t).otherwise(
            F.when(
                (t == F.lit(b))
                & ((acc == F.lit(a)) | acc.endswith(F.lit(SEP + a))),
                F.concat(acc, F.lit(b)),
            ).otherwise(F.concat(acc, F.lit(SEP), t))
        ),
    )


def bpe_word_encode_expr(
    word: Column,
    merges: Sequence[tuple[str, str]],
    *,
    alphabet: str = "char",
) -> Column:
    """Expression encoding one word: initial-alphabet split (``char`` =
    codepoints, ``byte`` = UTF-8 bytes through the fixed GPT-2-style
    remap), then the merge folds in rank order. Returns the \\x1f-joined
    token string (token count = ``size(split(result, \\x1f))``). Pure
    expression — composes into any projection; cost O(len(word) ·
    len(merges)) per evaluated row, which is why callers evaluate it over
    distinct words only. The fold is alphabet-agnostic: byte-level merge
    tokens are strings over the remap chars, and the same
    rank-monotonicity check applies."""
    _check_monotone(merges)
    if alphabet not in ("char", "byte"):
        raise ValueError(f"unknown alphabet {alphabet!r} (use 'char' or 'byte')")

    def _build() -> Column:
        if alphabet == "byte":
            s = byte_tokens_expr(word)
        else:
            # '.' = one full codepoint in both Java regex and RE2 (words
            # from BPE_PATTERN cannot contain newlines, the one thing '.'
            # skips)
            s = F.array_join(F.regexp_extract_all(word, F.lit("."), 0), SEP)
        for a, b in merges:
            s = _fold_step(s, a, b)
        return s

    # memoized template (exprtools, r13): the fold is a pure function of
    # (input column, merge table, alphabet) and the key captures all
    # three — a learned table still re-learns per build; only the
    # mechanical Column assembly from the GIVEN table is skipped
    # (~20 py4j round-trips per merge otherwise). The merge table is
    # keyed by md5 digest, not raw repr: real tables run to thousands of
    # pairs and up to 256 such keys are retained for the process
    # lifetime (ADVICE r13).
    import hashlib

    from proxima_platform_spark.exprtools import static_template

    merges_key = hashlib.md5(repr(tuple(merges)).encode()).hexdigest()
    return static_template(
        "bpe_word_encode",
        f"{word}|{merges_key}|{alphabet}",
        _build,
    )


def bpe_encode_words(
    words: DataFrame,
    merges: Sequence[tuple[str, str]],
    *,
    word_col: str = "word",
    alphabet: str = "char",
) -> DataFrame:
    """Encode a (distinct-)word frame: adds ``enc`` (joined token string)
    and ``n_tok``. Narrow projection — no shuffle."""
    return words.withColumn(
        "enc", bpe_word_encode_expr(F.col(word_col), merges, alphabet=alphabet)
    ).withColumn("n_tok", F.size(F.split(F.col("enc"), SEP)))


def bpe_encode_docs(
    docs: DataFrame,
    merges: Sequence[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = BPE_PATTERN,
    alphabet: str = "char",
) -> DataFrame:
    """Tokenize a corpus with a learned merge table — the scale path:

      explode words with position → encode the DISTINCT vocabulary →
      equi-join encodings back → per-document re-aggregation.

    Output per document (documents with zero pattern matches drop out, in
    both engines): ``n_words``, ``n_chars`` (codepoints inside words; for
    ``alphabet='byte'`` the column is ``n_bytes`` — UTF-8 octets),
    ``n_tokens`` (post-merge), and ``fp`` — md5 of the position-ordered
    concatenation of the word encodings, certifying every token's
    identity and order, not just the counts."""
    words = docs.select(
        id_col,
        F.posexplode(F.regexp_extract_all(text_col, F.lit(pattern), 0)).alias(
            "pos", "word"
        ),
    )
    vocab = bpe_encode_words(
        words.select("word").distinct(), merges, word_col="word",
        alphabet=alphabet,
    )
    joined = words.join(vocab, "word")
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "enc"))),
        lambda x: x["enc"],
    )
    unit = (
        F.sum(F.octet_length("word")).alias("n_bytes")
        if alphabet == "byte"
        else F.sum(F.length("word")).alias("n_chars")
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        unit,
        F.sum("n_tok").alias("n_tokens"),
        F.md5(F.array_join(ordered, SEP)).alias("fp"),
    )


def bpe_learn(
    docs: DataFrame,
    n_merges: int,
    *,
    text_col: str = "text",
    pattern: str = BPE_PATTERN,
    alphabet: str = "char",
) -> list[tuple[str, str]]:
    """Learn a rank-monotone merge table from a corpus (the induction
    loop behind ``bpe_merge_candidates``' single-shot ranking): each
    round counts occurrence-weighted adjacent token pairs over the
    CURRENT tokenization of the distinct vocabulary and merges the
    (count desc, pair asc) argmax everywhere.

    Driver reads are bounded by contract: one 1-row ``first()`` per
    round (the argmax pair), ``n_merges`` rounds total. Each round's
    vocab frame is lazily ``localCheckpoint``-ed (the
    ``connected_components``/``pagerank`` pattern): the round's argmax
    aggregate is the first action on it, so one job both stores the
    blocks and reduces the argmax, and round k's plan is one fold over
    round k−1's blocks — without the truncation, plan text and analysis
    cost grow with every round (measured: driver OOM building the
    explain string near round 16). Stops early when no pair is left
    (every word fully merged)."""
    if alphabet not in ("char", "byte"):
        raise ValueError(f"unknown alphabet {alphabet!r} (use 'char' or 'byte')")
    init = (
        byte_tokens_expr(F.col("word"))
        if alphabet == "byte"
        else F.array_join(F.regexp_extract_all("word", F.lit("."), 0), SEP)
    )
    vocab = (
        docs.select(
            F.explode(
                F.regexp_extract_all(text_col, F.lit(pattern), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("w"))
        .select(init.alias("enc"), "w")
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        toks = F.split("enc", SEP)
        pairs = vocab.where(F.size(toks) > 1).select(
            F.explode(
                F.zip_with(
                    F.slice(toks, 1, F.size(toks) - 1),
                    F.slice(toks, 2, F.size(toks) - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
            "w",
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("w").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .first()
        )
        if top is None:
            break
        merges.append((top["a"], top["b"]))
        vocab = vocab.withColumn(
            "enc", _fold_step(F.col("enc"), top["a"], top["b"])
        ).localCheckpoint(eager=False)
    return merges


def load_gpt2_merges(
    source,
    *,
    max_merges: int | None = None,
) -> list[tuple[str, str]]:
    """Parse a GPT-2-format ``merges.txt`` (the published artifact layout:
    optional ``#version:`` header, then one space-separated merge pair per
    line, tokens written in the byte→unicode remap alphabet — ``'Ġ t'``
    is the rank-0 GPT-2 merge) into the table
    :func:`bpe_word_encode_expr` consumes with ``alphabet='byte'``.

    ``source`` is a file path or an iterable of lines. ``max_merges``
    truncates to the first N ranks — a PREFIX of a learned table is
    itself a valid learned table (rank-monotone), which is what makes
    truncated real-model tables usable inside expression-size limits.

    Validation is strict: exactly two space-separated tokens per line,
    every token composed of byte-alphabet chars or earlier merge
    products, and the whole table rank-monotone (the
    :func:`bpe_word_encode_expr` precondition — every published learned
    table satisfies it; hand-edited ones that don't are rejected loudly
    rather than silently mis-tokenizing).

    This container ships no copy of the real GPT-2 artifact and has no
    network, so the engine certifies the FORMAT and the conventions
    (remap, rank order, leftmost-greedy fold) on synthetic tables —
    see ``tests/test_bpe.py::TestGpt2MergeTable`` — and accepts the real
    file via ``SPARK_GRAFT_GPT2_MERGES`` wherever a deployment has one
    (``__spark_entry__.q_tokenizer_fertility_bytes`` picks it up)."""
    if isinstance(source, (str, bytes)):
        with open(source, encoding="utf-8") as f:
            lines = f.read().splitlines()
    else:
        lines = [ln.rstrip("\n") for ln in source]
    alphabet_chars = set(byte_alphabet().values())
    merges: list[tuple[str, str]] = []
    produced: set[str] = set()
    for i, ln in enumerate(lines):
        if not ln.strip() or ln.startswith("#"):
            continue
        parts = ln.split(" ")
        if len(parts) != 2 or not parts[0] or not parts[1]:
            raise ValueError(
                f"merges line {i}: expected 'tokA tokB', got {ln!r}"
            )
        a, b = parts
        for side in (a, b):
            if side not in produced and not set(side) <= alphabet_chars:
                bad = sorted(set(side) - alphabet_chars)
                raise ValueError(
                    f"merges line {i}: token {side!r} contains chars "
                    f"{bad!r} outside the byte alphabet and is not an "
                    "earlier merge product"
                )
        merges.append((a, b))
        produced.add(a + b)
        if max_merges is not None and len(merges) >= max_merges:
            break
    _check_monotone(merges)
    return merges
