"""WordPiece tokenization (functions/wordpiece.py): greedy
longest-match-first encoding vs a python reference model, the
frequency-vocab builder's determinism/coverage, and the per-doc
fertility summary."""

import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _ref_encode(word, vocab, max_piece_len=8, max_word_chars=64):
    """Reference greedy longest-match (BERT WordPieceTokenizer)."""
    if len(word) > max_word_chars:
        return None
    pos, pieces = 0, []
    while pos < len(word):
        best = None
        for ln in range(min(max_piece_len, len(word) - pos), 0, -1):
            cand = word[pos:pos + ln]
            key = cand if pos == 0 else "##" + cand
            if key in vocab:
                best = key
                break
        if best is None:
            return None
        pieces.append(best)
        pos += len(best) - 2 if best.startswith("##") else len(best)
    return pieces


class TestWordpieceEncode:
    VOCAB = {
        "u", "##u", "n", "##n", "a", "##a", "f", "##f", "e", "##e",
        "c", "##c", "t", "##t", "d", "##d",
        "un", "##ed", "aff", "##ect", "affect", "##affect",
    }

    def _vocab_df(self, spark):
        return spark.createDataFrame(
            [(p,) for p in sorted(self.VOCAB)], "piece string"
        )

    def test_known_words_match_reference(self, spark):
        from proxima_platform_spark.functions.wordpiece import (
            wordpiece_encode_words,
        )

        words = ["unaffected", "affect", "unafe", "cat", "zebra", "a"]
        df = spark.createDataFrame([(w,) for w in words], "w string")
        out = {
            r.w: (list(r.pieces), r.n_pieces, r.is_unk)
            for r in wordpiece_encode_words(df, self._vocab_df(spark)).collect()
        }
        assert set(out) == set(words)
        for w in words:
            ref = _ref_encode(w, self.VOCAB)
            if ref is None:
                assert out[w] == ([], 1, True), (w, out[w])
            else:
                assert out[w] == (ref, len(ref), False), (w, out[w], ref)
        # pin the canonical example: longest-match, not leftmost-shortest
        assert out["unaffected"] == (["un", "##affect", "##ed"], 3, False)
        # 'zebra': 'z' has no vocab entry -> all-or-nothing UNK
        assert out["zebra"] == ([], 1, True)

    def test_random_words_match_reference(self, spark):
        from proxima_platform_spark.functions.wordpiece import (
            wordpiece_encode_words,
        )

        rng = random.Random(11)
        alpha = "unafectd"
        words = sorted(
            {"".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
             for _ in range(120)}
        )
        df = spark.createDataFrame([(w,) for w in words], "w string")
        out = {
            r.w: (list(r.pieces), r.is_unk)
            for r in wordpiece_encode_words(df, self._vocab_df(spark)).collect()
        }
        for w in words:
            ref = _ref_encode(w, self.VOCAB)
            if ref is None:
                assert out[w] == ([], True), (w, out[w])
            else:
                assert out[w] == (ref, False), (w, out[w], ref)

    def test_too_long_word_is_unk(self, spark):
        from proxima_platform_spark.functions.wordpiece import (
            wordpiece_encode_words,
        )

        df = spark.createDataFrame([("a" * 65,), ("a" * 64,)], "w string")
        out = {
            r.w: (r.n_pieces, r.is_unk)
            for r in wordpiece_encode_words(df, self._vocab_df(spark)).collect()
        }
        assert out["a" * 65] == (1, True)
        assert out["a" * 64] == (64, False)  # 64 single-char pieces


class TestWordpieceVocab:
    def test_single_char_coverage_and_topk(self, spark):
        from proxima_platform_spark.functions.wordpiece import wordpiece_vocab

        docs = spark.createDataFrame(
            [(1, "aba aba aba cab"), (2, "aba cab cab")],
            "doc_id long, text string",
        )
        vocab = {r.piece for r in wordpiece_vocab(
            docs, vocab_size=2, max_piece_len=3
        ).collect()}
        # every OBSERVED single-char form (c never occurs word-internally,
        # so ##c is rightly absent)
        assert {"a", "c", "##a", "##b"} <= vocab
        assert "##c" not in vocab and "b" not in vocab
        # top-2 multi-char pieces by (count desc, piece asc):
        # 'ab' (initial, 4x from aba) vs '##ba' (4x) vs 'aba'(4x) vs
        # 'ca'(3x) 'cab'(3x) '##b'... multi pieces only; count desc, piece asc
        multi = sorted(p for p in vocab if len(p.replace("##", "", 1)) > 1)
        assert len(multi) == 2
        assert multi == sorted(["##ba", "ab"])  # both 4 occurrences, ties by piece

    def test_determinism(self, spark):
        from proxima_platform_spark.functions.wordpiece import wordpiece_vocab

        docs = spark.createDataFrame(
            [(i, f"token{i % 7} stable corpus words here") for i in range(40)],
            "doc_id long, text string",
        )
        a = {r.piece for r in wordpiece_vocab(docs, vocab_size=20).collect()}
        b = {r.piece for r in wordpiece_vocab(docs, vocab_size=20).collect()}
        assert a == b

    def test_knob_guards(self, spark):
        from proxima_platform_spark.functions.wordpiece import wordpiece_vocab

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            wordpiece_vocab(docs, vocab_size=-1)
        with pytest.raises(ValueError):
            wordpiece_vocab(docs, max_piece_len=0)


class TestWordpieceFertility:
    def test_hand_computed_summary(self, spark):
        from proxima_platform_spark.functions.wordpiece import (
            wordpiece_fertility,
        )

        vocab = spark.createDataFrame(
            [(p,) for p in ["ab", "##c", "a", "##b", "d", "##d"]],
            "piece string",
        )
        docs = spark.createDataFrame(
            [(1, "abc abc dd"), (2, "zz abc")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in wordpiece_fertility(docs, vocab).collect()}
        # doc 1: abc -> [ab, ##c] (2 pieces) x2, dd -> [d, ##d] (2) x1
        assert out[1].n_words == 3 and out[1].n_pieces == 6
        assert out[1].n_unk_words == 0
        assert out[1].fertility == 2.0
        # doc 2: zz -> UNK (1 piece), abc -> 2 pieces
        assert out[2].n_words == 2 and out[2].n_pieces == 3
        assert out[2].n_unk_words == 1
        assert out[2].fertility == 1.5

    def test_corpus_roundtrip_nonvacuous(self, spark, sf_dir):
        from proxima_platform_spark.functions.wordpiece import (
            wordpiece_fertility,
            wordpiece_vocab,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
        vocab = wordpiece_vocab(docs, vocab_size=300)
        out = wordpiece_fertility(docs, vocab)
        rows = out.collect()
        assert len(rows) == 50
        # with per-char coverage nothing is UNK and fertility >= 1
        assert all(r.n_unk_words == 0 for r in rows)
        assert all(r.fertility >= 1.0 for r in rows)


from hypothesis import HealthCheck, given, settings, strategies as st

_piece_st = st.text(alphabet="abcd", min_size=1, max_size=4)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pieces=st.sets(_piece_st, min_size=1, max_size=12),
    words=st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=10),
        min_size=1, max_size=15, unique=True,
    ),
)
def test_random_vocab_matches_reference_model(spark, pieces, words):
    """Property: for ANY vocabulary (random initial + continuation forms)
    and ANY words, the join-loop encoder equals the python greedy
    longest-match reference — including all-or-nothing UNK."""
    from proxima_platform_spark.functions.wordpiece import (
        wordpiece_encode_words,
    )

    vocab = set()
    for p in pieces:
        vocab.add(p)
        vocab.add("##" + p)
    vdf = spark.createDataFrame([(p,) for p in sorted(vocab)], "piece string")
    wdf = spark.createDataFrame([(w,) for w in words], "w string")
    out = {
        r.w: (list(r.pieces), r.is_unk)
        for r in wordpiece_encode_words(
            wdf, vdf, max_piece_len=4
        ).collect()
    }
    for w in words:
        ref = _ref_encode(w, vocab, max_piece_len=4)
        if ref is None:
            assert out[w] == ([], True), (w, out[w], sorted(vocab))
        else:
            assert out[w] == (ref, False), (w, out[w], ref, sorted(vocab))
