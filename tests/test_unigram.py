"""Unigram-LM tokenizer (functions/unigram.py): Viterbi encoding and EM
expected counts validated against EXHAUSTIVE segmentation enumeration (an
independent algorithm, not shared code), EM's likelihood-monotonicity
invariant, training determinism, and the corpus roundtrip."""

import itertools
import math
import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _all_segmentations(word, vocab, max_piece_len):
    """Every segmentation of word into vocab pieces (exhaustive)."""
    n = len(word)
    out = []

    def rec(pos, acc):
        if pos == n:
            out.append(tuple(acc))
            return
        for ln in range(1, min(max_piece_len, n - pos) + 1):
            piece = word[pos:pos + ln]
            if piece in vocab:
                rec(pos + ln, acc + [piece])

    rec(0, [])
    return out


def _brute_viterbi(word, lp, max_piece_len):
    segs = _all_segmentations(word, set(lp), max_piece_len)
    if not segs:
        return None
    # max lp sum, then fewer pieces, then lexicographically smallest
    best = max((sum(lp[p] for p in s), -len(s)) for s in segs)
    return min(s for s in segs
               if (sum(lp[p] for p in s), -len(s)) == best)


def _brute_expected_counts(word, lp, max_piece_len):
    segs = _all_segmentations(word, set(lp), max_piece_len)
    if not segs:
        return None
    ps = [math.exp(sum(lp[p] for p in s)) for s in segs]
    z = sum(ps)
    ec = {}
    for s, p in zip(segs, ps):
        for piece in s:
            ec[piece] = ec.get(piece, 0.0) + p / z
    return ec, math.log(z)


def _rand_model(rng, alphabet="abc", n_multi=6, max_piece_len=3):
    pieces = set(alphabet)
    while len(pieces) < len(alphabet) + n_multi:
        ln = rng.randint(2, max_piece_len)
        pieces.add("".join(rng.choice(alphabet) for _ in range(ln)))
    raw = {p: rng.uniform(0.5, 2.0) for p in pieces}
    tot = sum(raw.values())
    return {p: math.log(v / tot) for p, v in raw.items()}


class TestViterbi:
    def test_matches_exhaustive_enumeration(self, spark):
        from proxima_platform_spark.functions.unigram import (
            unigram_viterbi_encode,
        )

        rng = random.Random(5)
        lp = _rand_model(rng)
        words = sorted(
            {"".join(rng.choice("abc") for _ in range(rng.randint(1, 8)))
             for _ in range(60)}
        )
        wdf = spark.createDataFrame([(w,) for w in words], "w string")
        pdf = spark.createDataFrame(list(lp.items()), "piece string, lp double")
        out = {
            r.w: (tuple(r.pieces), r.lp, r.is_unk)
            for r in unigram_viterbi_encode(
                wdf, pdf, max_piece_len=3
            ).collect()
        }
        for w in words:
            ref = _brute_viterbi(w, lp, 3)
            assert ref is not None  # single-char coverage
            got = out[w]
            assert not got[2]
            assert got[0] == ref, (w, got[0], ref)
            assert abs(got[1] - sum(lp[p] for p in ref)) < 1e-9

    def test_unsegmentable_and_overlong_are_unk(self, spark):
        from proxima_platform_spark.functions.unigram import (
            unigram_viterbi_encode,
        )

        lp = {"ab": math.log(0.5), "c": math.log(0.5)}
        wdf = spark.createDataFrame(
            [("abc",), ("ca",), ("ab" * 40,)], "w string"
        )
        pdf = spark.createDataFrame(list(lp.items()), "piece string, lp double")
        out = {
            r.w: (r.n_pieces, r.is_unk)
            for r in unigram_viterbi_encode(wdf, pdf).collect()
        }
        assert out["abc"] == (2, False)   # ab + c
        assert out["ca"] == (1, True)     # 'a' alone not in vocab
        assert out["ab" * 40] == (1, True)  # 80 chars > max_word_chars

    def test_tie_break_prefers_fewer_then_lex(self, spark):
        from proxima_platform_spark.functions.unigram import (
            unigram_viterbi_encode,
        )

        # p(ab)=p(a)*p(b): equal score -> fewer pieces wins
        lp = {"a": math.log(0.2), "b": math.log(0.2),
              "ab": math.log(0.04)}
        wdf = spark.createDataFrame([("ab",)], "w string")
        pdf = spark.createDataFrame(list(lp.items()), "piece string, lp double")
        r = unigram_viterbi_encode(wdf, pdf).collect()[0]
        assert list(r.pieces) == ["ab"]


class TestExpectedCounts:
    def test_forward_backward_matches_enumeration(self, spark):
        from proxima_platform_spark.functions.unigram import _expected_counts

        rng = random.Random(9)
        for _ in range(30):
            lp = _rand_model(rng)
            w = "".join(rng.choice("abc") for _ in range(rng.randint(1, 8)))
            got = _expected_counts(w, lp, 3)
            ref = _brute_expected_counts(w, lp, 3)
            assert (got is None) == (ref is None)
            if got is None:
                continue
            assert abs(got[1] - ref[1]) < 1e-9
            assert set(got[0]) == set(ref[0])
            for piece, e in ref[0].items():
                assert abs(got[0][piece] - e) < 1e-9, (w, piece)

    def test_em_step_matches_weighted_enumeration(self, spark):
        from proxima_platform_spark.functions.unigram import unigram_em_step

        rng = random.Random(3)
        lp = _rand_model(rng)
        corpus = {"abc": 3, "cab": 2, "aa": 5}
        wdf = spark.createDataFrame(
            [(w, c) for w, c in sorted(corpus.items())], "w string, wc long"
        )
        pdf = spark.createDataFrame(list(lp.items()), "piece string, lp double")
        got = {
            r.piece: r.lp
            for r in unigram_em_step(wdf, pdf, max_piece_len=3).collect()
        }
        ec = {}
        for w, c in corpus.items():
            e, _ = _brute_expected_counts(w, lp, 3)
            for piece, v in e.items():
                # mirror the operator's 9-dp quantization
                ec[piece] = ec.get(piece, 0.0) + round(v * c, 9)
        tot = sum(ec.values())
        for piece, v in ec.items():
            if v <= 0:
                continue
            assert piece in got
            assert abs(got[piece] - math.log(v / tot)) < 1e-9, piece


class TestEmTraining:
    def _corpus(self, spark):
        rows = [
            (1, "low lower lowest low low"),
            (2, "new newer newest new newer"),
            (3, "wide wider widest wide"),
            (4, "low new wide lower newer wider"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_em_iterations_do_not_decrease_likelihood(self, spark):
        from proxima_platform_spark.functions.dedup import tokens
        from proxima_platform_spark.functions.unigram import (
            unigram_corpus_loglik,
            unigram_em_step,
            unigram_seed_probs,
        )

        docs = self._corpus(spark)
        words = (
            docs.select(F.explode(tokens(F.col("text"))).alias("w"))
            .where(F.length("w") > 0)
            .groupBy("w").agg(F.count(F.lit(1)).alias("wc"))
        )
        probs = unigram_seed_probs(docs, seed_size=50, max_piece_len=4)
        ll = unigram_corpus_loglik(words, probs, max_piece_len=4)
        for _ in range(3):
            probs = unigram_em_step(words, probs, max_piece_len=4)
            ll2 = unigram_corpus_loglik(words, probs, max_piece_len=4)
            assert ll2 >= ll - 1e-9, (ll, ll2)  # the EM invariant
            ll = ll2

    def test_training_is_deterministic(self, spark):
        from proxima_platform_spark.functions.unigram import unigram_em_train

        docs = self._corpus(spark)
        a = {(r.piece, r.lp) for r in unigram_em_train(
            docs, vocab_size=12, seed_size=40, max_piece_len=4, iters=2
        ).collect()}
        b = {(r.piece, r.lp) for r in unigram_em_train(
            docs, vocab_size=12, seed_size=40, max_piece_len=4, iters=2
        ).collect()}
        assert a == b  # decimal-quantized ECs make the model bit-stable

    def test_prune_keeps_chars_and_bounds_vocab(self, spark):
        from proxima_platform_spark.functions.unigram import unigram_em_train

        docs = self._corpus(spark)
        model = unigram_em_train(
            docs, vocab_size=5, seed_size=40, max_piece_len=4, iters=1
        )
        pieces = {r.piece for r in model.collect()}
        chars = {c for c in "lowernstwid"}
        assert chars <= pieces
        assert len([p for p in pieces if len(p) > 1]) <= 5

    def test_prune_coverage_survives_overlong_only_chars(self, spark):
        """A seeded single char whose EVERY containing word is overlong
        (> max_word_chars, so the E-step assigns it zero expected count)
        must still survive the prune — the coverage keep reads the
        pre-prune model, not the E-step output (r12 ADVICE)."""
        from proxima_platform_spark.functions.unigram import unigram_em_train

        docs = spark.createDataFrame(
            [(0, "the quick brown fox jumps high"),
             (1, "the lazy dog sleeps " + "z" * 80)],
            "doc_id long, text string",
        )
        model = unigram_em_train(
            docs, vocab_size=5, seed_size=60, max_piece_len=4, iters=1,
            max_word_chars=16,
        )
        pieces = {r.piece for r in model.collect()}
        # 'z' occurs ONLY inside the 80-char word, which the DP skips
        assert "z" in pieces

    def test_knob_guards(self, spark):
        from proxima_platform_spark.functions.unigram import (
            unigram_em_train,
            unigram_seed_probs,
        )

        docs = self._corpus(spark)
        with pytest.raises(ValueError):
            unigram_em_train(docs, iters=0)
        with pytest.raises(ValueError):
            unigram_seed_probs(docs, seed_size=-1)

    def test_corpus_roundtrip_nonvacuous(self, spark, sf_dir):
        from proxima_platform_spark.functions.unigram import (
            unigram_em_train,
            unigram_viterbi_encode,
        )
        from proxima_platform_spark.functions.dedup import tokens

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
        model = unigram_em_train(
            docs, vocab_size=150, seed_size=400, iters=1
        )
        words = docs.select(
            F.explode(tokens(F.col("text"))).alias("w")
        ).where(F.length("w") > 0).distinct()
        enc = unigram_viterbi_encode(words, model)
        rows = enc.collect()
        assert len(rows) == words.count()
        # char coverage -> nothing UNK; multi-char pieces actually used
        assert all(not r.is_unk for r in rows)
        assert any(r.n_pieces < len(r.w) for r in rows)
