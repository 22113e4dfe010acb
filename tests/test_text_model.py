"""Round-6 text-model operators: model-based quality scoring
(quality_model_score) and within-document repeated-span removal
(self_dedup_spans)."""

import pytest

from pyspark.sql import functions as F

from proxima_platform_spark.functions.text import (
    QUALITY_MODEL_WEIGHTS_V1,
    quality_model_logit,
    quality_model_score,
)


PROSE = (
    "The quick brown fox jumps over the lazy dog and the dog is happy "
    "to see the fox in the morning light of the quiet meadow."
)
SPAM = "!!! $$$ ### @@@ %%% ^^^ &&& *** ((( ))) !!! $$$ ### @@@ %%%"
REPEAT = "buy now " * 30


def docs(spark):
    return spark.createDataFrame(
        [(0, PROSE), (1, SPAM), (2, REPEAT), (3, "")],
        "doc_id long, text string",
    )


class TestQualityModelScore:
    def test_score_bounds_and_keep_flag(self, spark):
        out = docs(spark).select(
            "doc_id",
            quality_model_score(F.col("text")).alias("s"),
        ).collect()
        for r in out:
            assert 0.0 <= r.s <= 1.0

    def test_signal_directions(self, spark):
        """Prose outranks punctuation spam and repeated-word junk — the
        directions the fixed weights encode."""
        s = {r.doc_id: r.s for r in docs(spark).select(
            "doc_id", quality_model_score(F.col("text")).alias("s")
        ).collect()}
        assert s[0] > s[1] and s[0] > s[2]

    def test_sigmoid_of_logit(self, spark):
        """score == round(sigmoid(logit), 6) with the logit pre-rounded —
        the engine-parity contract the oracle relies on."""
        import math

        rows = docs(spark).select(
            quality_model_logit(F.col("text")).alias("z"),
            quality_model_score(F.col("text")).alias("s"),
        ).collect()
        for r in rows:
            assert r.s == pytest.approx(
                round(1.0 / (1.0 + math.exp(-r.z)), 6), abs=1e-9
            )

    def test_weights_are_versioned_constants(self):
        assert set(QUALITY_MODEL_WEIGHTS_V1) == {
            "bias", "alpha_ratio", "punct_ratio", "stopword_ratio",
            "mean_word_len_dev", "length_sat", "dup_word_frac",
        }

    def test_pretraining_prep_gate_composes(self, spark):
        """model_quality_min gates pretraining_prep exactly like
        pre-filtering the docs frame on the score — and the gate actually
        drops something on this fixture (non-vacuous)."""
        from proxima_platform_spark.functions.prep import pretraining_prep

        d = docs(spark).where(F.length("text") > 0)
        cutoff = 0.5
        gated = pretraining_prep(
            d, model_quality_min=cutoff, budget=64, n_shards=2,
            quality_min=0.0, dup_word_max=1.0,
        ).collect()
        prefiltered = pretraining_prep(
            d.where(quality_model_score(F.col("text")) >= cutoff),
            budget=64, n_shards=2, quality_min=0.0, dup_word_max=1.0,
        ).collect()
        assert sorted(map(tuple, gated)) == sorted(map(tuple, prefiltered))
        ungated = pretraining_prep(
            d, budget=64, n_shards=2, quality_min=0.0, dup_word_max=1.0,
        ).agg(F.sum("total_tokens")).collect()[0][0]
        gated_total = sum(r.total_tokens for r in gated)
        assert gated_total < ungated


class TestSelfDedupSpans:
    def test_first_occurrence_kept_and_reassembled(self, spark):
        from proxima_platform_spark.functions.dedup import self_dedup_spans

        # spans of 2 tokens: [a b][c d][a b][e] → drop the repeat, keep order
        d = spark.createDataFrame(
            [(1, "a b c d a b e"), (2, "x y x y x y"), (3, "")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in self_dedup_spans(d, span_tokens=2).collect()}
        assert (out[1].n_spans, out[1].n_kept) == (4, 3)
        assert out[1].text_dedup == "a b c d e"
        assert (out[2].n_spans, out[2].n_kept) == (3, 1)
        assert out[2].text_dedup == "x y"
        # empty text: tokens('') == [''] → one empty span, reassembles to ''
        assert (out[3].n_spans, out[3].n_kept) == (1, 1)
        assert out[3].text_dedup == ""

    def test_no_repeats_is_identity(self, spark):
        from proxima_platform_spark.functions.dedup import self_dedup_spans

        d = spark.createDataFrame(
            [(1, "one two three four five")], "doc_id long, text string"
        )
        r = self_dedup_spans(d, span_tokens=2).collect()[0]
        assert r.n_spans == r.n_kept == 3
        assert r.text_dedup == "one two three four five"

    def test_repetition_delta_drops(self, spark):
        """Deduping repeated spans must not increase dup_word_frac on a
        repeat-heavy document."""
        from proxima_platform_spark.functions.dedup import self_dedup_spans
        from proxima_platform_spark.functions.text import repetition_signals

        d = spark.createDataFrame(
            [(1, "spam ham " * 20 + "real content here")],
            "doc_id long, text string",
        )
        sd = self_dedup_spans(d, span_tokens=2)
        row = d.join(sd, "doc_id").select(
            repetition_signals(F.col("text"))["dup_word_frac"].alias("before"),
            repetition_signals(F.col("text_dedup"))["dup_word_frac"].alias("after"),
        ).collect()[0]
        assert row.after < row.before


class TestDupNgramCoverage:
    def test_shared_passage_covered(self, spark):
        from proxima_platform_spark.functions.dedup import dup_ngram_coverage

        shared = "alpha beta gamma delta"  # one shared 4-token passage
        d = spark.createDataFrame(
            [
                (1, shared + " unique one two three"),
                (2, "other words here " + shared),
                (3, "completely different content entirely"),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in dup_ngram_coverage(d, n=4).collect()}
        # doc1: tokens 8, grams 5, exactly gram at pos0 duplicated → covers 4
        assert (out[1].n_tokens, out[1].n_grams) == (8, 5)
        assert out[1].n_dup_grams == 1 and out[1].covered_tokens == 4
        assert out[1].coverage == 0.5
        # doc2: shared passage at the end
        assert out[2].n_dup_grams == 1 and out[2].covered_tokens == 4
        # doc3: nothing shared
        assert out[3].n_dup_grams == 0 and out[3].coverage == 0.0

    def test_overlapping_windows_union(self, spark):
        """Two overlapping duplicated grams cover the union of their
        windows, not the sum."""
        from proxima_platform_spark.functions.dedup import dup_ngram_coverage

        seq = "a b c d e"  # grams (a b c d), (b c d e) both duplicated
        d = spark.createDataFrame(
            [(1, seq + " tail1 x1 y1"), (2, seq + " tail2 x2 y2")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in dup_ngram_coverage(d, n=4).collect()}
        assert out[1].n_dup_grams == 2
        assert out[1].covered_tokens == 5  # union of [0..3] and [1..4]

    def test_within_doc_repeat_not_duplicated(self, spark):
        """A gram repeated only WITHIN one doc is not cross-doc duplicated
        (the >=2 distinct docs rule)."""
        from proxima_platform_spark.functions.dedup import dup_ngram_coverage

        d = spark.createDataFrame(
            [(1, "p q r s p q r s"), (2, "totally different words here")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in dup_ngram_coverage(d, n=4).collect()}
        assert out[1].n_dup_grams == 0 and out[1].coverage == 0.0


class TestR06ModelParity:
    def test_self_dedup_spans_matches_python_model(self, spark):
        """Randomized corpora: operator output equals a direct Python model
        of the spec (chunk → first-occurrence filter → reassemble)."""
        import random

        from proxima_platform_spark.functions.dedup import self_dedup_spans

        rng = random.Random(42)
        words = ["aa", "bb", "cc", "dd"]
        rows = []
        for i in range(40):
            n = rng.randint(0, 12)
            rows.append((i, " ".join(rng.choice(words) for _ in range(n))))
        d = spark.createDataFrame(rows, "doc_id long, text string")
        for k in (2, 3):
            got = {
                r.doc_id: (r.n_spans, r.n_kept, r.text_dedup)
                for r in self_dedup_spans(d, span_tokens=k).collect()
            }
            for i, text in rows:
                toks = text.lower().strip().split()
                toks = toks if toks != [] else [""] if text == "" else toks
                # tokens('') == [''] per the dedup.tokens contract
                if text.strip() == "":
                    toks = [""]
                spans = [
                    " ".join(toks[s:s + k]) for s in range(0, max(len(toks), 1), k)
                ]
                seen, kept = set(), []
                for sp in spans:
                    if sp not in seen:
                        seen.add(sp)
                        kept.append(sp)
                want = (len(spans), len(kept), " ".join(kept))
                assert got[i] == want, (i, text, got[i], want)

    def test_dup_ngram_coverage_matches_python_model(self, spark):
        import random

        from proxima_platform_spark.functions.dedup import dup_ngram_coverage

        rng = random.Random(7)
        words = ["x", "y", "z"]
        rows = [
            (i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 10))))
            for i in range(30)
        ]
        d = spark.createDataFrame(rows, "doc_id long, text string")
        n = 3
        got = {
            r.doc_id: (r.n_tokens, r.n_grams, r.n_dup_grams, r.covered_tokens)
            for r in dup_ngram_coverage(d, n=n).collect()
        }
        # model
        toks = {}
        for i, text in rows:
            t = text.lower().strip().split()
            toks[i] = t if t or text.strip() else [""]
            if text.strip() == "":
                toks[i] = [""]
        grams = {
            i: [" ".join(t[s:s + n]) for s in range(len(t) - n + 1)]
            if len(t) >= n else []
            for i, t in toks.items()
        }
        docs_per_gram = {}
        for i, gs in grams.items():
            for g in set(gs):
                docs_per_gram.setdefault(g, set()).add(i)
        for i, text in rows:
            dup_occ = [
                s for s, g in enumerate(grams[i]) if len(docs_per_gram[g]) >= 2
            ]
            covered = set()
            for s in dup_occ:
                covered.update(range(s, s + n))
            want = (len(toks[i]), len(grams[i]), len(dup_occ), len(covered))
            assert got[i] == want, (i, text, got[i], want)


class TestDedupSubstrings:
    def test_first_occurrence_kept_cross_doc(self, spark):
        """The globally-first occurrence of a shared passage survives; every
        other document's copy is cut."""
        from proxima_platform_spark.functions.dedup import dedup_substrings

        shared = "alpha beta gamma delta"
        d = spark.createDataFrame(
            [
                (1, shared + " unique one two three"),
                (2, "other words here " + shared),
                (3, "completely different content entirely"),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in dedup_substrings(d, n=4).collect()}
        # doc1 holds the first occurrence (min doc_id): untouched
        assert (out[1].n_tokens, out[1].n_removed) == (8, 0)
        assert out[1].text_dedup == shared + " unique one two three"
        # doc2 loses exactly the 4 shared tokens
        assert out[2].n_removed == 4
        assert out[2].text_dedup == "other words here"
        # doc3 untouched
        assert out[3].n_removed == 0
        assert out[3].text_dedup == "completely different content entirely"

    def test_overlapping_windows_cut_union(self, spark):
        """Overlapping duplicated grams in the loser doc cut the UNION of
        their windows (no double counting, no gaps)."""
        from proxima_platform_spark.functions.dedup import dedup_substrings

        seq = "a b c d e"  # grams (a b c d) and (b c d e) both shared
        d = spark.createDataFrame(
            [(1, seq + " tail1 x1 y1"), (2, "front2 " + seq + " tail2")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in dedup_substrings(d, n=4).collect()}
        assert out[1].n_removed == 0  # first occurrences live in doc1
        assert out[2].n_removed == 5  # union of [1..4] and [2..5]
        assert out[2].text_dedup == "front2 tail2"

    def test_within_doc_repeat_untouched(self, spark):
        """A gram repeated only within ONE doc is self_dedup_spans'
        business, not this operator's."""
        from proxima_platform_spark.functions.dedup import dedup_substrings

        d = spark.createDataFrame(
            [(1, "p q r s p q r s"), (2, "totally different words here")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in dedup_substrings(d, n=4).collect()}
        assert out[1].n_removed == 0
        assert out[2].n_removed == 0

    def test_winner_doc_later_copies_cut(self, spark):
        """Within the winner doc, occurrences AFTER the first are cut once
        the gram is cross-doc duplicated."""
        from proxima_platform_spark.functions.dedup import dedup_substrings

        shared = "m n o p"
        d = spark.createDataFrame(
            [
                (1, shared + " filler words " + shared),
                (2, "elsewhere " + shared + " too"),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in dedup_substrings(d, n=4).collect()}
        # doc1 keeps the first copy, loses the second
        assert out[1].n_removed == 4
        assert out[1].text_dedup == shared + " filler words"
        assert out[2].n_removed == 4
        assert out[2].text_dedup == "elsewhere too"

    def test_short_and_empty_docs_pass_through(self, spark):
        from proxima_platform_spark.functions.dedup import dedup_substrings

        d = spark.createDataFrame(
            [(1, "too short"), (2, ""), (3, "too short")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in dedup_substrings(d, n=4).collect()}
        assert out[1].n_removed == 0 and out[1].text_dedup == "too short"
        assert out[2].n_removed == 0 and out[2].text_dedup == ""

    def test_coverage_delta_drops(self, spark):
        """The before/after contract: duplicated-passage coverage measured
        by dup_ngram_coverage strictly drops after the cut."""
        from proxima_platform_spark.functions.dedup import (
            dedup_substrings,
            dup_ngram_coverage,
        )

        shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
        rows = [
            (i, f"doc{i} head words " + shared + f" doc{i} tail words")
            for i in range(6)
        ]
        d = spark.createDataFrame(rows, "doc_id long, text string")
        before = sum(
            r.covered_tokens for r in dup_ngram_coverage(d, n=8).collect()
        )
        after_docs = dedup_substrings(d, n=8).select(
            "doc_id", F.col("text_dedup").alias("text")
        )
        after = sum(
            r.covered_tokens
            for r in dup_ngram_coverage(after_docs, n=8).collect()
        )
        assert before > 0
        assert after < before


class TestDedupSubstringsMaximal:
    def test_unaligned_long_duplicate_removed_whole(self, spark):
        """A planted duplicate of length min_len+7 at an UNALIGNED offset
        is removed as ONE maximal run (the fixed-n operator's contract
        check from VERDICT r07 #2)."""
        from proxima_platform_spark.functions.dedup import (
            dedup_substrings_maximal,
        )

        span = " ".join(f"s{i}" for i in range(1, 12))  # 11 = 4 + 7 tokens
        d = spark.createDataFrame(
            [
                (1, span + " u1 u2 u3"),
                (2, "f1 f2 f3 " + span + " g1 g2"),  # offset 3: unaligned
            ],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r
            for r in dedup_substrings_maximal(d, min_len=4).collect()
        }
        # doc1 holds every winning occurrence: untouched
        assert (out[1].n_removed, out[1].n_runs_cut) == (0, 0)
        assert out[1].text_dedup == span + " u1 u2 u3"
        # doc2 loses the whole 11-token span as ONE run — not fragments
        assert out[2].n_removed == 11
        assert out[2].n_runs_cut == 1
        assert out[2].max_run_len == 11
        assert out[2].text_dedup == "f1 f2 f3 g1 g2"

    def test_winner_window_immune_under_self_overlap(self, spark):
        """Self-overlapping repeats: kept wins over removal, so the first
        occurrence survives whole where dedup_substrings' removal-wins
        approximation would chew it."""
        from proxima_platform_spark.functions.dedup import (
            dedup_substrings,
            dedup_substrings_maximal,
        )

        d = spark.createDataFrame(
            [(1, "a b a b a b"), (2, "x a b a b y")],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r
            for r in dedup_substrings_maximal(d, min_len=4).collect()
        }
        # winner window [0..3] of "a b a b" immune; doc1's second
        # occurrence loses only the tokens OUTSIDE the kept window
        assert out[1].text_dedup == "a b a b"
        assert out[1].n_removed == 2
        # loser doc cut in full
        assert out[2].text_dedup == "x y"
        assert out[2].n_removed == 4
        # contrast: the fixed-n cutter destroys part of the kept copy
        old = {r.doc_id: r for r in dedup_substrings(d, n=4).collect()}
        assert old[1].n_removed > out[1].n_removed

    def test_duplicated_content_always_survives_somewhere(self, spark):
        """Invariant: every duplicated gram's content remains readable at
        its winning occurrence — the ExactSubstr keep-one contract."""
        from pyspark.sql import functions as F

        from proxima_platform_spark.functions.dedup import (
            dedup_substrings_maximal,
            shingles_from_tokens,
            tokens,
        )

        rows = [
            (1, "p q r s t common one two"),
            (2, "zz p q r s t yy common"),
            (3, "common p q r s t common p q r s t"),
        ]
        d = spark.createDataFrame(rows, "doc_id long, text string")
        out = dedup_substrings_maximal(d, min_len=4)
        # grams duplicated across >= 2 docs in the INPUT
        occ = d.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    shingles_from_tokens(tokens(F.col("text")), 4)
                )
            ).alias("g"),
        ).distinct()
        dup = {
            r.g
            for r in occ.groupBy("g")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .where("nd >= 2")
            .collect()
        }
        assert dup  # non-vacuous fixture
        survivors = " | ".join(
            r.text_dedup for r in out.orderBy("doc_id").collect()
        )
        for g in dup:
            assert g in survivors, f"duplicated gram erased everywhere: {g}"

    def test_short_docs_and_validation(self, spark):
        from proxima_platform_spark.functions.dedup import (
            dedup_substrings_maximal,
        )

        d = spark.createDataFrame(
            [(1, "too short"), (2, "")],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r
            for r in dedup_substrings_maximal(d, min_len=4).collect()
        }
        assert out[1].n_removed == 0 and out[1].text_dedup == "too short"
        assert out[2].n_removed == 0 and out[2].text_dedup == ""
        import pytest

        with pytest.raises(ValueError, match="min_len"):
            dedup_substrings_maximal(d, min_len=1)

    def test_matches_python_model(self, spark):
        """Randomized corpora: operator output equals a direct Python model
        of the keep-global-first / cut-windows rule."""
        import random

        from proxima_platform_spark.functions.dedup import dedup_substrings

        rng = random.Random(77)
        vocab = [f"w{i}" for i in range(12)]
        n = 3
        docs = []
        for did in range(8):
            toks = [vocab[rng.randrange(len(vocab))] for _ in range(rng.randrange(2, 25))]
            docs.append((did, " ".join(toks)))

        # python model (1-based-free: 0-based everywhere)
        token_lists = {did: t.split(" ") if t else [""] for did, t in docs}
        occs = {}  # fp -> list[(doc, pos)]
        for did, tl in token_lists.items():
            for p in range(len(tl) - n + 1):
                fp = " ".join(tl[p:p + n])
                occs.setdefault(fp, []).append((did, p))
        removed = {did: set() for did, _ in docs}
        for fp, lst in occs.items():
            if len({d for d, _ in lst}) < 2:
                continue
            winner = min(lst)
            for (d_, p_) in lst:
                if (d_, p_) == winner:
                    continue
                removed[d_].update(range(p_, p_ + n))
        want = {}
        for did, tl in token_lists.items():
            keep = [t for i, t in enumerate(tl) if i not in removed[did]]
            want[did] = (len(tl), len(keep), " ".join(keep))

        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_tokens, r.n_kept, r.text_dedup)
            for r in dedup_substrings(df, n=n).collect()
        }
        assert got == want


class TestWinnowing:
    """True winnowing (MOSS): local w-window fingerprint sets with the
    rightmost-min tie-break, and the copy-detection overlap join."""

    def test_detection_guarantee(self, spark):
        """Any shared token run of length >= w + 2 (one full window of
        3-grams) shares at least one fingerprint — winnowing's theorem,
        the property the global-min fingerprint does not give."""
        from proxima_platform_spark.functions.text import winnow_overlap

        w = 4
        shared = "alpha beta gamma delta epsilon zeta"  # w + 2 = 6 tokens
        df = spark.createDataFrame(
            [
                (0, f"one two three four {shared} five six seven eight"),
                (1, f"nine ten eleven twelve {shared} thirteen fourteen"),
                (2, "totally unrelated words only here nothing common"),
            ],
            "doc_id long, text string",
        )
        pairs = {
            (r.doc_a, r.doc_b)
            for r in winnow_overlap(
                df, "doc_id", "text", w=w, min_shared=1
            ).collect()
        }
        assert (0, 1) in pairs
        assert all(2 not in p for p in pairs)

    def test_positions_point_at_selected_gram(self, spark):
        """Every reported (pos, fp): recomputing the 3-gram hash at pos
        reproduces fp (positions are real offsets, not window indices),
        and pos is the RIGHTMOST minimal gram inside some window."""
        from proxima_platform_spark.functions.dedup import (
            normalize_text as _nt,
        )
        from proxima_platform_spark.functions.text import (
            ROLLING_B,
            ROLLING_B2,
            ROLLING_P,
            winnow_fingerprints,
        )
        import hashlib

        text = "the cat sat on the mat and the cat sat on the rug again"
        df = spark.createDataFrame([(7, text)], "doc_id long, text string")
        toks = text.lower().split()

        def h30(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % 2**30

        th = [h30(t) for t in toks]
        grams = [
            (th[i] * ROLLING_B2 + th[i + 1] * ROLLING_B + th[i + 2])
            % ROLLING_P
            for i in range(len(th) - 2)
        ]
        got = winnow_fingerprints(df, "doc_id", "text", w=4).collect()
        assert len(got) >= 1
        for r in got:
            assert grams[r.pos - 1] == r.fp  # pos is 1-based gram offset

    def test_rightmost_tie_break(self, spark):
        """A window of identical gram hashes selects the RIGHTMOST
        position (the SWA-paper rule that minimizes fingerprint count
        across overlapping windows)."""
        from proxima_platform_spark.functions.text import winnow_fingerprints

        # "x x x x x x" → all 3-grams identical → every window ties
        df = spark.createDataFrame(
            [(1, "x x x x x x x")], "doc_id long, text string"
        )
        rows = winnow_fingerprints(df, "doc_id", "text", w=4).collect()
        # 5 grams, windows [1..4],[2..5] → rightmost picks pos 4 and 5
        assert sorted(r.pos for r in rows) == [4, 5]
        assert len({r.fp for r in rows}) == 1

    def test_density_and_short_docs(self, spark):
        """Fingerprint count per doc is bounded by the window count and
        >= 1 per w windows (density ~2/(w+1)); docs under 3 tokens emit
        nothing; docs with 1 <= grams < w emit exactly one fingerprint."""
        from proxima_platform_spark.functions.text import winnow_fingerprints

        long_text = " ".join(f"tok{i % 17}" for i in range(60))
        df = spark.createDataFrame(
            [(0, long_text), (1, "just two"), (2, "a b c d")],
            "doc_id long, text string",
        )
        out = winnow_fingerprints(df, "doc_id", "text", w=4).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        assert 1 not in by_doc  # < 3 tokens → no grams
        assert len(by_doc[2]) == 1  # 2 grams < w → one clamped window
        n_grams, w = 58, 4
        n_windows = n_grams - w + 1
        assert 1 <= len(by_doc[0]) <= n_windows

    def test_boilerplate_cap_drops_ubiquitous_fingerprints(self, spark):
        """max_docs_per_fp: a fingerprint present in every doc (license
        header) is cut before pairing, so pure-boilerplate pairs vanish
        while genuinely-shared-content pairs survive."""
        from proxima_platform_spark.functions.text import winnow_overlap

        header = "licensed under the apache license version two zero"
        body = "real shared content sentence repeated across two docs"
        rows = [(i, f"{header} unique{i} filler{i} words{i}") for i in range(6)]
        rows += [(10, f"{header} {body} tail one"), (11, f"{header} {body} tail two")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = {
            (r.doc_a, r.doc_b)
            for r in winnow_overlap(
                df, "doc_id", "text", w=4, min_shared=1, max_docs_per_fp=4
            ).collect()
        }
        assert (10, 11) in pairs
        # header-only pairs are gone: no pair among docs 0-5
        assert not any(a < 6 and b < 6 for a, b in pairs)


class TestWinnowFold:
    """r13 fold (VERDICT r12 'Next round' #3): winnow_fingerprint_set left
    the declared query set to open r14's window slot for unigram_fertility.
    This test preserves the certification the driver hash used to provide:
    the EXACT (doc_id, pos, fp) row set of Spark winnow_fingerprints vs the
    DuckDB oracle (_sql_winnow_fingerprints — still embedded verbatim in
    the surviving winnow_overlap and dedup_winnow oracles) on the real
    sf0.001 documents table."""

    def test_spark_matches_duckdb_oracle_on_testdata(self, spark, sf_dir):
        import duckdb
        import os

        from proxima_platform_spark.functions.text import winnow_fingerprints

        path = os.path.join(sf_dir, "documents.parquet")
        docs = spark.read.parquet(path)
        got = {
            (r.doc_id, r.pos, r.fp)
            for r in winnow_fingerprints(docs, "doc_id", "text", w=4).collect()
        }

        import __spark_entry__ as entry

        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
        )
        want = set(map(tuple, con.sql(entry._sql_winnow_fingerprints()).fetchall()))
        assert len(got) > 100  # real data, non-trivial fingerprint set
        assert got == want
    def test_known_values(self, spark):
        """Uniform 4-symbol text → exactly 2 bits/char; single-char text
        → 0; empty text → NULL with n_chars 0."""
        from proxima_platform_spark.functions.text import char_entropy

        df = spark.createDataFrame(
            [(0, "abcd" * 8), (1, "aaaa"), (2, "")],
            "doc_id long, text string",
        )
        got = {r.doc_id: (r.n_chars, r.entropy) for r in
               char_entropy(df, "doc_id", "text").collect()}
        assert got[0] == (32, 2.0)
        assert got[1] == (4, 0.0)
        assert got[2] == (0, None)

    def test_spam_scores_below_prose(self, spark):
        """The quality-signal property: repetitive spam has lower
        character entropy than natural prose."""
        from proxima_platform_spark.functions.text import char_entropy

        df = spark.createDataFrame(
            [(0, "The quick brown fox jumps over the lazy dog quietly."),
             (1, "buy now buy now buy now buy now buy now buy now")],
            "doc_id long, text string",
        )
        got = {r.doc_id: r.entropy for r in
               char_entropy(df, "doc_id", "text").collect()}
        assert got[0] > got[1]


class TestDedupWinnow:
    """Winnow-based shared-span cut: the dedup completion of the
    winnowing tier — near-verbatim blocks with small edits are cut where
    exact-gram dedup sees nothing."""

    def _planted(self, spark):
        # doc 1: original 40-token block (+ unique tail). doc 2: the same
        # block with an edit every 7 tokens — no duplicated 8-gram
        # survives (exact-gram dedup blind), but every untouched run is
        # 6 tokens >= w+2, which winnowing at w=4 GUARANTEES to
        # fingerprint. doc 3: unrelated.
        block = [f"tok{i}" for i in range(40)]
        edited = list(block)
        for j in range(3, 40, 7):
            edited[j] = f"edit{j}"
        return spark.createDataFrame(
            [
                (1, " ".join(block) + " unique tail one"),
                (2, " ".join(edited) + " different ending two"),
                (3, "totally unrelated text with nothing shared at all"),
            ],
            "doc_id long, text string",
        )

    def test_edited_block_cut_where_exact_gram_blind(self, spark):
        from proxima_platform_spark.functions.dedup import (
            dedup_substrings_maximal,
            dedup_winnow,
        )

        docs = self._planted(spark)
        exact = {
            r.doc_id: r.n_removed
            for r in dedup_substrings_maximal(docs, min_len=8).collect()
        }
        assert exact == {1: 0, 2: 0, 3: 0}  # edits break every 8-gram
        got = {r.doc_id: r for r in dedup_winnow(docs, w=4).collect()}
        # first occurrence survives WHOLE (winner immunity)
        assert got[1].n_removed == 0
        assert got[1].text_dedup.startswith("tok0 tok1 tok2 tok3")
        # the edited copy loses its shared runs but keeps most edits
        # (an edit can be bridged over when matched fingerprints flank
        # it within <= w grams — the documented conservative cut)
        assert got[2].n_removed > 10
        assert got[2].n_runs_cut >= 2
        surviving = sum(
            f"edit{j}" in got[2].text_dedup for j in range(3, 40, 7)
        )
        assert surviving >= 4
        assert got[2].text_dedup.endswith("different ending two")
        # unrelated doc untouched
        assert got[3].n_removed == 0

    def test_island_bridging_cuts_runs_whole(self, spark):
        """Two docs sharing one long verbatim run: the non-winner copy's
        matched fingerprints (<= w apart inside the run) bridge into ONE
        island, so the run is cut whole — never fragmented at sampled
        positions."""
        from proxima_platform_spark.functions.dedup import dedup_winnow

        run = " ".join(f"r{i}" for i in range(20))
        df = spark.createDataFrame(
            [
                (1, "alpha beta " + run + " gamma delta"),
                (2, "one two three " + run + " four five six"),
            ],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in dedup_winnow(df, w=4).collect()}
        assert got[1].n_removed == 0  # globally-first copy immune
        assert got[2].n_runs_cut == 1  # one island, not fragments
        assert got[2].max_run_len >= 18  # covers (almost) the whole run
        assert "four five six" in got[2].text_dedup

    def test_w_validation(self, spark):
        import pytest

        from proxima_platform_spark.functions.dedup import dedup_winnow

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        with pytest.raises(ValueError, match="w must be"):
            dedup_winnow(df, w=0)


class TestVocabGrowth:
    def test_cumulative_curve(self, spark):
        from proxima_platform_spark.functions.text import vocab_growth

        df = spark.createDataFrame(
            [
                (0, "a b c"),        # bucket 0: 3 tokens, types a b c
                (1, "a b"),          # bucket 0: +2 tokens, no new types
                (2, "c d"),          # bucket 2: +2 tokens, new type d
                (5, "e e e"),        # bucket 4: +3 tokens, new type e
            ],
            "doc_id long, text string",
        )
        got = {
            r.checkpoint: (r.cum_docs, r.cum_tokens, r.cum_types)
            for r in vocab_growth(df, "doc_id", "text", every=2).collect()
        }
        assert got[2] == (2, 5, 3)
        assert got[4] == (3, 7, 4)
        assert got[6] == (4, 10, 5)

    def test_every_validation(self, spark):
        import pytest

        from proxima_platform_spark.functions.text import vocab_growth

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError, match="every"):
            vocab_growth(df, "doc_id", "text", every=0)

    def test_non_numeric_id_raises(self, spark):
        """A doc id that casts to NULL would silently fall out of the
        bucketing — fail loud per-row (r09 ADVICE)."""
        import pytest

        from proxima_platform_spark.functions.text import vocab_growth

        df = spark.createDataFrame(
            [("doc-x", "a b"), ("7", "c")], "doc_id string, text string"
        )
        with pytest.raises(Exception, match="vocab_growth"):
            vocab_growth(df, "doc_id", "text", every=2).collect()


class TestWinnowDecontaminate:
    def test_edited_copy_flagged_exact_ngram_blind(self, spark):
        """A training doc containing a lightly-edited copy of an eval
        item shares NO exact 8-gram but IS flagged by winnowing."""
        from proxima_platform_spark.functions.text import (
            winnow_decontaminate,
        )

        block = [f"q{i}" for i in range(30)]
        edited = list(block)
        for j in range(3, 30, 7):
            edited[j] = f"x{j}"
        evalset = spark.createDataFrame(
            [(1, " ".join(block))], "doc_id long, text string"
        )
        corpus = spark.createDataFrame(
            [
                (100, "prefix words " + " ".join(edited) + " suffix words"),
                (101, "completely unrelated training content here"),
            ],
            "doc_id long, text string",
        )
        got = winnow_decontaminate(
            corpus, evalset, w=4, min_shared=2
        ).collect()
        assert {(r.doc_id, r.eval_id) for r in got} == {(100, 1)}
        assert got[0].shared >= 2

    def test_min_shared_thresholds(self, spark):
        from proxima_platform_spark.functions.text import (
            winnow_decontaminate,
        )

        evalset = spark.createDataFrame(
            [(1, "a b c d e f unique eval tail")],
            "doc_id long, text string",
        )
        corpus = spark.createDataFrame(
            [(100, "a b c d e f and then different words entirely")],
            "doc_id long, text string",
        )
        low = winnow_decontaminate(corpus, evalset, min_shared=1).collect()
        assert len(low) == 1
        high = winnow_decontaminate(
            corpus, evalset, min_shared=50
        ).collect()
        assert high == []


class TestContainmentPairs:
    def test_quote_inclusion_found_where_jaccard_tiny(self, spark):
        """A short doc quoted whole inside a much longer one: Jaccard is
        tiny (union dominated by the long doc) but containment ~1 — the
        asymmetric case resemblance dedup structurally misses."""
        from proxima_platform_spark.functions.dedup import containment_pairs

        quote = " ".join(f"q{i}" for i in range(12))
        long_doc = (
            " ".join(f"body{i}" for i in range(80))
            + " " + quote + " "
            + " ".join(f"tail{i}" for i in range(40))
        )
        df = spark.createDataFrame(
            [(1, quote), (2, long_doc), (3, "unrelated filler words here")],
            "doc_id long, text string",
        )
        got = {
            (r.doc_a, r.doc_b): r
            for r in containment_pairs(df, n=4, threshold=0.5).collect()
        }
        assert (1, 2) in got  # quote contained in the long doc
        assert got[(1, 2)].containment == 1.0
        # the reverse direction fails the threshold (long doc is mostly
        # NOT in the quote) — directionality is the point
        assert (2, 1) not in got

    def test_boilerplate_cap_drops_universal_shingles(self, spark):
        from proxima_platform_spark.functions.dedup import containment_pairs

        header = "standard header line for every page"
        df = spark.createDataFrame(
            [(i, header + f" unique body {i} content piece") for i in range(6)],
            "doc_id long, text string",
        )
        # the header shingles appear in all 6 docs: cap at 3 cuts them,
        # and no pair shares anything else
        out = containment_pairs(
            df, n=4, threshold=0.1, max_docs_per_shingle=3
        ).collect()
        assert out == []

    def test_validation(self, spark):
        import pytest

        from proxima_platform_spark.functions.dedup import containment_pairs

        df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
        with pytest.raises(ValueError, match="threshold"):
            containment_pairs(df, threshold=0.0)
        with pytest.raises(ValueError, match="n must"):
            containment_pairs(df, n=0)


class TestZipfSlope:
    def test_matches_python_ols(self, spark):
        import math
        from decimal import Decimal

        from proxima_platform_spark.functions.text import zipf_slope

        docs = spark.createDataFrame(
            [(1, "a a a a b b b c c d"), (2, "a a b c d e f g")],
            "doc_id long, text string",
        )
        [row] = zipf_slope(docs, top_r=5).collect()
        # counts: a=6 b=4 c=3 d=2 e=1 f=1 g=1 -> top5 by (cnt desc, w):
        # a6 b4 c3 d2 e1
        q = lambda v: Decimal(repr(round(math.log(v), 8)))
        pts = [(q(r), q(c)) for r, c in [(1, 6), (2, 4), (3, 3), (4, 2), (5, 1)]]
        n = float(len(pts))
        sx = float(sum(p[0] for p in pts)); sy = float(sum(p[1] for p in pts))
        sxy = float(sum(p[0] * p[1] for p in pts))
        sxx = float(sum(p[0] * p[0] for p in pts))
        sl = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert row["n_terms"] == 5
        assert row["slope"] == round(sl, 6)
        assert row["intercept"] == round((sy - sl * sx) / n, 6)
        assert row["slope"] < 0  # frequency decreasing in rank


class TestSourceJsd:
    def _model(self, rows):
        import math
        from collections import Counter
        from decimal import Decimal

        per_s, corpus = {}, Counter()
        import re as _re
        for s, txt in rows:
            toks = _re.sub(r"\s+", " ", txt.strip().lower()).split(" ")
            per_s.setdefault(s, Counter()).update(toks)
            corpus.update(toks)
        t = sum(corpus.values())
        out = {}
        q8 = lambda x: Decimal(repr(round(math.log(x), 8)))
        for s, cnts in per_s.items():
            ts = sum(cnts.values())
            s1 = s2 = Decimal(0)
            for w, c in corpus.items():
                cs = cnts.get(w, 0)
                p, q = cs / ts, c / t
                m = (p + q) / 2.0
                if cs > 0:
                    s1 += cs * q8(p / m)
                s2 += c * q8(q / m)
            out[s] = round(0.5 * (float(s1) / ts + float(s2) / t), 6)
        return out

    def test_matches_python_model(self, spark):
        from proxima_platform_spark.functions.text import source_jsd

        rows = [
            ("a", "x y z x y"),
            ("a", "x x w"),
            ("b", "u v u v w"),
            ("c", "x y z w u v"),
        ]
        df = spark.createDataFrame(
            [(i, s, t) for i, (s, t) in enumerate(rows)],
            "doc_id long, source string, text string",
        )
        got = {r["source"]: r["jsd"] for r in source_jsd(df).collect()}
        want = self._model(rows)
        assert got == want
        # bounded by ln 2
        assert all(0.0 <= v <= 0.6931472 for v in got.values())

    def test_identical_distribution_is_zero(self, spark):
        from proxima_platform_spark.functions.text import source_jsd

        df = spark.createDataFrame(
            [(1, "a", "x y z"), (2, "b", "x y z")],
            "doc_id long, source string, text string",
        )
        got = {r["source"]: r["jsd"] for r in source_jsd(df).collect()}
        assert got == {"a": 0.0, "b": 0.0}


class TestCcnetDegenerateBatch:
    def test_all_docs_drop_before_scoring(self, spark):
        """A micro-batch whose every document dies before KN5 (here: all
        docs shorter than 5 tokens after paragraph dedup) must yield the
        EMPTY summary with the output schema — not crash on the quantile
        collect (the streaming twin feeds ccnet_pipeline arbitrary
        slices)."""
        from proxima_platform_spark.functions.prep import ccnet_pipeline

        train = spark.createDataFrame(
            [(900, "en", "the cat sat on the mat near the door")],
            "doc_id long, lang string, text string",
        )
        docs = spark.createDataFrame(
            [(1, "too short"), (2, "also tiny")],
            "doc_id long, text string",
        )
        out = ccnet_pipeline(docs, train)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == [
            "pred_lang", "bucket", "n_docs", "clean_tokens", "avg_kn5"]

    def test_schema_matches_nonempty_output(self, spark):
        from proxima_platform_spark.functions.prep import ccnet_pipeline

        train = spark.createDataFrame(
            [(900, "en", "the cat sat on the mat near the door today ok")],
            "doc_id long, lang string, text string",
        )
        full = spark.createDataFrame(
            [(1, "the cat sat on the mat near the door today ok"),
             (2, "too short")],
            "doc_id long, text string",
        )
        empty_in = full.where("doc_id = 2")
        a = ccnet_pipeline(full, train)
        b = ccnet_pipeline(empty_in, train)
        assert [(f.name, f.dataType) for f in a.schema.fields] == [
            (f.name, f.dataType) for f in b.schema.fields]
