"""Multinomial Naive Bayes (functions/classify.py) vs a hand-computed
model: exact Laplace counts, unseen-token fallback, argmax tiebreak."""

import math
from decimal import Decimal

from proxima_platform_spark.functions.classify import naive_bayes_classify


def _qln(x: float) -> Decimal:
    # round(ln,8) -> decimal via shortest double repr, the engine cast path
    return Decimal(repr(round(math.log(x), 8)))

TRAIN = [
    (1, "spark spark shuffle", "tech"),
    (2, "spark join agg", "tech"),
    (3, "goal match score", "sport"),
    (4, "match match goal", "sport"),
]
TEST = [
    (10, "spark shuffle shuffle", "tech"),
    (11, "goal goal match", "sport"),
    (12, "unseen words only", "tech"),
]


def model_score(text: str, cls_tokens: dict, cls_docs: dict, vocab: int):
    """Replays the quantized-ln pipeline: each ln rounds to 8dp before the
    exact sum (matching round->decimal(18,10) in the engine)."""
    nd = sum(cls_docs.values())
    out = {}
    for c, toks_c in cls_tokens.items():
        tc = sum(toks_c.values())
        s = _qln(cls_docs[c] / nd)
        for w in text.split(" "):
            cnt = toks_c.get(w)
            s += (
                _qln((cnt + 1) / (tc + vocab))
                if cnt is not None
                else _qln(1.0 / (tc + vocab))
            )
        out[c] = float(s)
    return out


class TestNaiveBayes:
    def test_matches_hand_model(self, spark):
        train = spark.createDataFrame(TRAIN, "doc_id long, text string, lang string")
        test = spark.createDataFrame(TEST, "doc_id long, text string, lang string")
        got = {
            r["id"]: (r["label"], r["pred"], r["score"])
            for r in naive_bayes_classify(train, test).collect()
        }
        cls_tokens = {
            "tech": {"spark": 3, "shuffle": 1, "join": 1, "agg": 1},
            "sport": {"goal": 2, "match": 3, "score": 1},
        }
        cls_docs = {"tech": 2, "sport": 2}
        vocab = 7
        for doc_id, text, label in TEST:
            scores = model_score(text, cls_tokens, cls_docs, vocab)
            pred = min(scores, key=lambda c: (-scores[c], c))
            assert got[doc_id][0] == label
            assert got[doc_id][1] == pred
            assert abs(got[doc_id][2] - scores[pred]) < 1e-9

    def test_unseen_doc_ties_break_by_label(self, spark):
        # both classes symmetric for an all-unseen doc except priors/totals;
        # craft equal totals so scores tie exactly -> smallest label wins
        train = spark.createDataFrame(
            [(1, "a b", "x"), (2, "c d", "y")],
            "doc_id long, text string, lang string",
        )
        test = spark.createDataFrame(
            [(9, "zz qq", "x")], "doc_id long, text string, lang string"
        )
        [row] = naive_bayes_classify(train, test).collect()
        assert row["pred"] == "x"

    def test_separates_obvious_classes(self, spark):
        train = spark.createDataFrame(TRAIN, "doc_id long, text string, lang string")
        test = spark.createDataFrame(TEST[:2], "doc_id long, text string, lang string")
        got = {r["id"]: r["pred"] for r in naive_bayes_classify(train, test).collect()}
        assert got == {10: "tech", 11: "sport"}


class TestNbTopKFeatures:
    def test_pruned_model_matches_hand_model(self, spark):
        # K=1 keeps only each class's most frequent token; every other
        # statistic (token mass, vocab, unseen likelihood) derives from
        # the PRUNED frame — the hand model uses exactly those dicts
        train = spark.createDataFrame(TRAIN, "doc_id long, text string, lang string")
        test = spark.createDataFrame(TEST, "doc_id long, text string, lang string")
        got = {
            r["id"]: (r["pred"], r["score"])
            for r in naive_bayes_classify(
                train, test, top_k_features=1
            ).collect()
        }
        cls_tokens = {"tech": {"spark": 3}, "sport": {"match": 3}}
        cls_docs = {"tech": 2, "sport": 2}
        vocab = 2
        for doc_id, text, label in TEST:
            scores = model_score(text, cls_tokens, cls_docs, vocab)
            pred = min(scores, key=lambda c: (-scores[c], c))
            assert got[doc_id][0] == pred
            assert abs(got[doc_id][1] - scores[pred]) < 1e-9

    def test_prune_ties_break_by_smallest_token(self, spark):
        # tech's count-1 tokens are {agg, join, shuffle}: K=2 keeps
        # spark(3) then 'agg' (smallest of the tied tail)
        from proxima_platform_spark.functions.classify import nb_counts

        train = spark.createDataFrame(TRAIN, "doc_id long, text string, lang string")
        cwc, _ = nb_counts(train, top_k_features=2)
        kept = {
            (r["c"], r["w"]) for r in cwc.collect()
        }
        assert kept == {("tech", "spark"), ("tech", "agg"),
                        ("sport", "match"), ("sport", "goal")}

    def test_k_must_be_positive(self, spark):
        import pytest

        from proxima_platform_spark.functions.classify import nb_counts

        train = spark.createDataFrame(TRAIN, "doc_id long, text string, lang string")
        with pytest.raises(ValueError):
            nb_counts(train, top_k_features=0)
