"""Ranking metrics (functions/evalmetrics.py): exact tie-aware AUC vs a
python model, precision@k ordering semantics."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from proxima_platform_spark.functions.evalmetrics import precision_at_k, rank_auc


def _auc_model(scores, labels):
    """Tie-averaged rank-sum AUC, straight from the definition."""
    scores, labels = np.asarray(scores, float), np.asarray(labels, int)
    order = np.argsort(scores, kind="mergesort")
    s, l = scores[order], labels[order]
    ranks = np.empty(len(s))
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[i:j] = (i + j + 1) / 2.0
        i = j
    n_pos, n_neg = l.sum(), (1 - l).sum()
    u = ranks[l == 1].sum() - n_pos * (n_pos + 1) / 2.0
    return u / (n_pos * n_neg)


class TestRankAuc:
    def test_matches_model_with_ties(self, spark):
        rng = np.random.RandomState(3)
        scores = np.round(rng.rand(300), 2)          # heavy ties at 2dp
        labels = (rng.rand(300) < 0.3 + 0.4 * scores).astype(int)
        df = spark.createDataFrame(
            [(float(s), int(l)) for s, l in zip(scores, labels)],
            ["score", "label"],
        )
        out = rank_auc(df).collect()[0]
        assert out.n_pos == int(labels.sum())
        assert out.n_neg == int(300 - labels.sum())
        assert out.auc == pytest.approx(
            round(_auc_model(scores, labels), 6), abs=1e-6
        )

    def test_perfect_and_inverted(self, spark):
        df = spark.createDataFrame(
            [(float(i), int(i >= 5)) for i in range(10)], ["score", "label"]
        )
        assert rank_auc(df).collect()[0].auc == 1.0
        inv = df.select((F.lit(10.0) - F.col("score")).alias("score"), "label")
        assert rank_auc(inv).collect()[0].auc == 0.0

    def test_all_tied_is_half(self, spark):
        df = spark.createDataFrame(
            [(1.0, i % 2) for i in range(20)], ["score", "label"]
        )
        assert rank_auc(df).collect()[0].auc == 0.5


class TestPrecisionAtK:
    def test_ordering_and_values(self, spark):
        rows = [(i, float(100 - i), int(i < 3 or i == 7)) for i in range(20)]
        df = spark.createDataFrame(rows, ["id", "score", "label"])
        out = {r.k: r for r in precision_at_k(df, [1, 5, 10], id_col="id").collect()}
        assert out[1].precision == 1.0          # top-1 = id 0, positive
        assert out[5].n_hits == 3               # ids 0,1,2 in the top 5
        assert out[10].n_hits == 4              # id 7 enters by rank 8
        assert out[10].precision == 0.4

    def test_tie_break_is_by_id(self, spark):
        rows = [(1, 5.0, 0), (2, 5.0, 1), (3, 4.0, 1)]
        df = spark.createDataFrame(rows, ["id", "score", "label"])
        out = {r.k: r for r in precision_at_k(df, [1, 2], id_col="id").collect()}
        assert out[1].n_hits == 0               # id 1 wins the tie, negative
        assert out[2].n_hits == 1

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 1.0, 1)], ["id", "score", "label"])
        with pytest.raises(ValueError):
            precision_at_k(df, [], id_col="id")
        with pytest.raises(ValueError):
            precision_at_k(df, [0], id_col="id")


class TestNdcg:
    def test_hand_computed(self, spark):
        """4 items, graded rel: dcg/idcg/ndcg match the textbook formula."""
        import math

        from proxima_platform_spark.functions.evalmetrics import ndcg_at_k

        # ranking by score desc: ids 1(rel2), 2(rel0), 3(rel3), 4(rel1)
        df = spark.createDataFrame(
            [(1, 4.0, 2), (2, 3.0, 0), (3, 2.0, 3), (4, 1.0, 1)],
            "id long, score double, rel int",
        )
        got = {
            r.k: (r.dcg, r.idcg, r.ndcg)
            for r in ndcg_at_k(df, [2, 4], id_col="id").collect()
        }
        g = {1: 3, 2: 0, 3: 7, 4: 1}  # 2^rel - 1
        dcg2 = g[1] / math.log2(2) + g[2] / math.log2(3)
        # ideal order by rel desc, id: 3(7), 1(3), 4(1), 2(0)
        idcg2 = 7 / math.log2(2) + 3 / math.log2(3)
        assert got[2] == (
            round(dcg2, 6), round(idcg2, 6), round(dcg2 / idcg2, 6)
        )
        dcg4 = dcg2 + g[3] / math.log2(4) + g[4] / math.log2(5)
        idcg4 = idcg2 + 1 / math.log2(4) + 0 / math.log2(5)
        assert got[4] == (
            round(dcg4, 6), round(idcg4, 6), round(dcg4 / idcg4, 6)
        )

    def test_perfect_ranking_is_one(self, spark):
        from proxima_platform_spark.functions.evalmetrics import ndcg_at_k

        df = spark.createDataFrame(
            [(i, 10.0 - i, 5 - i) for i in range(1, 6)],
            "id long, score double, rel int",
        )
        for r in ndcg_at_k(df, [3, 5], id_col="id").collect():
            assert r.ndcg == 1.0

    def test_no_relevant_items_null(self, spark):
        from proxima_platform_spark.functions.evalmetrics import ndcg_at_k

        df = spark.createDataFrame(
            [(1, 2.0, 0), (2, 1.0, 0)], "id long, score double, rel int"
        )
        [row] = ndcg_at_k(df, [2], id_col="id").collect()
        assert row.ndcg is None and row.dcg == 0.0

    def test_groups_and_validation(self, spark):
        import pytest

        from proxima_platform_spark.functions.evalmetrics import ndcg_at_k

        df = spark.createDataFrame(
            [("a", 1, 2.0, 1), ("a", 2, 1.0, 0), ("b", 3, 2.0, 0), ("b", 4, 1.0, 2)],
            "q string, id long, score double, rel int",
        )
        got = {
            (r.q, r.k): r.ndcg
            for r in ndcg_at_k(df, [1], id_col="id", group_cols=["q"]).collect()
        }
        assert got[("a", 1)] == 1.0  # relevant item ranked first
        assert got[("b", 1)] == 0.0  # relevant item ranked second
        with pytest.raises(ValueError, match="positive"):
            ndcg_at_k(df, [], id_col="id")

    def test_out_of_range_rel_fails_loudly(self, spark):
        """rel outside [0, 62] or NULL must RAISE, never silently drop —
        dropping a top-scored row shifts every rank below it and
        silently returns a wrong (often perfect-looking) NDCG."""
        import pytest

        from proxima_platform_spark.functions.evalmetrics import ndcg_at_k

        for bad in (63, -1, None):
            df = spark.createDataFrame(
                [(1, 2.0, bad), (2, 1.0, 1)],
                "id long, score double, rel int",
            )
            with pytest.raises(Exception, match="ndcg_at_k"):
                ndcg_at_k(df, [2], id_col="id").collect()


class TestCohensKappa:
    def _kappa(self, spark, pairs):
        from proxima_platform_spark.functions.evalmetrics import cohens_kappa

        df = spark.createDataFrame(pairs, "a int, b int")
        [row] = cohens_kappa(df, rater_a="a", rater_b="b").collect()
        return row

    def test_perfect_agreement_is_one(self, spark):
        row = self._kappa(spark, [(0, 0)] * 3 + [(1, 1)] * 5)
        assert row.kappa == 1.0 and row.observed_agree == 8

    def test_textbook_two_by_two(self, spark):
        """Cohen's original shape: counts [[20,5],[10,15]] ->
        po=0.7, pe=(30*25 + 20*25)/2500 = 0.5, kappa = 0.4."""
        pairs = (
            [(1, 1)] * 20 + [(1, 0)] * 5 + [(0, 1)] * 10 + [(0, 0)] * 15
        )
        row = self._kappa(spark, pairs)
        assert row.n_items == 50 and row.observed_agree == 35
        assert row.kappa == 0.4

    def test_constant_raters_null(self, spark):
        """Both raters constant: pe = 1, kappa undefined -> NULL."""
        row = self._kappa(spark, [(1, 1)] * 4)
        assert row.kappa is None

    def test_chance_level_is_zero(self, spark):
        """Statistically independent raters at 50/50: kappa = 0."""
        pairs = [(i % 2, (i // 2) % 2) for i in range(40)]
        row = self._kappa(spark, pairs)
        assert row.kappa == 0.0

    def test_null_rater_raises(self, spark):
        """NULL rater labels would skew N vs the diagonal/marginals —
        fail loud per-row (r09 ADVICE), same convention as ndcg."""
        import pytest

        from proxima_platform_spark.functions.evalmetrics import cohens_kappa

        for pairs in ([(1, 1), (None, 1)], [(1, 1), (0, None)]):
            df = spark.createDataFrame(pairs, "a int, b int")
            with pytest.raises(Exception, match="cohens_kappa"):
                cohens_kappa(df, rater_a="a", rater_b="b").collect()


class TestCalibration:
    def test_perfectly_calibrated_bins(self, spark):
        """Scores exactly equal to the per-bin positive rate -> every
        bin's |acc - conf| = 0 and ECE = 0."""
        from proxima_platform_spark.functions.evalmetrics import (
            calibration_bins,
            calibration_ece,
        )

        rows = []
        for bin10 in (1, 5, 9):  # conf 0.15, 0.55, 0.95
            conf = bin10 / 10 + 0.05
            n = 20
            pos = int(round(conf * n))
            rows += [(conf, 1)] * pos + [(conf, 0)] * (n - pos)
        df = spark.createDataFrame(rows, "score double, label int")
        [row] = calibration_ece(df, bins=10).collect()
        assert row.n_items == 60 and row.ece == 0.0
        got = {
            r.bin: (r.n, r.conf, r.acc)
            for r in calibration_bins(df, bins=10).collect()
        }
        assert got[1] == (20, 0.15, 0.15)
        assert got[9] == (20, 0.95, 0.95)

    def test_overconfident_scorer_penalized(self, spark):
        from proxima_platform_spark.functions.evalmetrics import (
            calibration_ece,
        )

        # score 0.9 but only 50% positives: ECE = |0.5 - 0.9| = 0.4
        df = spark.createDataFrame(
            [(0.9, 1)] * 5 + [(0.9, 0)] * 5, "score double, label int"
        )
        [row] = calibration_ece(df, bins=10).collect()
        assert row.ece == 0.4

    def test_score_one_lands_in_top_bin(self, spark):
        from proxima_platform_spark.functions.evalmetrics import (
            calibration_bins,
        )

        df = spark.createDataFrame(
            [(1.0, 1), (0.999999, 0)], "score double, label int"
        )
        got = {r.bin for r in calibration_bins(df, bins=10).collect()}
        assert got == {9}

    def test_bins_validation(self, spark):
        import pytest

        from proxima_platform_spark.functions.evalmetrics import (
            calibration_ece,
        )

        df = spark.createDataFrame([(0.5, 1)], "score double, label int")
        with pytest.raises(ValueError, match="bins"):
            calibration_ece(df, bins=0)

    def test_out_of_range_score_fails_loudly(self, spark):
        """Calibration scores are probabilities by contract: >1, <0 or
        NULL must RAISE (a clamped >1 score hides the very bug being
        measured; a negative micro value hits the div-vs-floor engine
        divergence)."""
        import pytest

        from proxima_platform_spark.functions.evalmetrics import (
            calibration_ece,
        )

        for bad in (1.5, -0.1, None):
            df = spark.createDataFrame(
                [(bad, 1), (0.5, 0)], "score double, label int"
            )
            with pytest.raises(Exception, match="calibration"):
                calibration_ece(df, bins=10).collect()


class TestLogBleu2Pairs:
    def test_hand_computed_pair(self, spark):
        from decimal import Decimal
        import math

        from proxima_platform_spark.functions.evalmetrics import log_bleu2_pairs

        docs = spark.createDataFrame(
            [
                (1, "the cat sat on the mat"),     # reference (6 tokens)
                (2, "the cat sat on the"),         # candidate (5 tokens)
                (3, "entirely different words"),
            ],
            "doc_id long, text string",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (1, 3)], "id_a long, id_b long"
        )
        rows = {
            (r["id_a"], r["id_b"]): r
            for r in log_bleu2_pairs(pairs, docs).collect()
        }
        # (1,3): zero overlap at both orders -> dropped
        assert (1, 3) not in rows
        r = rows[(1, 2)]
        # unigrams of cand all present in ref with enough multiplicity
        assert (r["clip1"], r["tot1"]) == (5, 5)
        # bigrams: 4 of 4 shared ("the cat","cat sat","sat on","on the")
        assert (r["clip2"], r["tot2"]) == (4, 4)
        # p1 = p2 = 1 -> ln p = 0; BP = 1 - 6/5 = -0.2
        q = lambda x: Decimal(repr(round(math.log(x), 8)))
        expected = round(
            min(0.0, 1.0 - 6 / 5) + float(q(1.0) + q(1.0)) / 2.0, 6
        )
        assert r["log_bleu2"] == expected

    def test_exact_duplicate_scores_zero(self, spark):
        from proxima_platform_spark.functions.evalmetrics import log_bleu2_pairs

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
            "doc_id long, text string",
        )
        pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        [r] = log_bleu2_pairs(pairs, docs).collect()
        assert r["log_bleu2"] == 0.0
