"""Record linkage (functions/linkage.py): comparator semantics, weighted
score, blocking recall on known near-duplicates, input validation."""

import pytest

from pyspark.sql import functions as F

from proxima_platform_spark.functions.linkage import (
    field_similarity,
    record_linkage_pairs,
)


def _people(spark):
    rows = [
        (1, "jon smith", "en", "srcA"),
        (2, "john smith", "en", "srcA"),    # 1-edit from jon smith
        (3, "john smyth", "en", "srcB"),    # 1-edit from john smith
        (4, "alice jones", "fr", "srcA"),
        (5, "alice jones", "fr", "srcA"),   # exact dup of 4
        (6, "zzz unrelated", "de", "srcC"),
    ]
    return spark.createDataFrame(rows, ["pid", "name", "lang", "source"])


class TestFieldSimilarity:
    def test_levenshtein_bounds_and_nulls(self, spark):
        df = spark.createDataFrame(
            [("kitten", "sitting"), ("same", "same"), (None, "x")], ["a", "b"]
        )
        out = df.select(
            F.round(field_similarity(F.col("a"), F.col("b"), "levenshtein"), 6).alias("s")
        ).collect()
        sims = [r.s for r in out]
        assert sims[1] == 1.0
        assert sims[2] == 0.0            # null scores as disagreement
        assert sims[0] == round(1 - 3 / 7, 6)

    def test_exact_and_unknown_kind(self, spark):
        df = spark.createDataFrame([("a", "a"), ("a", "b")], ["a", "b"])
        out = df.select(
            field_similarity(F.col("a"), F.col("b"), "exact").alias("s")
        ).collect()
        assert [r.s for r in out] == [1.0, 0.0]
        with pytest.raises(ValueError):
            field_similarity(F.col("a"), F.col("b"), "soundex")


class TestRecordLinkagePairs:
    def test_finds_typo_pairs_not_unrelated(self, spark):
        df = _people(spark)
        out = record_linkage_pairs(
            df,
            "pid",
            block_key=F.substring(F.col("name"), 1, 6),
            fields=[("name", "levenshtein", 0.8),
                    ("lang", "exact", 0.1),
                    ("source", "exact", 0.1)],
            threshold=0.75,
            window=4,
        ).collect()
        pairs = {(r.id_a, r.id_b) for r in out}
        assert (4, 5) in pairs          # exact dup
        assert (2, 3) in pairs          # 1-edit neighbors, sort-adjacent
        assert all(6 not in p for p in pairs)
        exact = [r for r in out if (r.id_a, r.id_b) == (4, 5)][0]
        assert exact.score == 1.0 and exact.sim_name == 1.0

    def test_weighted_score_matches_hand_computation(self, spark):
        df = _people(spark)
        out = {
            (r.id_a, r.id_b): r
            for r in record_linkage_pairs(
                df,
                "pid",
                block_key=F.substring(F.col("name"), 1, 6),
                fields=[("name", "levenshtein", 0.8),
                        ("lang", "exact", 0.1),
                        ("source", "exact", 0.1)],
                threshold=0.0,
                window=4,
            ).collect()
        }
        r = out[(2, 3)]  # john smith vs john smyth: lev 1, len 10
        expected = 0.8 * (1 - 1 / 10) + 0.1 * 1.0 + 0.1 * 0.0
        assert abs(r.score - round(expected, 6)) < 1e-9

    def test_validation(self, spark):
        df = _people(spark)
        with pytest.raises(ValueError):
            record_linkage_pairs(
                df, "pid", block_key=F.col("name"), fields=[], threshold=0.5
            )
        with pytest.raises(ValueError):
            record_linkage_pairs(
                df, "pid", block_key=F.col("name"),
                fields=[("name", "levenshtein", 0.0)], threshold=0.5,
            )
