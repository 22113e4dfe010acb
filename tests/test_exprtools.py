"""The static-template expression cache (exprtools.static_template):
process-level memoization of constant Column trees. The cache must hand
back the SAME template for the same (name, input) — that is the whole
py4j saving — and distinct templates for distinct inputs, without ever
touching data (the quality/text suites pin value behavior)."""

from pyspark.sql import functions as F

from proxima_platform_spark.exprtools import _CACHE, static_template
from proxima_platform_spark.functions.text import (
    quality_model_score,
    quality_signals,
)


class TestStaticTemplate:
    def test_same_input_returns_same_template(self, spark):
        a = quality_model_score(F.col("text"))
        b = quality_model_score(F.col("text"))
        assert a is b  # memo hit — no rebuild, no py4j chatter

    def test_distinct_inputs_get_distinct_templates(self, spark):
        a = quality_model_score(F.col("text"))
        b = quality_model_score(F.col("text_dedup"))
        assert a is not b

    def test_dict_stacks_memoize_as_a_unit(self, spark):
        a = quality_signals(F.col("text"))
        b = quality_signals(F.col("text"))
        # the CONTAINER is a fresh shallow copy per call (so a caller
        # mutating the returned dict cannot poison the process-wide
        # cache — ADVICE r13), but the Column templates inside are the
        # memoized instances (the py4j saving)
        assert a is not b
        assert all(a[k] is b[k] for k in a)
        assert set(a) == {
            "alpha_ratio", "punct_ratio", "stopword_ratio", "mean_word_len",
        }

    def test_mutating_returned_container_does_not_poison_cache(self, spark):
        a = quality_signals(F.col("text"))
        a["rogue"] = F.lit(1)
        b = quality_signals(F.col("text"))
        assert "rogue" not in b

    def test_cache_is_bounded(self, spark):
        before = len(_CACHE)
        for i in range(300):
            static_template("t-bound", f"c{i}", lambda: object())
        assert len(_CACHE) <= 256
        assert before <= 256

    def test_cached_template_still_evaluates(self, spark):
        df = spark.createDataFrame(
            [("the quick brown fox and the lazy dog",), ("",)], ["text"]
        )
        # build twice (second is the cached instance) and evaluate both
        r1 = df.select(quality_model_score(F.col("text")).alias("s")).collect()
        r2 = df.select(quality_model_score(F.col("text")).alias("s")).collect()
        assert r1 == r2
        assert 0.0 <= r1[0]["s"] <= 1.0
