"""Deterministic corpus sampling (functions/sampling.py): stable under
re-execution, salt-independent draws, stratified rates, pure-filter plan."""

import pytest

from pyspark.sql import functions as F

from proxima_platform_spark.functions.sampling import (
    BUCKETS,
    hash_sample,
    sample_key,
    stratified_sample,
)


def corpus(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
    )


class TestHashSample:
    def test_deterministic_across_runs(self, spark):
        df = corpus(spark)
        a = {r.doc_id for r in hash_sample(df, key=F.col("doc_id"), rate=0.3).collect()}
        b = {r.doc_id for r in hash_sample(df, key=F.col("doc_id"), rate=0.3).collect()}
        assert a == b and 0 < len(a) < 2000

    def test_rate_approximation(self, spark):
        df = corpus(spark, n=5000)
        kept = hash_sample(df, key=F.col("doc_id"), rate=0.5).count()
        assert 0.45 * 5000 < kept < 0.55 * 5000

    def test_salts_draw_independent_samples(self, spark):
        df = corpus(spark)
        a = {r.doc_id for r in hash_sample(df, key=F.col("doc_id"), rate=0.5, salt="A").collect()}
        b = {r.doc_id for r in hash_sample(df, key=F.col("doc_id"), rate=0.5, salt="B").collect()}
        assert a != b
        overlap = len(a & b) / max(len(a), 1)
        assert 0.3 < overlap < 0.7  # ~rate for independent draws

    def test_nested_samples_monotone(self, spark):
        """Lower rate with the same salt must be a subset of a higher rate —
        the property that makes samples versionable (growing a 1% sample to
        10% keeps the original rows)."""
        df = corpus(spark)
        small = {r.doc_id for r in hash_sample(df, key=F.col("doc_id"), rate=0.1).collect()}
        big = {r.doc_id for r in hash_sample(df, key=F.col("doc_id"), rate=0.4).collect()}
        assert small <= big

    def test_invalid_rate_raises(self, spark):
        with pytest.raises(ValueError):
            hash_sample(corpus(spark), key=F.col("doc_id"), rate=1.5)


class TestStratifiedSample:
    def test_per_stratum_rates(self, spark):
        df = corpus(spark, n=4000)  # 1000 per source
        out = stratified_sample(
            df,
            key=F.col("doc_id"),
            strata=F.col("source"),
            rates={"src0": 1.0, "src1": 0.5},
            default_rate=0.0,
        )
        counts = {r.source: r["count"] for r in out.groupBy("source").count().collect()}
        assert counts.get("src0") == 1000
        assert 400 < counts.get("src1", 0) < 600
        assert "src2" not in counts and "src3" not in counts

    def test_plan_is_pure_filter(self, spark):
        """The scale property: one filter over the scan — no shuffle, no
        join, no aggregation before sampling."""
        df = corpus(spark)
        out = stratified_sample(
            df,
            key=F.col("doc_id"),
            strata=F.col("source"),
            rates={"src0": 0.5},
            default_rate=0.1,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "SortMergeJoin" not in plan and "HashJoin" not in plan

    def test_sample_key_range(self, spark):
        df = corpus(spark, n=500)
        mm = df.select(
            F.min(sample_key(F.col("doc_id"))).alias("lo"),
            F.max(sample_key(F.col("doc_id"))).alias("hi"),
        ).collect()[0]
        assert 0 <= mm.lo and mm.hi < BUCKETS


class TestExactKAndSplit:
    def test_exact_k_count_and_determinism(self, spark):
        from proxima_platform_spark.functions.sampling import hash_sample_exact_k

        df = corpus(spark, n=200)
        s1 = hash_sample_exact_k(df, key=F.col("doc_id"), k=25)
        s2 = hash_sample_exact_k(df, key=F.col("doc_id"), k=25)
        ids1 = sorted(r.doc_id for r in s1.collect())
        assert len(ids1) == 25
        assert ids1 == sorted(r.doc_id for r in s2.collect())

    def test_exact_k_nested_samples(self, spark):
        """Threshold sampling property: the k=10 sample is a subset of the
        k=30 sample (same key, same salt) — growing a sample never swaps
        already-chosen rows."""
        from proxima_platform_spark.functions.sampling import hash_sample_exact_k

        df = corpus(spark, n=200)
        small = {r.doc_id for r in hash_sample_exact_k(df, key=F.col("doc_id"), k=10).collect()}
        large = {r.doc_id for r in hash_sample_exact_k(df, key=F.col("doc_id"), k=30).collect()}
        assert small <= large

    def test_exact_k_is_top_k_plan(self, spark):
        from proxima_platform_spark.functions.sampling import hash_sample_exact_k

        df = corpus(spark, n=200)
        plan = (
            hash_sample_exact_k(df, key=F.col("doc_id"), k=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan  # never a global sort

    def test_split_disjoint_exhaustive_stable(self, spark):
        from proxima_platform_spark.functions.sampling import hash_split

        df = corpus(spark, n=400)
        lab = hash_split(
            df, key=F.col("doc_id"),
            fractions={"train": 0.8, "validation": 0.1, "test": 0.1},
        )
        out = df.select("doc_id", lab.alias("split")).collect()
        assert len(out) == 400  # every row labeled (exhaustive)
        counts = {}
        for r in out:
            counts[r.split] = counts.get(r.split, 0) + 1
        # rough proportions (deterministic, so bounds are safe to pin)
        assert counts["train"] > 250 and counts["validation"] < 100

    def test_split_fractions_must_sum_to_one(self, spark):
        from proxima_platform_spark.functions.sampling import hash_split

        df = corpus(spark, n=10)
        with pytest.raises(ValueError, match="sum to 1"):
            hash_split(df, key=F.col("doc_id"), fractions={"a": 0.5, "b": 0.1})


class TestSequencePack:
    def _docs(self, spark):
        import random

        rng = random.Random(7)
        rows = [(i, rng.randint(1, 300)) for i in range(400)]
        return spark.createDataFrame(rows, "doc_id long, n_tokens long")

    def test_bins_respect_budget_with_single_overflow(self, spark):
        from proxima_platform_spark.functions.sampling import sequence_pack

        out = sequence_pack(self._docs(spark), budget=512, n_shards=4).collect()
        by_bin = {}
        for r in out:
            by_bin.setdefault((r.shard, r.bin), []).append(r.n_tokens)
        for (shard, b), toks in by_bin.items():
            # offset packing: a bin exceeds the budget only via its last doc
            assert sum(toks) <= 512 + max(toks), (shard, b, toks)

    def test_bins_contiguous_from_zero_per_shard(self, spark):
        from proxima_platform_spark.functions.sampling import sequence_pack

        out = sequence_pack(self._docs(spark), budget=512, n_shards=4).collect()
        shards = {}
        for r in out:
            shards.setdefault(r.shard, set()).add(r.bin)
        for s, bins in shards.items():
            assert bins == set(range(max(bins) + 1)), s

    def test_deterministic_under_repartition(self, spark):
        from proxima_platform_spark.functions.sampling import sequence_pack

        docs = self._docs(spark)
        a = {(r.doc_id): (r.shard, r.bin) for r in sequence_pack(docs, budget=512, n_shards=4).collect()}
        b = {(r.doc_id): (r.shard, r.bin) for r in sequence_pack(docs.repartition(13), budget=512, n_shards=4).collect()}
        assert a == b
