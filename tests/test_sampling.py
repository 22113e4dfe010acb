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


class TestQuotaSample:
    def _docs(self, spark):
        from pyspark.sql import functions as F

        return spark.range(0, 300).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), (F.col("id") % 3)).alias("source"),
        )

    def test_caps_each_stratum(self, spark):
        from proxima_platform_spark.functions.sampling import quota_sample
        from pyspark.sql import functions as F

        out = quota_sample(
            self._docs(spark), key=F.col("doc_id"), strata=F.col("source"),
            quota=25, salt="t",
        )
        counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
        assert counts == {"s0": 25, "s1": 25, "s2": 25}

    def test_quota_above_population_keeps_all(self, spark):
        from proxima_platform_spark.functions.sampling import quota_sample
        from pyspark.sql import functions as F

        out = quota_sample(
            self._docs(spark), key=F.col("doc_id"), strata=F.col("source"),
            quota=500, salt="t",
        )
        assert out.count() == 300

    def test_winners_deterministic_and_prefilter_composable(self, spark):
        # composing a hash_sample prefilter that keeps a superset of the
        # winners must not change the final quota sample
        from proxima_platform_spark.functions.sampling import (
            hash_sample, quota_sample, sample_key,
        )
        from pyspark.sql import functions as F

        docs = self._docs(spark)
        full = quota_sample(docs, key=F.col("doc_id"), strata=F.col("source"), quota=10, salt="t")
        pre = hash_sample(docs, key=F.col("doc_id"), rate=0.5, salt="t")
        comp = quota_sample(pre, key=F.col("doc_id"), strata=F.col("source"), quota=10, salt="t")
        a = sorted(r["doc_id"] for r in full.collect())
        b = sorted(r["doc_id"] for r in comp.collect())
        # prefilter keeps the smallest half of the SAME key space, and each
        # stratum has ≥10 survivors at rate 0.5 of 100 — winners identical
        assert a == b

    def test_columns_restored(self, spark):
        from proxima_platform_spark.functions.sampling import quota_sample
        from pyspark.sql import functions as F

        out = quota_sample(
            self._docs(spark), key=F.col("doc_id"), strata=F.col("source"),
            quota=5, salt="t",
        )
        assert out.columns == ["doc_id", "source"]


class TestWeightedSample:
    def test_rate_extremes_and_clamp(self, spark):
        from proxima_platform_spark.functions.sampling import weighted_sample
        from pyspark.sql import functions as F

        docs = spark.range(0, 200).select(F.col("id").alias("doc_id"))
        none = weighted_sample(docs, key=F.col("doc_id"), rate=F.lit(0.0), salt="w")
        assert none.count() == 0
        all_ = weighted_sample(docs, key=F.col("doc_id"), rate=F.lit(5.0), salt="w")
        assert all_.count() == 200  # clamped to 1.0

    def test_monotone_in_rate(self, spark):
        from proxima_platform_spark.functions.sampling import weighted_sample
        from pyspark.sql import functions as F

        docs = spark.range(0, 500).select(F.col("id").alias("doc_id"))
        lo = {r["doc_id"] for r in weighted_sample(docs, key=F.col("doc_id"), rate=F.lit(0.2), salt="w").collect()}
        hi = {r["doc_id"] for r in weighted_sample(docs, key=F.col("doc_id"), rate=F.lit(0.6), salt="w").collect()}
        assert lo <= hi
        assert 40 < len(lo) < 160 and 200 < len(hi) < 400

    def test_no_shuffle_plan(self, spark):
        from proxima_platform_spark.functions.sampling import weighted_sample
        from pyspark.sql import functions as F

        docs = spark.range(0, 10).select(F.col("id").alias("doc_id"))
        plan = (
            weighted_sample(docs, key=F.col("doc_id"), rate=F.lit(0.5), salt="w")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestQuotaSampleProperty:
    def test_matches_model_on_random_corpus(self, spark):
        # deterministic pseudo-random corpus; model = per-stratum smallest
        # (md5-key, key) winners, mirroring sample_key's exact arithmetic
        import hashlib

        from pyspark.sql import functions as F

        from proxima_platform_spark.functions.sampling import quota_sample

        rows = [(i, f"s{i % 7}") for i in range(211)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = sorted(
            r["doc_id"]
            for r in quota_sample(
                df, key=F.col("doc_id"), strata=F.col("source"), quota=9,
                salt="prop",
            ).collect()
        )

        def sk(doc_id):
            h = hashlib.md5(f"prop{doc_id}".encode()).hexdigest()
            return int(h[:15], 16) % 1_000_000

        by_stratum = {}
        for i, s in rows:
            by_stratum.setdefault(s, []).append((sk(i), i))
        want = sorted(
            i
            for s, members in by_stratum.items()
            for _, i in sorted(members)[:9]
        )
        assert out == want


from proxima_platform_spark.functions.sampling import temperature_mix  # noqa: E402


class TestTemperatureMix:
    def _corpus(self, spark):
        # skewed mixture: 400 'big', 100 'mid', 25 'small'
        rows = (
            [(i, "big") for i in range(400)]
            + [(400 + i, "mid") for i in range(100)]
            + [(500 + i, "small") for i in range(25)]
        )
        return spark.createDataFrame(rows, "doc_id long, src string")

    def test_sqrt_upweights_tail(self, spark):
        df = self._corpus(spark)
        out = temperature_mix(
            df, key=F.col("doc_id"), strata_col="src", target_total=200
        )
        kept = out.groupBy("src").count().collect()
        frac = {r.src: r["count"] / n for r, n in
                ((r, {"big": 400, "mid": 100, "small": 25}[r.src]) for r in kept)}
        # keep-rate must INCREASE as stratum size decreases (α=1/2 law)
        assert frac["small"] > frac["mid"] > frac["big"]

    def test_rates_match_python_model(self, spark):
        import math

        df = self._corpus(spark)
        out = temperature_mix(
            df, key=F.col("doc_id"), strata_col="src", target_total=200,
            salt="s1",
        )
        got = sorted(r.doc_id for r in out.collect())
        sizes = {"big": 400, "mid": 100, "small": 25}
        w = {s: round(math.sqrt(n), 6) for s, n in sizes.items()}
        sw = float(sum(w.values()))  # 6-dec weights: float sum is exact here
        thr = {
            s: int(round(min(1.0, (200.0 * w[s]) / (sw * n)), 6) * 1_000_000)
            for s, n in sizes.items()
        }
        from proxima_platform_spark.functions.sampling import sample_key

        keyed = df.select(
            "doc_id", "src", sample_key(F.col("doc_id"), "s1").alias("sk")
        ).collect()
        want = sorted(r.doc_id for r in keyed if r.sk < thr[r.src])
        assert got == want and 0 < len(want) < 525

    def test_deterministic(self, spark):
        df = self._corpus(spark)
        a = sorted(
            r.doc_id
            for r in temperature_mix(
                df, key=F.col("doc_id"), strata_col="src", target_total=100
            ).collect()
        )
        b = sorted(
            r.doc_id
            for r in temperature_mix(
                df, key=F.col("doc_id"), strata_col="src", target_total=100
            ).collect()
        )
        assert a == b


class TestLeakageSafeSplit:
    def _docs_with_dups(self, spark):
        # 300 docs in 100 exact-dup groups of 3 (whitespace variants
        # normalize to the same group key)
        from pyspark.sql import functions as F

        base = spark.range(100).select(
            F.col("id").alias("g"),
            F.concat(F.lit("doc body "), F.col("id").cast("string")).alias("t"),
        )
        # variants that normalize identically: leading/trailing SPACES
        # (space-only trim) and collapsed internal whitespace runs
        variants = base.selectExpr("g", "t AS text").unionAll(
            base.selectExpr("g", "concat('  ', t, ' ') AS text")
        ).unionAll(base.selectExpr("g", "replace(t, ' ', '\t ') AS text"))
        return variants.select(
            F.monotonically_increasing_id().alias("doc_id"), "g", "text"
        )

    def test_groups_never_straddle_splits(self, spark):
        from proxima_platform_spark.functions.dedup import exact_dup_key
        from proxima_platform_spark.functions.sampling import leakage_safe_split

        docs = self._docs_with_dups(spark)
        split = leakage_safe_split(
            docs,
            group_key=exact_dup_key(F.col("text")),
            fractions={"train": 0.8, "validation": 0.1, "test": 0.1},
            salt="t",
        )
        per_group = (
            docs.select("g", split.alias("split"))
            .groupBy("g")
            .agg(F.countDistinct("split").alias("n"))
        )
        assert per_group.where(F.col("n") > 1).count() == 0

    def test_all_splits_populated_and_exhaustive(self, spark):
        from proxima_platform_spark.functions.dedup import exact_dup_key
        from proxima_platform_spark.functions.sampling import leakage_safe_split

        docs = self._docs_with_dups(spark)
        split = leakage_safe_split(
            docs,
            group_key=exact_dup_key(F.col("text")),
            fractions={"train": 0.8, "validation": 0.1, "test": 0.1},
            salt="t",
        )
        counts = {
            r["split"]: r["n"]
            for r in docs.select(split.alias("split"))
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert sum(counts.values()) == 300
        assert counts.get("train", 0) > counts.get("test", 0)


class TestNegativeSamples:
    def test_k_per_anchor_no_self_no_dupgroup(self, spark):
        from proxima_platform_spark.functions.dedup import exact_dup_key
        from proxima_platform_spark.functions.sampling import negative_samples

        # 200 docs, every pair (2i, 2i+1) is an exact-dup group
        docs = spark.range(200).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("body "), (F.col("id") / F.lit(2)).cast("int").cast("string")).alias("text"),
        )
        out = negative_samples(
            docs,
            id_col="doc_id",
            k=3,
            exclude_key=exact_dup_key(F.col("text")),
            buckets=8,
            salt="t",
        ).collect()
        by_anchor = {}
        for r in out:
            by_anchor.setdefault(r.anchor_id, []).append(r)
            assert r.anchor_id != r.negative_id
            # dup partner (same group) never sampled
            assert r.negative_id != (r.anchor_id ^ 1)
        assert all(len(v) <= 3 for v in by_anchor.values())
        assert all(sorted(r.rank for r in v) == list(range(1, len(v) + 1))
                   for v in by_anchor.values())

    def test_deterministic(self, spark):
        from proxima_platform_spark.functions.sampling import negative_samples

        docs = spark.range(100).select(F.col("id").alias("doc_id"))
        a = sorted(map(tuple, negative_samples(
            docs, id_col="doc_id", k=2, buckets=4, salt="s").collect()))
        b = sorted(map(tuple, negative_samples(
            docs, id_col="doc_id", k=2, buckets=4, salt="s").collect()))
        assert a == b and len(a) > 0

    def test_k_validation(self, spark):
        from proxima_platform_spark.functions.sampling import negative_samples

        docs = spark.range(10).select(F.col("id").alias("doc_id"))
        with pytest.raises(ValueError):
            negative_samples(docs, id_col="doc_id", k=0)


class TestDsirResample:
    def _corpus(self, spark):
        # two vocabularies: target domain talks about alpha/beta/gamma,
        # the rest about delta/epsilon/zeta
        rows = []
        for i in range(60):
            rows.append((i, "alpha beta gamma alpha beta gamma alpha beta", "tgt"))
        for i in range(60, 400):
            rows.append((i, "delta epsilon zeta delta epsilon zeta delta", "raw"))
        # 20 raw docs that LOOK like the target domain — these must win
        for i in range(400, 420):
            rows.append((i, "alpha beta gamma beta alpha gamma beta alpha", "raw"))
        return spark.createDataFrame(rows, ["doc_id", "text", "dom"])

    def test_target_like_docs_win(self, spark):
        from proxima_platform_spark.functions.sampling import dsir_resample

        docs = self._corpus(spark)
        out = dsir_resample(
            docs.where(F.col("dom") == "raw"),
            docs.where(F.col("dom") == "tgt"),
            id_col="doc_id",
            text="text",
            k=20,
            buckets=256,
        ).collect()
        winners = {r.id for r in out}
        assert winners == set(range(400, 420))

    def test_deterministic_and_k_bounded(self, spark):
        from proxima_platform_spark.functions.sampling import dsir_resample

        docs = self._corpus(spark)
        a = [tuple(r) for r in dsir_resample(
            docs, docs.where(F.col("dom") == "tgt"),
            id_col="doc_id", text="text", k=7, buckets=128, salt="s").collect()]
        b = [tuple(r) for r in dsir_resample(
            docs, docs.where(F.col("dom") == "tgt"),
            id_col="doc_id", text="text", k=7, buckets=128, salt="s").collect()]
        assert a == b and len(a) == 7

    def test_short_docs_have_no_features(self, spark):
        from proxima_platform_spark.functions.sampling import dsir_resample

        docs = spark.createDataFrame(
            [(1, "one"), (2, "two tokens here"), (3, "more than one token")],
            ["doc_id", "text"],
        )
        out = dsir_resample(
            docs, docs, id_col="doc_id", text="text", k=10, buckets=64
        ).collect()
        assert {r.id for r in out} == {2, 3}


class TestUnimaxMixture:
    def test_matches_hand_waterfill(self, spark):
        from pyspark.sql import functions as F

        from proxima_platform_spark.functions.sampling import unimax_mixture

        # explicit caps: capacities 10, 40, 60; budget = 1.5 * 55 = 82.5
        # ladder: r1 c=10 u=27.5 -> cap (10); r2 c=40 u=36.25 -> VIOLATION
        # -> r2, r3 take the uniform share 36.25
        docs = spark.createDataFrame(
            [
                (1, "a", " ".join(["w"] * 10)),
                (2, "b", " ".join(["w"] * 20)),
                (3, "c", " ".join(["w"] * 25)),
            ],
            "doc_id long, source string, text string",
        )
        caps = (
            F.when(F.col("source") == "a", 1)
            .when(F.col("source") == "b", 2)
            .otherwise(F.lit(60) / F.lit(25))
        )
        got = {
            r["source"]: (r["capacity"], r["allocation"], r["epochs"])
            for r in unimax_mixture(
                docs, budget_factor=1.5, epoch_caps=caps
            ).collect()
        }
        assert got["a"] == (10, 10.0, 1.0)
        u = round((82.5 - 10) / 2, 6)
        assert got["b"] == (40, u, round(u / 20, 6))
        assert got["c"] == (50, u, round(u / 25, 6))

    def test_all_capped_when_budget_exceeds_capacity(self, spark):
        from pyspark.sql import functions as F

        from proxima_platform_spark.functions.sampling import unimax_mixture

        docs = spark.createDataFrame(
            [(1, "a", "w w w"), (2, "b", "w w")],
            "doc_id long, source string, text string",
        )
        got = {
            r["source"]: r["allocation"]
            for r in unimax_mixture(
                docs, budget_factor=10.0, epoch_caps=F.lit(2)
            ).collect()
        }
        # budget 50 > total capacity 10: every source exhausts its cap
        assert got == {"a": 6.0, "b": 4.0}
