"""Pure-DataFrame Bloom filter (functions/sketch.py): no false negatives,
plausible false-positive rate, exactness of the prefilter+confirm join,
and plan shape (broadcast 1-row filter, no Python boundary)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from proxima_platform_spark.functions.sketch import (
    bloom_build,
    bloom_prefilter,
    bloom_semi_join,
)


class TestBloom:
    def test_no_false_negatives(self, spark):
        keys = spark.range(0, 500).select(F.concat(F.lit("k"), "id").alias("g"))
        bloom = bloom_build(keys, "g", num_bits=1 << 14, k=5)
        kept = bloom_prefilter(keys, "g", bloom, num_bits=1 << 14, k=5)
        # every true member must survive
        assert kept.count() == 500

    def test_false_positive_rate_plausible(self, spark):
        members = spark.range(0, 200).select(F.concat(F.lit("m"), "id").alias("g"))
        others = spark.range(0, 2000).select(F.concat(F.lit("x"), "id").alias("g"))
        bloom = bloom_build(members, "g", num_bits=1 << 14, k=5)
        fp = bloom_prefilter(others, "g", bloom, num_bits=1 << 14, k=5).count()
        # n=200, m=16384, k=5 → theoretical fpr ≈ (1-e^{-kn/m})^k ≈ 5e-7;
        # allow generous slack for hash clustering
        assert fp <= 20

    def test_semi_join_exact(self, spark):
        corpus = spark.range(0, 1000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("g"), (F.col("id") % 137)).alias("g"),
        )
        needles = spark.createDataFrame(
            [("g3",), ("g17",), ("g200",)], "g string"
        )  # g200 never occurs (id%137 < 137)
        got = sorted(
            r["doc_id"]
            for r in bloom_semi_join(corpus, needles, "g").select("doc_id").collect()
        )
        want = sorted(
            r["doc_id"]
            for r in corpus.join(needles, "g", "left_semi").select("doc_id").collect()
        )
        assert got == want and len(want) > 0

    def test_join_reduce_equals_plain_join_and_prunes(self, spark):
        from proxima_platform_spark.functions.sketch import (
            bloom_join_reduce,
            bloom_build,
            bloom_prefilter,
        )

        fact = spark.range(0, 5000).select(
            F.col("id").alias("fid"),
            (F.col("id") % 500).cast("string").alias("k"),
            (F.col("id") * 2).alias("payload"),
        )
        dim = spark.range(0, 10).select(
            (F.col("id") * 7).cast("string").alias("k"),
            F.concat(F.lit("d"), F.col("id")).alias("dval"),
        )
        got = sorted(
            map(tuple, bloom_join_reduce(fact, dim, "k").select(
                "fid", "dval").collect())
        )
        want = sorted(
            map(tuple, fact.join(dim, "k").select("fid", "dval").collect())
        )
        assert got == want and len(want) > 0
        # the prefilter must actually bite: far fewer candidates than fact
        bloom = bloom_build(dim.select("k").distinct(), "k", 1 << 20, 5)
        n_cand = bloom_prefilter(fact, "k", bloom, 1 << 20, 5).count()
        assert n_cand < 0.2 * 5000 and n_cand >= len(want)

    def test_plan_broadcast_no_python(self, spark):
        corpus = spark.range(0, 100).select(
            F.concat(F.lit("g"), (F.col("id") % 7)).alias("g")
        )
        needles = spark.createDataFrame([("g1",)], "g string")
        plan = (
            bloom_semi_join(corpus, needles, "g")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
            assert bad not in plan, f"{bad} in plan"


from proxima_platform_spark.functions.sketch import (  # noqa: E402
    cms_build,
    cms_estimate,
    cms_frequent_items,
    cms_merge,
)


class TestCountMin:
    """CMS contract: estimates never undercount, merge is exact counter
    addition (CMS(A ⊎ B) == merge(CMS(A), CMS(B))), and the two-phase
    frequent-items equals the plain exact groupBy — same exactness shape
    as the Bloom prefilter+confirm above."""

    def _df(self, spark):
        # zipf-ish: key k occurs ~ 600/(k+1) times → a few clear hitters
        return spark.range(0, 2000).select(
            (F.col("id") % 13).alias("k"),
            F.concat(F.lit("t"), F.col("id") % 3).alias("t"),
        ).where(F.col("id") % (F.col("k") + 1) == 0)

    def test_estimate_never_undercounts(self, spark):
        df = self._df(spark)
        exact = {(r.k, r.t): r["count"] for r in df.groupBy("k", "t").count().collect()}
        sk = cms_build(df, ["k", "t"], width=256, depth=4)
        est = cms_estimate(
            df.select("k", "t").distinct(), ["k", "t"], sk, width=256, depth=4
        ).collect()
        assert len(est) == len(exact)
        for r in est:
            assert r.freq_est >= exact[(r.k, r.t)]

    def test_never_seen_estimates_include_zero(self, spark):
        df = self._df(spark)
        sk = cms_build(df, ["k", "t"], width=2048, depth=4)
        probe = spark.createDataFrame([(999, "zz")], "k long, t string")
        [(r,)] = cms_estimate(probe, ["k", "t"], sk).select("freq_est").collect()
        # wide grid + tiny key set → the unseen key's cells are all empty
        assert r == 0

    def test_merge_equals_union_build(self, spark):
        df = self._df(spark)
        a, b = df.where("id < 700"), df.where("id >= 700")
        m = cms_merge(
            cms_build(a, ["k", "t"], width=256, depth=4),
            cms_build(b, ["k", "t"], width=256, depth=4),
        ).collect()[0]
        u = cms_build(df, ["k", "t"], width=256, depth=4).collect()[0]
        assert dict(m.cells) == dict(u.cells)
        assert (m.width, m.depth) == (u.width, u.depth)

    def test_frequent_items_exact(self, spark):
        df = self._df(spark)
        for threshold in (5, 50, 200):
            got = {
                (r.k, r.t): r.n
                for r in cms_frequent_items(
                    df, ["k", "t"], threshold, width=256, depth=4
                ).collect()
            }
            want = {
                (r.k, r.t): r["count"]
                for r in df.groupBy("k", "t").count().collect()
                if r["count"] >= threshold
            }
            assert got == want

    def test_plan_broadcast_no_python(self, spark):
        df = self._df(spark)
        plan = (
            cms_frequent_items(df, ["k", "t"], 10, width=256, depth=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
            assert bad not in plan, f"{bad} in plan"


from proxima_platform_spark.functions.sketch import cms_join_size_estimate  # noqa: E402


class TestJoinSizeEstimate:
    def test_never_undercounts_and_is_tight_when_wide(self, spark):
        # a: keys 0..99 once each; b: key k appears k%5+1 times
        a = spark.range(100).select(F.col("id").alias("k"))
        b = spark.range(300).select((F.col("id") % 100).alias("k"))
        exact = a.join(b, "k").count()
        [row] = cms_join_size_estimate(a, b, ["k"], width=4096, depth=4).collect()
        assert row.est_join_rows >= exact  # inner product never undercounts
        # wide grid, tiny key set → within a few collision cross-terms
        assert row.est_join_rows <= exact * 1.1

    def test_narrow_grid_overestimates_but_bounded(self, spark):
        a = spark.range(200).select(F.col("id").alias("k"))
        b = spark.range(200).select(F.col("id").alias("k"))
        exact = 200
        [row] = cms_join_size_estimate(a, b, ["k"], width=32, depth=4).collect()
        assert row.est_join_rows >= exact
        # AMS bound: error ~ |a||b|/width = 200*200/32 = 1250
        assert row.est_join_rows <= exact + 5 * 1250

    def test_disjoint_keys_estimate_zero_or_tiny(self, spark):
        a = spark.range(0, 50).select(F.col("id").alias("k"))
        b = spark.range(1000, 1050).select(F.col("id").alias("k"))
        [row] = cms_join_size_estimate(a, b, ["k"], width=4096, depth=4).collect()
        assert row.est_join_rows <= 2  # collisions only

    def test_xxhash_family_same_guarantees(self, spark):
        # the production fast path: never undercounts, tight when wide,
        # and agrees with the md5 spec family within collision cross-terms
        a = spark.range(100).select(F.col("id").alias("k"))
        b = spark.range(300).select((F.col("id") % 100).alias("k"))
        exact = a.join(b, "k").count()
        [fast] = cms_join_size_estimate(
            a, b, ["k"], width=4096, depth=4, family="xxhash64"
        ).collect()
        [spec] = cms_join_size_estimate(a, b, ["k"], width=4096, depth=4).collect()
        assert fast.est_join_rows >= exact
        assert fast.est_join_rows <= exact * 1.1
        assert abs(fast.est_join_rows - spec.est_join_rows) <= exact * 0.1


class TestBitmapAndGini:
    def test_bitmap_intersection_equals_set_intersection(self, spark):
        import random

        rng = random.Random(11)
        rows = [(rng.randint(0, 3), rng.randint(0, 500)) for _ in range(2000)]
        df = spark.createDataFrame(rows, "day long, uid long")
        bm = (
            df.select(
                "day",
                F.expr("uid DIV 64").alias("word"),
                F.expr("shiftleft(1L, CAST(uid % 64 AS INT))").alias("m"),
            )
            .groupBy("day", "word")
            .agg(F.bit_or("m").alias("bits"))
        )
        nxt = bm.select(
            (F.col("day") - 1).alias("day"), "word", F.col("bits").alias("b2")
        )
        got = {
            r.day: r.n
            for r in bm.join(nxt, ["day", "word"])
            .select("day", F.bit_count(F.col("bits").bitwiseAND(F.col("b2"))).alias("p"))
            .groupBy("day")
            .agg(F.sum("p").alias("n"))
            .collect()
        }
        from collections import defaultdict

        days = defaultdict(set)
        for d, u in rows:
            days[d].add(u)
        want = {
            d: len(days[d] & days[d + 1])
            for d in days
            if d + 1 in days and len(days[d] & days[d + 1]) > 0
        }
        assert got == want and len(want) >= 2

    def test_gini_bounds(self, spark):
        import __spark_entry__ as entry
        import os

        sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
        if not os.path.exists(f"{sf}/events.parquet"):
            import pytest as _p

            _p.skip("no testdata")
        [r] = entry.q_skew_report(spark, sf).collect()
        # near-uniform synthetic fixture: Gini small but nonzero
        assert 0.0 < r.gini < 0.3
        assert r.n_keys == 150
        # concentrated distribution → Gini near 1
        rows = [(0, i) for i in range(1000)] + [(k, 0) for k in range(1, 10)]
        df = spark.createDataFrame(rows, "uid long, j long")
        counts = df.groupBy("uid").count()
        xs = sorted(r["count"] for r in counts.collect())
        n, tot = len(xs), sum(xs)
        gini = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs)) / (n * tot)
        assert gini > 0.85


class TestHll:
    """HyperLogLog register frames: accuracy, mergeability, branch
    coverage, and the integer-register invariants that make the oracle
    hash-compare sound."""

    def _ids(self, spark, n, start=0):
        return spark.range(start, start + n).selectExpr("id AS k")

    def test_raw_branch_accuracy(self, spark):
        from proxima_platform_spark.functions.sketch import hll_build, hll_estimate

        n = 5000  # >> 2.5 * m: raw harmonic-mean branch
        regs = hll_build(self._ids(spark, n), ["k"], b=8)
        [r] = hll_estimate(regs, b=8).collect()
        assert r.v_zeros == 0 or r.m_present > 200
        # m=256 -> relative std error ~1.04/sqrt(m) = 6.5%; allow 4 sigma
        assert abs(r.est_distinct - n) / n < 0.26

    def test_linear_counting_branch(self, spark):
        from proxima_platform_spark.functions.sketch import hll_build, hll_estimate

        n = 40  # << m: linear counting m*ln(m/V)
        regs = hll_build(self._ids(spark, n), ["k"], b=8)
        [r] = hll_estimate(regs, b=8).collect()
        assert r.v_zeros > 0
        assert abs(r.est_distinct - n) / n < 0.15

    def test_merge_equals_union_build(self, spark):
        from proxima_platform_spark.functions.sketch import (
            hll_build,
            hll_estimate,
            hll_merge,
        )

        a = self._ids(spark, 1000)          # 0..999
        b = self._ids(spark, 1000, 500)     # 500..1499 (overlap 500)
        merged = hll_merge(hll_build(a, ["k"]), hll_build(b, ["k"]))
        direct = hll_build(a.unionAll(b), ["k"])
        got = {(r.bucket, r.rho) for r in merged.collect()}
        want = {(r.bucket, r.rho) for r in direct.collect()}
        assert got == want  # register-exact, not just estimate-close
        [em] = hll_estimate(merged).collect()
        [ed] = hll_estimate(direct).collect()
        assert em.est_distinct == ed.est_distinct

    def test_merge_idempotent(self, spark):
        from proxima_platform_spark.functions.sketch import hll_build, hll_merge

        a = hll_build(self._ids(spark, 300), ["k"])
        twice = hll_merge(a, a)
        assert {(r.bucket, r.rho) for r in twice.collect()} == {
            (r.bucket, r.rho) for r in a.collect()
        }

    def test_registers_integer_and_bounded(self, spark):
        from proxima_platform_spark.functions.sketch import hll_build

        regs = hll_build(self._ids(spark, 2000), ["k"], b=8).collect()
        assert len(regs) <= 256
        for r in regs:
            assert 0 <= r.bucket < 256
            assert 1 <= r.rho <= 53

    def test_group_cols(self, spark):
        from proxima_platform_spark.functions.sketch import hll_build, hll_estimate

        df = spark.range(4000).selectExpr("id % 2 AS g", "id AS k")
        est = hll_estimate(
            hll_build(df, ["k"], group_cols=["g"]), group_cols=["g"]
        ).collect()
        assert len(est) == 2
        for r in est:
            assert abs(r.est_distinct - 2000) / 2000 < 0.26


class TestKmv:
    def test_exact_when_small(self, spark):
        from proxima_platform_spark.functions.sketch import kmv_build, kmv_estimate

        df = spark.range(100).selectExpr("id AS k")
        sk = kmv_build(df, ["k"], k=256)
        [r] = kmv_estimate(sk, k=256).collect()
        assert r.est_distinct == 100.0  # fewer than k hashes -> exact

    def test_estimate_accuracy(self, spark):
        from proxima_platform_spark.functions.sketch import kmv_build, kmv_estimate

        df = spark.range(20000).selectExpr("id AS k")
        sk = kmv_build(df, ["k"], k=256)
        assert sk.count() == 256
        [r] = kmv_estimate(sk, k=256).collect()
        # RSE ~ 1/sqrt(k-2) = 6.3%; allow 4 sigma
        assert abs(r.est_distinct - 20000) / 20000 < 0.26

    def test_set_ops(self, spark):
        from proxima_platform_spark.functions.sketch import kmv_build, kmv_set_ops

        a = spark.range(0, 6000).selectExpr("id AS k")
        b = spark.range(3000, 9000).selectExpr("id AS k")
        ka = kmv_build(a, ["k"], k=256, set_name="a")
        kb = kmv_build(b, ["k"], k=256, set_name="b")
        [r] = kmv_set_ops(ka, kb, k=256).collect()
        assert abs(r.est_union - 9000) / 9000 < 0.3
        assert abs(r.est_intersection - 3000) / 3000 < 0.45
        assert 0.0 < r.jaccard_k < 1.0

    def test_disjoint_sets(self, spark):
        from proxima_platform_spark.functions.sketch import kmv_build, kmv_set_ops

        a = spark.range(0, 5000).selectExpr("id AS k")
        b = spark.range(10000, 15000).selectExpr("id AS k")
        ka = kmv_build(a, ["k"], k=128, set_name="a")
        kb = kmv_build(b, ["k"], k=128, set_name="b")
        [r] = kmv_set_ops(ka, kb, k=128).collect()
        # overlap count is integer-exact over the sketches: 0 for disjoint
        # hash sets (md5 collisions across 5k+5k 60-bit hashes: none)
        assert r.est_intersection == 0.0 and r.jaccard_k == 0.0


class TestQuantileSketch:
    """Mergeable bottom-k quantile sketch: exact merge law, type-1 rank
    selection, and sample-bound accuracy."""

    def _df(self, spark, n, start=0, g="a"):
        return spark.createDataFrame(
            [(g, i, float((i * 7919) % 1000)) for i in range(start, start + n)],
            "g string, rid long, v double",
        )

    def test_merge_law_exact(self, spark):
        """bottom-k of the union == bottom-k of the merged bottom-ks —
        EXACTLY (deterministic hash tags), the algebra the HLL/KMV family
        is held to. Partial sketches from any partitioning combine
        losslessly."""
        from proxima_platform_spark.functions.sketch import (
            quantile_sketch_build,
            quantile_sketch_merge,
        )

        a = self._df(spark, 400)
        b = self._df(spark, 400, start=300)  # overlapping rows
        merged = quantile_sketch_merge(
            quantile_sketch_build(a, "v", ["rid"], group_cols=["g"], k=64),
            quantile_sketch_build(b, "v", ["rid"], group_cols=["g"], k=64),
            k=64,
        )
        direct = quantile_sketch_build(
            a.unionByName(b).dropDuplicates(["rid"]),
            "v",
            ["rid"],
            group_cols=["g"],
            k=64,
        )
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )

    def test_exact_when_small(self, spark):
        """n <= k: the sketch IS the data, so estimates are the exact
        type-1 quantiles of the full column."""
        from proxima_platform_spark.functions.sketch import (
            quantile_sketch_build,
            quantile_sketch_estimate,
        )

        vals = [5.0, 1.0, 9.0, 3.0, 7.0]
        df = spark.createDataFrame(
            [("a", i, v) for i, v in enumerate(vals)],
            "g string, rid long, v double",
        )
        sk = quantile_sketch_build(df, "v", ["rid"], group_cols=["g"], k=64)
        got = {
            round(r.q, 2): r.est
            for r in quantile_sketch_estimate(sk, [0.25, 0.5, 1.0]).collect()
        }
        s = sorted(vals)
        import math

        assert got == {
            0.25: s[math.ceil(0.25 * 5) - 1],
            0.5: s[math.ceil(0.5 * 5) - 1],
            1.0: s[4],
        }

    def test_sample_accuracy(self, spark):
        """k=256 over 4000 uniform values: median estimate within ~6
        percentile points (the 1/sqrt(k) bound the docstring promises)."""
        from proxima_platform_spark.functions.sketch import (
            quantile_sketch_build,
            quantile_sketch_estimate,
        )

        df = self._df(spark, 4000)
        sk = quantile_sketch_build(df, "v", ["rid"], group_cols=["g"], k=256)
        est = {
            round(r.q, 2): r.est
            for r in quantile_sketch_estimate(sk, [0.5]).collect()
        }[0.5]
        # values are uniform on [0, 1000); true median ~500
        assert abs(est - 500.0) < 120.0

    def test_estimate_rejects_out_of_range_q(self, spark):
        """q > 1 computes rank > n (mid-job ANSI failure / silent NULL)
        and q <= 0 silently clamps to rank 1 — both rejected loudly."""
        import pytest

        from proxima_platform_spark.functions.sketch import (
            quantile_sketch_build,
            quantile_sketch_estimate,
        )

        sk = quantile_sketch_build(
            self._df(spark, 10), "v", ["rid"], group_cols=["g"], k=8
        )
        for bad in ([0.0], [1.5], [-0.1], [0.5, 2.0]):
            with pytest.raises(ValueError, match=r"\(0, 1\]"):
                quantile_sketch_estimate(sk, bad)

    def test_merge_schema_mismatch_raises(self, spark):
        import pytest

        from proxima_platform_spark.functions.sketch import (
            quantile_sketch_build,
            quantile_sketch_merge,
        )

        a = quantile_sketch_build(
            self._df(spark, 10), "v", ["rid"], group_cols=["g"], k=8
        )
        with pytest.raises(ValueError, match="share schema"):
            quantile_sketch_merge(a, a.withColumnRenamed("g", "grp"), k=8)

    def test_sketch_bounded_and_deterministic(self, spark):
        from proxima_platform_spark.functions.sketch import (
            quantile_sketch_build,
        )

        df = self._df(spark, 1000)
        a = quantile_sketch_build(df, "v", ["rid"], group_cols=["g"], k=32)
        assert a.count() == 32
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, quantile_sketch_build(
                df, "v", ["rid"], group_cols=["g"], k=32
            ).collect())
        )
