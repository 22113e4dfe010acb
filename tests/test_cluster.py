"""Distributed k-means (functions/cluster.py): recovers separated
clusters, deterministic tie-breaks, plan shape (broadcast centroids, no
Python boundary)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from proxima_platform_spark.functions.cluster import (
    kmeans_assign,
    kmeans_lloyd,
)


def _blobs(spark):
    # two tight blobs far apart; seeds 0 and 1 land one in each blob
    rows = []
    for i in range(10):
        rows.append((i * 2, [0.0 + i * 0.01, 0.0]))       # blob A (even ids)
        rows.append((i * 2 + 1, [100.0, 100.0 + i * 0.01]))  # blob B (odd ids)
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestKmeans:
    def test_recovers_separated_blobs(self, spark):
        out = kmeans_lloyd(_blobs(spark), k=2, iters=2).collect()
        by_cluster = {}
        for r in out:
            by_cluster.setdefault(r["cid"], set()).add(r["vec_id"])
        assert len(by_cluster) == 2
        groups = sorted(by_cluster.values(), key=min)
        assert groups[0] == {i * 2 for i in range(10)}
        assert groups[1] == {i * 2 + 1 for i in range(10)}

    def test_assign_tie_breaks_lower_cid(self, spark):
        vecs = spark.createDataFrame(
            [(7, [0.0, 0.0])], "vec_id long, v array<double>"
        )
        cents = spark.createDataFrame(
            [(3, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [-1.0, 0.0])],
            "cid long, c array<double>",
        )  # all at distance 1 — the lowest cid must win
        row = kmeans_assign(vecs, cents).collect()[0]
        assert row["cid"] == 1

    def test_iteration_moves_centroids(self, spark):
        # seed centroids both sit in blob A; after one update, one centroid
        # must move toward blob B and capture it
        rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0])] + [
            (i, [100.0 + i * 0.01, 100.0]) for i in range(2, 12)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = {r["vec_id"]: r["cid"] for r in kmeans_lloyd(df, k=2, iters=2).collect()}
        assert out[0] == 0
        # blob B all in one cluster, and not cluster 0's seed-only cluster
        b_clusters = {out[i] for i in range(2, 12)}
        assert len(b_clusters) == 1

    def test_plan_broadcast_no_python(self, spark):
        plan = (
            kmeans_lloyd(_blobs(spark), k=2, iters=1)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        for bad in ("BatchEvalPython", "ArrowEvalPython"):
            assert bad not in plan, f"{bad} in plan"


class TestSemanticDedup:
    def test_near_dups_dropped_within_cluster_only(self, spark):
        """Near-identical vectors in the same blob condemn the higher id;
        cross-blob vectors never pair (the SemDeDup bound)."""
        from proxima_platform_spark.functions.cluster import semantic_dedup

        rows = [
            (0, [1.0, 0.0]),
            (1, [100.0, 100.0]),
            (2, [1.0, 0.0001]),      # ~ vec 0 → dropped (same blob)
            (3, [100.0, 100.001]),   # ~ vec 1 → dropped (same blob)
            (4, [0.0, 1.0]),         # blob A but orthogonal → kept
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = {
            r.vec_id: r
            for r in semantic_dedup(emb, k=2, iters=2, threshold=0.99).collect()
        }
        assert out[0].kept and out[1].kept and out[4].kept
        assert not out[2].kept and out[2].n_near == 1
        assert not out[3].kept
        assert out[2].max_cos > 0.99
        assert out[4].max_cos == -2.0

    def test_greedy_keeps_lowest_id(self, spark):
        """Three mutual near-dups: only the lowest id survives."""
        from proxima_platform_spark.functions.cluster import semantic_dedup

        rows = [(i, [1.0, float(i) * 1e-6]) for i in range(3)] + [
            (10, [-50.0, 60.0]),
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = {r.vec_id: r.kept for r in semantic_dedup(
            emb, k=2, iters=1, threshold=0.999
        ).collect()}
        assert out[0] and not out[1] and not out[2]

    def test_pairs_are_cluster_bounded_arrow_stage(self, spark):
        """Plan shape: pair scoring is an Arrow stage grouped on the
        cluster id (the exact int64 Gram matmul) — candidates never cross
        clusters and nothing in the plan is a cartesian product."""
        from proxima_platform_spark.functions.cluster import semantic_dedup

        emb = _blobs(spark)
        plan = semantic_dedup(emb, k=2, iters=1)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # the scorer is grouped on cid: a FlatMapGroupsInPandas (Arrow)
        # stage fed by a hash exchange on the cluster id
        assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsIn" in plan
        assert any(
            "hashpartitioning(cid" in line for line in plan.splitlines()
        ), plan

    def test_quantized_cosine_is_exact_int_gram(self, spark):
        """The Arrow scorer's cosine equals the direct fixed-point formula
        floor(x*1e6) int dot / (sqrt*sqrt) computed independently."""
        import math

        from proxima_platform_spark.functions.cluster import semantic_dedup

        rows = [(0, [0.8, 0.61]), (1, [0.79, 0.6]), (2, [-0.9, 0.2])]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = {r.vec_id: r for r in semantic_dedup(
            emb, k=1, iters=1, threshold=0.9
        ).collect()}

        def q(v):
            return [math.floor(x * 1_000_000) for x in v]

        qa, qb = q(rows[0][1]), q(rows[1][1])
        dotq = sum(a * b for a, b in zip(qa, qb))
        na = math.sqrt(float(sum(a * a for a in qa)))
        nb = math.sqrt(float(sum(b * b for b in qb)))
        want = round(dotq / (na * nb), 6)
        assert out[1].max_cos == pytest.approx(want, abs=0)
        assert not out[1].kept and out[0].kept

    def test_keep_policy_far_centroid(self, spark):
        """SemDeDup paper policy: of a near-dup pair, the member FARTHER
        from its centroid survives (diversity keep) — the opposite winner
        from min_id when the near-dups sit at different radii."""
        from proxima_platform_spark.functions.cluster import semantic_dedup

        # cluster seeded at vec 0; vec 5 is the same direction but farther
        # from the centroid; vec 9 anchors a second cluster
        rows = [
            (0, [1.0, 0.0]),
            (5, [3.0, 0.0]),          # cos(0,5)=1.0, larger d2 from centroid
            (9, [-100.0, 100.0]),
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        min_id = {r.vec_id: r.kept for r in semantic_dedup(
            emb, k=2, iters=1, threshold=0.99, keep="min_id"
        ).collect()}
        far = {r.vec_id: r.kept for r in semantic_dedup(
            emb, k=2, iters=1, threshold=0.99, keep="far_centroid"
        ).collect()}
        near = {r.vec_id: r.kept for r in semantic_dedup(
            emb, k=2, iters=1, threshold=0.99, keep="near_centroid"
        ).collect()}
        assert min_id[0] and not min_id[5]
        # after 1 Lloyd iter the centroid is the pair mean: vec 5 is farther
        assert far[5] and not far[0]
        assert near[0] and not near[5]
        assert min_id[9] and far[9] and near[9]

    def test_keep_policy_rejects_unknown(self, spark):
        from proxima_platform_spark.functions.cluster import semantic_dedup

        emb = spark.createDataFrame(
            [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="keep policy"):
            semantic_dedup(emb, keep="best")


class TestSemanticDedupClusterBound:
    """max_cluster_rows enforcement (VERDICT r06 #2): oversized clusters
    are sub-keyed by sign-LSH bucket so no Arrow group spans the whole
    cluster; identical vectors always share buckets and are still found."""

    def _skewed(self, spark):
        # one giant cluster (k=1): 100 base vectors + 10 exact duplicates
        rows = []
        for i in range(100):
            # deterministic spread-out directions, dim 4
            rows.append((i, [
                float((i * 37 + 11) % 101) - 50.0,
                float((i * 53 + 7) % 97) - 48.0,
                float((i * 71 + 3) % 89) - 44.0,
                float((i * 13 + 29) % 83) - 41.0,
            ]))
        for i in range(10):
            rows.append((100 + i, list(rows[i][1])))  # exact duplicate of i
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    def test_bounded_is_subset_and_finds_exact_dups(self, spark):
        from proxima_platform_spark.functions.cluster import semantic_dedup

        emb = self._skewed(spark)
        unbounded = {r.vec_id: r for r in semantic_dedup(
            emb, k=1, iters=1, threshold=0.95
        ).collect()}
        bounded = {r.vec_id: r for r in semantic_dedup(
            emb, k=1, iters=1, threshold=0.95, max_cluster_rows=30
        ).collect()}
        assert len(bounded) == len(unbounded) == 110
        # bucket sub-keying only ever REMOVES candidate pairs
        for vid, r in bounded.items():
            if not r.kept:
                assert not unbounded[vid].kept, vid
        # exact duplicates share every LSH bucket → found despite the bound
        for i in range(10):
            assert not bounded[100 + i].kept, f"dup {100 + i} not condemned"
            assert bounded[100 + i].max_cos == 1.0

    def test_bound_actually_splits_the_group(self, spark):
        """The (cid, table, bucket) sub-key splits the 110-row cluster into
        groups all smaller than the cluster, and the plan groups the Arrow
        stage on the bucket columns."""
        from pyspark.sql import functions as F

        from proxima_platform_spark.functions.cluster import semantic_dedup
        from proxima_platform_spark.functions.similarity import (
            sign_lsh_buckets_arrow,
        )

        emb = self._skewed(spark)
        staged = sign_lsh_buckets_arrow(
            emb.select("vec_id", F.col("embedding").alias("v")),
            vec_col="v", num_planes=8, num_tables=2,
        )
        for t in range(2):
            sizes = [
                r.n for r in staged.groupBy(f"__b{t}")
                .agg(F.count(F.lit(1)).alias("n")).collect()
            ]
            assert max(sizes) < 110, f"table {t} did not split: {sizes}"
        plan = (
            semantic_dedup(emb, k=1, iters=1, threshold=0.95,
                           max_cluster_rows=30)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "__bkt" in plan, "bucket sub-key missing from plan"

    def test_unbounded_path_unchanged_when_under_bound(self, spark):
        """A bound larger than every cluster must reproduce the unbounded
        verdicts exactly (the small-cluster branch is the same scorer)."""
        from proxima_platform_spark.functions.cluster import semantic_dedup

        emb = self._skewed(spark)
        base = sorted(
            (r.vec_id, r.kept, r.n_near, r.max_cos)
            for r in semantic_dedup(emb, k=1, iters=1, threshold=0.95).collect()
        )
        wide = sorted(
            (r.vec_id, r.kept, r.n_near, r.max_cos)
            for r in semantic_dedup(
                emb, k=1, iters=1, threshold=0.95, max_cluster_rows=100_000
            ).collect()
        )
        assert base == wide
