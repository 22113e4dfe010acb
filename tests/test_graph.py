"""Connected components / dedup groups (functions/graph.py).

North-star extension (no reference counterpart): alternating
large-star/small-star contraction, validated against a driver-side
union-find brute force.
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from proxima_platform_spark.functions.graph import (
    _canonical,
    connected_components,
    dedup_groups,
)


def _union_find_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent[find(u)] = find(v)
    # label every node with the min of its component
    comp_min: dict[int, int] = {}
    for n in list(parent):
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in parent}


class TestConnectedComponents:
    def test_two_components_and_pair(self, spark):
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20)], "u int, v int"
        )
        got = {
            (r.node, r.component) for r in connected_components(edges).collect()
        }
        assert got == {
            (1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10), (20, 20), (21, 20)
        }

    def test_long_chain_collapses(self, spark):
        """Diameter-64 chain: naive min-propagation would need 64 rounds;
        the alternating algorithm must finish well inside max_iter=25."""
        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(64)], "u int, v int"
        )
        cc = connected_components(chain)
        assert cc.count() == 65
        assert cc.where(F.col("component") != 0).count() == 0

    def test_self_loops_and_duplicates_ignored(self, spark):
        edges = spark.createDataFrame(
            [(5, 5), (1, 2), (2, 1), (1, 2)], "u int, v int"
        )
        got = {(r.node, r.component) for r in connected_components(edges).collect()}
        assert got == {(1, 1), (2, 1)}  # the pure self-loop node disappears

    def test_matches_union_find_on_random_graph(self, spark):
        rng = random.Random(7)
        edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(150)]
        edges = [e for e in edges if e[0] != e[1]]
        df = spark.createDataFrame(edges, "u int, v int")
        got = {r.node: r.component for r in connected_components(df).collect()}
        assert got == _union_find_labels(edges)

    def test_string_ids(self, spark):
        """Labels are min by the column's natural ordering — works for any
        orderable id type (dedup keys are often md5 hex strings)."""
        edges = spark.createDataFrame(
            [("b", "c"), ("a", "b"), ("x", "y")], "u string, v string"
        )
        got = {(r.node, r.component) for r in connected_components(edges).collect()}
        assert got == {("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")}

    def test_canonical_orients_and_dedupes(self, spark):
        e = _canonical(
            spark.createDataFrame([(1, 2), (2, 1), (3, 3)], "u int, v int")
        ).collect()
        assert [(r.u, r.v) for r in e] == [(2, 1)]


class TestDedupGroups:
    def test_representative_flags(self, spark):
        pairs = spark.createDataFrame(
            [(4, 2), (2, 9), (7, 8)], "id_a int, id_b int"
        )
        got = {
            (r.id, r.group_id, r.is_representative)
            for r in dedup_groups(pairs).collect()
        }
        assert got == {
            (2, 2, True), (4, 2, False), (9, 2, False),
            (7, 7, True), (8, 7, False),
        }

    def test_empty_pairs(self, spark):
        pairs = spark.createDataFrame([], "id_a int, id_b int")
        assert dedup_groups(pairs).count() == 0


class TestSimhashPairs:
    """simhash_candidate_pairs (functions/dedup.py): pigeonhole-chunked
    bucket join in hamming space — grouped here with the other dedup-group
    machinery."""

    def test_exact_dup_is_hamming_zero_pair(self, spark):
        from proxima_platform_spark.functions.dedup import simhash_candidate_pairs

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta"),
                (2, "alpha beta gamma delta"),          # exact dup of 1
                (3, "utterly different words entirely unrelated"),
            ],
            "doc_id int, text string",
        )
        got = {
            (r.id_a, r.id_b): r.hamming
            for r in simhash_candidate_pairs(docs, "doc_id", "text").collect()
        }
        assert got.get((1, 2)) == 0
        assert (1, 3) not in got and (2, 3) not in got

    def test_signatures_match_expression_form(self, spark):
        from proxima_platform_spark.functions.dedup import (
            simhash64,
            simhash_signatures_df,
        )
        from pyspark.sql import functions as F

        docs = spark.createDataFrame(
            [(1, "a b c"), (2, "the quick brown fox"), (3, "a a b")],
            "doc_id int, text string",
        )
        agg = {
            r.id: r.sim for r in simhash_signatures_df(docs, "doc_id", "text").collect()
        }
        expr = {
            r.doc_id: r.s
            for r in docs.select("doc_id", simhash64(F.col("text")).alias("s")).collect()
        }
        assert agg == expr

    def test_threshold_needs_enough_chunks(self, spark):
        from proxima_platform_spark.functions.dedup import simhash_candidate_pairs

        docs = spark.createDataFrame([(1, "x")], "doc_id int, text string")
        with pytest.raises(ValueError, match="pigeonhole"):
            simhash_candidate_pairs(docs, "doc_id", "text", hamming_threshold=4)


class TestPlanBands:
    def test_factorizations_and_monotonicity(self):
        from proxima_platform_spark.functions.dedup import plan_bands

        for nh in (8, 16, 64):
            for t in (0.2, 0.5, 0.8, 0.95):
                b, r = plan_bands(t, nh)
                assert b * r == nh
                pivot = (1.0 / b) ** (1.0 / r)
                # every other factorization is no closer to the threshold
                for rr in range(1, nh + 1):
                    if nh % rr == 0:
                        bb = nh // rr
                        assert abs(pivot - t) <= abs((1.0 / bb) ** (1.0 / rr) - t) + 1e-12
        # low threshold (catch distant pairs) wants many bands; high
        # threshold (near-exact only) wants few
        b_lo, _ = plan_bands(0.2, 16)
        b_hi, _ = plan_bands(0.95, 16)
        assert b_lo > b_hi

    def test_rejects_bad_inputs(self):
        import pytest as _pytest

        from proxima_platform_spark.functions.dedup import plan_bands

        with _pytest.raises(ValueError):
            plan_bands(0.0, 8)
        with _pytest.raises(ValueError):
            plan_bands(0.5, 0)


from proxima_platform_spark.functions.graph import pagerank_int  # noqa: E402


class TestPagerankInt:
    """Integer-spec PageRank vs a pure-Python replay of the same spec:
    contrib = (17·rank·w) // (20·out_w), rank' = (3·scale) // 20 + Σ."""

    def _model(self, edges, iterations=3, scale=10 ** 9):
        nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
        out_w = {}
        for u, _, w in edges:
            out_w[u] = out_w.get(u, 0) + w
        rank = {n: scale for n in nodes}
        for _ in range(iterations):
            nxt = {n: (3 * scale) // 20 for n in nodes}
            for u, v, w in edges:
                nxt[v] += (17 * rank[u] * w) // (20 * out_w[u])
            rank = nxt
        return rank

    def test_matches_model(self, spark):
        edges = [
            ("a", "b", 3), ("a", "c", 1), ("b", "c", 2),
            ("c", "a", 5), ("d", "a", 1),
        ]
        df = spark.createDataFrame(edges, "src string, dst string, weight long")
        got = {r.node: r.rank for r in pagerank_int(df, iterations=3).collect()}
        assert got == self._model(edges)

    def test_sink_keeps_teleport_plus_inflow(self, spark):
        # d has no in-edges: after iteration 1 its rank is exactly the
        # teleport term, and it stays there
        edges = [("d", "a", 1), ("a", "b", 1), ("b", "a", 1)]
        df = spark.createDataFrame(edges, "src string, dst string, weight long")
        got = {r.node: r.rank for r in pagerank_int(df, iterations=4).collect()}
        assert got["d"] == (3 * 10 ** 9) // 20
        assert got == self._model(edges, iterations=4)

    def test_more_inflow_ranks_higher(self, spark):
        # hub receives from everyone; spokes only from the hub
        edges = [("s%d" % i, "hub", 10) for i in range(5)] + [
            ("hub", "s%d" % i, 1) for i in range(5)
        ]
        df = spark.createDataFrame(edges, "src string, dst string, weight long")
        got = {r.node: r.rank for r in pagerank_int(df).collect()}
        assert got["hub"] > max(v for k, v in got.items() if k != "hub")
        assert got == self._model(edges)


class TestSimilarityJoinPrefix:
    """similarity_join_prefix (functions/dedup.py): EXACT set-similarity
    self-join with lossless AllPairs/PPJoin prefix filtering — output must
    equal the naive all-pairs shingle-Jaccard join, with no cartesian in
    the plan."""

    def _naive(self, spark, docs, threshold):
        from proxima_platform_spark.functions.dedup import ngram_shingles

        sh = docs.select(
            "doc_id", F.array_distinct(ngram_shingles(F.col("text"), 3)).alias("s")
        )
        a = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
        b = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
        inter = F.size(F.array_intersect("sa", "sb"))
        union = F.size("sa") + F.size("sb") - inter
        jac = inter.cast("double") / union.cast("double")
        return {
            (r.id_a, r.id_b, r.n_inter, r.jac)
            for r in a.join(b, F.col("id_a") < F.col("id_b"))
            .where(union > 0)
            .where(jac >= threshold)
            .select(
                "id_a", "id_b", inter.alias("n_inter"),
                F.round(jac, 6).alias("jac"),
            )
            .collect()
        }

    def test_equals_naive_join_and_boundary_pair(self, spark):
        from proxima_platform_spark.functions.dedup import similarity_join_prefix

        docs = spark.createDataFrame(
            [
                (1, "a b c d e"),            # shingles {abc, bcd, cde}
                (2, "a b c d f"),            # {abc, bcd, cdf}: jac(1,2)=0.5 EXACT
                (3, "a b c d e"),            # exact dup of 1
                (4, "x y z w v u t"),        # unrelated
                (5, "x y z w v u q"),        # near-dup of 4 (4/6 shingles... 3/7)
                (6, "too short"),            # < 3 tokens: empty shingle set
                (7, "p q"),                  # < 3 tokens
            ],
            "doc_id int, text string",
        )
        got = {
            (r.id_a, r.id_b, r.n_inter, r.jac)
            for r in similarity_join_prefix(
                docs, "doc_id", "text", n=3, threshold=0.5
            ).collect()
        }
        assert got == self._naive(spark, docs, 0.5)
        # the exact-threshold pair survives (jac == t, >= not >)
        assert (1, 2, 2, 0.5) in got
        # exact dup pair at jac 1.0
        assert (1, 3, 3, 1.0) in got
        # empty-shingle docs never pair (naive excludes union=0 too)
        assert not any(6 in (p[0], p[1]) or 7 in (p[0], p[1]) for p in got)

    def test_no_cartesian_in_plan(self, spark):
        from proxima_platform_spark.functions.dedup import similarity_join_prefix

        docs = spark.createDataFrame(
            [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(20)],
            "doc_id int, text string",
        )
        out = similarity_join_prefix(docs, "doc_id", "text", threshold=0.5)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_random_corpus_matches_naive(self, spark):
        from proxima_platform_spark.functions.dedup import similarity_join_prefix

        rng = random.Random(7)
        vocab = [f"t{i}" for i in range(30)]
        rows = []
        for i in range(40):
            k = rng.randint(3, 12)
            rows.append((i, " ".join(rng.choice(vocab) for _ in range(k))))
        # plant mutated near-dups to exercise the >= t band
        for j in range(10):
            base = rows[j][1].split()
            base[rng.randrange(len(base))] = rng.choice(vocab)
            rows.append((100 + j, " ".join(base)))
        docs = spark.createDataFrame(rows, "doc_id int, text string")
        for t in (0.25, 0.5, 0.75):
            got = {
                (r.id_a, r.id_b, r.n_inter, r.jac)
                for r in similarity_join_prefix(
                    docs, "doc_id", "text", n=3, threshold=t
                ).collect()
            }
            assert got == self._naive(spark, docs, t), f"threshold {t}"


class TestSortedNeighborhood:
    """snm_candidate_pairs (functions/dedup.py): exact global rank from
    bucket-parallel row_number + cumulative offsets; neighbor pairing is
    an equi-join on rank+d."""

    def test_ranks_and_window_pairs_exact(self, spark):
        from proxima_platform_spark.functions.dedup import snm_candidate_pairs

        # deliberately unbalanced buckets ('a' x4, 'b' x1, 'z' x2) — the
        # offsets must still produce the exact global (key, id) rank
        rows = [
            (1, "apple"), (2, "apricot"), (3, "avocado"), (4, "apple"),
            (5, "banana"), (6, "zebra"), (7, "zucchini"),
        ]
        df = spark.createDataFrame(rows, "id int, k string")
        got = {
            (r.id_a, r.id_b, r.rank_a, r.rank_b)
            for r in snm_candidate_pairs(
                df, "id", F.col("k"), window=3, bucket_chars=1
            ).collect()
        }
        # sorted order: apple(1), apple(4), apricot(2), avocado(3),
        #               banana(5), zebra(6), zucchini(7) -> ranks 1..7
        order = [1, 4, 2, 3, 5, 6, 7]
        want = set()
        for i, ida in enumerate(order):
            for d in (1, 2):
                if i + d < len(order):
                    want.add((ida, order[i + d], i + 1, i + 1 + d))
        assert got == want

    def test_no_cartesian_and_offsets_broadcast(self, spark):
        from proxima_platform_spark.functions.dedup import snm_candidate_pairs

        df = spark.createDataFrame(
            [(i, f"k{i:03d}") for i in range(50)], "id int, k string"
        )
        out = snm_candidate_pairs(df, "id", F.col("k"), window=4)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestTriangleCounts:
    """triangle_counts (functions/graph.py): degree-ordered node-iterator;
    validated against driver-side brute force."""

    def _brute(self, edges):
        adj = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        counts = {}
        nodes = sorted(adj)
        for i, a in enumerate(nodes):
            for b in [x for x in adj[a] if x > a]:
                for c in adj[a] & adj[b]:
                    if c > b:
                        for n in (a, b, c):
                            counts[n] = counts.get(n, 0) + 1
        return counts

    def test_known_graph(self, spark):
        from proxima_platform_spark.functions.graph import triangle_counts

        # K4 on 1-4 (4 triangles, each node in 3) + pendant 5 + disjoint
        # triangle 6-7-8
        edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
                 (6, 7), (6, 8), (7, 8)]
        df = spark.createDataFrame(edges, "u int, v int")
        got = {(r.node, r.n_tri) for r in triangle_counts(df).collect()}
        assert got == {(1, 3), (2, 3), (3, 3), (4, 3), (6, 1), (7, 1), (8, 1)}

    def test_random_graph_matches_brute_force(self, spark):
        from proxima_platform_spark.functions.graph import triangle_counts

        rng = random.Random(13)
        edges = set()
        while len(edges) < 120:
            a, b = rng.randrange(25), rng.randrange(25)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        df = spark.createDataFrame(sorted(edges), "u int, v int")
        got = {(r.node, r.n_tri) for r in triangle_counts(df).collect()}
        assert got == set(self._brute(sorted(edges)).items())

    def test_probe_exchange_sized_by_default_parallelism(self, spark):
        """The probe-side repartition must scale with the cluster, not a
        constant: assert the plan carries a RoundRobinPartitioning exchange
        sized to sparkContext.defaultParallelism (VERDICT r11 #2)."""
        from proxima_platform_spark.functions.graph import triangle_counts

        df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "u int, v int")
        plan = triangle_counts(df)._jdf.queryExecution().analyzed().toString()
        n = spark.sparkContext.defaultParallelism
        assert f"Repartition {n}, true" in plan, plan


class TestKCore:
    def _graph(self, spark):
        # a 4-clique {1,2,3,4} with pendant chains hanging off it:
        # 5-6-7 path from node 1, leaf 8 on node 2
        edges = [
            (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
            (1, 5), (5, 6), (6, 7), (2, 8),
        ]
        return spark.createDataFrame(edges, ["u", "v"])

    def test_three_core_is_the_clique(self, spark):
        from proxima_platform_spark.functions.graph import k_core

        out = {r.node: r.deg for r in k_core(self._graph(spark), 3).collect()}
        assert out == {1: 3, 2: 3, 3: 3, 4: 3}

    def test_fixpoint_equals_fixed_rounds_past_depth(self, spark):
        from proxima_platform_spark.functions.graph import k_core

        g = self._graph(spark)
        fix = sorted(map(tuple, k_core(g, 2).collect()))
        fixed = sorted(map(tuple, k_core(g, 2, rounds=6).collect()))
        assert fix == fixed
        # the 2-core keeps the clique only (chains peel leaf-first)
        assert {n for n, _ in fix} == {1, 2, 3, 4}

    def test_core_is_maximal(self, spark):
        from proxima_platform_spark.functions.graph import k_core
        from pyspark.sql import functions as F

        g = self._graph(spark)
        core = k_core(g, 2)
        # peeling the core again changes nothing (fixpoint invariant)
        core_edges = (
            g.join(core.select(F.col("node").alias("u")), "u", "left_semi")
            .join(core.select(F.col("node").alias("v")), "v", "left_semi")
        )
        again = sorted(map(tuple, k_core(core_edges.select("u", "v"), 2).collect()))
        assert again == sorted(map(tuple, core.collect()))

    def test_k1_keeps_everything_and_validation(self, spark):
        from proxima_platform_spark.functions.graph import k_core
        import pytest as _pytest

        g = self._graph(spark)
        assert k_core(g, 1).count() == 8
        with _pytest.raises(ValueError):
            k_core(g, 0)

    def test_empty_core(self, spark):
        from proxima_platform_spark.functions.graph import k_core

        chain = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["u", "v"])
        assert k_core(chain, 2).count() == 0


class TestLabelPropagation:
    def test_two_cliques_with_bridge(self, spark):
        """Two 4-cliques joined by one bridge edge: LPA assigns each
        clique its minimum node id as community label (deterministic
        min tie-break), and the bridge does not merge them."""
        from proxima_platform_spark.functions.graph import label_propagation

        clique1 = [(a, b) for a in range(4) for b in range(4) if a < b]
        clique2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
        edges = spark.createDataFrame(
            clique1 + clique2 + [(3, 10)], "u long, v long"
        )
        got = {
            r.node: r.label
            for r in label_propagation(edges, rounds=4).collect()
        }
        assert {got[n] for n in range(4)} == {0}
        assert {got[n] for n in range(10, 14)} == {10}

    def test_fixpoint_by_round_6_on_fixture(self, spark, sf_dir):
        """The declared query runs rounds=8; communities stabilize by
        round 6 on the co-purchase fixture (round 4 at sf0.01), and a
        deterministic round map that agrees on two consecutive rounds
        holds the labels forever — so 8 rounds IS the fixpoint (the
        k_core declared-rounds contract)."""
        from pyspark.sql import functions as F

        from proxima_platform_spark.functions.graph import label_propagation

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
            F.col("l_quantity") <= 5
        )
        a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("u"))
        b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("v"))
        edges = (
            a.join(b, "o").where(F.col("u") < F.col("v"))
            .select("u", "v").distinct()
        )
        r6 = sorted(map(tuple, label_propagation(edges, rounds=6).collect()))
        r8 = sorted(map(tuple, label_propagation(edges, rounds=8).collect()))
        assert r6 == r8

    def test_deterministic_and_validated(self, spark):
        import pytest

        from proxima_platform_spark.functions.graph import label_propagation

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5)], "u long, v long"
        )
        a = sorted(map(tuple, label_propagation(edges, rounds=2).collect()))
        b = sorted(map(tuple, label_propagation(edges, rounds=2).collect()))
        assert a == b
        with pytest.raises(ValueError, match="rounds"):
            label_propagation(edges, rounds=0)
