"""Distributed connected components — dedup-group clustering.

Near-duplicate candidate *pairs* (MinHash/LSH, SimHash, embedding buckets —
functions/dedup.py) are only half of deduplication: a corpus cleaner must
collapse each *transitive* group (A~B, B~C ⇒ {A,B,C}) and keep one
representative. That grouping is connected components over the candidate
graph.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the same
two-phase contraction GraphFrames/GraphX use. Each phase is one
groupBy + join (two shuffles); the edge set contracts toward a star per
component in O(log n) rounds *regardless of component diameter*, which is
why it is preferred over naive min-label propagation (O(diameter) rounds —
a 1M-long chain of near-dups would need 1M rounds) at 100 TB scale.

Scale properties:
  * state is only the current edge set — no driver-side graph, ever;
  * each round is hash-partitioned groupBy(min) + equi-join on node id;
  * lineage is truncated every round (``localCheckpoint``) so the plan
    stays O(1) deep instead of O(rounds);
  * convergence is detected with a single count+checksum aggregate per
    round, and the checkpoint is LAZY: the fingerprint aggregate is the
    first action on the round's edge set, so the one job both stores the
    checkpoint blocks and reduces the fingerprint — one pass over the
    (shrinking) edges per round, not a materialize-then-aggregate pair.

Reference parity note: the reference platform has no graph operator; this
is a north-star extension (training-data pipeline: dedup group collapse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set as (u > v) ordered pairs, self-loops dropped."""
    return (
        edges.select(
            F.greatest("u", "v").alias("u"),
            F.least("u", "v").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every *strictly larger* neighbor of each node to the node's
    minimum neighbor (including itself): for each u, m = min(N(u) ∪ {u});
    emit (v, m) for v ∈ N(u), v > u."""
    sym = edges.select("u", "v").union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", F.col("u")).alias("m"))
    # no .distinct() here: the consumer (_small_star via _canonical)
    # dedupes anyway — a distinct would only add a shuffle per round
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Within each node's *smaller-or-equal* neighborhood, connect everything
    to the minimum: orient edges u ≥ v, m = min(N≤(u) ∪ {u}); emit (v, m)
    for the smaller neighbors plus (u, m).

    The input (large-star output) is a multigraph; no distinct here: ``min``
    is duplicate-insensitive, duplicate join rows collapse in the final
    ``distinct()``, and a 2-col distinct's hashpartitioning(u, v) could not
    be reused by the 1-col join on u anyway — it would be a pure extra
    shuffle of the same E rows."""
    e = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))  # u > v orientation, no distinct
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    reattach = (
        e.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )
    root = mins.select(F.col("u"), F.col("m").alias("v"))
    return reattach.union(root).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the minimum
    node id of its connected component.

    Returns ``(node, component)`` — one row per node that appears in at
    least one edge; ``component`` is the component's minimum node id
    (deterministic, engine-portable: an ANSI recursive CTE produces the
    same labels, which is what the oracle checks).

    Raises ``RuntimeError`` if not converged after ``max_iter`` alternating
    rounds (the algorithm's bound is O(log n) rounds; 25 covers graphs far
    beyond 2^25 nodes).
    """
    def _fingerprint(df: DataFrame):
        # convergence = identical edge set; on (u>v)-canonical DISTINCT
        # sets, (count, sum of 64-bit row hashes in decimal — no overflow)
        # is an exact set fingerprint modulo ~2^-64 collision odds
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("s"),
        ).first()
        return (row["n"], row["s"])

    # eager=False everywhere: each round's fingerprint aggregate is the first
    # action on that round's edge set, so ONE job stores the checkpoint
    # blocks AND reduces (count, hash). No up-front fingerprint of the input:
    # fp=None makes round 1 unconditionally proceed (the input is almost
    # never already a star forest), saving one full pass over the largest —
    # pre-contraction — edge set.
    e = _canonical(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    ).localCheckpoint(eager=False)
    fp = None

    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=False)
        fp2 = _fingerprint(e2)
        e = e2
        if fp2 == fp:
            break
        fp = fp2
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")

    # converged state is a star forest: every edge points (u > v=root);
    # nodes are all endpoints, roots label themselves
    nodes = e.select(F.col("u").alias("node"), F.col("v").alias("component")).union(
        e.select(F.col("v").alias("node"), F.col("v").alias("component"))
    )
    return nodes.groupBy("node").agg(F.min("component").alias("component"))


def dedup_groups(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Collapse near-duplicate candidate pairs into transitive dedup groups.

    Returns ``(id, group_id, is_representative)`` — every document that has
    at least one near-dup partner, its group label (min id in the
    component), and whether it is the group's keeper (the representative the
    corpus cleaner retains; the rest are dropped).
    """
    cc = connected_components(pairs, id_a, id_b)
    return cc.select(
        F.col("node").alias("id"),
        F.col("component").alias("group_id"),
        (F.col("node") == F.col("component")).alias("is_representative"),
    )


def pagerank_int(
    edges: DataFrame,
    iterations: int = 3,
    damping_num: int = 17,
    damping_den: int = 20,
    scale: int = 10 ** 9,
) -> DataFrame:
    """Weighted PageRank with a fully INTEGER specification — every rank is
    a scaled int64 and every division is integer ``DIV``, so two engines
    replaying the same spec agree bit-for-bit (the same determinism trick
    as the k-means decimal means and the LSH integer projections).

    Spec (per iteration, damping d = damping_num/damping_den):

        contrib(u→v) = (d·rank(u)·w(u,v)) DIV (den·out_w(u))
        rank'(v)     = ((den−num)·scale) DIV den + Σ contrib(·→v)

    Nodes = distinct endpoints of ``edges(src, dst, weight)``; nodes with
    no in-edges keep the teleport term. Dangling nodes (no out-edges)
    simply don't distribute — the spec is self-contained rather than
    mass-conserving, which is what makes it exactly replayable.

    Scale shape: each iteration is ONE equi-join (ranks ⋈ edges on src —
    ranks is one row per node and broadcasts when small; at web scale both
    sides hash-partition on the same key every round, so AQE reuses the
    exchange) + one groupBy(dst) sum with map-side combine. The plan is
    built lazily over ``iterations`` rounds — no driver state, no collect.
    Fixed iteration count keeps the plan finite; for convergence-driven
    runs compose with the ``connected_components`` checkpoint pattern.

    Overflow bound: num·rank·w must fit int64 — rank ≤ scale·(1+in_deg),
    fine for scale=1e9 and weights ≤ ~1e5.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        # pinned: the node frame is referenced by the initial ranks AND
        # by every iteration's teleport left-join — without the pin the
        # endpoint-union distinct re-derives (iterations + 1) times per
        # run (r13: 2.42 -> 1.87s at sf0.1, 6/6 interleaved pairs)
        .localCheckpoint(eager=False)
    )
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    # lazy checkpoint: the weighted edge list is consumed once per
    # iteration — truncate lineage so round k doesn't replay the (possibly
    # expensive) edge derivation k times (same pattern as
    # connected_components; blocks materialize on first use)
    e = edges.join(out_w, "src").localCheckpoint(eager=False)
    teleport = F.expr(
        f"CAST({(damping_den - damping_num) * scale} AS BIGINT) DIV {damping_den}"
    )
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"(CAST({damping_num} AS BIGINT) * rank * weight)"
                    f" DIV (CAST({damping_den} AS BIGINT) * out_w)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (teleport + F.coalesce(F.col("in_sum"), F.lit(0).cast("long"))).alias(
                    "rank"
                ),
            )
        )
    return ranks


def triangle_counts(edges: DataFrame, u: str = "u", v: str = "v") -> DataFrame:
    """Per-node triangle counts over an undirected simple graph —
    degree-ordered edge-iterator with adjacency-set intersection (the
    Suri & Vassilvitskii WWW'11 orientation + the compact-forward
    closing step): orient every edge from its lower-(degree, id)
    endpoint to the higher one, collect each node's oriented out-
    neighborhood as ONE array row, and close triangles per oriented
    edge (a, b) as ``array_intersect(N+(a), N+(b))``. Every triangle
    {x < y < z} in (degree, id) order appears exactly once — at edge
    (x, y) with closing node z — so no /3 or /6 correction is needed,
    and each corner is credited exactly once (a and b get |C|, each
    c in C gets 1).

    Why this shape at 100 TB: orientation bounds every out-degree by
    O(sqrt(m)), so total intersection work is the optimal O(m^{3/2}) —
    but unlike the wedge-join formulation (self-join then equi-close),
    the O(m^{3/2}) wedge volume lives as array elements scanned inside
    one whole-stage-codegen'd stage, never as shuffled rows: the only
    shuffles are the degree groupBy, the adjacency collect_list (both
    map-side combined, one row per node out) and two node-keyed equi-
    joins of the edge frame against the vocab-sized adjacency frame.
    Measured at sf0.1 (1.2M-edge co-purchase graph, 41M wedges): 172s
    wedge-join form -> ~15s this form. Per-array memory is bounded by
    the same sqrt(m) orientation bound (no hub blow-up).

    ``edges`` must hold each undirected edge once with ``u != v`` (any
    per-pair canonical order works; duplicates must be pre-dropped).
    Output orientation does not affect results — an id-ordered oracle
    produces identical counts.

    Returns (node, n_tri) for every node in >= 1 triangle.
    """
    # staged once (lazy localCheckpoint): the caller's edge frame (often
    # an expensive self-join + distinct) is referenced by the degree
    # union (twice) and the keyed probe — without the pin the build
    # re-executes per reference inside the orientation job. The degree
    # frame likewise feeds both endpoint joins.
    e = edges.select(
        F.col(u).alias("__a"), F.col(v).alias("__b")
    ).localCheckpoint(eager=False)
    deg = (
        e.select(F.col("__a").alias("__n"))
        .unionAll(e.select(F.col("__b").alias("__n")))
        .groupBy("__n")
        .agg(F.count(F.lit(1)).alias("__d"))
        .localCheckpoint(eager=False)
    )
    da = deg.select(
        F.col("__n").alias("__a"), F.struct("__d", F.col("__n").alias("__i")).alias("__ka")
    )
    db = deg.select(
        F.col("__n").alias("__b"), F.struct("__d", F.col("__n").alias("__i")).alias("__kb")
    )
    keyed = e.join(da, "__a").join(db, "__b")
    # staged once (lazy localCheckpoint): the oriented edge frame feeds
    # the adjacency agg AND the per-edge probe; without staging the
    # edge-distinct + degree joins recompute once per consumer.
    oriented = keyed.select(
        F.when(F.col("__ka") < F.col("__kb"), F.col("__a"))
        .otherwise(F.col("__b"))
        .alias("__src"),
        F.when(F.col("__ka") < F.col("__kb"), F.col("__b"))
        .otherwise(F.col("__a"))
        .alias("__dst"),
    ).localCheckpoint(eager=False)
    # adj feeds both the source and destination neighborhood joins —
    # pinned so the collect_list agg over the oriented edges runs once
    adj = oriented.groupBy("__src").agg(
        F.collect_list("__dst").alias("__nb")
    ).localCheckpoint(eager=False)
    na = adj.select(F.col("__src").alias("__a2"), F.col("__nb").alias("__na"))
    nb = adj.select(F.col("__src").alias("__b2"), F.col("__nb").alias("__nbn"))
    # repartition the probe side: the edge frame is small in BYTES, so
    # AQE would coalesce it to 1-2 partitions and serialize the whole
    # intersection workload onto one core (measured 74s -> 35s at sf0.1)
    # sized to the cluster (defaultParallelism), not a constant: on a
    # 1000-executor cluster the intersection stage must fan out with the
    # cores, while on local[32] this reproduces the measured 74s -> 35s fix
    n_probe = oriented.sparkSession.sparkContext.defaultParallelism
    probe = oriented.repartition(n_probe)
    # the intersect is referenced exactly ONCE, inside the Generate — a
    # multi-reference projection (size filter + corner weights) would be
    # substituted into every reference by projection collapsing and re-run
    # the O(m^{3/2}) set-op per reference (measured 35s vs 18s at sf0.1).
    # explode() also drops empty intersections for free, and the triangle
    # frame it produces is one row per TRIANGLE — far smaller than the
    # wedge volume the join formulation shuffles.
    tri = (
        probe.join(na, probe["__src"] == na["__a2"])
        # left join: the max-(degree, id) node of an edge may have no
        # out-edges at all — it closes nothing, but must not drop the row
        .join(nb, probe["__dst"] == nb["__b2"], "left")
        .select(
            "__src",
            "__dst",
            F.explode(
                F.array_intersect(
                    # empty-array fallback typed from __na itself — the
                    # function is generic over the node column's type
                    "__na",
                    F.coalesce("__nbn", F.array_except("__na", "__na")),
                )
            ).alias("__w"),
        )
    )
    nodes = tri.select(
        F.explode(F.array("__src", "__dst", "__w")).alias("node")
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))


def k_core(
    edges: DataFrame,
    k: int,
    u: str = "u",
    v: str = "v",
    *,
    rounds: int | None = None,
    max_rounds: int = 50,
) -> DataFrame:
    """k-core decomposition membership: iteratively peel nodes of degree
    < ``k`` until no such node remains (Seidman'83; the standard
    distributed rendering peels by ROUNDS — every round removes ALL
    currently-underdegree nodes at once, so convergence takes O(peel
    depth) rounds, not O(nodes)).

    ``rounds=None`` (production): loop to the fixpoint, checking an
    is-there-anything-left-to-peel aggregate per round (one tiny count —
    the only driver-side value; max_rounds bounds runaway inputs loudly).
    ``rounds=N`` (declared-query mode): run EXACTLY N peels — the same
    fixed-iteration contract as ``pagerank_int``, so an engine oracle can
    replay the rounds as N chained CTEs; at fixture scale N is chosen
    past the fixpoint and verified there by test.

    Scale shape: each round is one map-side-combined degree agg + two
    anti-joins keyed by node (hash-partitioned; the underdegree frame is
    the SMALL side and broadcasts), with the edge frame lazily
    localCheckpoint-ed per round — the kmeans/pagerank lesson: an
    uncheckpointed loop re-derives every prior round per action and the
    plan deepens quadratically.

    ``edges`` holds each undirected edge once (u != v, pre-deduped).
    Returns (node, deg) for k-core members, deg = degree INSIDE the core
    (>= k by construction).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = (
        edges.select(F.col(u).alias("__a"), F.col(v).alias("__b"))
        .unionAll(
            edges.select(F.col(v).alias("__a"), F.col(u).alias("__b"))
        )
        .localCheckpoint(eager=False)
    )
    n_rounds = rounds if rounds is not None else max_rounds
    for i in range(n_rounds):
        deg = e.groupBy("__a").agg(F.count(F.lit(1)).alias("__d"))
        bad = deg.where(F.col("__d") < k).select("__a")
        if rounds is None and bad.isEmpty():
            break
        e = (
            e.join(F.broadcast(bad), "__a", "left_anti")
            .join(
                F.broadcast(bad.select(F.col("__a").alias("__b"))),
                "__b",
                "left_anti",
            )
            .localCheckpoint(eager=False)
        )
    else:
        if rounds is None:
            # the emptiness check runs at the TOP of each iteration, so a
            # peel that removes the last under-degree nodes on the final
            # round would otherwise raise spuriously — re-check the final
            # edge frame before declaring non-convergence (r07 ADVICE #4)
            deg = e.groupBy("__a").agg(F.count(F.lit(1)).alias("__d"))
            if not deg.where(F.col("__d") < k).isEmpty():
                raise RuntimeError(
                    f"k_core did not converge within max_rounds={max_rounds}; "
                    "raise max_rounds (peel depth exceeds the bound)"
                )
    return (
        e.groupBy("__a")
        .agg(F.count(F.lit(1)).alias("deg"))
        .where(F.col("deg") >= k)
        .select(F.col("__a").alias("node"), "deg")
    )


def label_propagation(
    edges: DataFrame,
    *,
    rounds: int,
    u: str = "u",
    v: str = "v",
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007, the deterministic rendering): every node starts with its own
    id as label; each round, every node adopts the most frequent label
    among its neighbors AND itself, breaking ties by the smallest label.
    Including the node's own current label in the vote is the standard
    damping that stops 2-coloring oscillation on bipartite regions; the
    (count desc, label asc) argmax makes the whole run deterministic — no
    RNG, no visit order — so a SQL oracle replays the rounds as chained
    CTEs (the ``pagerank_int``/``k_core`` fixed-iteration contract).

    Scale shape per round: one equi-join of the directed edge frame
    against the label frame (hash-partitioned on node), one
    map-side-combinable (node, label) count, one min-struct argmax per
    node — never materializes anything wider than the edge list. The
    label frame is lazily localCheckpoint-ed per round (the
    kmeans/pagerank lesson: an uncheckpointed loop re-derives every prior
    round per action and the plan deepens quadratically).

    ``edges`` holds each undirected edge once (u != v, pre-deduped).
    Returns ``(node, label)``; a community is a label's node set.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    directed = (
        edges.select(F.col(u).alias("__n"), F.col(v).alias("__m"))
        .unionAll(edges.select(F.col(v).alias("__n"), F.col(u).alias("__m")))
        .localCheckpoint(eager=False)
    )
    labels = (
        directed.select(F.col("__n").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=False)
    )
    for _ in range(rounds):
        votes = directed.join(
            labels.select(F.col("node").alias("__m"), "label"), "__m"
        ).select(F.col("__n").alias("node"), "label").unionAll(
            labels.select("node", "label")  # self-vote (damping)
        )
        # NO explicit repartition("node") here: r13 tried it to serve
        # both downstream groupings with one exchange, but it shuffles
        # the RAW 2|E|+|V| vote stream WITHOUT map-side combining and
        # concentrates every hot node's full vote list on one reducer
        # (skew). The two-agg form shuffles partial (node, label) counts
        # instead — far fewer bytes whenever duplicate votes exist in a
        # map partition, which is exactly the hub-heavy case (driver r13:
        # 2.8 -> 4.9s with the repartition; reverted for r14).
        counts = votes.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("__c")
        )
        labels = (
            counts.groupBy("node")
            .agg(
                F.min(F.struct((-F.col("__c")).alias("nc"), "label")).alias(
                    "__best"
                )
            )
            .select("node", F.col("__best.label").alias("label"))
            .localCheckpoint(eager=False)
        )
    return labels
