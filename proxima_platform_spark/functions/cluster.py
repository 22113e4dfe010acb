"""Distributed k-means (Lloyd) over an embedding column — the clustering
step of corpus curation pipelines (topic bucketing, diversity sampling,
IVF coarse-quantizer training; the assignment step is what
``similarity.ivf_top_k`` consumes).

Scale design, per Lloyd iteration:
* assignment — centroids are a k-row frame BROADCAST into a crossJoin
  (k ≪ partitions; the k× row blow-up is filtered to 1 per vector by a
  map-side-combined ``min(struct(d2, cid))`` argmin, deterministic
  tie-break on centroid id), distances are the expression-only
  ``similarity.dot`` fold — no Python boundary, whole-stage codegen.
* update — ``posexplode`` to (cluster, dim) pairs and a map-side-combined
  decimal-sum aggregate: one shuffle of k×d tiny partial rows per
  executor, never a per-cluster vector buffer. Decimal accumulation makes
  the new centroids ORDER-INDEPENDENT (bit-identical however Spark
  schedules the partials) — the same exactness trick as the engine's
  decimal window sums, and what lets a DuckDB oracle replay the whole
  iteration chain hash-identically.
* the loop builds ONE lazy plan (no driver materialization between
  iterations); iteration count is fixed by the caller, so there is no
  driver-synchronized convergence barrier — at 100 TB each iteration is
  two shuffles and the chain is scheduled as a single job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from proxima_platform_spark.functions.similarity import dot


def _sq_dist(v: Column, c: Column) -> Column:
    """||v-c||² via the 3-dot expansion ``v·v - 2·v·c + c·c`` — the exact
    association order is mirrored in the SQL oracle, keeping doubles
    bit-identical across engines."""
    return dot(v, v) - F.lit(2.0) * dot(v, c) + dot(c, c)


def kmeans_assign(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: ``vecs(id_col…, v)`` × broadcast
    ``centroids(cid, c)`` → one row per vector with ``cid`` and ``d2``.
    Ties break on the lower centroid id (total order → deterministic).

    The argmin is ``min(struct(d2, cid))`` — an algebraic aggregate, so the
    k candidate rows (all produced in the vector's own partition by the
    broadcast crossJoin) collapse map-side to ONE row per vector before any
    exchange. A row_number window here would instead shuffle and sort all
    k·n scored rows. ``first(v)`` is deterministic: every candidate row of
    a vec_id carries the identical vector."""
    scored = vecs.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "v",
        F.struct(_sq_dist(F.col("v"), F.col("c")).alias("d2"), "cid").alias("__sc"),
    )
    return scored.groupBy("vec_id").agg(
        F.min("__sc").alias("__m"), F.first("v").alias("v")
    ).select(
        "vec_id", F.col("__m.cid").alias("cid"), F.col("__m.d2").alias("d2"), "v"
    )


def _update_centroids(assigned: DataFrame) -> DataFrame:
    """New centroid = per-dimension mean of the assigned vectors, decimal
    sums for order independence. Clusters that lost all members drop out
    (standard Lloyd on fixed data — both engines agree)."""
    return (
        assigned.select("cid", F.posexplode("v").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(28,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("cv")
        )
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                lambda s: s.cv,
            ).alias("c")
        )
    )


def semantic_dedup(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.9,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-level semantic deduplication — the SemDeDup shape
    (public recipe: cluster the embedding space, then near-dup only
    WITHIN each cluster): :func:`kmeans_lloyd` assigns clusters, exact
    cosine runs over intra-cluster pairs only, and a vector is dropped
    when a LOWER-id vector in its cluster exceeds the threshold (greedy
    keep-first — deterministic, and the same winner rule as the exact
    ``embedding_near_dup_pairs`` consumers).

    Returns one row per vector: ``(vec_id, cluster, kept, n_near,
    max_cos)`` — ``n_near``/``max_cos`` describe the lower-id near-dups
    that condemned it (0 / -2.0 sentinel when kept).

    Scale design (100 TB): the pair space is bounded PER CLUSTER — the
    self-join is an equi-join on cluster id, never a cross product across
    clusters, so candidate volume is Σ nᵢ² over cluster sizes instead of
    n². Production sizing picks k ∝ n (SemDeDup runs ~10⁵ clusters over
    ~10⁸ docs keeping clusters ~10³); for clusters still too large,
    ``embedding_near_dup_pairs``' sign-LSH bucketing composes INSIDE a
    cluster by keying on (cluster, bucket). k-means itself is the two
    shuffles/iteration documented on :func:`kmeans_lloyd`; everything
    downstream is one equi-join + one per-key agg + one left join."""
    from proxima_platform_spark.functions.similarity import cosine_similarity

    assigned = kmeans_lloyd(emb, id_col=id_col, vec_col=vec_col, k=k, iters=iters)
    vecs = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    av = assigned.join(vecs, "vec_id").select("vec_id", "cid", "v")
    a = av.select(
        F.col("vec_id").alias("id_a"), "cid", F.col("v").alias("__va")
    )
    b = av.select(
        F.col("vec_id").alias("id_b"), "cid", F.col("v").alias("__vb")
    )
    pairs = a.join(b, "cid").where(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_b",
        cosine_similarity(F.col("__va"), F.col("__vb"), dim=dim).alias("cos"),
    ).where(F.col("cos") > threshold)
    condemned = scored.groupBy("id_b").agg(
        F.count(F.lit(1)).alias("n_near"), F.max("cos").alias("max_cos")
    )
    return av.join(condemned, av["vec_id"] == condemned["id_b"], "left").select(
        "vec_id",
        F.col("cid").alias("cluster"),
        F.col("id_b").isNull().alias("kept"),
        F.coalesce("n_near", F.lit(0)).alias("n_near"),
        F.round(F.coalesce("max_cos", F.lit(-2.0)), 6).alias("max_cos"),
    )


def kmeans_lloyd(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """``iters`` Lloyd iterations from the deterministic seed ``id < k``
    (callers wanting k-means|| style seeding pass their own frame through
    ``kmeans_assign`` directly). Returns the final assignment:
    ``(vec_id, cid, d2)`` per vector."""
    vecs = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    cent = vecs.where(F.col("vec_id") < k).select(
        F.col("vec_id").cast("long").alias("cid"), F.col("v").alias("c")
    )
    for _ in range(iters):
        cent = _update_centroids(kmeans_assign(vecs, cent))
    return kmeans_assign(vecs, cent).select("vec_id", "cid", "d2")
