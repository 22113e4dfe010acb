"""Distributed k-means (Lloyd) over an embedding column — the clustering
step of corpus curation pipelines (topic bucketing, diversity sampling,
IVF coarse-quantizer training; the assignment step is what
``similarity.ivf_top_k`` consumes).

Scale design, per Lloyd iteration:
* assignment — the k centroids collapse to ONE broadcast row carrying
  ``array<struct<cid, c>>``; the argmin is ``array_min`` over a per-row
  ``transform`` — a pure projection with ZERO exchange (deterministic
  tie-break on centroid id via struct order), distances are the
  expression-only ``similarity.dot`` fold — no Python boundary.
  (The dim-unrolled codegen dot chain was A/B-measured 3× WORSE here:
  3 dots × k candidates × 64 dims exceeds whole-stage-codegen limits —
  the same trap recorded on ``semantic_dedup``'s cosine.)
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
  one shuffle (the k×d update partials) and the chain is scheduled as a
  single job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from proxima_platform_spark.functions.similarity import (
    dot,
    sign_lsh_buckets_arrow,
)


def _sq_dist(v: Column, c: Column) -> Column:
    """||v-c||² via the 3-dot expansion ``v·v - 2·v·c + c·c`` — the exact
    association order is mirrored in the SQL oracle, keeping doubles
    bit-identical across engines."""
    return dot(v, v) - F.lit(2.0) * dot(v, c) + dot(c, c)


def kmeans_assign(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: ``vecs(id_col…, v)`` × broadcast
    centroid ARRAY → one row per vector with ``cid`` and ``d2``.
    Ties break on the lower centroid id (total order → deterministic).

    The k centroids are collapsed to ONE broadcast row carrying
    ``array<struct<cid, c>>`` and the argmin is ``array_min`` over a
    per-row ``transform`` — a pure projection, so assignment ships ZERO
    bytes through an exchange. The previous formulation (k-row broadcast
    crossJoin + ``min(struct(d2, cid))`` groupBy) was algebraically
    identical but re-shuffled the full vector frame once per assignment:
    vec_ids are already unique per row, so its map-side combine reduced
    nothing and the exchange carried every vector verbatim. struct
    comparison (d2, then cid) is the same total order in both forms —
    bit-identical output (A/B-verified). An empty centroid frame yields
    a NULL argmin; the filter reproduces the old empty-join result.

    The argmin struct is routed through a single-element explode so the
    distance chain evaluates ONCE per row — extracting ``cid``/``d2``
    straight off the expression re-evaluates the whole ``array_min``
    per referenced field under projection collapsing (the r07 trap)."""
    carr = centroids.agg(F.collect_list(F.struct("cid", "c")).alias("__cs"))
    m = F.array_min(
        F.transform(
            F.col("__cs"),
            lambda s: F.struct(
                _sq_dist(F.col("v"), s["c"]).alias("d2"),
                s["cid"].alias("cid"),
            ),
        )
    )
    return (
        vecs.crossJoin(F.broadcast(carr))
        .select("vec_id", "v", F.explode(F.array(m)).alias("__m"))
        .select(
            "vec_id",
            F.col("__m.cid").alias("cid"),
            F.col("__m.d2").alias("d2"),
            "v",
        )
        .where(F.col("cid").isNotNull())
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
    keep: str = "min_id",
    max_cluster_rows: int | None = None,
    num_planes: int = 8,
    num_tables: int = 2,
) -> DataFrame:
    """Embedding-level semantic deduplication — the SemDeDup shape
    (public recipe: cluster the embedding space, then near-dup only
    WITHIN each cluster): :func:`kmeans_lloyd` assigns clusters, exact
    cosine runs over intra-cluster pairs only, and a vector is dropped
    when a HIGHER-priority vector in its cluster exceeds the threshold.

    Verdicts are PAIRWISE, not greedy-transitive: ANY higher-priority
    near-dup condemns, including one that is itself condemned. With
    A~B, B~C, A!~C the kept set here is {A} — the cited SemDeDup
    keep-first greedy (which skips condemned rows as condemners and
    would keep {A, C}) is deliberately NOT implemented, because the
    pairwise rule is a per-pair predicate (order-independent, exactly
    replayable by a SQL oracle, and parallelizable over row blocks)
    while kept-only greedy is an inherently sequential scan per
    cluster. Downstreams wanting more survivors re-run the operator on
    the kept set (condemned rows gone → their transitive victims
    return), which converges to the greedy fixpoint in practice.

    ``keep`` selects the priority order — which member of a near-dup
    pair survives:

      * ``"min_id"`` (default): lowest id wins — the same winner rule as
        the exact ``embedding_near_dup_pairs`` consumers;
      * ``"far_centroid"``: larger kmeans d² wins (vec_id tiebreak) —
        the SemDeDup paper's policy (keep the example FARTHEST from its
        centroid for diversity);
      * ``"near_centroid"``: smaller d² wins — the prototypical-example
        policy.

    Returns one row per vector: ``(vec_id, cluster, kept, n_near,
    max_cos)`` — ``n_near``/``max_cos`` describe the lower-id near-dups
    that condemned it (0 / -2.0 sentinel when kept).

    Cosines are computed on micro-quantized vectors (``floor(x·10⁶)``
    int64 fixed point): the per-cluster Gram product then runs as an
    EXACT integer matmul — order-independent, bit-reproducible, and
    BLAS-fast — and the double cosine derived from those integers is
    bit-identical in any engine (the ``embedding_covariance`` /
    ``sign_lsh`` parity technique). Quantization shifts a cosine by
    O(10⁻⁶) — far below any dedup threshold's meaningful resolution. The
    expression-form alternative (64-term unrolled dot in the join stage)
    measured 20µs/pair: the chain exceeds whole-stage-codegen limits and
    silently drops the stage to interpreted mode.

    Scale design (100 TB): the pair space is bounded PER CLUSTER — the
    self-join is an equi-join on cluster id, never a cross product across
    clusters, so candidate volume is Σ nᵢ² over cluster sizes instead of
    n². Production sizing picks k ∝ n (SemDeDup runs ~10⁵ clusters over
    ~10⁸ docs keeping clusters ~10³). ``max_cluster_rows`` ENFORCES the
    bound for skewed clusterings: any cluster larger than the bound is
    sub-keyed by its rows' sign-LSH buckets (``sign_lsh_buckets_arrow``,
    ``num_tables`` tables of ``num_planes`` planes — the
    ``embedding_near_dup_pairs`` family), so one applyInPandas group is
    (cid, table, bucket) ≈ nᵢ/2^planes rows instead of the whole
    cluster, at the standard LSH recall tradeoff (cross-bucket pairs in
    oversized clusters are missed; identical/near-identical vectors
    share buckets and are always found). Pairs found in several tables
    are de-duplicated before the verdict agg — the integer cosine is
    bit-identical across tables, so the distinct is exact. k-means
    itself is the two shuffles/iteration documented on
    :func:`kmeans_lloyd`; everything downstream is one equi-join + one
    per-key agg + one left join."""
    import numpy as np
    import pandas as pd

    if keep not in ("min_id", "far_centroid", "near_centroid"):
        raise ValueError(f"unknown keep policy {keep!r}")
    assigned = kmeans_lloyd(emb, id_col=id_col, vec_col=vec_col, k=k, iters=iters)
    vecs = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    # staged ONCE via an eager localCheckpoint: the scorer and the verdict
    # frame both scan this frame — without the materialization the whole
    # kmeans chain re-executes per consumer (alias-renamed sides
    # canonicalize differently, no ReusedExchange; measured ~3x).
    # localCheckpoint (the kmeans/pagerank/bpe_learn handoff pattern)
    # rather than persist(): it truncates the plan, so repeated calls
    # don't pollute the CacheManager with deep kmeans plans whose
    # canonicalized-lookup cost grows with every cached entry (measured:
    # 3.3s → 12.9s per call by the third persist()-based invocation in
    # one session).
    av = (
        assigned.join(vecs, "vec_id")
        .select("vec_id", "cid", "d2", "v")
        .localCheckpoint()
    )

    scale = 1_000_000

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64"),
                              "cos": pd.Series(dtype="float64")})
        if len(pdf) < 2:
            return empty
        # priority-sorted: row i condemns row j>i on a near-dup hit, so
        # sorting BY the keep policy makes the same block loop implement
        # every policy (total order → deterministic winners)
        if keep == "min_id":
            pdf = pdf.sort_values("vec_id")
        elif keep == "far_centroid":
            pdf = pdf.sort_values(["d2", "vec_id"], ascending=[False, True])
        else:  # near_centroid
            pdf = pdf.sort_values(["d2", "vec_id"], ascending=[True, True])
        ids = pdf["vec_id"].to_numpy()
        Q = np.floor(
            np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]]) * scale
        ).astype(np.int64)
        d = Q.shape[1]
        qmax = int(np.abs(Q).max()) if Q.size else 0
        # loud overflow guard (the embedding_covariance contract): the
        # int64 Gram product is exact only while dim·max|q|² < 2^62
        if qmax and d * qmax * qmax >= 2**62:
            raise ValueError(
                f"semantic_dedup: |value|*{scale} up to {qmax} over dim {d} "
                "overflows the int64 Gram accumulation; normalize the "
                "embeddings or lower the fixed-point scale"
            )
        rn = np.sqrt((Q * Q).sum(axis=1).astype(np.float64))
        out_a, out_ids, out_cos = [], [], []
        B = 1024  # row blocks bound the transient Gram slab to B×n
        col = np.arange(len(ids))
        with np.errstate(divide="ignore", invalid="ignore"):
            for s in range(0, len(ids), B):
                e = min(s + B, len(ids))
                Gb = Q[s:e] @ Q.T  # exact int64
                cb = Gb.astype(np.float64) / (rn[s:e, None] * rn[None, :])
                for bi in range(e - s):
                    i = s + bi
                    m = (col > i) & (rn > 0) & (rn[i] > 0) & (cb[bi] > threshold)
                    if m.any():
                        out_a.extend([int(ids[i])] * int(m.sum()))
                        out_ids.extend(ids[m].tolist())
                        out_cos.extend(cb[bi][m].tolist())
        if not out_ids:
            return empty
        return pd.DataFrame({"id_a": np.asarray(out_a, dtype=np.int64),
                             "id_b": np.asarray(out_ids, dtype=np.int64),
                             "cos": np.asarray(out_cos, dtype=np.float64)})

    pair_schema = "id_a long, id_b long, cos double"
    if max_cluster_rows is None:
        scored = av.groupBy("cid").applyInPandas(score, pair_schema)
    else:
        # enforce the per-group bound: oversized clusters are sub-keyed by
        # sign-LSH bucket so no applyInPandas group exceeds ~n_i/2^planes
        # rows (see docstring for the recall contract)
        sizes = av.groupBy("cid").agg(F.count(F.lit(1)).alias("__n"))
        sized = av.join(F.broadcast(sizes), "cid")  # k rows — broadcast
        small = sized.where(F.col("__n") <= max_cluster_rows).drop("__n")
        big = sized.where(F.col("__n") > max_cluster_rows).drop("__n")
        bucketed = sign_lsh_buckets_arrow(
            big, vec_col="v", num_planes=num_planes, num_tables=num_tables
        )
        tb = F.array(*[
            F.struct(F.lit(t).alias("t"), F.col(f"__b{t}").alias("b"))
            for t in range(num_tables)
        ])
        big_groups = bucketed.select(
            "vec_id", "cid", "d2", "v", F.explode(tb).alias("__tb")
        ).select(
            "vec_id", "cid", "d2", "v",
            F.col("__tb.t").alias("__t"), F.col("__tb.b").alias("__bkt"),
        )
        scored = (
            small.groupBy("cid").applyInPandas(score, pair_schema)
            .unionByName(
                big_groups.groupBy("cid", "__t", "__bkt")
                .applyInPandas(score, pair_schema)
            )
            # a pair found in several tables carries a bit-identical
            # integer cosine → distinct on all three columns is exact
            .dropDuplicates(["id_a", "id_b"])
        )
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
