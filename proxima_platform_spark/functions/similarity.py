"""Vector similarity / ANN over embedding columns (array<float>).

Extensions beyond the reference surface (north star). Two tiers:

  * brute-force cosine top-k — one projection + one top-k; fine up to ~10⁷
    vectors per query batch. Expression-only (zip_with/aggregate), JVM-side.
  * LSH-bucketed ANN (random hyperplane / sign-LSH) — the scale path:
    vectors hash to ``num_planes``-bit buckets; candidates come from one
    bucket-equi-join instead of a full cross product. Deterministic planes
    derived from md5 of (plane, dim) so results are reproducible without a
    shared RNG.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot_sql(a_sql: str, b_sql: str, dim: int) -> str:
    """The unrolled multiply-add chain as SQL text. Token-for-token the
    Column-loop form (same element_at/cast placement, same left-assoc sum
    — SQL `+` parses left-associative, matching the loop's accumulator),
    so the doubles are bit-equal; built as ONE string because the Column
    loop costs ~5 py4j round-trips per dimension — ~0.9s of pure driver
    time at dim=64, paid per query build (r13; the bench rebuilds fresh
    each run)."""
    return " + ".join(
        f"(CAST(element_at({a_sql}, {d + 1}) AS DOUBLE)"
        f" * CAST(element_at({b_sql}, {d + 1}) AS DOUBLE))"
        for d in range(dim)
    )


def dot(a: Column | str, b: Column | str, *, dim: int | None = None) -> Column:
    """Sequential-order dot product. With ``dim`` known, unrolls to a flat
    multiply-add chain that whole-stage-codegen compiles (the aggregate
    form runs in *interpreted* lambdas, ~20× slower); the left-to-right
    order is identical either way, so the doubles are bit-equal. Pass the
    operands as SQL text (backtick-quoted names) WITH ``dim`` to build the
    unrolled chain in one F.expr call instead of ~5 py4j round-trips per
    dimension (see ``_dot_sql``)."""
    if isinstance(a, str) or isinstance(b, str):
        # the SQL-text fast path needs BOTH operands as SQL text: a mixed
        # call would interpolate str(Column) ("Column<'x'>") into the SQL
        # string and fail with a confusing AnalysisException far from the
        # call site (ADVICE r13)
        if not (isinstance(a, str) and isinstance(b, str)):
            raise TypeError(
                "dot: mixed Column/str operands — pass both as SQL text"
                " (backtick-quoted names) or both as Columns"
            )
        if dim is None:
            raise ValueError("SQL-text operands require dim")
        return F.expr(_dot_sql(a, b, dim))
    if dim is not None:
        out = None
        for d in range(dim):
            t = F.element_at(a, d + 1).cast("double") * F.element_at(b, d + 1).cast("double")
            out = t if out is None else out + t
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str, *, dim: int | None = None) -> Column:
    if isinstance(a, str):
        if dim is None:
            raise ValueError("SQL-text operand requires dim")
        return F.expr(f"SQRT({_dot_sql(a, a, dim)})")
    if dim is not None:
        out = None
        for d in range(dim):
            x = F.element_at(a, d + 1).cast("double")
            t = x * x
            out = t if out is None else out + t
        return F.sqrt(out)
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity(
    a: Column | str, b: Column | str, *, dim: int | None = None
) -> Column:
    if isinstance(a, str) or isinstance(b, str):
        if not (isinstance(a, str) and isinstance(b, str)):
            raise TypeError(
                "cosine_similarity: mixed Column/str operands — pass both"
                " as SQL text (backtick-quoted names) or both as Columns"
            )
        if dim is None:
            raise ValueError("SQL-text operands require dim")
        denom = f"(SQRT({_dot_sql(a, a, dim)}) * SQRT({_dot_sql(b, b, dim)}))"
        return F.expr(
            f"CASE WHEN {denom} > 0"
            f" THEN ({_dot_sql(a, b, dim)}) / {denom}"
            f" ELSE 0.0D END"
        )
    denom = l2_norm(a, dim=dim) * l2_norm(b, dim=dim)
    return F.when(denom > 0, dot(a, b, dim=dim) / denom).otherwise(F.lit(0.0))


def brute_force_top_k(
    embeddings: DataFrame,
    query_vec: list[float],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k against one query vector.

    The broadcast-side is a literal array; the scan is a single projection +
    TakeOrderedAndProject (no shuffle of the full table).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def _plane_component(plane: int, dim: Column) -> Column:
    """Deterministic pseudo-gaussian plane component in [-0.5, 0.5): derived
    from md5(plane, dim) — reproducible across engines and runs."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(",", F.lit(str(plane)), dim.cast("string"))), 1, 8),
        16,
        10,
    ).cast("double")
    return h / F.lit(float(16**8)) - 0.5


def sign_lsh_bucket(
    vec: Column, *, num_planes: int = 8, plane_offset: int = 0
) -> Column:
    """Random-hyperplane LSH bucket id (bigint in [0, 2^num_planes)).

    ``plane_offset`` selects an independent plane set (table t passes
    t·num_planes) — the multi-table LSH recall knob: each table is an
    independent 2^k-bucket partition, and candidates union across tables.

    Expression form (interpreted higher-order lambdas): right for
    query-sized inputs (ann_lsh_topk). For corpus-sized bucket assignment
    use ``sign_lsh_buckets_arrow`` — its integer-exact plane family is
    order-independent and vectorizes."""
    dims = F.sequence(F.lit(0), F.size(vec) - 1)

    def component_fn(p: int):
        # closure factory (a `pp=p` default would break zip_with's arity check)
        return lambda x, i: x.cast("double") * _plane_component(p, i)

    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        proj = F.aggregate(
            F.zip_with(vec, dims, component_fn(plane_offset + p)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(2**p).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_top_k(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    k: int = 10,
    num_planes: int = 8,
    num_tables: int = 1,
) -> DataFrame:
    """Approximate top-k for a *set* of query vectors: bucket-equi-join on the
    sign-LSH bucket, exact cosine within the bucket, per-query top-k.

    At 100 TB this is the right shape: both sides hash-partition on bucket,
    no cross product, and the per-query top-k is a windowed rank over the
    joined (small) candidate set. Recall is tunable via num_planes and
    ``num_tables`` (independent plane sets whose candidates union — the
    standard L-tables LSH knob; duplicate candidates collapse in the
    DISTINCT before ranking).
    """
    def with_buckets(df, idc, vc, alias_vec=None):
        sel = [F.col(idc)] + ([F.col(vc).alias(alias_vec)] if alias_vec else [F.col(vc)])
        vec = F.col(vc)
        tb = F.array(*[
            F.struct(
                F.lit(t).alias("t"),
                sign_lsh_bucket(
                    vec, num_planes=num_planes, plane_offset=t * num_planes
                ).alias("b"),
            )
            for t in range(num_tables)
        ])
        out_names = [idc] + [alias_vec or vc]
        return df.select(*sel, F.explode(tb).alias("__tb")).select(
            *out_names, F.col("__tb.t").alias("__t"), F.col("__tb.b").alias("bucket")
        )

    base = with_buckets(embeddings, id_col, vec_col)
    qs = with_buckets(queries, query_id_col, query_vec_col, alias_vec="__qvec")
    joined = base.join(qs, on=["__t", "bucket"]).select(
        query_id_col,
        id_col,
        F.round(cosine_similarity(F.col(vec_col), F.col("__qvec")), 6).alias("cosine"),
    )
    if num_tables > 1:
        joined = joined.distinct()
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop("rank")
    )


def _centroid_dist_sql(vec_sql: str, cvec: list[float]) -> str:
    """One centroid's squared-L2 distance as SQL text. The expression is
    token-for-token the old Column-API form (zip_with + aggregate, same
    cast placement, same IEEE op order — results bit-identical); it is
    BUILT as one string because the Column form cost one py4j round-trip
    per literal — n_centroids x dim x 2 JVM calls ≈ 1.5s of pure driver
    time per ivfpq build at 8x64 (r13; the bench rebuilds per run).
    Components render as CAST('<repr>' AS DOUBLE): repr round-trips the
    Python float exactly and string→double is correctly rounded, so the
    parsed literal is the same double F.lit produced."""
    lits = ",".join(f"CAST('{x!r}' AS DOUBLE)" for x in cvec)
    return (
        f"aggregate(zip_with({vec_sql}, array({lits}),"
        f" (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
        f" 0.0D, (acc, x) -> acc + x)"
    )


def _centroid_assignment(
    vec_sql: str, centroids: list[tuple[int, list[float]]]
) -> Column:
    """array_min over (squared-distance, centroid_id) structs → nearest
    centroid id. Expression-only: each distance is one zip_with/aggregate
    against a literal centroid array, so assignment runs inside codegen.
    ``vec_sql`` is the vector column as SQL text (backtick-quoted name)."""
    pairs = ",".join(
        f"named_struct('d', {_centroid_dist_sql(vec_sql, cvec)}, 'c', {cid})"
        for cid, cvec in centroids
    )
    return F.expr(f"array_min(array({pairs})).c")


def _probe_assignments(
    vec_sql: str, centroids: list[tuple[int, list[float]]], n_probe: int
) -> Column:
    """The n_probe nearest centroid ids (array_sort on (dist, id) structs)."""
    pairs = ",".join(
        f"named_struct('d', {_centroid_dist_sql(vec_sql, cvec)}, 'c', {cid})"
        for cid, cvec in centroids
    )
    return F.expr(
        f"transform(slice(array_sort(array({pairs})), 1, {n_probe}), s -> s.c)"
    )


def ivf_top_k(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-flat approximate top-k: the second scale path next to sign-LSH.

    Centroids are a deterministic sample of the corpus (the ``n_centroids``
    vectors minimizing md5(id) — a fixed pseudo-random draw; production
    systems would run a few Lloyd iterations, which only changes the
    centroid list handed to the same plan). Every vector assigns to its
    nearest centroid (partition-pruned inverted lists); each query probes
    its ``n_probe`` nearest cells, computes exact cosine inside them, and
    takes per-query top-k.

    100 TB shape: one tiny driver-side sample, one hash-partitioned
    equi-join on cell id (candidates ≈ corpus × n_probe/n_centroids, never
    a cross product), one windowed rank. Recall is tuned by n_probe, the
    same knob as FAISS IVF.
    """
    sampled = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(n_centroids)
        .collect()  # bounded: n_centroids rows — centroid "training" output
    )
    centroids = [(i, list(r[vec_col])) for i, r in enumerate(sampled)]

    base = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        _centroid_assignment(f"`{vec_col}`", centroids).alias("cell"),
    )
    probes = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col).alias("__qvec"),
        F.explode(
            _probe_assignments(f"`{query_vec_col}`", centroids, n_probe)
        ).alias("cell"),
    )
    joined = base.join(probes, on="cell").select(
        query_id_col,
        id_col,
        F.round(cosine_similarity(F.col(vec_col), F.col("__qvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop("rank")
    )


def _pq_arrow_stages(
    pre: DataFrame,
    probes_pre: DataFrame,
    id_col: str,
    query_id_col: str,
    codebooks,
    m: int,
    dsub: int,
):
    """Arrow-batched PQ encode + ADC-table stages, bit-identical to the
    expression twin in :func:`ivfpq_top_k` (int64 squared distances,
    ``np.argmin``'s first-index tie-break == ``array_position(array_min)``).

    The expression form embeds an m×ks×dsub literal codebook per call
    site; at m=16/ks=64 Catalyst analysis alone costs ~40 s. Here the
    codebook ships once in the task closure (m·ks·dsub int64 ≈ 32 KB at
    the defaults) and the per-batch work is one broadcast-subtract —
    (batch, m, 1, dsub) − (1, m, ks, dsub) — squared and summed, all
    int64. Overflow is guarded loudly: the ADC score sums m subspace
    distances, so the guard is m·dsub·(|q|max+|c|max)² < 2⁶³ (numpy
    int64 would WRAP silently, not raise) — same contract family as
    the Gram probes in functions/dedup.py.
    """
    import numpy as np
    from pyspark.sql import types as T

    cb = np.asarray(codebooks, dtype=np.int64)  # (m, ks, dsub)
    cmax = int(np.abs(cb).max()) if cb.size else 0

    def _stack(col) -> "np.ndarray":
        return np.asarray(
            [np.asarray(v, dtype=np.int64) for v in col], dtype=np.int64
        )

    def _dists(Q: "np.ndarray") -> "np.ndarray":
        qmax = int(np.abs(Q).max()) if Q.size else 0
        # the ADC score is a sum of m subspace distances — bound the SUM
        if m * dsub * (qmax + cmax) ** 2 >= 2**63:
            raise ValueError(
                f"PQ distance overflow risk: m={m} dsub={dsub} qmax={qmax} "
                f"cmax={cmax} exceeds the int64 budget — lower `scale`"
            )
        sub = Q.reshape(len(Q), m, 1, dsub)
        diff = sub - cb[None, :, :, :]
        return (diff * diff).sum(axis=3)  # (n, m, ks) int64-exact

    pre_schema = pre.schema
    code_schema = T.StructType(
        [pre_schema[id_col], pre_schema["cell"]]
        + [T.StructField(f"__code{s}", T.IntegerType(), False) for s in range(m)]
    )

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            d = _dists(_stack(pdf["__qv"]))
            out = {id_col: pdf[id_col], "cell": pdf["cell"]}
            codes = d.argmin(axis=2).astype(np.int32)  # first-index ties
            for s in range(m):
                out[f"__code{s}"] = codes[:, s]
            yield pd.DataFrame(out)

    probes_schema = probes_pre.schema
    qtab_schema = T.StructType(
        [probes_schema[query_id_col], probes_schema["cell"]]
        + [
            T.StructField(f"__qtab{s}", T.ArrayType(T.LongType()), False)
            for s in range(m)
        ]
    )

    def qtabs(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            d = _dists(_stack(pdf["__qq"]))
            out = {query_id_col: pdf[query_id_col], "cell": pdf["cell"]}
            for s in range(m):
                out[f"__qtab{s}"] = list(d[:, s, :])
            yield pd.DataFrame(out)

    return (
        pre.mapInPandas(encode, code_schema),
        probes_pre.mapInPandas(qtabs, qtab_schema),
    )


def ivfpq_top_k(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 4,
    m: int = 16,
    ks: int = 64,
    shortlist: int = 50,
    train_iters: int = 0,
    scale: int = 1_000_000,
    use_arrow: bool = True,
) -> DataFrame:
    """IVF-PQ approximate top-k with exact-rescore refine — the index
    shape that FITS at 10⁹–10¹¹ vectors, where IVF-flat's uncompressed
    floats don't (VERDICT r07 'Next round' #3).

    **Memory math** (the point of PQ): a 64-dim float32 vector is 256 B;
    its PQ code is ``m`` sub-quantizer indices — at m=16, ks=64 that is
    16 B/vector (6 bits each, byte-aligned), a 16× compression. At 10¹⁰
    vectors: 2.56 TB of floats vs 160 GB of codes + a codebook of
    m·ks·(dim/m) ints (64 KB) broadcast to every executor. Candidate
    scoring never touches the original vectors; only the
    ``shortlist``-sized refine stage fetches them back (a broadcast
    equi-join point-lookup, queries × shortlist rows).

    Pipeline (all replayable bit-for-bit by a SQL oracle):

      1. coarse quantizer: ``n_centroids`` md5-ordered sample vectors
         (the :func:`ivf_top_k` recipe); every vector assigns to its
         argmin-L2 cell, queries probe ``n_probe`` cells.
      2. product quantizer: ``ks`` codewords per subspace from an
         md5('pq|id')-ordered sample (decorrelated from the coarse
         draw), components quantized to ``floor(x·scale)`` int64 —
         codebooks, codes, and ADC tables are EXACT INTEGER arithmetic,
         so both engines agree to the last bit (the
         ``quantize_embeddings`` fixed-point recipe generalized).
         ``train_iters`` > 0 runs per-subspace integer Lloyd refinement
         (distributed assign + floor-mean update — ``kmeans_lloyd``'s
         loop on subvectors); measured on the 500×64 fixture the refine
         stage moves recall@10 by < 0.02 once the rescore stage is on,
         so the declared query keeps train_iters=0 and the knob is for
         real corpora whose subspace marginals are less uniform.
      3. encode: per subspace the code is the first-index argmin of the
         squared int64 distance to the ks codewords. Two bit-identical
         implementations, chosen by ``use_arrow``: the default Arrow
         stage (one ``mapInPandas`` batch matmul-free broadcast-subtract
         per batch — ``np.argmin`` shares the first-index tie-break) and
         the expression twin (``array_position(dists, array_min(dists))
         - 1`` over a ``transform`` against the 2-D literal codebook).
         The expression form embeds m·ks·dsub literals per call site and
         Catalyst spends ~40 s ANALYZING the tree at m=16/ks=64 — the
         Arrow stage's plan is O(columns), which is why it is the
         default (measured 37 s → ~4 s warm end-to-end at sf0.1);
         ``tests/test_similarity.py`` pins both paths row-identical.
      4. ADC: per query an m×ks integer distance table (same transform),
         per candidate the approx distance is m ``element_at`` lookups
         summed — int64-exact, no float drift.
      5. refine: the ``shortlist`` best ADC candidates per query join
         BACK to the embedding table (broadcast — queries×shortlist
         rows) for exact cosine; final top-k by (cosine desc, id asc).

    100 TB shape: one bounded driver collect (n_centroids + ks rows),
    one hash-partitioned equi-join on cell id (candidates ≈ corpus ×
    n_probe/n_centroids), two windows over candidate/shortlist frames
    keyed per query, one broadcast refine join. Recall on the sf0.01
    fixture (500 unit-norm vectors, 5 queries): 0.66 @ k=10 vs the
    brute-force oracle — bounded by the probe-4-of-8 IVF ceiling
    (0.68); production deployments raise n_centroids with Lloyd-trained
    coarse centroids, the same knob FAISS exposes.
    """
    dim_row = embeddings.select(
        F.size(F.col(vec_col)).alias("d")
    ).first()
    dim = dim_row.d if dim_row else 0
    if dim == 0 or dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    dsub = dim // m

    coarse = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(n_centroids)
        .collect()  # bounded: n_centroids rows
    )
    centroids = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(coarse)]
    cw_rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.md5(F.concat(F.lit("pq|"), F.col(id_col).cast("string"))))
        .limit(ks)
        .collect()  # bounded: ks rows
    )
    import math as _math

    # codebooks[s][j] = int64-quantized codeword (dsub components)
    codebooks = [
        [
            [
                _math.floor(float(r[vec_col][s * dsub + d]) * scale)
                for d in range(dsub)
            ]
            for r in cw_rows
        ]
        for s in range(m)
    ]

    qv_expr = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long"),
    )

    if train_iters > 0:
        # per-subspace integer Lloyd: distributed assign + floor-mean
        # update; codebook stays ks rows per subspace, driver-bounded
        subs = embeddings.select(
            qv_expr.alias("__qv")
        ).select(
            *[
                F.slice("__qv", s * dsub + 1, dsub).alias(f"__s{s}")
                for s in range(m)
            ]
        ).localCheckpoint(eager=False)
        for _ in range(train_iters):
            new_books = []
            for s in range(m):
                cw2d = F.array(*[
                    F.array(*[F.lit(int(c)) for c in cb])
                    for cb in codebooks[s]
                ])
                dists = F.transform(
                    cw2d,
                    lambda cw: F.aggregate(
                        F.zip_with(
                            F.col(f"__s{s}"), cw, lambda a, b: (a - b) * (a - b)
                        ),
                        F.lit(0).cast("long"),
                        lambda acc, x: acc + x,
                    ),
                )
                assigned = subs.select(
                    F.col(f"__s{s}").alias("__v"),
                    (F.array_position(dists, F.array_min(dists)) - 1).alias(
                        "__j"
                    ),
                )
                means = (
                    assigned.select(
                        "__j", F.posexplode("__v").alias("__d", "__x")
                    )
                    .groupBy("__j", "__d")
                    .agg(
                        F.floor(
                            F.sum("__x").cast("double") / F.count(F.lit(1))
                        ).alias("__c")
                    )
                    .collect()  # bounded: ks × dsub rows
                )
                book = [list(cb) for cb in codebooks[s]]
                for r in means:
                    book[int(r["__j"])][int(r["__d"])] = int(r["__c"])
                new_books.append(book)
            codebooks = new_books

    def _code_cols(prefix: str):
        cols = []
        for s in range(m):
            cw2d = F.array(*[
                F.array(*[F.lit(int(c)) for c in cb]) for cb in codebooks[s]
            ])
            sub = F.col(f"{prefix}{s}")
            dists = F.transform(
                cw2d,
                lambda cw: F.aggregate(
                    F.zip_with(sub, cw, lambda a, b: (a - b) * (a - b)),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ),
            )
            cols.append(dists)
        return cols

    qq_expr = (
        qv_expr
        if query_vec_col == vec_col
        else F.transform(
            F.col(query_vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast(
                "long"
            ),
        )
    )
    pre = embeddings.select(
        F.col(id_col),
        _centroid_assignment(f"`{vec_col}`", centroids).alias("cell"),
        qv_expr.alias("__qv"),
    )
    probes_pre = queries.select(
        F.col(query_id_col),
        qq_expr.alias("__qq"),
        F.explode(
            _probe_assignments(f"`{query_vec_col}`", centroids, n_probe)
        ).alias("cell"),
    )
    if use_arrow:
        encoded, probes = _pq_arrow_stages(
            pre, probes_pre, id_col, query_id_col, codebooks, m, dsub
        )
    else:
        base = pre.select(
            id_col,
            "cell",
            *[
                F.slice("__qv", s * dsub + 1, dsub).alias(f"__sub{s}")
                for s in range(m)
            ],
        ).localCheckpoint(eager=False)
        dist_arrays = _code_cols("__sub")
        encoded = base.select(
            id_col,
            "cell",
            *[
                (
                    F.array_position(dist_arrays[s], F.array_min(dist_arrays[s]))
                    - 1
                )
                .cast("int")
                .alias(f"__code{s}")
                for s in range(m)
            ],
        )
        probes = probes_pre.select(
            query_id_col,
            "cell",
            *[
                F.slice("__qq", s * dsub + 1, dsub).alias(f"__qsub{s}")
                for s in range(m)
            ],
        )
        qtabs = _code_cols("__qsub")
        probes = probes.select(
            query_id_col,
            "cell",
            *[qtabs[s].alias(f"__qtab{s}") for s in range(m)],
        )

    adc = None
    for s in range(m):
        term = F.element_at(f"__qtab{s}", F.col(f"__code{s}") + 1)
        adc = term if adc is None else adc + term
    cand = encoded.join(probes, "cell").select(
        query_id_col, id_col, adc.alias("adc_dist")
    )
    ws = Window.partitionBy(query_id_col).orderBy("adc_dist", id_col)
    short = (
        cand.withColumn("__r", F.row_number().over(ws))
        .where(F.col("__r") <= shortlist)
        .select(query_id_col, id_col, "adc_dist")
    )
    # refine: exact cosine on the shortlist only (broadcast point-lookup)
    orig = embeddings.select(F.col(id_col), F.col(vec_col).alias("__v"))
    qorig = queries.select(
        F.col(query_id_col), F.col(query_vec_col).alias("__qvec")
    )
    rescored = (
        orig.join(F.broadcast(short), id_col)
        .join(F.broadcast(qorig), query_id_col)
        .select(
            query_id_col,
            id_col,
            "adc_dist",
            # rank on the ROUNDED cosine (the ivf_top_k recipe): 6dp
            # absorbs last-ulp summation drift between engines; ties
            # resolve by id
            F.round(
                cosine_similarity(F.col("__v"), F.col("__qvec")), 6
            ).alias("cosine"),
        )
    )
    wk = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        rescored.withColumn("__r", F.row_number().over(wk))
        .where(F.col("__r") <= k)
        .select(query_id_col, id_col, "adc_dist", "cosine")
    )


def knn_join_lsh(
    embeddings,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    num_planes: int = 8,
    num_tables: int = 2,
    dim: int | None = None,
):
    """Approximate k-nearest-neighbor SELF-join: for EVERY vector, its
    top-k most-cosine-similar bucket mates — the corpus-wide companion to
    the single-query ``ann_*`` operators (retrieval-augmented dataset
    building, nearest-neighbor audit sheets, graph construction).

    Candidates come from the same multi-table sign-LSH bucket equi-joins
    as :func:`proxima_platform_spark.functions.dedup.
    embedding_near_dup_pairs` (never an n² product; recall rises with
    ``num_tables`` at ≈L·n²/2^planes candidate volume); each vector then
    ranks ITS candidates by (cosine desc, neighbor id asc) through one
    per-vector window over the candidate set — the shuffle is bounded by
    candidate volume, not n². Vectors whose buckets hold no other vector
    emit nothing (the documented LSH-recall tradeoff; raise num_tables
    or lower num_planes to tighten).

    Scale knob law (priced in BENCH_SF1.json, ``ann_knn_join@planes11``):
    bucket occupancy is n/2^planes, so hold per-bucket candidate volume
    constant by raising planes with the corpus — planes += log2(growth)
    (10× data → +3 planes ≈ linear wall clock); recover the boundary
    recall the narrower buckets cost via more tables or, cheaper, the
    query-side multi-probe knob (:func:`multiprobe_lsh_top_k`)."""
    from pyspark.sql import Window

    from proxima_platform_spark.functions.dedup import embedding_near_dup_pairs

    # zero-norm vectors have no cosine: drop them up front. Without this
    # the keep-everything threshold exposes an engine asymmetry — Spark's
    # cosine_similarity falls back to 0.0 on a zero denominator while a
    # raw SQL division yields NaN (every other caller thresholds >= 0 and
    # both engines agree to drop; -1.0 keeps the fallback rows)
    nonzero = embeddings.where(
        F.exists(F.col(vec_col), lambda x: x.cast("double") != 0.0)
    )
    pairs = embedding_near_dup_pairs(
        nonzero,
        id_col=id_col,
        vec_col=vec_col,
        # keep EVERY scored candidate (ranking cuts to k): the pair filter
        # is strict (cosine > threshold), so -1.0 would silently drop an
        # exactly-antipodal bucket mate (cosine == -1.0, e.g. v vs -v);
        # any value strictly below -1.0 keeps the contract exact
        threshold=-2.0,
        num_planes=num_planes,
        num_tables=num_tables,
        dim=dim,
    ).localCheckpoint(eager=False)
    # staged once: the directed union references the scored pair frame
    # twice — without the pin the candidate equi-join + cosine + distinct
    # execute per reference (the hard_negative_mining twin)
    directed = pairs.union(
        pairs.select(
            F.col("id_b").alias("id_a"),
            F.col("id_a").alias("id_b"),
            "cosine",
        )
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), F.asc("id_b"))
    return (
        directed.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("id_a").alias(id_col),
            "rank",
            F.col("id_b").alias("nbr"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


def _int_plane_projection(vec: Column, plane: int) -> Column:
    """Exact-integer projection of ``vec`` onto ±1 plane ``plane`` from
    the md5-top-bit family (``_plane_sign``): components fixed-pointed to
    floor(x·10⁶) (exact in doubles), so the sum is an int64 — order-
    independent and bit-identical cross-engine by construction. The
    expression form of ``sign_lsh_buckets_arrow``'s plane math, for
    query-sized inputs."""
    dims = F.sequence(F.lit(0), F.size(vec) - 1)
    sign = lambda i: F.when(  # noqa: E731
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(",", F.lit(str(plane)), i.cast("string"))
                ),
                1,
                1,
            ),
            16,
            10,
        ).cast("int")
        >= 8,
        F.lit(1).cast("long"),
    ).otherwise(F.lit(-1).cast("long"))
    return F.aggregate(
        F.zip_with(
            vec,
            dims,
            lambda x, i: F.floor(x.cast("double") * LSH_FIXED_SCALE).cast(
                "long"
            )
            * sign(i),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def multiprobe_lsh_top_k(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    k: int = 10,
    num_planes: int = 8,
    probes: int = 4,
) -> DataFrame:
    """Multi-probe sign-LSH top-k (Lv et al.'07, restricted to Hamming-1
    perturbations): ONE table, and each query probes its own bucket plus
    the ``probes − 1`` neighbor buckets reached by flipping the planes
    with the smallest |projection| — the bits most likely to be on the
    wrong side of a near-boundary vector.

    Why this beats L-tables LSH at scale: multi-table recall costs L×
    the CORPUS — L bucket assignments, L shuffled copies of every
    vector, L equi-joins. Multi-probe keeps the corpus at exactly one
    bucket per vector (one Arrow assignment pass, one shuffle) and
    spends the recall budget on the QUERY side, which is smaller by
    orders of magnitude; candidate volume per query is ~probes·n/2^planes
    vs L·n/2^planes with L corpus copies. Same recall knob, ~L/probes
    of the corpus cost — this is the knob law ann_knn_join's sf1 ratio
    asks for, applied structurally.

    Exactness: corpus buckets come from ``sign_lsh_buckets_arrow``'s
    integer-exact plane family; query projections replay the identical
    int64 math in expression form (:func:`_int_plane_projection`), so
    bucket ids, flip ORDER (ranked by exact (|proj|, plane) — integer
    compares, no float tie ambiguity) and therefore the candidate set
    are all bit-identical cross-engine. Probe buckets are pairwise
    distinct (bucket ⊕ 2^p), so no candidate dedup pass is needed.

    Output: (query_id, vec_id, cosine round 6), top-k per query by
    (cosine desc, id asc).
    """
    if not 1 <= probes <= num_planes + 1:
        raise ValueError(
            f"probes must lie in [1, num_planes+1], got {probes}"
        )
    base = sign_lsh_buckets_arrow(
        embeddings.select(id_col, vec_col),
        vec_col=vec_col,
        num_planes=num_planes,
        num_tables=1,
    ).withColumnRenamed("__b0", "bucket")

    qvec = F.col(query_vec_col)

    def _build_qside():
        # the three query-side expressions are STATIC templates — pure
        # functions of (query column, num_planes, probes); building them
        # Column-by-Column costs ~7000 py4j round-trips (the P² flip-rank
        # compares dominate), so the built trees are memoized per
        # template key (exprtools; the quality-stack precedent)
        proj_arr = F.array(
            *[
                _int_plane_projection(qvec, p)
                for p in range(num_planes)
            ]
        )
        projs = [F.element_at("__projs", p + 1) for p in range(num_planes)]
        bkt = None
        for p in range(num_planes):
            term = F.when(projs[p] > 0, F.lit(1 << p).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            bkt = term if bkt is None else bkt + term

        def flip_rank(p: int):
            # how many planes q sort strictly before p by (|proj|, index)
            # — pure int64 compares over the materialized projection array
            r = F.lit(0)
            for q in range(num_planes):
                if q == p:
                    continue
                before = (F.abs(projs[q]) < F.abs(projs[p])) | (
                    (F.abs(projs[q]) == F.abs(projs[p])) & F.lit(q < p)
                )
                r = r + F.when(before, 1).otherwise(0)
            return r

        flp = F.array(
            *[
                F.when(
                    flip_rank(p) < probes - 1,
                    F.col("__bucket").bitwiseXOR(F.lit(1 << p).cast("long")),
                )
                for p in range(num_planes)
            ]
        )
        return proj_arr, bkt, flp

    from proxima_platform_spark.exprtools import static_template

    proj_array, bucket, flips = static_template(
        "multiprobe_qside",
        f"{query_vec_col}|{num_planes}|{probes}",
        _build_qside,
    )
    # materialize the P projections ONCE: referenced P² times by the
    # flip-rank expressions, and projection collapsing would otherwise
    # re-evaluate the P dim-length folds per reference (the r07 lesson)
    # — localCheckpoint cuts the lineage
    qp = queries.select(
        F.col(query_id_col),
        qvec.alias("__qvec"),
        proj_array.alias("__projs"),
    ).localCheckpoint(eager=False)
    qb = qp.withColumn("__bucket", bucket).select(
        query_id_col,
        "__qvec",
        F.explode(
            F.concat(
                F.array(F.col("__bucket")),
                F.filter(flips, lambda x: x.isNotNull()),
            )
        ).alias("bucket"),
    )

    num = dot(F.col(vec_col), F.col("__qvec"))
    den = l2_norm(F.col(vec_col)) * l2_norm(F.col("__qvec"))
    joined = base.join(qb, "bucket").select(
        query_id_col,
        id_col,
        F.round(
            F.when(den > 0, num / den).otherwise(F.lit(0.0)), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop("rank")
    )


def quantize_embeddings(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 255,
) -> DataFrame:
    """Per-vector min-max int8 quantization with reconstruction error —
    the storage-side companion of the ANN operators (a 100 TB embedding
    corpus at float32 is 4× the int8 footprint; quantize once, search the
    compact form, rescore survivors at full precision).

    q_i = floor((x_i − min) · levels / (max − min)), dequant x̂_i =
    min + q_i·scale. Pure array expressions (zip-free: one transform +
    one aggregate per vector) — a single codegen projection, no shuffle,
    no Python. Output is scalar per vector (range, checksum of the code
    array, mean squared reconstruction error), hash-comparable across
    engines because every float op is the same IEEE double expression tree.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mn = F.array_min(v)
    mx = F.array_max(v)
    rng = mx - mn
    scale = rng / F.lit(float(levels))
    q = F.when(rng > 0, F.transform(
        v, lambda x: F.floor((x - mn) * F.lit(float(levels)) / rng).cast("long")
    )).otherwise(F.transform(v, lambda x: F.lit(0).cast("long")))
    dequant_sq_err = F.aggregate(
        F.zip_with(v, q, lambda x, c: (x - (mn + c.cast("double") * scale))
                   * (x - (mn + c.cast("double") * scale))),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    n = F.size(v)
    return embeddings.select(
        F.col(id_col),
        F.round(mn, 6).alias("vmin"),
        F.round(mx, 6).alias("vmax"),
        F.aggregate(q, F.lit(0).cast("long"), lambda acc, c: acc + c).alias("q_checksum"),
        F.round(F.when(n > 0, dequant_sq_err / n.cast("double")).otherwise(F.lit(0.0)), 9).alias("mse"),
    )


def quantize_embeddings_arrow(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 255,
) -> DataFrame:
    """Arrow-batched fast path for `quantize_embeddings` — identical output.

    The expression form runs through Spark's *interpreted* higher-order
    lambdas (~0.4 ms/vector); this stage computes the same values at
    ~20 µs/vector and stays narrow (no shuffle). The error accumulation is
    a deliberate sequential left-to-right python-float loop — NOT numpy
    pairwise summation — so the double result is bit-identical to the
    expression form's F.aggregate and the oracle's list_sum. Rounding is
    applied Spark-side after the stage, same as the expression form.
    """
    import math
    from typing import Iterator

    lv = float(levels)

    def quant(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for vid, vec in zip(pdf[id_col], pdf[vec_col]):
                v = [float(x) for x in vec]
                if not v:
                    # match the expression form on empty vectors:
                    # null min/max, zero checksum, 0.0 mse
                    rows.append((vid, None, None, 0, 0.0))
                    continue
                mn, mx = min(v), max(v)
                rng = mx - mn
                if rng > 0:
                    scale = rng / lv
                    checksum, acc = 0, 0.0
                    for x in v:
                        c = math.floor((x - mn) * lv / rng)
                        checksum += c
                        d = x - (mn + c * scale)
                        acc += d * d
                else:
                    checksum, acc = 0, 0.0
                mse = acc / len(v) if v else 0.0
                rows.append((vid, mn, mx, checksum, mse))
            yield pd.DataFrame(
                rows, columns=[id_col, "vmin_raw", "vmax_raw", "q_checksum", "mse_raw"]
            )

    out = embeddings.select(id_col, vec_col).mapInPandas(
        quant,
        schema=f"{id_col} long, vmin_raw double, vmax_raw double, "
        "q_checksum long, mse_raw double",
    )
    return out.select(
        F.col(id_col),
        F.round("vmin_raw", 6).alias("vmin"),
        F.round("vmax_raw", 6).alias("vmax"),
        "q_checksum",
        F.round("mse_raw", 9).alias("mse"),
    )


LSH_FIXED_SCALE = 1_000_000.0


def _plane_sign(plane: int, dim: int) -> int:
    """±1 hyperplane component from the top bit of md5's first hex digit —
    the integer-exact plane family for the Arrow bucket stage."""
    import hashlib

    return 1 if int(hashlib.md5(f"{plane},{dim}".encode()).hexdigest()[0], 16) >= 8 else -1


def sign_lsh_buckets_arrow(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    num_planes: int = 8,
    num_tables: int = 1,
) -> DataFrame:
    """Append per-table sign-LSH bucket columns ``__b0..__b{L-1}`` via one
    Arrow-batched stage — the vectorizable-by-construction bucket family.

    Float hyperplane projections are summation-order-sensitive, which forces
    sequential evaluation (interpreted lambdas or giant codegen trees whose
    Catalyst analysis alone costs seconds per build). This family quantizes
    each component to fixed-point (floor(x·10⁶), exact in doubles) and
    projects onto ±1 planes (md5 top bit), so the projection is an *integer*
    sum — order-independent, overflow-safe (|q| ≤ 2³³ per term, dim ≤ 2²⁸),
    and safely computed with numpy matrix products at full vector speed.
    The DuckDB oracle mirrors it with a list_sum of the same integers.
    Narrow stage: no shuffle, output inherits input partitioning.
    """
    from typing import Iterator

    import numpy as np

    sign_cache: dict[int, "np.ndarray"] = {}

    def stage(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            if pdf.empty:
                out = pdf.copy()
                for t in range(num_tables):
                    out[f"__b{t}"] = pd.Series([], dtype="int64")
                yield out
                continue
            lens = {len(v) for v in pdf[vec_col]}
            if len(lens) != 1:
                raise ValueError(
                    f"sign_lsh_buckets_arrow: mixed vector lengths {sorted(lens)} "
                    f"in one batch — the corpus contract requires a fixed "
                    f"embedding dim"
                )
            vecs = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            n, dim = vecs.shape
            if dim not in sign_cache:
                sign_cache[dim] = np.asarray(
                    [
                        [_plane_sign(p, d) for d in range(dim)]
                        for p in range(num_tables * num_planes)
                    ],
                    dtype=np.int64,
                )
            S = sign_cache[dim]
            q = np.floor(vecs * LSH_FIXED_SCALE).astype(np.int64)
            proj = q @ S.T  # (n, tables*planes) integer — order-independent
            bits = (proj > 0).astype(np.int64)
            weights = np.asarray([1 << p for p in range(num_planes)], dtype=np.int64)
            out = pdf.copy()
            for t in range(num_tables):
                out[f"__b{t}"] = bits[:, t * num_planes:(t + 1) * num_planes] @ weights
            yield out

    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"__b{t} long" for t in range(num_tables)]
    )
    return df.mapInPandas(stage, schema=schema)


def embedding_whiten(
    emb,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    eps: float = 1e-6,
    scale: int = 1_000_000,
):
    """ZCA-whiten an embedding column — the APPLY step on top of
    :func:`embedding_covariance_partials` (whitening/PCA preprocessing
    for dedup, retrieval, and outlier scoring):

      1. exact covariance power sums stream through the one-pass Arrow
         partials path (no self-join, O(d²·batches) shuffle);
      2. the d×d eigendecomposition runs ON THE DRIVER over the
         aggregated cells — a BOUNDED collect (d(d+1)/2 rows, the
         k-centroid contract: driver state scales with d², never with
         the corpus);
      3. ``W = U·diag(1/√(λ+eps))·Uᵀ`` and the mean vector broadcast
         back inside one ``mapInPandas`` matmul stage —
         ``(X − μ) @ Wᵀ`` per Arrow batch, narrow, no shuffle.

    Returns ``(id_col, whitened array<double>)``. Deterministic: the
    covariance cells are exact integers, so eigh sees bit-identical
    input on every run. No SQL oracle (eigendecomposition is not
    SQL-expressible) — certified by the whitened-covariance ≈ identity
    property test instead."""
    import numpy as np
    import pandas as pd

    partials = embedding_covariance_partials(
        emb.select(F.col(vec_col).alias("__v")), vec_col="__v", dim=dim,
        scale=scale,
    )
    cells = (
        partials.groupBy("i", "j")
        .agg(
            F.sum("n").alias("n"),
            F.sum(F.col("sxi").cast("decimal(38,0)")).alias("sxi"),
            F.sum(F.col("sxj").cast("decimal(38,0)")).alias("sxj"),
            F.sum(F.col("sxy").cast("decimal(38,0)")).alias("sxy"),
        )
        .collect()  # bounded: d(d+1)/2 rows
    )
    n = int(cells[0]["n"]) if cells else 0
    if n < 2:
        raise ValueError("embedding_whiten needs at least 2 rows")
    C = np.zeros((dim, dim), dtype=np.float64)
    mu = np.zeros(dim, dtype=np.float64)
    for r in cells:
        i, j = r["i"] - 1, r["j"] - 1
        sxi, sxj, sxy = float(r["sxi"]), float(r["sxj"]), float(r["sxy"])
        cov = (n * sxy - sxi * sxj) / (n * (n - 1.0)) / float(scale) ** 2
        C[i, j] = C[j, i] = cov
        if i == j:
            mu[i] = sxi / n / scale
    lam, U = np.linalg.eigh(C)
    W = (U * (1.0 / np.sqrt(np.maximum(lam, 0.0) + eps))) @ U.T

    def project(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["__v"]])
            Z = (X - mu) @ W.T
            yield pd.DataFrame({"__id": pdf["__id"], "__w": list(Z)})

    out = emb.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    ).mapInPandas(project, "__id long, __w array<double>")
    return out.select(
        F.col("__id").alias(id_col), F.col("__w").alias("whitened")
    )


def embedding_outlier_scores(
    emb,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    eps: float = 1e-6,
):
    """Mahalanobis outlier score per embedding: ``‖W(x−μ)‖²`` where W is
    the ZCA whitening matrix — i.e. squared Mahalanobis distance (up to
    the eps regularization), the covariance-aware companion to the
    per-key z-score family. One :func:`embedding_whiten` pass plus a
    narrow squared-norm projection; same bounded-driver-eigh contract."""
    w = embedding_whiten(emb, id_col=id_col, vec_col=vec_col, dim=dim, eps=eps)
    return w.select(
        id_col,
        F.round(
            F.aggregate(
                "whitened", F.lit(0.0), lambda acc, x: acc + x * x
            ),
            6,
        ).alias("maha2"),
    )


def embedding_covariance_partials(
    emb, *, vec_col: str = "embedding", dim: int, scale: int = 1_000_000
):
    """Upper-triangle covariance power sums over an embedding column — the
    block-matrix accumulation path: values are micro-scaled to int64 by a
    JVM-side ``F.round`` projection (keeping the HALF_UP scaling bit-exact
    with the expression form / the SQL oracle — no Python rounding in the
    path), then each Arrow batch emits ONE partial (i, j, n, sxi, sxj,
    sxy) set from an exact int64 ``X.T @ X`` (exactness requires
    n·max|x·scale|² < 2^62 per batch — ENFORCED per batch with a loud
    ValueError, so unnormalized embeddings can never silently wrap). Output is d(d+1)/2 rows per
    BATCH, so the downstream per-cell aggregation shuffles O(d² ·
    n_batches) tiny rows no matter the corpus size; the global sums
    accumulate in DECIMAL there. For d=64 the naive pair-explode works
    too, but the interpreted nested-lambda explode costs ~8× this Arrow
    stage and the gap widens quadratically with d."""
    import numpy as np
    import pandas as pd

    scaled = emb.select(
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * scale, 0).cast("long"),
        ).alias("sc")
    )
    iu = None

    def stage(batches):
        nonlocal iu
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["sc"].to_numpy()).astype(np.int64)
            n = X.shape[0]
            # loud overflow guard: the int64 X.T @ X accumulation is exact
            # only while n·max|x·scale|² < 2^62; unnormalized embeddings
            # (|x| ~ 100 at scale=1e6) would silently wrap and produce
            # wrong covariances. Checked against the ACTUAL batch max, so
            # normalized corpora never pay more than one abs/max pass.
            bmax = int(np.abs(X).max()) if X.size else 0
            if bmax and n * bmax * bmax >= 2**62:
                raise ValueError(
                    f"embedding_covariance_partials: |value|*scale up to "
                    f"{bmax} over a {n}-row batch overflows the int64 "
                    f"X.T@X accumulation; normalize the embeddings or "
                    f"lower scale= (currently risking >=2^62 products)"
                )
            s = X.sum(axis=0)
            G = X.T @ X
            if iu is None:
                iu = np.triu_indices(dim)
            ii, jj = iu
            yield pd.DataFrame(
                {
                    "i": ii + 1,
                    "j": jj + 1,
                    "n": np.full(ii.shape, n, dtype=np.int64),
                    "sxi": s[ii],
                    "sxj": s[jj],
                    "sxy": G[ii, jj],
                }
            )

    return scaled.mapInPandas(
        stage, "i int, j int, n long, sxi long, sxj long, sxy long"
    )


def random_projection(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    out_dim: int = 16,
    scale: int = 1_000_000,
    seed: str = "rp-v1",
) -> DataFrame:
    """Sparse random projection (Achlioptas'03 database-friendly JL
    transform) — EXACT integer arithmetic end-to-end: the dimension
    reducer that runs in front of LSH/IVF when the raw embedding width
    is the cost driver (a 64→16 projection cuts every downstream
    bucket-hash, Gram and ADC stage 4× while preserving pairwise
    distances within the JL bound, variance 1/out_dim per pair).

    R_ij ∈ {+1, −1, 0} with p = (1/6, 1/6, 2/3), drawn from the md5
    family (``seed|i|j`` → 60-bit int % 6: 0→+1, 1→−1, else 0) so both
    engines build the identical matrix from the identical text keys —
    no literal matrix ships in the plan (the IVF-PQ literal-codebook
    Catalyst-analysis trap). Components quantize to ``scale``
    micro-units (round-half-up int64); y_j = Σ_i R_ij·x_i is an exact
    int64 sum — |y| ≤ Σ_i|x_i|·scale, guarded PER ROW with a loud
    raise_error when that bound reaches 2⁶² (one extra codegen
    aggregate; numpy-style silent int64 wrap is exactly the failure
    this operator exists to avoid). Distances in the
    projected space carry the implicit factor scale·√(1/ (3·out_dim))⁻¹
    … callers compare RELATIVE distances, which the constant cancels.

    Output is the exploded scalar form ``(id, dim_j, y)`` — out_dim
    rows per vector, hash-comparable without array-format drift.

    Scale shape: the R frame is ``out_dim`` rows built from
    ``range(out_dim)`` and broadcast; the projection is one
    broadcast-crossJoin (row amplification × out_dim, stated) of pure
    codegen zip_with/aggregate expressions — no shuffle at all; no
    Python.
    """
    if out_dim < 1 or dim < 1:
        raise ValueError(f"dim/out_dim must be >= 1, got {dim}/{out_dim}")
    spark = embeddings.sparkSession
    sign = lambda i, j: (  # noqa: E731
        F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.lit(seed), i.cast("string"),
                                      j.cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 6
            == 0,
            F.lit(1).cast("long"),
        )
        .when(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.lit(seed), i.cast("string"),
                                      j.cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 6
            == 1,
            F.lit(-1).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
    )
    r_frame = spark.range(out_dim).select(
        F.col("id").cast("int").alias("dim_j"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: sign(i, F.col("id")),
        ).alias("__r"),
    )
    v = F.transform(
        F.col(vec_col),
        lambda e: F.round(e.cast("double") * scale).cast("long"),
    )
    base = embeddings.select(F.col(id_col), v.alias("__v")).where(
        F.size("__v") == dim
    )
    abs_bound = F.aggregate(
        F.col("__v"),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.abs(x),
    )
    guarded = base.select(
        id_col,
        F.when(
            abs_bound >= F.lit(2**62),
            F.raise_error(
                F.concat(
                    F.lit("random_projection: |y| bound exceeds int64 — "
                          "lower `scale`; sum|x|*scale = "),
                    abs_bound.cast("string"),
                )
            ),
        ).otherwise(F.col("__v")).alias("__v"),
    )
    return guarded.crossJoin(F.broadcast(r_frame)).select(
        id_col,
        "dim_j",
        F.aggregate(
            F.zip_with(F.col("__v"), F.col("__r"), lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("y"),
    )


def hard_negative_mining(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 3,
    num_planes: int = 8,
    num_tables: int = 2,
    dim: int | None = None,
) -> DataFrame:
    """Per-anchor top-k nearest DIFFERENT-label neighbors — hard
    negatives for contrastive/embedding training (the pairs that teach
    the margin; random negatives are mostly trivial). The
    complement of :func:`knn_join_lsh`: same multi-table sign-LSH
    bucket candidates (never n²), label-filtered BEFORE the per-anchor
    ranking so the k slots hold only negatives.

    Returns (id_col, rank, negative_id, cosine, anchor_label,
    negative_label) — (cosine desc, id) deterministic order. Anchors
    whose buckets hold no other-label vector emit nothing (the
    documented LSH-recall tradeoff; raise ``num_tables``).

    Scale shape: candidate volume ≈ L·n²/2^planes equi-join rows, the
    label frame joins by id (broadcast when small), and the ranking is
    one window bounded by each anchor's candidate count.

    Scale knob law (priced in BENCH_SF1.json,
    ``hard_negative_mining@planes11``): same as :func:`knn_join_lsh` —
    planes += log2(growth) holds per-bucket candidate volume constant
    (10× data → +3 planes ≈ linear wall clock).
    """
    from pyspark.sql import Window

    from proxima_platform_spark.functions.dedup import (
        embedding_near_dup_pairs,
    )

    nonzero = embeddings.where(
        F.exists(F.col(vec_col), lambda x: x.cast("double") != 0.0)
    )
    # staged once (lazy localCheckpoint): the directed union references
    # the scored pair frame TWICE — the bucket stage is cached inside
    # embedding_near_dup_pairs, but the candidate equi-join + cosine +
    # distinct (the L·n²/2^planes work) would still execute per
    # reference without the pin (the kmv_set_ops lesson)
    pairs = embedding_near_dup_pairs(
        nonzero,
        id_col=id_col,
        vec_col=vec_col,
        threshold=-2.0,  # keep every scored candidate; ranking cuts to k
        num_planes=num_planes,
        num_tables=num_tables,
        dim=dim,
    ).localCheckpoint(eager=False)
    directed = pairs.union(
        pairs.select(
            F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"),
            "cosine",
        )
    )
    labels = embeddings.select(
        F.col(id_col).alias("__lid"), F.col(label_col).alias("__lab")
    )
    labeled = (
        directed.join(labels, directed["id_a"] == labels["__lid"])
        .select("id_a", "id_b", "cosine", F.col("__lab").alias("anchor_label"))
        .join(labels, F.col("id_b") == labels["__lid"])
        .select(
            "id_a", "id_b", "cosine", "anchor_label",
            F.col("__lab").alias("negative_label"),
        )
        .where(F.col("anchor_label") != F.col("negative_label"))
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), F.asc("id_b"))
    return (
        labeled.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("id_a").alias(id_col),
            "rank",
            F.col("id_b").alias("negative_id"),
            F.round("cosine", 6).alias("cosine"),
            "anchor_label",
            "negative_label",
        )
    )
