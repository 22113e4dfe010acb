"""Deterministic corpus sampling for training-data pipelines.

Extension beyond the reference surface (north star operators). Sampling a
100 TB corpus must be (a) shuffle-free — a pure filter, so it composes with
scan pruning and never materializes the population, (b) deterministic and
versionable — re-running the pipeline yields the same sample, and (c)
stratifiable — per-source/per-language rates to rebalance a mixture.

The sampling key is an md5-derived integer in [0, 1e6) (the same
engine-portable hash family the dedup/LSH operators use — md5 is
bit-identical in Spark and DuckDB, so the driver oracle can mirror the
sample exactly; Spark's native ``hash()`` is Murmur3 with engine-specific
seeds and would not cross-check).

``F.rand()``-based sampling is rejected on purpose: nondeterministic across
retries/partition re-reads, which silently breaks exactly-once pipeline
semantics at scale (a retried task would sample different rows).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, functions as F

#: granularity of the sampling key space; rates quantize to 1/BUCKETS
BUCKETS = 1_000_000


def sample_key(key: Column, salt: str = "") -> Column:
    """Uniform deterministic key in [0, BUCKETS): md5 of (salt || key),
    first 60 bits as integer, mod BUCKETS. Pure codegen expression."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % BUCKETS


def hash_sample(
    df: DataFrame, *, key: Column, rate: float, salt: str = ""
) -> DataFrame:
    """Keep ~``rate`` of rows, deterministically by ``key``.

    A pure filter — predicate-pushdown-friendly, zero shuffle, stable under
    retries. Different ``salt`` values draw independent samples (e.g.
    train/validation splits from disjoint salts)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.where(sample_key(key, salt) < int(rate * BUCKETS))


def stratified_sample(
    df: DataFrame,
    *,
    key: Column,
    strata: Column,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-rebalancing primitive
    (e.g. downsample crawl data to 10% while keeping 100% of books).

    Still a single pure filter: the stratum column selects the rate via a
    literal map lookup, so the plan is one codegen stage, no shuffle, and
    the scan only reads rows it keeps."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1], got {r}")
    rate_map = F.create_map(
        *[x for s, r in sorted(rates.items()) for x in (F.lit(s), F.lit(int(r * BUCKETS)))]
    )
    threshold = F.coalesce(
        rate_map[strata], F.lit(int(default_rate * BUCKETS))
    )
    return df.where(sample_key(key, salt) < threshold)


def hash_sample_exact_k(
    df: DataFrame, *, key: Column, k: int, salt: str = ""
) -> DataFrame:
    """Exactly ``k`` rows, uniform without replacement, deterministic by
    ``key``: the k smallest sampling keys win. Compiles to
    TakeOrderedAndProject — per-partition top-k heaps, no full sort, no
    shuffle of the population (the distributed analog of reservoir
    sampling, with a versionable, retry-stable choice of winners)."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    return (
        df.withColumn("__sk", sample_key(key, salt))
        .orderBy(F.col("__sk"), key)  # key tiebreak: total order, stable
        .limit(k)
        .drop("__sk")
    )


def quota_sample(
    df: DataFrame, *, key: Column, strata: Column, quota: int, salt: str = ""
) -> DataFrame:
    """Cap every stratum at ``quota`` rows — the source-mixing primitive
    ("no single crawl may exceed N documents"): within each stratum, the
    ``quota`` rows with the smallest sampling keys win, a deterministic
    uniform choice.

    One hash exchange on the stratum key, then a per-stratum ordered rank.
    Strata counts are the partition-size bound — sources/languages/shards,
    thousands at most, so a stratum fits a task at 100 TB corpus scale
    *per stratum*; a pathologically dominant stratum is exactly the row
    this operator exists to cut, and if its PRE-quota bulk breaks a sort
    buffer the caller composes ``hash_sample`` (pure filter, no shuffle)
    in front to knock the population down to O(quota) first — same final
    sample, because both draws order by the same md5 key."""
    if quota < 0:
        raise ValueError(f"quota must be >= 0, got {quota}")
    from pyspark.sql import Window

    w = Window.partitionBy("__st").orderBy("__sk", key)
    return (
        df.withColumn("__st", strata)
        .withColumn("__sk", sample_key(key, salt))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= quota)
        .drop("__st", "__sk", "__rn")
    )


def weighted_sample(
    df: DataFrame, *, key: Column, rate: Column, salt: str = ""
) -> DataFrame:
    """Per-ROW Bernoulli keep with probability ``rate`` (a Column in
    [0, 1]) — importance/quality-weighted sampling (keep long documents,
    high quality scores, rare languages at higher rates). Still a pure
    codegen filter: deterministic by key, zero shuffle, composes with scan
    pruning. Rates outside [0,1] are clamped."""
    clamped = F.least(F.greatest(rate.cast("double"), F.lit(0.0)), F.lit(1.0))
    # long < double comparison (exact: both sides < 2^53) — an integer CAST
    # of the threshold would truncate here but round in other engines,
    # flipping boundary keys
    return df.where(
        sample_key(key, salt).cast("double") < clamped * F.lit(float(BUCKETS))
    )


def hash_split(
    df: DataFrame, *, key: Column, fractions: Mapping[str, float], salt: str = ""
) -> Column:
    """Disjoint deterministic split assignment (train/validation/test).

    Returns a label Column partitioning the key space by cumulative ranges
    of ONE sampling key — unlike drawing per-split samples with different
    salts (independent, overlapping), ranges of the same key are exactly
    disjoint and exhaustive. Fractions must sum to 1 (±1e-9). Attach it
    with ``df.withColumn("split", hash_split(df, ...))`` and filter — still
    a pure codegen expression, no shuffle."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    sk = sample_key(key, salt)
    expr = None
    cum = 0.0
    items = sorted(fractions.items())
    for name, frac in items[:-1]:
        cum += frac
        cond = sk < int(cum * BUCKETS)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    return (expr.otherwise(F.lit(last)) if expr is not None else F.lit(last)).alias("split")


def sequence_pack(
    docs,
    *,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
    budget: int = 2048,
    n_shards: int = 32,
):
    """Deterministic sequence packing: assign documents to fixed-token-budget
    training bins (extension beyond the reference surface; standard LLM
    pretraining batch-prep).

    Documents are hash-sharded (`id % n_shards`), ordered by id within the
    shard, and a bin boundary falls wherever the running token total crosses
    the budget: bin = floor(cumulative_start / budget). Greedy first-fit is
    inherently sequential; this offset-packing variant is order-deterministic,
    engine-portable (one window cumsum — same SQL in any engine), and at
    100 TB parallelizes per shard: set n_shards ≳ cluster parallelism and no
    single window partition ever sees more than corpus/n_shards rows. Bins
    can overflow by at most one document — the standard trade for
    deterministic distributed packing (true bin packing is NP-hard and
    order-sensitive).
    """
    from pyspark.sql import Window

    shard = (F.col(id_col) % n_shards).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_shard = docs.select(id_col, token_count_col, shard)
    return with_shard.select(
        id_col,
        "shard",
        F.coalesce(F.sum(token_count_col).over(w), F.lit(0)).alias("cum_start"),
        F.col(token_count_col).alias("n_tokens"),
    ).select(
        id_col,
        "shard",
        # integer division, not float-divide-then-cast: for non-power-of-two
        # budgets with large cumulative sums, double rounding can land on the
        # wrong side of the boundary vs the oracle's integer `//`
        F.expr(f"cum_start DIV {int(budget)}").alias("bin"),
        "n_tokens",
    )


def temperature_mix(
    df: DataFrame,
    *,
    key: Column,
    strata_col: str,
    target_total: int,
    salt: str = "",
) -> DataFrame:
    """Temperature-based source mixing (the T5/mT5 recipe at temperature
    T=2, i.e. exponent α = 1/2): sample each source s with probability
    ∝ √n_s, so small sources are up-weighted relative to their share and
    no source dominates purely by volume. Rates are DERIVED from the data:

        w_s = round(√n_s, 6)            (sqrt is IEEE-correctly-rounded —
                                         the only engine-portable irrational
                                         op; rounding pins the 6-dec value)
        rate_s = round(min(1, target_total·w_s / (Σw·n_s)), 6)

    Σw accumulates the 6-dec weights in DECIMAL (order-independent), and
    the per-source rate is a fixed sequence of correctly-rounded double
    ops — deterministic across engines, so the md5-keyed draw (the same
    ``sample_key`` family as every sampler here) is exactly mirrorable in
    SQL. Plan: one tiny per-source count agg (map-side combined), a 1-row
    Σw broadcast, a broadcast join of the per-source rates onto the corpus,
    then ONE pure codegen filter — no shuffle of the corpus itself."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_s"))
    w = counts.withColumn("w_s", F.round(F.sqrt(F.col("n_s")), 6))
    tot = w.agg(
        F.sum(F.col("w_s").cast("decimal(28,6)")).cast("double").alias("sum_w")
    )
    rates = (
        w.crossJoin(F.broadcast(tot))
        .withColumn(
            "rate",
            F.round(
                F.least(
                    F.lit(1.0),
                    (F.lit(float(target_total)) * F.col("w_s"))
                    / (F.col("sum_w") * F.col("n_s").cast("double")),
                ),
                6,
            ),
        )
        # double threshold, NOT an integer cast: rate*BUCKETS can land just
        # below an integer in double (e.g. 437515.9999...), and a truncating
        # cast here would round in other engines, flipping boundary keys —
        # the same trap documented at weighted_sample above. long < double
        # is exact (both sides < 2^53).
        .select(strata_col, (F.col("rate") * F.lit(float(BUCKETS))).alias("__thr"))
    )
    out = df.join(F.broadcast(rates), strata_col).where(
        sample_key(key, salt).cast("double") < F.col("__thr")
    )
    return out.drop("__thr")


def leakage_safe_split(
    df: DataFrame,
    *,
    group_key: Column,
    fractions: Mapping[str, float],
    salt: str = "",
) -> Column:
    """Split assignment keyed by a DEDUP-GROUP key instead of the row id —
    decontamination by construction: every member of a duplicate group
    lands in the SAME split, so a near-verbatim copy of a test document
    can never leak into train (the eval-contamination failure mode that
    row-keyed splits like :func:`hash_split` cannot rule out; see the
    exact-substring/fuzzy decontamination operators in functions/dedup.py
    for the after-the-fact counterpart).

    ``group_key`` is any deterministic canonical key for the duplicate
    group — ``dedup.exact_dup_key(text)`` (md5 of normalized text) for
    exact groups, or a precomputed connected-component representative
    column for fuzzy groups. Same cumulative-range construction as
    ``hash_split`` (disjoint, exhaustive, pure codegen expression, no
    shuffle); two rows with equal group keys get equal sampling keys and
    therefore equal labels, unconditionally."""
    return hash_split(df, key=group_key, fractions=fractions, salt=salt)


def negative_samples(
    df: DataFrame,
    *,
    id_col: str,
    k: int,
    exclude_key: Column | None = None,
    buckets: int = 64,
    salt: str = "",
) -> DataFrame:
    """``k`` deterministic negative partners per anchor row — the
    contrastive-training sampler (in-batch negatives made retry-stable
    and engine-checkable): for each anchor, candidates are the rows of
    ONE pseudo-randomly assigned partner bucket, ranked by a pair hash;
    the ``k`` smallest win. ``exclude_key`` (e.g.
    ``dedup.exact_dup_key(text)``) drops candidates from the anchor's own
    duplicate group — a near-duplicate is a FALSE negative that teaches
    the model to push identical content apart.

    Scale shape (100 TB): never all-pairs — the candidate space per
    anchor is n/``buckets`` rows (one equi-join on the bucket id, hash-
    partitioned), and the per-anchor top-k is a window over that bounded
    candidate set. Raise ``buckets`` with corpus size to hold the
    per-anchor candidate volume constant; every draw is a pure md5
    expression, so retries and engine mirrors reproduce it exactly.

    Returns (anchor id, negative id, pair rank 1..k).
    """
    if k <= 0:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    aid = F.col(id_col)
    ex = exclude_key if exclude_key is not None else aid.cast("string")
    own = F.pmod(sample_key(aid, salt), F.lit(buckets))
    # keyed once (lazy localCheckpoint, the oracle's `b` CTE shape): both
    # self-join sides need (id, own bucket, exclude key) — without the
    # staging each side re-runs the full-text exclude-key md5 over the
    # corpus (2x the normalize+hash pass)
    keyed = df.select(
        aid.alias("__kid"), own.alias("__own"), ex.alias("__ex")
    ).localCheckpoint(eager=False)
    anchors = keyed.select(
        F.col("__kid").alias("anchor_id"),
        # partner bucket: shifted by 1 so an anchor never draws from its
        # own bucket (its own row would rank, and same-bucket anchors
        # would all share candidate sets)
        F.pmod(F.col("__own") + 1, F.lit(buckets)).alias("__pb"),
        F.col("__ex").alias("__ex_a"),
    )
    cands = keyed.select(
        F.col("__kid").alias("negative_id"),
        F.col("__own").alias("__cb"),
        F.col("__ex").alias("__ex_c"),
    )
    w = Window.partitionBy("anchor_id").orderBy("__pk", "negative_id")
    return (
        anchors.join(cands, anchors["__pb"] == cands["__cb"])
        .where(F.col("__ex_a") != F.col("__ex_c"))
        .withColumn(
            "__pk",
            sample_key(
                F.concat(
                    F.col("anchor_id").cast("string"),
                    F.lit("|"),
                    F.col("negative_id").cast("string"),
                ),
                salt,
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("anchor_id", "negative_id", "rank")
    )


def dsir_bucket_counts(
    df: DataFrame, *, text: str, buckets: int, name: str = "n"
) -> DataFrame:
    """Hashed word-bigram bucket counts (b, <name>) over ``df[text]`` —
    partial buckets only (absent buckets carry no row; join against a
    range(buckets) domain to densify). One map-side-combined agg of at
    most ``buckets`` cells; the DSIR feature map, shared by the batch
    resampler and the streaming maintainer (streaming/dsir_stream.py),
    whose per-batch deltas are exactly these frames."""
    from .dedup import shingles_from_tokens, tokens

    toks = df.select(tokens(F.col(text)).alias("__t"))
    # shingles_from_tokens guards the <n-token descending-sequence trap
    grams = toks.select(
        F.explode(shingles_from_tokens(F.col("__t"), 2)).alias("__g")
    )
    b = F.pmod(
        F.conv(F.substring(F.md5("__g"), 1, 15), 16, 10).cast("long"),
        F.lit(buckets),
    )
    return grams.select(b.alias("b")).groupBy("b").agg(
        F.count(F.lit(1)).alias(name)
    )


def dsir_ratios_from_counts(
    ct: DataFrame,
    cr: DataFrame,
    *,
    buckets: int,
    smooth: float = 1.0,
) -> DataFrame:
    """(b, lr) log importance ratios from pre-computed partial bucket
    count frames ``ct`` (target: b, n_tgt) and ``cr`` (raw: b, n_raw) —
    the arithmetic half of :func:`dsir_log_ratios`, reusable against
    continuously-maintained counts. Exactly ``buckets`` rows out."""
    domain = ct.sparkSession.range(buckets).select(F.col("id").alias("b"))
    joined = (
        domain.join(ct, "b", "left")
        .join(cr, "b", "left")
        .select(
            "b",
            F.coalesce("n_tgt", F.lit(0)).alias("n_tgt"),
            F.coalesce("n_raw", F.lit(0)).alias("n_raw"),
        )
    )
    tot = joined.agg(
        F.sum("n_tgt").alias("t_tot"), F.sum("n_raw").alias("r_tot")
    )
    sm = F.lit(float(smooth))
    denom_t = F.col("t_tot").cast("double") + sm * F.lit(float(buckets))
    denom_r = F.col("r_tot").cast("double") + sm * F.lit(float(buckets))
    p = (F.col("n_tgt").cast("double") + sm) / denom_t
    q = (F.col("n_raw").cast("double") + sm) / denom_r
    return joined.crossJoin(F.broadcast(tot)).select(
        "b", F.round(F.log(p / q), 8).cast("decimal(28,10)").alias("lr")
    )


def dsir_log_ratios(
    raw: DataFrame,
    target: DataFrame,
    *,
    text: str,
    buckets: int = 1024,
    smooth: float = 1.0,
) -> DataFrame:
    """Per-bucket log importance ratios for DSIR (Data Selection via
    Importance Resampling, Xie et al. NeurIPS'23): hashed word-bigram
    bag-of-ngrams features, target distribution p over a small curated
    ``target`` corpus vs raw distribution q over ``raw``, add-``smooth``
    smoothing on both:

        lr_b = round(ln(p_b / q_b), 8)    (stored as exact decimal)

    p_b = (target_b + smooth)/(target_total + smooth·buckets), q_b same
    over raw. The 8-decimal rounding + decimal storage is the engine-
    portability recipe proven by ``trigram_lm_scores``: the one libm op
    (ln) agrees to well under 1e-8 across engines, and everything after
    it is exact.

    Scale shape (100 TB raw corpus): feature space is FIXED at ``buckets``
    rows regardless of corpus size — both count aggs are map-side-combined
    shuffles of at most ``buckets`` cells, the bucket domain comes from a
    ``range(buckets)`` frame (absent buckets get pure-smoothing mass), and
    the result broadcasts everywhere it is used.

    Returns (b, lr) with exactly ``buckets`` rows.
    """
    cr = dsir_bucket_counts(raw, text=text, buckets=buckets, name="n_raw")
    ct = dsir_bucket_counts(target, text=text, buckets=buckets, name="n_tgt")
    return dsir_ratios_from_counts(ct, cr, buckets=buckets, smooth=smooth)


def dsir_doc_log_weights(
    df: DataFrame,
    lr: DataFrame,
    *,
    id_col: str,
    text: str,
    buckets: int,
) -> DataFrame:
    """(id, n_grams, logw) per document: the exact-decimal sum of the
    broadcast ratio frame's lr over the doc's bigram buckets — the
    scoring half of DSIR, reusable against any ratio frame (batch-built
    or continuously maintained). Docs with < 2 tokens have no features
    and no row."""
    from .dedup import shingles_from_tokens, tokens

    toks = df.select(F.col(id_col).alias("id"), tokens(F.col(text)).alias("__t"))
    grams = toks.select(
        "id", F.explode(shingles_from_tokens(F.col("__t"), 2)).alias("__g")
    )
    keyed = grams.select(
        "id",
        F.pmod(
            F.conv(F.substring(F.md5("__g"), 1, 15), 16, 10).cast("long"),
            F.lit(buckets),
        ).alias("b"),
    )
    return (
        keyed.join(F.broadcast(lr), "b")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("lr").alias("logw"),
        )
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    *,
    id_col: str,
    text: str,
    k: int,
    buckets: int = 1024,
    smooth: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """DSIR importance resampling: keep the ``k`` raw documents whose
    Gumbel-perturbed log importance weight is largest — a deterministic,
    engine-replayable rendering of "sample k docs ∝ their importance
    weight w(x) = Π p_b/q_b over hashed n-gram features" (Gumbel-top-k
    IS sampling-without-replacement ∝ w when the noise is standard
    Gumbel; here the noise comes from the md5 key family, so retries and
    oracle mirrors reproduce the draw exactly).

        log_w(d) = Σ over d's bigrams of lr_bucket(g)   (exact decimal)
        u(d)     = (sample_key(id)+1) / (BUCKETS+1)      in (0, 1)
        g(d)     = round(-ln(-ln(u)), 8) quantized to exact decimal
        score(d) = round(log_w + g, 6)                   (exact decimal)
        keep top-k by (score, id)

    The Gumbel term is QUANTIZED (round(·,8) then decimal(28,10) cast —
    the trigram/lr recipe) before the sum: tools/margin_check.py found
    the previous double-arithmetic score sitting 6e-18 from its
    round(·,6) boundary on the sf0.01 fixture, and double round(·,8)
    itself is not bit-specified across engines (BigDecimal shortest-repr
    vs multiply-divide differ by ~1 ulp). After quantization the sum and
    final 6-dp round are exact decimal arithmetic — ties included,
    every engine produces the identical digit.

    Docs with fewer than 2 tokens have no features and are not sampled
    (log_w undefined, matching the paper's n-gram feature map).

    Scale shape: the ``buckets``-row ratio frame broadcasts; per-doc
    scoring is one explode + one map-side-combined sum keyed by doc; the
    top-k compiles to TakeOrderedAndProject (per-partition heaps — the
    population never globally sorts).

    Returns (id, n_grams, score) for the k winners.
    """
    # r13 staged the raw corpus's (id, bucket) grams behind a lazy
    # localCheckpoint shared by both consumers (ratio counts + scoring
    # join) to save one corpus pass; the driver's value hash went red
    # that round (CORRECTNESS_r13: hash_match false) and the cause was
    # never reproduced locally (exact-text comparison green at all three
    # SFs), so per VERDICT r13 item 1 the staging is reverted to the
    # composed-helper form until the divergence is understood. Cost: one
    # extra corpus bigram pass (~1 s at sf0.1); correctness outranks it.
    lr = dsir_log_ratios(raw, target, text=text, buckets=buckets, smooth=smooth)
    per_doc = dsir_doc_log_weights(
        raw, lr, id_col=id_col, text=text, buckets=buckets
    ).withColumnRenamed("logw", "__logw")
    u = (sample_key(F.col("id"), salt) + 1).cast("double") / float(BUCKETS + 1)
    gumbel = F.round(-F.log(-F.log(u)), 8).cast("decimal(28,10)")
    return (
        per_doc.select(
            "id",
            "n_grams",
            F.round(F.col("__logw") + gumbel, 6)
            .cast("decimal(28,6)")
            .alias("score"),
        )
        .orderBy(F.col("score").desc(), "id")
        .limit(k)
    )


def unimax_mixture(
    docs: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
    budget_factor: float = 1.5,
    epoch_caps: Column | None = None,
) -> DataFrame:
    """UniMax mixture allocation (Chung et al. ICLR'23): distribute a total
    token budget across sources as UNIFORMLY as possible subject to
    per-source repetition caps — the principled alternative to temperature
    sampling for multi-source pretraining (temperature_mix's neighbor).

    Water-filling has a closed form over sources sorted ascending by
    capacity c_s = epochs_cap_s × n_s: with csum the running capacity sum
    and r the 1-based rank among k sources,

        u_r     = (B − csum_{<r}) / (k − r + 1)
        alloc_s = c_s            if  c_s ≤ u_r   (source exhausts its cap)
                  u_t            otherwise       (uniform share at the
                                                  first violation rank t)

    because exhausting every smaller-capacity source leaves the remaining
    budget split evenly over the rest. ``budget_factor`` sets
    B = factor × total corpus tokens; ``epoch_caps`` is a per-source cap
    expression (default ``1 + source-hash mod 3`` — deterministic, varied,
    so both the capped and the uniform regime are exercised on any corpus).

    Exactness: token counts and capacities are exact int64; the u ladder is
    a fixed IEEE double sequence over the (tiny) sorted source list,
    identical cross-engine; outputs round at 6dp.

    Scale shape: the only corpus-scale work is one map-side-combined token
    count per source; everything after runs on |sources| rows (windows over
    a frame that is small BY DEFINITION — mixture design is per-source).

    Output: (source, n_tokens, epoch_cap, capacity, allocation, epochs).
    """
    from pyspark.sql import Window

    from proxima_platform_spark.functions.dedup import tokens as _toks

    counts = (
        docs.select(
            F.col(group_col).alias("source"),
            F.size(_toks(F.col(text_col))).alias("__n"),
        )
        .groupBy("source")
        .agg(F.sum("__n").alias("n_tokens"))
    )
    # default cap varies by the md5-derived source hash (engine-portable,
    # the shingle_hash recipe) so capped and uniform regimes both appear
    cap = (
        epoch_caps
        if epoch_caps is not None
        else F.lit(1)
        + F.conv(F.substring(F.md5(F.col("source")), 1, 15), 16, 10)
        .cast("long")
        % F.lit(3)
    )
    capped = counts.select(
        "source", "n_tokens",
        cap.cast("long").alias("epoch_cap"),
        (cap.cast("long") * F.col("n_tokens")).alias("capacity"),
    )
    total = counts.agg(
        (F.sum("n_tokens").cast("double") * F.lit(float(budget_factor)))
        .alias("b"),
        F.count(F.lit(1)).alias("k"),
    )
    w = Window.orderBy("capacity", "source")
    ranked = capped.crossJoin(F.broadcast(total)).select(
        "*",
        F.row_number().over(w).alias("r"),
        F.coalesce(
            F.sum("capacity").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("csum_prev"),
    )
    u = (F.col("b") - F.col("csum_prev")) / (F.col("k") - F.col("r") + 1)
    flagged = ranked.select("*", u.alias("u"),
                            (F.col("capacity") > u).alias("viol"))
    # uniform share at the first violation (1-row broadcast; NULL when no
    # source violates — then every source exhausts its cap)
    t_row = flagged.where("viol").agg(
        F.min(F.struct("r", "u")).alias("t")
    ).select(
        F.col("t.r").alias("t_r"), F.col("t.u").alias("t_u")
    )
    out = flagged.crossJoin(F.broadcast(t_row)).select(
        "source", "n_tokens", "epoch_cap", "capacity",
        F.round(
            F.when(
                F.col("t_r").isNull() | (F.col("r") < F.col("t_r")),
                F.col("capacity").cast("double"),
            ).otherwise(F.col("t_u")),
            6,
        ).alias("allocation"),
    )
    return out.select(
        "*",
        F.round(F.col("allocation") / F.col("n_tokens"), 6).alias("epochs"),
    )
