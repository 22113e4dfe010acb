"""Pure-DataFrame Bloom filter: build a broadcastable bitset from a key
column, probe it JVM-side, and use it as a pre-filter in front of an exact
semi-join.

Spark ships a BloomFilter in ``DataFrameStatFunctions``, but it materializes
on the driver and probing from Python needs a row-at-a-time UDF. This
implementation keeps BOTH sides in Catalyst expressions:

* build — k hash positions per key (``xxhash64(key, seed)`` per seed,
  ``pmod`` into m bits), exploded and ``bit_or``-combined into 64-bit words
  (map-side partial aggregation — the filter build is one shuffle of
  |keys| × k tiny rows), then collapsed to a SINGLE ROW holding a DENSE
  ``array<long>`` of m/64 words (m/8 bytes; O(1) probe indexing — see
  ``bloom_build`` for why not a sparse map). Broadcastable at KB-MB scale.
* probe — ``crossJoin(broadcast(filter_row))`` (1-row build side: this is
  a map-side broadcast, NOT a cartesian blow-up) + a ``forall`` over the
  k (word, mask) pairs checking bits with ``element_at`` + bitwise AND.
  Whole-stage-codegen, no Python boundary, no shuffle of the probe side.

Bloom semantics: false positives possible, false negatives impossible — so
callers follow the probe with an EXACT confirm join on the surviving
(typically ≪ 1%) candidates, and results remain exact while the heavy
shuffle only carries survivors. That two-phase shape is the reference's
storage-filter idea (StorageFilter pre-selection before exact reads,
``direct/core`` commit-log filtering) applied to join pruning, and is the
standard runtime-filter pattern at 100 TB: ship a few KB to every executor
instead of shuffling the full corpus-side key set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _positions(col: Column, num_bits: int, k: int) -> list[Column]:
    """k bit positions for a key: xxhash64 with k distinct seed columns.
    xxhash64 is a keyed 64-bit hash evaluated JVM-side; pmod keeps the
    position non-negative (hash can be negative)."""
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits)) for i in range(k)
    ]


def bloom_build(
    keys: DataFrame, col: str, num_bits: int = 1 << 16, k: int = 5
) -> DataFrame:
    """One-row DataFrame ``{words: array<long>, num_bits, k}`` — the
    Bloom bitset over ``keys[col]`` as a DENSE array of num_bits/64
    64-bit words.

    Dense on purpose: Spark's ``map_from_entries`` map is array-backed,
    so a sparse ``map<long,long>`` pays a LINEAR scan over its non-zero
    words per ``element_at`` probe — O(words) × k per probe row, which
    is exactly the hot path. A dense array probes O(1) by index. Cost is
    num_bits/8 bytes regardless of fill (128 KB at 2^20 bits) — size
    ``num_bits`` ~10x the key count, the standard Bloom sizing, and the
    broadcast stays KB-to-MB scale."""
    n_words = (num_bits + 63) // 64
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(col), num_bits, k))).alias("pos")
    )
    words = pos.select(
        F.expr("pos DIV 64").alias("w"),
        F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("mask"),
    )
    per_word = words.groupBy("w").agg(F.bit_or("mask").alias("bits"))
    # densify via a range outer-join (n_words tiny rows, one agg) — NOT a
    # per-index map lookup, which would scan the array-backed map once per
    # word and go quadratic in the word count
    full = keys.sparkSession.range(n_words).select(F.col("id").alias("w"))
    dense = full.join(per_word, "w", "left").select(
        "w", F.coalesce("bits", F.lit(0).cast("long")).alias("bits")
    )
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("w", "bits"))),
            lambda s: s["bits"],
        ).alias("words"),
        F.lit(num_bits).alias("num_bits"),
        F.lit(k).alias("k"),
    )


def bloom_prefilter(
    probe: DataFrame, col: str, bloom: DataFrame, num_bits: int = 1 << 16, k: int = 5
) -> DataFrame:
    """Rows of ``probe`` whose ``col`` is possibly in the filter (all k bits
    set). Never drops a true member; keeps a ~(1-e^{-kn/m})^k fraction of
    non-members. The 1-row filter side is broadcast."""
    checks = [
        # dense bitset: O(1) array indexing (1-based element_at)
        F.expr(
            f"(element_at(__bloom.words, CAST(__p{i} DIV 64 AS INT) + 1)"
            f" & shiftleft(1L, CAST(__p{i} % 64 AS INT))) != 0"
        )
        for i in range(k)
    ]
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    out = (
        probe.crossJoin(F.broadcast(bloom.select(F.struct("words").alias("__bloom"))))
        .select(
            "*",
            *[
                p.alias(f"__p{i}")
                for i, p in enumerate(_positions(F.col(col), num_bits, k))
            ],
        )
        .where(cond)
    )
    return out.drop("__bloom", *[f"__p{i}" for i in range(k)])


def bloom_semi_join(
    corpus: DataFrame,
    needles: DataFrame,
    col: str,
    num_bits: int = 1 << 16,
    k: int = 5,
) -> DataFrame:
    """EXACT left-semi join of ``corpus`` against ``needles`` on ``col``,
    with a Bloom pre-filter in front: the shuffle/broadcast for the exact
    confirm join only carries rows that pass the bitset probe. Result is
    identical to ``corpus.join(needles, col, "left_semi")`` — the filter
    can only admit extra CANDIDATES, which the confirm join removes."""
    bloom = bloom_build(needles.select(col).distinct(), col, num_bits, k)
    candidates = bloom_prefilter(corpus, col, bloom, num_bits, k)
    return candidates.join(
        needles.select(col).distinct(), col, "left_semi"
    )


def bloom_join_reduce(
    fact: DataFrame,
    dim: DataFrame,
    col: str,
    num_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """EXACT inner equi-join with a Bloom runtime filter in front of the
    fact side — the semi-join-reduction rewrite (Bloom-join, Bratbergsengen
    VLDB'84; what Spark's own runtime row-level filtering does for DPP-
    ineligible joins, here as an explicit, tunable operator): build the
    bitset over the (already filtered) dim keys, drop fact rows whose key
    can't match BEFORE the join's exchange, then run the normal join.

    Result is IDENTICAL to ``fact.join(dim, col)``: the bitset never drops
    a true member, and its false positives are removed by the exact join —
    the same two-phase no-false-negative contract as :func:`bloom_semi_join`
    and the CMS prefilters below.

    Why it matters at 100 TB: a selective dim predicate (say 1% of orders)
    still makes the plain join SHUFFLE the full fact table — the filter
    lives on the other side of the exchange. The bitset is a few hundred
    KB broadcast (num_bits/8 bytes ceiling, sparse map in practice), the
    probe is whole-stage-codegen bit arithmetic in the fact scan's own
    stage, and only the ~1% surviving fact rows reach the shuffle. The
    fact side is pruned ~(1-e^{-kn/m})^k of non-members; size ``num_bits``
    ~10x the dim key count for a <1% false-positive rate."""
    bloom = bloom_build(dim.select(col).distinct(), col, num_bits, k)
    pruned = bloom_prefilter(fact, col, bloom, num_bits, k)
    return pruned.join(dim, col)


# ===========================================================================
# Count-Min sketch (frequency) — same two-phase exactness pattern as Bloom
# ===========================================================================
#
# A CMS is a depth×width grid of counters; each key increments one counter
# per row (xxhash64(key, row) % width) and its frequency estimate is the MIN
# over its depth counters. Estimates NEVER undercount (collisions only add),
# so "estimate >= T" admits every truly-frequent key — the same
# no-false-negative contract the Bloom filter gives membership, applied to
# frequency. Reference analog: the platform's StorageFilter pre-selection
# (direct/core commit-log filtering) — prune cheaply first, confirm exactly
# on the survivors.
#
# Scale shape (100 TB): the build shuffles depth×width COUNTER CELLS
# (map-side combined — the shuffle is O(d·w), independent of key
# cardinality), collapses to ONE row holding a map<int,long> of a few
# hundred KB, and the probe is a 1-row broadcast + least() over d
# element_at lookups — whole-stage codegen, no Python, no shuffle. An
# exact frequent-items groupBy at 100 TB shuffles every distinct key;
# CMS-prefiltered, the exact agg only carries rows whose key is plausibly
# frequent (true hitters + a collision-bounded ε·N of impostors).


def _cms_cells(cols: list[Column], width: int, depth: int) -> list[Column]:
    """depth cell ids for a (possibly composite) key: row r hashes with
    seed r into [0, width), offset by r·width into the flat grid."""
    return [
        F.lit(r * width) + F.pmod(F.xxhash64(*cols, F.lit(r)), F.lit(width))
        for r in range(depth)
    ]


def cms_build(
    df: DataFrame, cols: list[str], width: int = 2048, depth: int = 4
) -> DataFrame:
    """One-row DataFrame ``{cells: map<int,long>, width, depth}`` — the
    Count-Min grid over the multiset of ``cols`` tuples in ``df`` (one
    increment per ROW, so the sketch estimates row frequencies)."""
    key = [F.col(c) for c in cols]
    pos = df.select(
        F.explode(F.array(*_cms_cells(key, width, depth))).alias("cell")
    )
    per_cell = pos.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    return per_cell.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(F.col("cell").cast("int"), "n")))
        ).alias("cells"),
        F.lit(width).alias("width"),
        F.lit(depth).alias("depth"),
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two same-shape sketches by element-wise counter addition —
    CMS(A ⊎ B) == merge(CMS(A), CMS(B)) exactly, which is what makes the
    sketch usable per-partition / per-micro-batch (build small, merge up,
    probe once). Plain DataFrame ops: explode both maps, sum per cell."""
    ae = a.select(F.explode("cells").alias("cell", "n"), "width", "depth")
    be = b.select(F.explode("cells").alias("cell", "n"), "width", "depth")
    u = ae.unionByName(be)
    per_cell = u.groupBy("cell", "width", "depth").agg(F.sum("n").alias("n"))
    return per_cell.groupBy("width", "depth").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("cell", "n")))
        ).alias("cells")
    ).select("cells", "width", "depth")


def cms_estimate(
    probe: DataFrame, cols: list[str], cms: DataFrame,
    width: int = 2048, depth: int = 4, out: str = "freq_est",
) -> DataFrame:
    """``probe`` + a ``freq_est`` column: min over the key's depth counters
    (0 for never-seen keys). 1-row broadcast crossJoin (map-side, not a
    cartesian blow-up); the lookup is least() over element_at — codegen.

    The sketch map is DENSIFIED to an ``array<long>`` of length
    width·depth before the join: ``map_from_entries`` maps are
    array-backed, so ``element_at`` on the map itself is a LINEAR scan of
    up to width·depth entries per probe — depth probes per row made the
    estimate pass O(rows·depth·width·depth) (measured ~1s of the 2.5s
    heavy_hitters median at sf0.1). The one-time densify costs
    O((width·depth)²) scans on the single sketch row (~milliseconds);
    array element_at is O(1) per probe, and the 8K-long broadcast is
    64 KB. The densify itself is a RANGE OUTER-JOIN (grid of all
    width·depth cell ids left-joined to the exploded map entries), never
    a per-index map lookup — a transform(sequence(...), i ->
    element_at(map, i)) measured 28 SECONDS for one 8K-cell row on the
    interpreted higher-order path (the documented map-densify trap), vs
    milliseconds for the join over ≤8K-row frames."""
    key = [F.col(c) for c in cols]
    cells = _cms_cells(key, width, depth)
    grid = cms.sparkSession.range(width * depth).select(
        F.col("id").cast("int").alias("cell")
    )
    entries = cms.select(F.explode("cells").alias("cell", "n"))
    dense_cms = (
        grid.join(entries, "cell", "left")
        .select("cell", F.coalesce("n", F.lit(0).cast("long")).alias("n"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("cell", "n"))),
                lambda s: s["n"],
            ).alias("cells")
        )
        .select(F.struct("cells").alias("__cms"))
    )
    # element_at on arrays is 1-based; cell ids are 0-based grid offsets
    lookups = [
        F.element_at(F.col("__cms.cells"), (c + 1).cast("int")) for c in cells
    ]
    est = lookups[0] if depth == 1 else F.least(*lookups)
    return (
        probe.crossJoin(F.broadcast(dense_cms))
        .withColumn(out, est)
        .drop("__cms")
    )


def cms_frequent_items(
    df: DataFrame,
    cols: list[str],
    threshold: int,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """EXACT frequent-items: every ``cols`` tuple occurring ≥ ``threshold``
    times in ``df``, with its exact count ``n`` — equal to the plain
    ``groupBy(cols).count().where(n >= T)``, but the exact aggregation only
    shuffles rows whose CMS estimate clears the threshold. CMS never
    undercounts ⇒ no true hitter is dropped; overcounted impostors are
    removed by the exact count."""
    sketch = cms_build(df.select(*cols), cols, width, depth)
    candidates = cms_estimate(df, cols, sketch, width, depth).where(
        F.col("freq_est") >= F.lit(threshold)
    )
    return (
        candidates.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= F.lit(threshold))
    )


# ===========================================================================
# CMS join-size estimation (md5 family — oracle-replayable end to end)
# ===========================================================================


def _cms_cells_md5(
    cols: list[Column], width: int, depth: int, salt: str
) -> list[Column]:
    """depth cell ids via the engine-portable md5 hash family (the
    ``sampling.sample_key`` trick): row r = md5(salt‖r‖key) → 60-bit int →
    flat grid offset. Slower per row than xxhash64, but DuckDB can compute
    the identical value — used where the ORACLE must rebuild the sketch."""
    key = F.concat_ws("\x1f", *[c.cast("string") for c in cols])
    return [
        F.lit(r * width)
        + F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{salt}{r}\x1f"), key)), 1, 15),
            16,
            10,
        ).cast("long")
        % width
        for r in range(depth)
    ]


def cms_build_md5(
    df: DataFrame, cols: list[str], width: int = 1024, depth: int = 4,
    salt: str = "cms-v1",
) -> DataFrame:
    """``(row, cell, n)`` counter frame (NOT collapsed to a map — the
    inner product consumes it as a frame) over the md5 hash family."""
    key = [F.col(c) for c in cols]
    cells = _cms_cells_md5(key, width, depth, salt)
    pos = df.select(
        F.explode(F.array(*cells)).alias("cell")
    )
    return pos.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))


def cms_build_xxhash(
    df: DataFrame, cols: list[str], width: int = 1024, depth: int = 4
) -> DataFrame:
    """``(cell, n)`` counter frame over the JVM-native xxhash64 family —
    the production fast path (codegen hash, no string md5 round-trip;
    measurably cheaper per row at 100 TB scan scale). Same flat-grid cell
    layout as :func:`cms_build_md5`, so the inner-product estimator
    consumes either family unchanged; md5 remains the oracle-replayable
    spec family."""
    key = [F.col(c) for c in cols]
    pos = df.select(F.explode(F.array(*_cms_cells(key, width, depth))).alias("cell"))
    return pos.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))


def cms_join_size_estimate(
    a: DataFrame,
    b: DataFrame,
    cols: list[str],
    width: int = 1024,
    depth: int = 4,
    salt: str = "cms-v1",
    family: str = "md5",
) -> DataFrame:
    """Estimate |a ⋈ b| on an equi-key WITHOUT executing the join: the
    inner product of the two Count-Min rows is an upper-bound estimator of
    Σ_k a_k·b_k (the true join size), and min over the depth rows tightens
    it (AMS/CMS inner-product estimate — collisions only ADD, so the
    estimate NEVER undercounts the true size; pytest pins both bounds).

    The planner primitive at 100 TB: sizing a candidate join costs two
    O(width·depth)-cell count aggs over single passes of each input —
    no shuffle of either table by key, no join executed. All arithmetic is
    integer. ``family="md5"`` (default) is the engine-portable spec the
    SQL oracle rebuilds bit-for-bit; ``family="xxhash64"`` is the
    JVM-native production path (same estimator guarantees — the
    never-undercounts property is hash-family-independent — pinned for
    both families in pytest).

    Returns one row: ``(est_join_rows,)``.
    """
    if family == "xxhash64":
        ca = cms_build_xxhash(a, cols, width, depth)
        cb = cms_build_xxhash(b, cols, width, depth)
    else:
        ca = cms_build_md5(a, cols, width, depth, salt)
        cb = cms_build_md5(b, cols, width, depth, salt)
    prod = (
        ca.alias("a")
        .join(cb.alias("b"), F.col("a.cell") == F.col("b.cell"))
        .select(
            (F.col("a.cell") / width).cast("int").alias("row"),
            (F.col("a.n") * F.col("b.n")).alias("p"),
        )
    )
    per_row = prod.groupBy("row").agg(F.sum("p").alias("ip"))
    # a depth row with NO overlapping cells has inner product 0 (join is
    # provably empty) — it must not silently drop out of the min
    spine = a.sparkSession.range(depth).select(F.col("id").cast("int").alias("row"))
    filled = spine.join(per_row, "row", "left").select(
        F.coalesce(F.col("ip"), F.lit(0).cast("long")).alias("ip")
    )
    return filled.agg(F.min("ip").alias("est_join_rows"))


# -- HyperLogLog ------------------------------------------------------------
#
# Mergeable distinct-count registers, built entirely from Catalyst
# expressions over the engine-portable md5 hash family (the same
# ``sampling.sample_key`` trick the CMS md5 family uses): the DuckDB
# oracle can rebuild every register — and therefore the estimate —
# bit-for-bit, so the correctness gate covers the sketch algorithm
# itself, not just row counts.
#
# Design for determinism (hash-compare across two engines):
#   * 60-bit hash h = int(md5[:15 hex]) — fits a BIGINT in both engines.
#   * bucket = top b bits (integer shift), rest = low 60-b bits.
#   * rho = leading-zeros(rest)+1 computed as (60-b) - length(bin(rest))
#     + 1 — bin() drops leading zeros in both Spark and DuckDB, so the
#     string length IS floor(log2)+1 with no floating point anywhere.
#   * the harmonic sum Σ 2^-reg is kept as the INTEGER Σ 2^(K+1-reg)
#     (K = 60-b; every term and the total fit a BIGINT) — an integer sum
#     is summation-order-independent, so Spark's nondeterministic
#     aggregation order cannot produce a different value than DuckDB's.
#     Doubles appear only in the final one-row estimate arithmetic on
#     exact integer inputs.
#
# 100 TB scale: the register frame is a map-side-combining groupBy down
# to at most m=2^b rows per group — the classic "sketch per partition,
# merge by max" shape; `hll_merge` is the same max-combine, so partial
# sketches from independent scans / days / streams union for free. The
# raw-data shuffle is ≤ m rows per group regardless of input rows.


def _h60_md5(cols: list[Column], salt: str) -> Column:
    """Engine-portable 60-bit hash: md5 over salt‖key, top 15 hex digits."""
    key = F.concat_ws("\x1f", *[c.cast("string") for c in cols])
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "\x1f"), key)), 1, 15), 16, 10
    ).cast("long")


def hll_build(
    df: DataFrame,
    cols: list[str],
    *,
    group_cols: list[str] | None = None,
    b: int = 8,
    salt: str = "hll-v1",
) -> DataFrame:
    """``(group..., bucket, rho)`` register frame, b bits of bucket
    (m = 2^b registers). One map-side-combining aggregation; output is
    ≤ m rows per group. Absent buckets mean register value 0."""
    group_cols = list(group_cols or [])
    rbits = 60 - b
    h = _h60_md5([F.col(c) for c in cols], salt)
    rest = h.bitwiseAND(F.lit((1 << rbits) - 1))
    rho = (
        F.when(rest == 0, F.lit(rbits + 1))
        .otherwise(F.lit(rbits + 1) - F.length(F.bin(rest)))
        .cast("int")
    )
    return (
        df.select(
            *group_cols,
            F.shiftright(h, rbits).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two register frames (same b, same group columns): register-wise
    max — the standard HLL merge, associative and idempotent, so partial
    sketches from any partitioning of the data combine exactly."""
    cols = a.columns
    assert cols == b.columns, "register frames must share schema"
    keys = [c for c in cols if c != "rho"]
    return a.unionByName(b).groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame,
    *,
    group_cols: list[str] | None = None,
    b: int = 8,
) -> DataFrame:
    """Distinct-count estimate per group from a register frame: the
    standard HLL estimator with the small-range linear-counting branch
    (E_raw ≤ 2.5m and empty registers exist → m·ln(m/V)).

    All aggregation is integer (order-independent); the two doubles — the
    alpha·m²·2^(K+1) constant and the final division / ln — are computed
    on exact integers, identically in the SQL oracle."""
    group_cols = list(group_cols or [])
    m = 1 << b
    k1 = 60 - b + 1  # scaled exponent ceiling: empty register => 2^(K+1)
    alpha_num = 0.7213 / (1.0 + 1.079 / m) * m * m * float(2 ** k1)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(
            F.pow(F.lit(2.0), F.lit(k1) - F.col("rho")).cast("long")
        ).alias("s_present"),
        F.count(F.lit(1)).alias("m_present"),
    )
    v = F.lit(m) - F.col("m_present")
    s_total = F.col("s_present") + v * F.lit(2 ** k1).cast("long")
    e_raw = F.lit(alpha_num) / s_total
    est = F.when(
        (e_raw <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(m) / v)
    ).otherwise(e_raw)
    return agg.select(
        *group_cols,
        F.round(est, 3).alias("est_distinct"),
        v.cast("long").alias("v_zeros"),
        F.col("m_present").cast("long").alias("m_present"),
    )


def hll_sql(
    table_expr: str,
    key_expr: str,
    *,
    group_expr: str | None = None,
    b: int = 8,
    salt: str = "hll-v1",
) -> str:
    """DuckDB mirror of hll_build→hll_estimate for the oracle gate:
    identical hash, identical integer register math, identical final
    arithmetic (the alpha constant is embedded at full repr precision so
    both engines divide the same two numbers)."""
    m = 1 << b
    rbits = 60 - b
    k1 = rbits + 1
    alpha_num = repr(0.7213 / (1.0 + 1.079 / m) * m * m * float(2 ** k1))
    gsel = f"{group_expr} AS grp," if group_expr else ""
    ggrp = "grp," if group_expr else ""
    gout = "grp," if group_expr else ""
    return f"""
WITH h AS (
  SELECT {gsel}
    ('0x' || substr(md5('{salt}' || chr(31) || ({key_expr})::VARCHAR), 1, 15))::BIGINT AS h60
  FROM {table_expr}),
regs AS (
  SELECT {ggrp} h60 // {1 << rbits} AS bucket,
    max(CASE WHEN h60 % {1 << rbits} = 0 THEN {k1}
        ELSE {k1} - length(bin(h60 % {1 << rbits})) END) AS rho
  FROM h GROUP BY {ggrp} bucket),
agg AS (
  SELECT {ggrp}
    sum(power(2.0, {k1} - rho)::BIGINT) AS s_present,
    count(*) AS m_present
  FROM regs GROUP BY {ggrp.rstrip(',') or '()'} )
SELECT {gout}
  round(CASE WHEN {alpha_num} / (s_present + ({m} - m_present) * {2 ** k1})
                  <= {2.5 * m}
             AND m_present < {m}
        THEN {float(m)} * ln({m} / ({m} - m_present))
        ELSE {alpha_num} / (s_present + ({m} - m_present) * {2 ** k1})
        END, 3) AS est_distinct,
  ({m} - m_present)::BIGINT AS v_zeros,
  m_present::BIGINT AS m_present
FROM agg
"""


# -- KMV (k minimum values / theta-style) set sketches ----------------------
#
# Distinct-count + UNION + INTERSECTION estimates from the k smallest
# hash values per set — the bottom-k / theta-sketch family (Druid/Pinot
# style set operations). Same portable md5 60-bit hash as HLL, so the
# oracle replays it exactly. Everything up to the final division is
# integer (k-th smallest hash, overlap counts), hence order-independent.
#
# 100 TB scale: dedupe is a map-side-combined distinct (the shuffle
# carries per-partition DISTINCT hashes, ∝ cardinality — the price of
# wanting set ALGEBRA; pure counting should use HLL above, whose shuffle
# is ≤ m register rows), then the bottom-k is a TakeOrdered: k rows per
# partition partial, one k-row merge. Union/intersection run on ≤ 2k
# rows. Steady-state refinement at extreme scale: pre-filter
# h < c·k·2^60/n̂ from a prior cardinality estimate before the distinct,
# which drops the shuffle to O(k) — the standard theta-sketch theta-cut.


def kmv_build(
    df: DataFrame,
    cols: list[str],
    *,
    k: int = 256,
    salt: str = "kmv-v1",
    set_name: str = "s",
) -> DataFrame:
    """``(set_name, h)`` — the k smallest distinct 60-bit hashes of the
    key. Distinct first (a hash value enters once), then ascending
    top-k."""
    h = _h60_md5([F.col(c) for c in cols], salt)
    return (
        df.select(h.alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
        .select(F.lit(set_name).alias("s"), "h")
    )


def kmv_estimate(kmv: DataFrame, *, k: int = 256) -> DataFrame:
    """``(s, est_distinct)`` per set: (k-1) · 2^60 / h_(k). If a set has
    fewer than k distinct hashes the sketch IS the exact set — estimate =
    its size."""
    agg = kmv.groupBy("s").agg(
        F.max("h").alias("hk"), F.count(F.lit(1)).alias("n")
    )
    est = F.when(
        F.col("n") < k, F.col("n").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(float(2 ** 60)) / F.col("hk"))
    return agg.select("s", F.round(est, 3).alias("est_distinct"))


def kmv_set_ops(
    a: DataFrame, b: DataFrame, *, k: int = 256
) -> DataFrame:
    """One row of set-operation estimates from two KMV sketches:
    ``(est_a, est_b, est_union, est_intersection, jaccard_k)``.

    Union sketch = k smallest of the merged distinct hashes (a valid KMV
    of A∪B by construction). Intersection via the standard theta-style
    rule: ρ = |union-sketch ∩ A-sketch ∩ B-sketch| / k and
    est∩ = ρ · est∪ — integer overlap count, one final division.

    Each input sketch (and the union sketch) is staged behind a lazy
    ``localCheckpoint``: the combiner references ``a``/``b`` four times
    each (its own estimate, both membership join sides, the union
    sketch twice) and Catalyst inlines the FULL build pipeline — the
    base-table scan + hash + distinct + top-k — into every reference
    (no ReusedExchange across the alias-renamed sides). The pins cap
    that at one build per sketch; the checkpointed frames are ≤ k rows
    (measured 1.02 → 0.28s at sf0.1, results identical)."""
    ka = a.select(F.col("h").alias("ha")).localCheckpoint(eager=False)
    kb = b.select(F.col("h").alias("hb")).localCheckpoint(eager=False)
    union_k = (
        ka.select(F.col("ha").alias("h"))
        .unionByName(kb.select(F.col("hb").alias("h")))
        .distinct()
        .orderBy("h")
        .limit(k)
        .localCheckpoint(eager=False)
    )
    # membership of the union sketch's hashes in both input sketches
    marked = (
        union_k.join(ka, union_k.h == ka.ha, "left")
        .join(kb, union_k.h == kb.hb, "left")
        .select(
            "h",
            (F.col("ha").isNotNull() & F.col("hb").isNotNull()).alias("inboth"),
        )
    )
    ua = kmv_estimate(
        ka.select(F.lit("a").alias("s"), F.col("ha").alias("h")), k=k
    )
    ub = kmv_estimate(
        kb.select(F.lit("b").alias("s"), F.col("hb").alias("h")), k=k
    )
    uu = kmv_estimate(
        union_k.select(F.lit("u").alias("s"), "h"), k=k
    )
    ov = marked.agg(
        F.sum(F.col("inboth").cast("long")).alias("n_both"),
        F.count(F.lit(1)).alias("n_union"),
    )
    return (
        ua.select(F.col("est_distinct").alias("est_a"))
        .crossJoin(ub.select(F.col("est_distinct").alias("est_b")))
        .crossJoin(uu.select(F.col("est_distinct").alias("est_union")))
        .crossJoin(ov)
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.col("n_both") / F.col("n_union") * F.col("est_union"), 3
            ).alias("est_intersection"),
            F.round(F.col("n_both") / F.col("n_union"), 6).alias("jaccard_k"),
        )
    )


def quantile_sketch_build(
    df: DataFrame,
    value_col: str,
    tag_cols: list[str],
    *,
    group_cols: list[str] | None = None,
    k: int = 256,
    salt: str = "qsk-v1",
) -> DataFrame:
    """Mergeable bottom-k quantile sketch: per group, the ``k`` rows whose
    60-bit md5 tag hashes are smallest, carrying their values —
    ``(group..., h, v)``. The tag hash is a deterministic uniform random
    tag over row identity (``tag_cols``), so the kept rows are a uniform
    ROW sample (value-weighted by row multiplicity, like a real quantile
    sketch and unlike KMV's distinct-value sample) and the sketch obeys an
    EXACT merge law: bottom-k of a union == bottom-k of the merged
    bottom-ks — associative, idempotent, no randomness to reconcile, the
    same algebra the HLL/KMV family is tested under.

    100 TB shape: the TakeOrdered/partial-top-k pattern — every partition
    keeps its local k smallest tags (map-side), one shuffle keyed by
    group reduces to the global k; sketch size is k rows per group
    regardless of input rows. Rank-error follows the uniform-sample bound
    (±O(1/√k) quantile error at 95%: k=256 → ~6 percentile points;
    production sizes k to the error budget, exactly like t-digest/KLL
    compaction budgets).
    """
    group_cols = list(group_cols or [])
    h = _h60_md5([F.col(c) for c in tag_cols], salt)
    w = Window.partitionBy(*[F.col(g) for g in group_cols]).orderBy(
        "h", "v"
    )
    return (
        df.select(
            *group_cols, h.alias("h"), F.col(value_col).alias("v")
        )
        .withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .drop("__r")
    )


def quantile_sketch_merge(a: DataFrame, b: DataFrame, *, k: int) -> DataFrame:
    """Merge two sketch frames (same group columns): bottom-k of the
    union per group. Exactly equal to building over the concatenated
    inputs when tags are distinct (deterministic hash over row identity),
    so partial sketches from any partitioning combine losslessly.

    ``k`` is REQUIRED and must equal the build k: a default independent
    of the build parameter would silently truncate sketches built with
    a larger k (merge law violated without any error)."""
    cols = a.columns
    if cols != b.columns:
        raise ValueError(
            f"sketch frames must share schema, got {cols} vs {b.columns}"
        )
    group_cols = [c for c in cols if c not in ("h", "v")]
    w = Window.partitionBy(*[F.col(g) for g in group_cols]).orderBy(
        "h", "v"
    )
    return (
        a.unionByName(b)
        .dropDuplicates(cols)
        .withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .drop("__r")
    )


def quantile_sketch_estimate(
    sketch: DataFrame, qs: list[float]
) -> DataFrame:
    """Per-group quantile estimates from a bottom-k sketch: the type-1
    (lower) sample quantile — the value at 1-based rank ``ceil(q·n)`` of
    the value-sorted sample. Integer rank arithmetic on exact micro-units
    (``ceil(q·1e6·n / 1e6)``), so both engines select the identical
    element and the result hash-matches bit-for-bit; no interpolation,
    no float formula to drift.

    Output: ``(group..., q, est)`` — one row per requested quantile.
    Driver never sees the sample; the selection is one bounded
    ``sort_array(collect_list)`` per group (≤ k elements by contract).
    Quantiles are snapped to micro-units DRIVER-side (``round(q·1e6)``)
    so the rank is ``ceil(q_micro·n / 1e6)`` in pure int64 arithmetic
    (``(q_micro·n + 999999) div 1e6``) — no float cast whose
    truncate-vs-round semantics differ between engines.

    Every q must lie in (0, 1]: q > 1 would compute rank > n (a mid-job
    element_at failure under ANSI, a silent NULL otherwise) and q <= 0
    would silently clamp to rank 1 — both rejected at call time.
    """
    bad_qs = [q for q in qs if not (0.0 < q <= 1.0)]
    if bad_qs:
        raise ValueError(
            f"quantiles must lie in (0, 1], got {bad_qs}"
        )
    group_cols = [c for c in sketch.columns if c not in ("h", "v")]
    agg = sketch.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("v")).alias("__vs"),
        F.count(F.lit(1)).alias("__n"),
    )
    qmicros = F.array(*[F.lit(int(round(q * 1_000_000))) for q in qs])
    # numerator <= 1e6 · k — exact in double, so floor is exact int div
    rank = F.greatest(
        F.floor(
            (F.col("__qm") * F.col("__n") + 999_999) / F.lit(1_000_000.0)
        ),
        F.lit(1),
    ).cast("int")
    return (
        agg.select(
            *group_cols,
            F.explode(qmicros).alias("__qm"),
            F.col("__vs"),
            F.col("__n"),
        )
        .select(
            *group_cols,
            (F.col("__qm") / F.lit(1_000_000.0)).alias("q"),
            F.element_at("__vs", rank).alias("est"),
        )
    )
