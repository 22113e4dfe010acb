"""Pure-DataFrame Bloom filter: build a broadcastable bitset from a key
column, probe it JVM-side, and use it as a pre-filter in front of an exact
semi-join.

Spark ships a BloomFilter in ``DataFrameStatFunctions``, but it materializes
on the driver and probing from Python needs a row-at-a-time UDF. This
implementation keeps BOTH sides in Catalyst expressions:

* build — k hash positions per key (``xxhash64(key, seed)`` per seed,
  ``pmod`` into m bits), exploded and ``bit_or``-combined into 64-bit words
  (map-side partial aggregation — the filter build is one shuffle of
  |keys| × k tiny rows), then collapsed to a SINGLE ROW holding a
  ``map<long,long>`` of the non-zero words. The collapsed row is
  O(m/64) ≤ a few KB for eval-suite-sized key sets — broadcastable.
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

from pyspark.sql import Column, DataFrame
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
    """One-row DataFrame ``{words: map<long,long>, num_bits, k}`` — the
    Bloom bitset over ``keys[col]`` as sparse 64-bit words."""
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(col), num_bits, k))).alias("pos")
    )
    words = pos.select(
        F.expr("pos DIV 64").alias("w"),
        F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("mask"),
    )
    per_word = words.groupBy("w").agg(F.bit_or("mask").alias("bits"))
    return per_word.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("w", "bits")))
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
        F.expr(
            f"(coalesce(element_at(__bloom.words, __p{i} DIV 64), 0L)"
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
    cartesian blow-up); the lookup is least() over element_at — codegen."""
    key = [F.col(c) for c in cols]
    cells = _cms_cells(key, width, depth)
    lookups = [
        F.coalesce(
            F.element_at(F.col("__cms.cells"), c.cast("int")), F.lit(0).cast("long")
        )
        for c in cells
    ]
    est = lookups[0] if depth == 1 else F.least(*lookups)
    return (
        probe.crossJoin(F.broadcast(cms.select(F.struct("cells").alias("__cms"))))
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
