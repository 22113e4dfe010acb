"""Exact distributed order statistics WITHOUT a global sort.

Extension beyond the reference surface (north star). ``quartiles_exact``
and friends compute exact quantiles by sorting — fine when the frame is
small, fatal at 100 TB (a global sort of the corpus is the single most
expensive thing a cluster can do). :func:`exact_quantile_bisect` is the
scale path: iterative histogram refinement (the classic
selection-by-bisection used by warehouse engines for exact percentile):
each pass partitions the CURRENT value range into ``slices`` equal
integer slices, aggregates one bounded count histogram (map-side
combined, ``slices`` cells), locates the slice containing the target
rank, and recurses into it. log_slices(range) passes — 4 passes at 256
slices cover a 2^32 micro-unit range — each a filtered scan whose
``BETWEEN`` predicate pushes down to parquet min/max pruning. Driver
materialization is ≤ ``slices`` counts per pass (bounded, commented).

The result is the EXACT type-1 (lower) sample quantile — the value at
1-based rank ceil(q_micro·n/1e6) in micro-unit integer rank arithmetic,
the same convention as ``sketch.quantile_sketch_estimate`` — so a SQL
oracle replays it by direct rank selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_quantile_bisect(
    df: DataFrame,
    value_col: str,
    q: float,
    *,
    scale: int = 1_000_000,
    slices: int = 256,
    max_passes: int = 12,
) -> DataFrame:
    """One-row (n, rank, value) exact type-1 quantile of ``value_col``
    by histogram bisection — no global sort, ever.

    Values are quantized to ``scale`` micro-units (round-half-up, the
    repo's integer convention) — the quantile is exact over the
    quantized domain. Each refinement pass is one jobs-scan with the
    narrowing ``BETWEEN`` filter; ``max_passes`` is a loud safety rail
    (12 passes at 256 slices resolve a 2^96 range — unreachable for
    int64 micro-units, so hitting it means a logic bug, not data).

    Scale notes (100 TB): the driver sees min/max (2 longs), then
    ≤ ``slices`` (bucket, count) rows per pass — never data; the scan
    volume SHRINKS per pass as the BETWEEN window tightens under
    parquet min/max pruning; and the final in-range distinct-value
    count is ≤ range ≤ ``slices`` values by the loop exit condition.
    """
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must lie in (0, 1], got {q}")
    if slices < 2:
        raise ValueError(f"slices must be >= 2, got {slices}")
    spark = df.sparkSession
    v = F.round(F.col(value_col).cast("double") * scale).cast("long")
    # keep the RAW column alongside the micro-quantized one: the exact
    # BETWEEN runs on __v (an expression — not pushable), so each pass
    # ALSO filters the raw column on the equivalent widened range, and
    # THAT predicate reaches the parquet scan (PushedFilters — the
    # min/max pruning the 100 TB story depends on; plan-asserted)
    vals = df.select(
        F.col(value_col).cast("double").alias("__raw"), v.alias("__v")
    ).where(F.col("__v").isNotNull())

    def _in_range(lo: int, hi: int):
        # v = round(raw*scale) in [lo, hi] implies raw in
        # [(lo-0.5)/scale, (hi+0.5)/scale]. The pushable raw bracket
        # only needs to be a SUPERSET (the exact __v BETWEEN is ANDed),
        # so widen it by 2/scale PLUS a 1e-12 relative pad: at |raw|
        # near the 2^53/scale quantization cap a double ulp of the
        # computed bound (~2e-6 at 9e9) would otherwise exceed the old
        # 0.5/scale slack and exclude boundary rows (r09 ADVICE). The
        # relative pad dominates ulp (2.2e-16 relative) by 4 orders.
        lo_b = (lo - 2) / scale
        hi_b = (hi + 2) / scale
        lo_b -= abs(lo_b) * 1e-12
        hi_b += abs(hi_b) * 1e-12
        return (
            (F.col("__raw") >= lo_b)
            & (F.col("__raw") <= hi_b)
            & F.col("__v").between(lo, hi)
        )

    # one agg: n, min, max (3 longs to the driver)
    head = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("__v").alias("lo"),
        F.max("__v").alias("hi"),
    ).collect()[0]
    n, lo, hi = head.n, head.lo, head.hi
    if n == 0:
        return spark.createDataFrame(
            [], "n long, rank long, value double"
        )
    q_micro = int(round(q * 1_000_000))
    rank = (q_micro * n + 999_999) // 1_000_000  # ceil, pure int
    rank = max(rank, 1)

    k = rank
    for _ in range(max_passes):
        if hi - lo + 1 <= slices:
            break
        width = (hi - lo) // slices + 1
        # <= `slices` (bucket, count) rows to the driver — bounded
        hist = dict(
            vals.where(_in_range(lo, hi))
            .groupBy(F.expr(f"(__v - {lo}) div {width}").alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        acc = 0
        for b in range(slices):
            c = hist.get(b, 0)
            if acc + c >= k:
                k -= acc
                lo, hi = lo + b * width, min(lo + (b + 1) * width - 1, hi)
                break
            acc += c
        else:  # pragma: no cover — rank <= n guarantees a hit
            raise RuntimeError("bisection lost the rank — logic bug")
    else:
        raise RuntimeError(
            f"range not resolved in {max_passes} passes — logic bug"
        )

    # final range spans <= `slices` distinct values: exact per-value
    # counts (bounded driver frame), pick the k-th in value order
    final = sorted(
        vals.where(_in_range(lo, hi))
        .select("__v")
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    acc = 0
    for val, c in final:
        if acc + c >= k:
            return spark.createDataFrame(
                [(n, rank, val / scale)], "n long, rank long, value double"
            )
        acc += c
    raise RuntimeError("rank exceeded in-range count — logic bug")


def exact_quantiles_bisect(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    *,
    scale: int = 1_000_000,
    slices: int = 256,
    max_passes: int = 12,
) -> list[float] | None:
    """Several exact type-1 quantiles of ``value_col`` in ONE bisection:
    the :func:`exact_quantile_bisect` recursion run for every rank in
    lockstep, with each refinement pass aggregating ONE combined
    histogram scan instead of one scan per rank.

    The banded pipelines (ccnet_pipeline, perplexity_band_prep) need
    BOTH ends of a [lo_q, hi_q] band; calling the single-rank bisector
    twice reads the corpus 2·passes times and pays 2·passes sequential
    driver round-trips. Here every pass filters to the UNION of the
    still-open ranges (each target's raw-column bracket still reaches
    the parquet scan — the OR of pushable ranges is pushable) and
    CASE-assigns each row to (range index, bucket), so k ranks cost the
    same number of scans as one. Ranges are pairwise equal-or-disjoint
    by construction (all targets subdivide the same initial [min, max]
    into aligned slices), so the CASE assignment is total and
    unambiguous; equal ranges share one histogram.

    Per-rank arithmetic (micro-unit quantization, ceil-rank, slice
    selection, final in-range value pick) is IDENTICAL to the
    single-rank bisector — the returned values match
    ``exact_quantile_bisect(df, c, q).collect()[0].value`` exactly.

    Returns the quantile values aligned with ``qs``, or ``None`` when
    the frame has no non-null rows (callers branch to their empty
    schema, mirroring the single-rank empty frame)."""
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"q must lie in (0, 1], got {q}")
    if slices < 2:
        raise ValueError(f"slices must be >= 2, got {slices}")
    v = F.round(F.col(value_col).cast("double") * scale).cast("long")
    vals = df.select(
        F.col(value_col).cast("double").alias("__raw"), v.alias("__v")
    ).where(F.col("__v").isNotNull())

    def _in_range(lo: int, hi: int):
        # identical pushdown bracket to exact_quantile_bisect
        lo_b = (lo - 2) / scale
        hi_b = (hi + 2) / scale
        lo_b -= abs(lo_b) * 1e-12
        hi_b += abs(hi_b) * 1e-12
        return (
            (F.col("__raw") >= lo_b)
            & (F.col("__raw") <= hi_b)
            & F.col("__v").between(lo, hi)
        )

    head = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("__v").alias("lo"),
        F.max("__v").alias("hi"),
    ).collect()[0]
    n, lo0, hi0 = head.n, head.lo, head.hi
    if n == 0:
        return None

    targets = []
    for q in qs:
        q_micro = int(round(q * 1_000_000))
        rank = max((q_micro * n + 999_999) // 1_000_000, 1)
        targets.append({"lo": lo0, "hi": hi0, "k": rank})

    def _grouped(active):
        """active targets grouped by (lo, hi) — ranges are pairwise
        equal-or-disjoint, so a group shares one histogram."""
        groups: dict[tuple[int, int], list[dict]] = {}
        for t in active:
            groups.setdefault((t["lo"], t["hi"]), []).append(t)
        return groups

    for _ in range(max_passes):
        active = [t for t in targets if t["hi"] - t["lo"] + 1 > slices]
        if not active:
            break
        groups = _grouped(active)
        keys = sorted(groups)
        widths = {
            (lo, hi): (hi - lo) // slices + 1 for (lo, hi) in keys
        }
        cond = None
        bucket = None
        for i, (lo, hi) in enumerate(keys):
            r = _in_range(lo, hi)
            cond = r if cond is None else (cond | r)
            w = widths[(lo, hi)]
            assign = F.struct(
                F.lit(i).alias("ri"),
                F.expr(f"(__v - {lo}) div {w}").alias("b"),
            )
            bucket = (
                F.when(F.col("__v").between(lo, hi), assign)
                if bucket is None
                else bucket.when(F.col("__v").between(lo, hi), assign)
            )
        # <= slices * len(keys) (range, bucket, count) rows — bounded
        hist: dict[tuple[int, int], int] = {}
        for row in (
            vals.where(cond)
            .groupBy(bucket.alias("rb"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ):
            hist[(row.rb.ri, row.rb.b)] = row.c
        for i, (lo, hi) in enumerate(keys):
            w = widths[(lo, hi)]
            for t in groups[(lo, hi)]:
                acc = 0
                for b in range(slices):
                    c = hist.get((i, b), 0)
                    if acc + c >= t["k"]:
                        t["k"] -= acc
                        t["lo"] = lo + b * w
                        t["hi"] = min(lo + (b + 1) * w - 1, hi)
                        break
                    acc += c
                else:  # pragma: no cover — rank <= n guarantees a hit
                    raise RuntimeError(
                        "bisection lost a rank — logic bug"
                    )
    else:
        if any(t["hi"] - t["lo"] + 1 > slices for t in targets):
            raise RuntimeError(
                f"range not resolved in {max_passes} passes — logic bug"
            )

    # final ranges span <= slices distinct values each: ONE scan of
    # exact per-value counts across the union (bounded driver frame)
    groups = _grouped(targets)
    keys = sorted(groups)
    cond = None
    ridx = None
    for i, (lo, hi) in enumerate(keys):
        r = _in_range(lo, hi)
        cond = r if cond is None else (cond | r)
        ridx = (
            F.when(F.col("__v").between(lo, hi), F.lit(i))
            if ridx is None
            else ridx.when(F.col("__v").between(lo, hi), F.lit(i))
        )
    finals: dict[int, list] = {i: [] for i in range(len(keys))}
    for row in (
        vals.where(cond)
        .groupBy(ridx.alias("ri"), F.col("__v").alias("mv"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ):
        finals[row.ri].append((row.mv, row.c))
    out: list[float] = []
    for t in targets:
        i = keys.index((t["lo"], t["hi"]))
        acc = 0
        val = None
        for vv, c in sorted(finals[i]):
            if acc + c >= t["k"]:
                val = vv / scale
                break
            acc += c
        if val is None:
            raise RuntimeError(
                "rank exceeded in-range count — logic bug"
            )
        out.append(val)
    return out
