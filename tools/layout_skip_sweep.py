#!/usr/bin/env python
"""Measured parquet file-skip rates per layout key (VERDICT r12 #6).

The layout queries' locality claims (Hilbert chunks 1.67x tighter
bounding boxes than Morton; either curve far tighter than a single-
column sort) were quantified ABSTRACTLY in tests/test_layout.py. This
sweep measures the thing a 100 TB reader actually feels: how many
parquet FILES a two-predicate range scan can skip on footer min/max
stats alone, per layout, on the real sf0.1 events table.

Method — exactly what a clustering writer + pruning reader do:

1. project events to (event_id, user_id, cents) and derive each
   layout's sort key: single-column sorts (user_id / cents), the
   Morton key, the Hilbert key — the SAME key functions the declared
   zorder_layout / hilbert_layout queries ship;
2. write each layout with ``repartitionByRange(N_FILES, key)
   .sortWithinPartitions(key)`` — one file per range partition, the
   standard clustered-write shape;
3. read every file's footer min/max for BOTH dimensions (pyarrow
   row-group statistics, aggregated per file — no data pages touched);
4. for a deterministic grid of two-predicate rectangles (every
   combination of QUERY_FRACS-sized windows at GRID x GRID positions),
   count the files whose [min,max] boxes intersect the rectangle: a
   reader must open exactly those; everything else is a FOOTER-ONLY
   SKIP. Report the mean skip fraction per layout.

Single-column sorts bound only their own column per file (the other
column's min/max spans the whole domain -> ~zero skips on the other
predicate); space-filling curves bound BOTH, and Hilbert's
no-seam adjacency keeps the boxes square rather than Morton's
occasionally-split rectangles. Prints one JSON line; the measured
numbers live in SCALE.md's layout row.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_FILES = int(os.environ.get("SWEEP_FILES", "64"))
GRID = 4            # GRID x GRID rectangle positions per size
QUERY_FRACS = (0.125, 0.25)  # rectangle side as a fraction of each domain


def file_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max of ``cols`` from parquet footers only."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        pf = pq.ParquetFile(os.path.join(path, name))
        idx = {c: pf.schema_arrow.get_field_index(c) for c in cols}
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(pf.metadata.num_row_groups):
            for c in cols:
                st = pf.metadata.row_group(rg).column(idx[c]).statistics
                assert st is not None and st.has_min_max, (name, c)
                lo[c] = st.min if lo[c] is None else min(lo[c], st.min)
                hi[c] = st.max if hi[c] is None else max(hi[c], st.max)
        out.append({c: (lo[c], hi[c]) for c in cols})
    return out


def skip_fraction(stats: list[dict], rects: list[dict]) -> float:
    """Mean fraction of files a footer-stats reader skips per rectangle."""
    total = 0.0
    for r in rects:
        read = sum(
            1
            for f in stats
            if all(f[c][0] <= r[c][1] and f[c][1] >= r[c][0] for c in r)
        )
        total += 1.0 - read / len(stats)
    return total / len(rects)


def main() -> int:
    from pyspark.sql import SparkSession, functions as F

    from proxima_platform_spark.functions.layout import (
        morton_key_2d,
        with_hilbert_key_2d,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", str(N_FILES))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    import __spark_entry__ as entry

    ev = entry._events(spark, SF_DIR).select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )

    base = ev
    layouts = {
        "sort_user_id": base.withColumn("k", F.col("user_id")),
        "sort_cents": base.withColumn("k", F.col("cents")),
        "morton": base.withColumn(
            "k", morton_key_2d(F.col("user_id"), F.col("cents"))
        ),
        "hilbert": with_hilbert_key_2d(
            base, F.col("user_id"), F.col("cents"), out="k"
        ),
    }

    dims = ["user_id", "cents"]
    bounds = ev.agg(
        *[F.min(c).alias(f"lo_{c}") for c in dims],
        *[F.max(c).alias(f"hi_{c}") for c in dims],
    ).first()
    def window(c: str, frac: float, g: int) -> tuple[float, float]:
        lo, hi = bounds[f"lo_{c}"], bounds[f"hi_{c}"]
        span = (hi - lo) * frac
        start = lo + (hi - lo - span) * g / max(GRID - 1, 1)
        return (start, start + span)

    rects = []
    bands = {c: [] for c in dims}  # single-predicate queries per dim
    for frac in QUERY_FRACS:
        for gi in range(GRID):
            for gj in range(GRID):
                rects.append({
                    c: window(c, frac, g)
                    for c, g in zip(dims, (gi, gj))
                })
            for c in dims:
                bands[c].append({c: window(c, frac, gi)})

    # 3D section (r13, morton_key_nd): a third predicate dimension
    # (event_id — the arrival-order axis) and three-predicate boxes.
    # The 2D layouts leave event_id unbounded per file; only the
    # 3-column interleave bounds all three.
    from proxima_platform_spark.functions.layout import morton_key_nd

    dims3 = ["user_id", "cents", "event_id"]
    bounds3 = ev.agg(
        *[F.min(c).alias(f"lo_{c}") for c in dims3],
        *[F.max(c).alias(f"hi_{c}") for c in dims3],
    ).first()

    def window3(c: str, frac: float, g: int) -> tuple[float, float]:
        lo, hi = bounds3[f"lo_{c}"], bounds3[f"hi_{c}"]
        span = (hi - lo) * frac
        start = lo + (hi - lo - span) * g / max(GRID - 1, 1)
        return (start, start + span)

    boxes3 = [
        {c: window3(c, frac, g) for c, g in zip(dims3, (gi, gj, gk))}
        for frac in (0.25, 0.5)
        for gi in range(GRID)
        for gj in range(GRID)
        for gk in range(GRID)
    ]
    layouts3 = {
        "sort_user_id": layouts["sort_user_id"],
        "morton_2d": layouts["morton"],
        "hilbert_2d": layouts["hilbert"],
        "morton_3d": base.withColumn(
            "k",
            morton_key_nd(
                [F.col("user_id"), F.col("cents"), F.col("event_id")],
                bits=17,
            ),
        ),
    }

    work = tempfile.mkdtemp(prefix="layout_skip_")
    results = {}
    results3 = {}
    files = {}
    try:
        for name, df in layouts.items():
            path = os.path.join(work, name)
            (
                df.repartitionByRange(N_FILES, "k")
                .sortWithinPartitions("k")
                .drop("k")
                .write.mode("overwrite")
                .parquet(path)
            )
            stats = file_stats(path, dims)
            files[name] = len(stats)
            results[name] = {
                "two_predicate": round(skip_fraction(stats, rects), 4),
                **{
                    f"{c}_only": round(skip_fraction(stats, bands[c]), 4)
                    for c in dims
                },
            }
        for name, df in layouts3.items():
            path = os.path.join(work, f"d3_{name}")
            (
                df.repartitionByRange(N_FILES, "k")
                .sortWithinPartitions("k")
                .drop("k")
                .write.mode("overwrite")
                .parquet(path)
            )
            stats = file_stats(path, dims3)
            results3[name] = round(skip_fraction(stats, boxes3), 4)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "layout_file_skip_fraction",
                "sf_dir": SF_DIR,
                "n_files": files,
                "n_rects": len(rects),
                "query_fracs": list(QUERY_FRACS),
                "skip_fraction": results,
                "skip_fraction_3pred": results3,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
