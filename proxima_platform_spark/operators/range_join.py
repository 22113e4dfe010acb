"""Range (interval-overlap) join — a scale-path custom operator.

Extension beyond the reference surface (north star; the reference has no
theta/range joins — SURVEY §2.6 "absent" list). The problem: joining points
to intervals on ``start <= point < end`` has no equality key, so Catalyst
can only plan a BroadcastNestedLoopJoin (fine for a broadcast-sized side,
an O(n·m) disaster at 100 TB).

The classic fix is **time binning**: explode each interval into every bin
it touches, map each point to its single bin, equi-join on the bin id, and
re-check the exact predicate on the (hugely reduced) candidate set. Every
(interval, point) match meets in exactly one bin — the point's — so the
join produces no duplicates and needs no distinct, regardless of interval
length.

Scale shape: one narrow explode (``ceil(len/bin)+1`` rows per interval —
2 when ``bin_seconds`` ≥ the typical interval), one hash-partitioned
equi-join on the bin id, the exact predicate as a post-join filter.
``bin_seconds`` is the volume knob: larger bins → fewer exploded interval
rows but more same-bin candidate pairs to filter; size it near the typical
interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join_binned(
    intervals: DataFrame,
    points: DataFrame,
    *,
    start_col: str,
    end_col: str,
    point_col: str,
    bin_seconds: int,
) -> DataFrame:
    """Inner-join ``points`` to ``intervals`` on
    ``start_col <= point_col < end_col`` via bin-id equi-join.

    Returns all columns of both inputs for every matching
    (interval, point) pair — exactly the rows of the naive theta join,
    without ever planning one (plan-asserted no BroadcastNestedLoopJoin).
    """
    if bin_seconds <= 0:
        raise ValueError(f"bin_seconds must be positive, got {bin_seconds}")
    s = F.unix_timestamp(F.col(start_col))
    e = F.unix_timestamp(F.col(end_col))
    p = F.unix_timestamp(F.col(point_col))

    # every bin the half-open interval [s, e) touches; e-1 because a bin
    # boundary at exactly e is not covered
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(s / bin_seconds), F.floor((e - 1) / bin_seconds)
            )
        ),
    )
    pt = points.withColumn("__bin", F.floor(p / bin_seconds))
    joined = iv.join(pt, "__bin").where(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col))
    )
    return joined.drop("__bin")
