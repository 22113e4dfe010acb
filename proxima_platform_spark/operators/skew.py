"""Skew handling: salting utilities for hot keys.

The reference delegates distribution entirely to the Beam runner (SURVEY §4);
in Spark, skew is the caller-visible failure mode at 100 TB, with three
standard answers layered by preference:

  1. **map-side partial aggregation** — free for algebraic `groupBy().agg()`
     (Catalyst always emits partial+final), so aggregation skew rarely needs
     anything manual;
  2. **AQE skew-join splitting** (`spark.sql.adaptive.skewJoin.enabled`) —
     handles sort-merge join skew at runtime;
  3. **explicit salting** (this module) — for the cases neither covers:
     shuffle-hash/broadcast-infeasible joins on a hot key, and per-key
     Python operators (`applyInPandas`) where one key's group must not land
     on a single worker.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `big` has skewed join keys: salt the big side into
    `buckets` sub-keys and replicate the small side once per bucket, so a
    hot key's rows spread over `buckets` tasks instead of one.

    Cost model: small side shuffles ×buckets (choose buckets ≈ the skew
    factor, not more); big side work is unchanged. Result equals
    ``big.join(small, on, how)`` exactly.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted_big = big.withColumn(
        "__salt", F.pmod(F.spark_partition_id() + F.crc32(F.col(on).cast("string")), F.lit(buckets))
    )
    replicated_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = salted_big.join(replicated_small, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def salted_two_phase_agg(
    df: DataFrame,
    key: str | Column,
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    *,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt, for aggregates whose
    *buffers* Catalyst cannot partial-aggregate efficiently (collect_list
    feeding a groupReduce, large binary max_by buffers): phase 1 aggregates
    per (key, salt) — a hot key spreads over `buckets` tasks — phase 2
    merges the bounded per-salt partials per key.

    ``partial_aggs`` aggregate raw rows; ``merge_aggs`` aggregate the
    partial columns (reference them by their aliases). The decomposition
    must be associative — the same contract Beam's Combine.perKey imposes
    (WindowedStream.java:189).
    """
    keycol = F.col(key) if isinstance(key, str) else key
    salted = df.withColumn(
        "__salt",
        F.pmod(F.spark_partition_id() + F.crc32(keycol.cast("string")), F.lit(buckets)),
    )
    phase1 = salted.groupBy(keycol.alias("__key"), F.col("__salt")).agg(*partial_aggs)
    return (
        phase1.groupBy("__key")
        .agg(*merge_aggs)
        .withColumnRenamed("__key", key if isinstance(key, str) else "key")
    )
