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
