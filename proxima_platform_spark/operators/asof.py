"""As-of join: pair each left row with the most recent right row at or
before its stamp, per key.

Extension beyond the reference surface (SURVEY §2.6 notes the reference has
no as-of/range joins) — the canonical event-enrichment operator for
changelog data ("what was the user's latest X when Y happened").

Spark has no native as-of join; the composition here is the scale-correct
one: union both sides, one shuffle on (key), and a running last-value
carry-forward window per key — O(n log n) per key partition, no range
cross-product, no per-row probe. Equivalent SQL engines expose the same
semantics as ASOF JOIN (the DuckDB oracle uses it directly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_stamp: str = "stamp",
    right_stamp: str = "stamp",
    right_values: list[str] | None = None,
    strict: bool = False,
    tolerance_ms: int | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_stamp <= left_stamp`` (``<`` when strict) for the same key.

    right_values: right columns to carry (default: all non-key/stamp).
    tolerance_ms: drop matches older than this bound (pandas merge_asof
    tolerance semantics); None = unbounded lookback.
    """
    rvals = right_values or [
        c for c in right.columns if c not in (key, right_stamp)
    ]
    lcols = left.columns

    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_stamp).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in lcols]).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rvals],
        F.lit(None).cast("timestamp").alias("__rt"),
    )
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_stamp).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in rvals],
        F.col(right_stamp).cast("timestamp").alias("__rt"),
    )
    merged = l.unionByName(r)

    # right rows sort before left rows at an equal stamp unless strict,
    # so a tie is visible to the left row (<=); strict flips the order
    tie = F.col("__is_left").asc() if not strict else F.col("__is_left").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), tie)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    carried = merged.select(
        "__k", "__t", "__is_left", "__lrow",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__c_{c}")
            for c in rvals
        ],
        F.last(F.col("__rt"), ignorenulls=True).over(w).alias("__c_rt"),
    )
    out = carried.where(F.col("__is_left") == 1)
    if tolerance_ms is not None:
        in_tol = (
            F.col("__c_rt").isNotNull()
            & (F.unix_micros(F.col("__t")) - F.unix_micros(F.col("__c_rt"))
               <= tolerance_ms * 1000)
        )
        carried_cols = [
            F.when(in_tol, F.col(f"__c_{c}")).alias(f"__c_{c}") for c in rvals
        ]
        out = out.select("__k", "__t", "__lrow", *carried_cols)
    return out.select(
        *[F.col("__lrow").getField(c).alias(c) for c in left.columns],
        *[F.col(f"__c_{c}").alias(f"right_{c}") for c in rvals],
    )
