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

import pandas as pd

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


def asof_join_stream(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_stamp: str = "stamp",
    right_stamp: str = "stamp",
    right_values: list[str] | None = None,
    tolerance_ms: int | None = None,
    watermark_delay: str = "10 seconds",
    api: str = "auto",
) -> DataFrame:
    """Streaming as-of join — point-in-time enrichment ONLINE: each left
    event emits with the most recent right values at-or-before its stamp
    (non-strict, matching the batch default), per key. The third consumer
    of the shared keyed engine ``reduce_value_state_by_key_stream``
    (after reduce-value-state and the retract join): both sides union
    into one keyed stream, the per-key state is just the latest right
    row (O(1)), and the engine's (stamp, side) event-time ordering makes
    a right update at an equal stamp visible to the left row — the batch
    window's tie rule. Rows buffer until the watermark passes them, so
    out-of-order arrivals within the bound enrich correctly; output
    trails by ``watermark_delay`` like every event-time-exact path here.
    Stamps order at millisecond precision (the engine's granularity).

    Output schema = ``left.columns`` + ``right_{c}`` for each carried
    right column — identical to :func:`asof_join`, so batch and stream
    are drop-in twins (pinned row-for-row in
    ``TestStreamingAsofJoin``)."""
    from proxima_platform_spark.streaming.stateful import (
        _pack_value,
        _unpack_value,
        reduce_value_state_by_key_stream,
    )

    rvals = right_values or [
        c for c in right.columns if c not in (key, right_stamp)
    ]
    lcols = [c for c in left.columns]

    l_norm = left.select(
        F.col(key).alias("__k"),
        F.col(left_stamp).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in rvals
        ],
    )
    r_norm = right.select(
        F.col(key).alias("__k"),
        F.col(right_stamp).alias("__t"),
        F.lit(0).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
            for c in lcols
        ],
        *[F.col(c).alias(f"__r_{c}") for c in rvals],
    )
    merged = l_norm.unionByName(r_norm)

    def ddl(df: DataFrame, c: str) -> str:
        return df.schema[c].dataType.simpleString()

    output_schema = ", ".join(
        [f"`{c}` {ddl(left, c)}" for c in lcols]
        + [f"`right_{c}` {ddl(right, c)}" for c in rvals]
    )

    def state_fn(st, k, row):
        if row["__side"] == 0:
            # right update: state = packed (stamp_ms, values) — packed so
            # the engine's JSON state serialization round-trips timestamps
            # and bytes losslessly
            stamp_ms = int(pd.Timestamp(row["__t"]).value // 1_000_000)
            return [stamp_ms, [_pack_value(row[f"__r_{c}"]) for c in rvals]], None
        out = {c: row[f"__l_{c}"] for c in lcols}
        vals = [None] * len(rvals)
        if st:
            r_ms, packed = st
            ev_ms = int(pd.Timestamp(row["__t"]).value // 1_000_000)
            if tolerance_ms is None or ev_ms - r_ms <= tolerance_ms:
                vals = [_unpack_value(v) for v in packed]
        out.update({f"right_{c}": v for c, v in zip(rvals, vals)})
        return st, out

    return reduce_value_state_by_key_stream(
        merged,
        key="__k",
        stamp="__t",
        state_fn=state_fn,
        initial_state=[],
        output_schema=output_schema,
        sorted=True,
        watermark_delay=watermark_delay,
        order_cols=("__side",),
        api=api,
    )
