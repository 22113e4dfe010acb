"""Time helpers shared by queries and the oracle contract.

The reference's stamps are epoch-millis longs (StreamElement.java:244); the
driver's `events` table carries nanosecond parquet timestamps which Spark
reads as long (spark.sql.legacy.parquet.nanosAsLong). These helpers normalize
both worlds to epoch-millis / TimestampType.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def epoch_ms(ts: Column) -> Column:
    """TimestampType → epoch milliseconds (bigint)."""
    return (F.unix_micros(ts) / 1000).cast("long")


def from_epoch_ms(ms: Column) -> Column:
    """epoch milliseconds (bigint) → TimestampType."""
    return F.timestamp_millis(ms.cast("long"))


def nanos_to_timestamp(ns: Column) -> Column:
    """long nanoseconds → TimestampType (micros precision)."""
    return F.timestamp_micros((ns / 1000).cast("long"))


def window_start_ms(window_col: Column) -> Column:
    """F.window(...) struct → window start as epoch ms (stable across engines,
    unlike timestamp hashing)."""
    return epoch_ms(window_col.getField("start"))
