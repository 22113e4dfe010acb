"""Streaming sinks: persist / write / persistIntoTargetFamily analogs.

Reference mapping (SURVEY §2.2):
  * persist(...)            → to_changelog + writeStream (BeamStream.persist:752)
  * write(repo)             → writeStream to the family's storage
    (BeamStream.write:766, beam/io/ProximaIO.java)
  * persistIntoTargetFamily → foreachBatch routing into a named family
    (BeamStream.persistIntoTargetFamily:642)
  * online vs bulk writers  → per-microbatch append (low latency) vs
    time-partitioned bulk file commit (OnlineAttributeWriter /
    BulkAttributeWriter, AbstractBulkFileSystemAttributeWriter)

Exactly-once: Structured Streaming checkpointing + idempotent/transactional
sinks — the reference's BufferUntilCheckpoint (beam/core/.../transforms/
BufferUntilCheckpoint.java) is built into the engine here.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from proxima_platform_spark.catalog.descriptors import AttributeFamilyDescriptor


def write_changelog(
    stream_df: DataFrame,
    family: AttributeFamilyDescriptor,
    *,
    checkpoint: str,
    trigger: dict | None = None,
    query_name: str | None = None,
) -> StreamingQuery:
    """Online writer: append each micro-batch to the family's storage.

    The analog of OnlineAttributeWriter — per-element ack becomes
    per-micro-batch commit with checkpointed offsets (at-least-once into an
    idempotent sink = effectively-once).
    """
    fmt = family.storage_format
    writer = (
        stream_df.writeStream.format("parquet" if fmt == "inmem" else fmt)
        .option("path", family.path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if query_name:
        writer = writer.queryName(query_name)
    return writer.trigger(**(trigger or {"availableNow": True})).start()


def write_bulk(
    stream_df: DataFrame,
    family: AttributeFamilyDescriptor,
    *,
    checkpoint: str,
    roll_interval: str = "10 minutes",
    trigger: dict | None = None,
) -> StreamingQuery:
    """Bulk writer: time-partitioned file flush (BulkAttributeWriter /
    AbstractBulkFileSystemAttributeWriter — the keyed flush-timer becomes a
    stamp-derived partition column; files commit per micro-batch and land in
    time-bucketed directories, the reference's NamingConvention)."""
    bucketed = stream_df.withColumn(
        "stamp_bucket",
        F.date_format(F.window("stamp", roll_interval).getField("start"), "yyyyMMdd-HHmm"),
    )
    return (
        bucketed.writeStream.format("parquet")
        .option("path", family.path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("stamp_bucket")
        .outputMode("append")
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def foreach_batch_into(
    stream_df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    *,
    checkpoint: str,
    trigger: dict | None = None,
    query_name: str | None = None,
) -> StreamingQuery:
    """persistIntoTargetFamily / custom-sink escape hatch: run ``batch_fn``
    per micro-batch (BeamStream.persistIntoTargetFamily:642)."""
    writer = (
        stream_df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
    )
    if query_name:
        writer = writer.queryName(query_name)
    return writer.trigger(**(trigger or {"availableNow": True})).start()
