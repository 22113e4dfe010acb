"""Commit-log stream sources.

Reference: BeamDataOperator.getStream(name, pipeline, position,
stopAtCurrent, useEventTime, attrs…) (beam/core/.../BeamDataOperator.java:160-237)
over SDF sources (CommitLogRead.java / DirectUnboundedSource.java).

Position semantics (core/.../storage/commitlog/Position.java:28-34):
  OLDEST  → startingOffsets=earliest
  NEWEST  → startingOffsets=latest
  CURRENT → resume from the query's checkpointed offsets
stopAtCurrent ≈ Trigger.AvailableNow on the reader's query.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession, functions as F

from proxima_platform_spark.catalog.descriptors import AttributeFamilyDescriptor

_POSITION_TO_OFFSETS = {"OLDEST": "earliest", "NEWEST": "latest", "CURRENT": None}


def commit_log_stream(
    spark: SparkSession,
    family: AttributeFamilyDescriptor,
    *,
    attributes: Iterable[str] | None = None,
    position: str = "NEWEST",
    max_per_trigger: int | None = None,
) -> DataFrame:
    """Unbounded changelog read from a commit-log family.

    ``max_per_trigger`` is the throughput limiter
    (core/.../storage/ThroughputLimiter.java → maxOffsetsPerTrigger /
    maxFilesPerTrigger).
    """
    if position not in _POSITION_TO_OFFSETS:
        raise ValueError(f"position must be one of {list(_POSITION_TO_OFFSETS)}")
    fmt = family.storage_format
    opts = dict(family.format_options)
    if fmt == "kafka":
        broker, _, topic = family.path.partition("/")
        opts.update({"kafka.bootstrap.servers": broker, "subscribe": topic})
        if _POSITION_TO_OFFSETS[position]:
            opts["startingOffsets"] = _POSITION_TO_OFFSETS[position]
        if max_per_trigger:
            opts["maxOffsetsPerTrigger"] = str(max_per_trigger)
        raw = spark.readStream.format("kafka").options(**opts).load()
        # kafka value = canonical changelog as JSON (see streaming.sink)
        from proxima_platform_spark.changelog import CHANGELOG_SCHEMA

        df = raw.select(
            F.from_json(F.col("value").cast("string"), CHANGELOG_SCHEMA).alias("e")
        ).select("e.*")
    elif fmt in ("parquet", "json", "csv", "delta"):
        if max_per_trigger:
            opts["maxFilesPerTrigger"] = str(max_per_trigger)
        reader = spark.readStream.options(**opts).format(fmt)
        if fmt != "delta":
            # streaming file sources require an explicit schema; a changelog
            # family's schema IS the canonical element schema (delta carries
            # its own)
            from proxima_platform_spark.changelog import CHANGELOG_SCHEMA

            reader = reader.schema(CHANGELOG_SCHEMA)
        df = reader.load(family.path)
    elif fmt == "rate":
        # synthetic source — the analog of periodicImpulse
        # (BeamStream.periodicImpulse:275-310)
        df = spark.readStream.format("rate").options(**opts).load()
    else:
        raise NotImplementedError(f"streaming source for {fmt!r}")
    if attributes is not None:
        df = df.where(F.col("attribute_base").isin(list(attributes)))
    return df
