"""Replication: primary commit-log fan-out to replica families.

The analog of the reference's ReplicationController
(direct/ingest-server/.../ReplicationController.java; docs replication.md:1-11):
one streaming query per (source family → target family), each with its own
checkpoint, optional StorageFilter predicate, and declared element-wise
transformations producing derived attributes.

Element-wise transformation (core/.../transform/ElementWiseTransformation.java:29-58,
wiring ConfigRepository.readTransformations:394): a function
changelog-batch → derived changelog-batch, applied inside the replication
flow on every upsert.

Proxy attributes (core/.../repository/AttributeProxyDescriptor.java,
ElementWiseProxyTransform.java:23-70) are the read/write-side rename variant:
expressed here as `rename_transform`.

Scale: each replication query is an independent streaming job — shuffle-free
(pure projection/filter per micro-batch) unless the transformation itself
aggregates; the commit-log partitioning carries through to the sink.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from proxima_platform_spark.catalog.descriptors import AttributeFamilyDescriptor
from proxima_platform_spark.streaming.sink import foreach_batch_into, write_changelog

#: an element-wise transformation: batch of changelog rows → derived rows
ElementWiseTransformation = Callable[[DataFrame], DataFrame]


def rename_transform(mapping: dict[str, str]) -> ElementWiseTransformation:
    """Proxy-attribute rename (ElementWiseProxyTransform renaming variant):
    rewrite attribute (and attribute_base) by exact-name mapping."""

    def apply(batch: DataFrame) -> DataFrame:
        attr = F.col("attribute")
        expr = attr
        for src, dst in mapping.items():
            expr = F.when(attr == src, F.lit(dst)).otherwise(expr)
        base = F.when(
            expr.contains("."),
            F.concat(F.substring_index(expr, ".", 1), F.lit(".*")),
        ).otherwise(expr)
        return batch.withColumn("attribute", expr).withColumn("attribute_base", base)

    return apply


@dataclass
class ReplicationTarget:
    family: AttributeFamilyDescriptor
    #: StorageFilter predicate (core/.../storage/StorageFilter.java) — a
    #: Column expression deciding which elements replicate
    storage_filter: Column | None = None
    #: transformations applied before writing (derived attributes)
    transformations: tuple[ElementWiseTransformation, ...] = ()


class ReplicationController:
    """Runs one streaming query per target over a source changelog stream."""

    def __init__(self, source_stream: DataFrame, *, checkpoint_root: str) -> None:
        self.source = source_stream
        self.checkpoint_root = checkpoint_root.rstrip("/")
        self.queries: list[StreamingQuery] = []

    def replicate(
        self, target: ReplicationTarget, *, trigger: dict | None = None
    ) -> StreamingQuery:
        df = self.source
        if target.storage_filter is not None:
            df = df.where(target.storage_filter)
        for transform in target.transformations:
            df = transform(df)
        q = write_changelog(
            df,
            target.family,
            checkpoint=f"{self.checkpoint_root}/{target.family.name}",
            trigger=trigger,
            query_name=f"replicate-{target.family.name}",
        )
        self.queries.append(q)
        return q

    def replicate_with(
        self,
        name: str,
        batch_fn: Callable[[DataFrame, int], None],
        *,
        storage_filter: Column | None = None,
        trigger: dict | None = None,
    ) -> StreamingQuery:
        """Custom-sink replication (e.g. maintaining a cached view)."""
        df = self.source
        if storage_filter is not None:
            df = df.where(storage_filter)
        q = foreach_batch_into(
            df,
            batch_fn,
            checkpoint=f"{self.checkpoint_root}/{name}",
            trigger=trigger,
            query_name=f"replicate-{name}",
        )
        self.queries.append(q)
        return q

    def await_all(self, timeout_sec: float | None = None) -> None:
        for q in self.queries:
            q.awaitTermination(timeout_sec) if timeout_sec else q.awaitTermination()

    def stop_all(self) -> None:
        for q in self.queries:
            q.stop()
