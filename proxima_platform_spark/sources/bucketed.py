"""Storage-side partitioning: writer partitioners + bucketed attribute families.

The reference routes every commit-log write through a ``Partitioner``
(reference: core/.../storage/commitlog/Partitioner.java:27-36), with three
built-ins:

  * ``KeyPartitioner`` — partition by entity key (the default;
    reference: core/.../storage/commitlog/KeyPartitioner.java:21-28)
  * ``KeyAttributePartitioner`` — partition by (key, attribute)
    (reference: core/.../storage/commitlog/KeyAttributePartitioner.java:22-29)
  * ``FirstPartitionPartitioner`` — everything to partition 0
    (reference: core/.../storage/commitlog/FirstPartitionPartitioner.java)

Partitioning is a *storage* property there: all elements of one key land in
one Kafka partition, and downstream consumers exploit that co-location.

Spark's durable equivalent is the **bucketed table**:
``df.write.bucketBy(n, cols).sortBy(...).saveAsTable(...)``. A scan of a
bucketed table reports ``HashPartitioning(bucket_cols, n)`` to the planner,
so operators whose required distribution is satisfied by the bucket columns
need no Exchange:

  * changelog→snapshot compaction (``groupBy(entity, key, attribute)``) over
    a family bucketed by ``key`` shuffles NOTHING — hash(key) clusters every
    group (key ⊆ grouping columns);
  * a join of two families bucketed by ``key`` with equal bucket counts is a
    SortMergeJoin with no Exchange on either side.

At 100 TB those are the two dominant shuffles of the platform's defining
path, and both disappear for every read of a family that was bucketed once
at write time (the changelog is written once, compacted many times). The
exact hash differs from the reference (Spark's Murmur3 vs Java
``String.hashCode``) — the *co-location guarantee*, not the hash value, is
the semantic contract.

The in-memory session catalog keeps bucket metadata for the session; on a
production cluster the same calls against a persistent metastore make the
bucketing durable across jobs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from proxima_platform_spark import changelog as _changelog

# -- writer partitioners (Partitioner SPI parity) ----------------------------


def key_partitioner() -> Column:
    """Partition by entity key (reference: KeyPartitioner.java:21-28)."""
    return F.col("key")


def key_attribute_partitioner() -> Column:
    """Partition by (key, attribute)
    (reference: KeyAttributePartitioner.java:22-29)."""
    return F.struct(F.col("key"), F.col("attribute"))


#: sentinel for first-partition routing — ``repartition(n, lit(0))`` would
#: land everything in partition ``pmod(hash(0), n)``, an arbitrary index;
#: the reference contract is literally partition 0
FIRST_PARTITION = object()


def first_partition_partitioner():
    """Single-partition routing: everything to partition index 0
    (reference: FirstPartitionPartitioner.java)."""
    return FIRST_PARTITION


def apply_partitioner(
    df: DataFrame, partitioner, num_partitions: int
) -> DataFrame:
    """Redistribute a changelog the way the reference's writer would
    (reference: Partitioner.java:30-36 — same partition id ⇒ same physical
    partition). In-flight analog of the durable bucketing below."""
    if partitioner is FIRST_PARTITION:
        return df.repartition(1)  # exactly one partition, index 0
    return df.repartition(num_partitions, partitioner)


# -- bucketed attribute families --------------------------------------------


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    num_buckets: int,
    bucket_cols: Sequence[str] = ("key",),
    sort_cols: Sequence[str] | None = ("key", "attribute", "stamp"),
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Materialize a changelog/snapshot family as a bucketed table.

    ``sort_cols`` additionally sorts within each bucket file, which lets a
    later SortMergeJoin skip its sort. Bucket count is a capacity decision:
    one bucket ≈ one task's worth of one key-range at the target scale
    (at 100 TB with ~256 MB per compacted bucket file → O(10k) buckets).
    """
    writer = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed family; the scan advertises its HashPartitioning."""
    return spark.table(table)


def compact_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Shuffle-free changelog compaction over a family bucketed by ``key``.

    Same semantics as :func:`proxima_platform_spark.changelog.compact`
    (max (stamp, seq_id) per (entity, key, attribute)); the bucketed scan
    satisfies the aggregation's required distribution, so the plan contains
    no Exchange.
    """
    return _changelog.compact(spark.table(table))


def snapshot_bucketed(spark: SparkSession, table: str, *, at=None) -> DataFrame:
    """Snapshot (tombstone-resolved) over a bucketed family — compaction,
    tombstone aggregation, and tombstone join all reuse the bucket
    partitioning ((entity, key, …) prefixes align on ``key``)."""
    return _changelog.snapshot(spark.table(table), at=at)
