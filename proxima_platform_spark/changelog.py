"""Canonical changelog schema + snapshot compaction.

The reference models all data as a changelog of upserts/deletes over an
entity-attribute model (reference: core/.../storage/StreamElement.java:232-248,
docs/src/content/book/datamodel.md:110-149). A *snapshot* ("table") at time T
is the max-stamp element per (entity, key, attribute) with delete and
wildcard-delete tombstones resolved
(reference: beam/core/.../PCollectionTools.java:42-66,
direct/core/.../view/LocalCachedPartitionedView.java:99-121,268-286).

Spark-first design notes
------------------------
* ``compact`` is a single hash aggregation: ``groupBy(entity, key, attribute)
  .agg(max_by(struct(*), (stamp, seq_id)))``. Catalyst plans this as
  partial+final hash agg (map-side combine), so at 100 TB it shuffles only
  one pre-combined row per (entity, key, attribute) per input partition.
* wildcard-tombstone resolution is a join of compacted instances against
  compacted tombstones on (entity, key, attribute_base). Tombstone cardinality
  is bounded by live (key, wildcard-attribute) pairs — usually tiny relative
  to instances — so we broadcast-hint it; AQE falls back to shuffle join if
  the estimate is wrong.
* equal-stamp ties break by seq_id
  (reference: direct/core/.../view/TimeBoundedVersionedCache.java:214).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: canonical changelog schema — the moral equivalent of StreamElement
#: (reference: core/.../storage/StreamElement.java:232-248; serialized form
#: beam/core/.../io/StreamElementCoder.java).
CHANGELOG_SCHEMA = StructType(
    [
        StructField("entity", StringType(), False),
        StructField("key", StringType(), False),
        # full attribute name incl. wildcard suffix, e.g. "category.books"
        StructField("attribute", StringType(), False),
        # descriptor name, e.g. "category.*" for wildcard, == attribute otherwise
        StructField("attribute_base", StringType(), False),
        StructField("seq_id", LongType(), True),
        StructField("uuid", StringType(), True),
        StructField("stamp", TimestampType(), False),
        StructField("delete", BooleanType(), False),
        StructField("delete_wildcard", BooleanType(), False),
        StructField("value", BinaryType(), True),
    ]
)

_CANONICAL_COLS = [f.name for f in CHANGELOG_SCHEMA.fields]


def _attribute_base(attribute: Column) -> Column:
    """Descriptor name of an attribute: ``a.x`` → ``a.*``, scalar unchanged.

    Mirrors AttributeDescriptor.toAttributePrefix
    (reference: core/.../repository/AttributeDescriptor.java:157-168).
    """
    return F.when(
        attribute.contains("."),
        F.concat(F.substring_index(attribute, ".", 1), F.lit(".*")),
    ).otherwise(attribute)


def to_changelog(
    df: DataFrame,
    *,
    entity: str | Column,
    key: str | Column,
    attribute: str | Column,
    stamp: str | Column,
    value: str | Column | None = None,
    seq_id: str | Column | None = None,
    uuid: str | Column | None = None,
    delete: str | Column | None = None,
    delete_wildcard: str | Column | None = None,
) -> DataFrame:
    """Map an arbitrary DataFrame into the canonical changelog schema.

    The analog of ``asStreamElements`` (reference: tools/.../Stream.java:210-217
    → beam/tools/.../BeamStream.java:692): callers supply column expressions
    for key / attribute / value / stamp.
    """

    def c(x: str | Column | None, default: Column | None = None) -> Column:
        if x is None:
            assert default is not None
            return default
        return F.col(x) if isinstance(x, str) else x

    attr = c(attribute)
    return df.select(
        (F.lit(entity) if isinstance(entity, str) else entity).alias("entity"),
        c(key).cast("string").alias("key"),
        attr.cast("string").alias("attribute"),
        _attribute_base(attr.cast("string")).alias("attribute_base"),
        c(seq_id, F.lit(None).cast("long")).cast("long").alias("seq_id"),
        c(uuid, F.lit(None).cast("string")).cast("string").alias("uuid"),
        c(stamp).alias("stamp"),
        c(delete, F.lit(False)).cast("boolean").alias("delete"),
        c(delete_wildcard, F.lit(False)).cast("boolean").alias("delete_wildcard"),
        c(value, F.lit(None).cast("binary")).alias("value"),
    )


def compact(changelog: DataFrame) -> DataFrame:
    """Max-stamp compaction per (entity, key, attribute); keeps tombstones.

    Mirrors PCollectionTools.reduceAsSnapshot (reference:
    beam/core/.../PCollectionTools.java:42-66): latest element wins by
    (stamp, seq_id); deletes *survive* this reduction and are resolved by
    :func:`snapshot` at read time (SURVEY §2.10.1).

    One shuffle on the compaction key with map-side partial aggregation.
    """
    payload = [c for c in changelog.columns if c not in ("entity", "key", "attribute")]
    ordering = F.struct(F.col("stamp"), F.coalesce(F.col("seq_id"), F.lit(0)))
    aggs = [
        F.max_by(F.col(c), ordering).alias(c) for c in payload
    ]
    return changelog.groupBy("entity", "key", "attribute").agg(*aggs).select(
        *[F.col(c) for c in changelog.columns]
    )


def snapshot(changelog: DataFrame, *, at: Column | str | None = None) -> DataFrame:
    """Snapshot (table view) of a changelog at time ``at`` (default: now).

    Semantics (SURVEY §2.10; reference
    direct/core/.../view/LocalCachedPartitionedView.java:99-121,268-286):

    1. restrict to elements with ``stamp <= at``;
    2. compact to the latest element per (entity, key, attribute),
       ties broken by seq_id;
    3. drop rows whose winner is a delete / wildcard-delete tombstone;
    4. drop instances older than a live wildcard tombstone on their
       attribute *prefix*: keep iff ``stamp >= tombstone_stamp`` (the
       reference filter is ``e.getFirst() >= filterStamp``, i.e. an
       instance written at exactly the tombstone stamp survives).
    """
    if at is not None:
        bound = F.col(at) if isinstance(at, str) else at
        changelog = changelog.where(F.col("stamp") <= bound)

    latest = compact(changelog)

    # live wildcard tombstones, compacted to the newest per prefix; columns
    # renamed so the (self-)join below has unambiguous attribute references
    tombstones = (
        changelog.where(F.col("delete_wildcard"))
        .groupBy(
            F.col("entity").alias("tomb_entity"),
            F.col("key").alias("tomb_key"),
            F.col("attribute_base").alias("tomb_base"),
        )
        .agg(F.max("stamp").alias("tombstone_stamp"))
    )

    live = latest.where(~F.col("delete") & ~F.col("delete_wildcard"))

    # No broadcast hint: the tombstone table scales with the number of keys
    # carrying wildcard deletes — tiny in most datasets (AQE will broadcast
    # it at runtime when it is), but potentially huge at 100 TB, where a
    # forced broadcast would OOM the driver; the shuffle join keys align
    # with the compaction shuffle's (entity, key) prefix.
    resolved = live.join(
        tombstones,
        on=[
            F.col("entity") == F.col("tomb_entity"),
            F.col("key") == F.col("tomb_key"),
            F.col("attribute_base") == F.col("tomb_base"),
        ],
        how="left",
    ).where(
        F.col("tombstone_stamp").isNull() | (F.col("stamp") >= F.col("tombstone_stamp"))
    )
    return resolved.select(*[F.col(c) for c in live.columns])


def snapshot_wide(
    snapshot_df: DataFrame, *, attributes: list[str] | None = None
) -> DataFrame:
    """Pivot a snapshot into one row per (entity, key) with attribute columns.

    The "table" view of the datamodel docs (reference:
    docs/src/content/book/datamodel.md:127-149). Wildcard attributes stay in
    changelog form; scalars pivot. ``attributes`` fixes the pivot values so
    the plan needs no extra distinct-scan job at scale.
    """
    pivoted = snapshot_df.groupBy("entity", "key").pivot(
        "attribute", values=attributes
    )
    return pivoted.agg(F.first("value"))


def snapshot_map(snapshot_df: DataFrame, attribute_base: str) -> DataFrame:
    """Snapshot of one wildcard attribute as ``key → map<suffix, value>``.

    The MapType form of a wildcard attribute (SURVEY §1.1; reference models
    it as an unbounded key→value map per entity key,
    docs/src/content/book/datamodel.md:92-99). One hash aggregation per key;
    suffixes sort within each map build for deterministic output. Map
    cardinality is per-entity-key instance count — the same bound the
    reference's random-access ``scanWildcard`` pages through.
    """
    prefix_len = len(attribute_base) - 1  # "a.*" → strip "a."
    inst = snapshot_df.where(
        (F.col("attribute_base") == attribute_base)
        & (F.col("attribute") != attribute_base)
    ).select(
        "entity",
        "key",
        F.substring(F.col("attribute"), prefix_len + 1, 2_147_483_647).alias(
            "suffix"
        ),
        "value",
    )
    return inst.groupBy("entity", "key").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("suffix", "value")))
        ).alias(attribute_base[:-2])
    )


def vacuum_changelog(
    changelog: DataFrame,
    *,
    keep_versions: int = 1,
    ttl_ms: int | None = None,
    now_ms: int | None = None,
) -> DataFrame:
    """Retention vacuum: prune a changelog to the newest ``keep_versions``
    rows per (entity, key, attribute) cell, optionally also dropping
    NON-NEWEST versions older than ``now_ms − ttl_ms``. The newest version
    of every cell is ALWAYS kept — ``snapshot(vacuum_changelog(c)) ==
    snapshot(c)`` by construction, the invariant storage retention must
    preserve (reference: per-family storage retention/TTL settings,
    core storage descriptors; this is the batch compaction a maintenance
    job runs over bulk families).

    Plan shape: one Exchange(cell key) → Sort → row_number, then a codegen
    filter — identical partitioning to ``compact``, so a maintenance
    pipeline doing vacuum→snapshot reuses the exchange. Version rank
    orders by (stamp, seq_id) DESC — the same total order compaction uses,
    so rank 1 is exactly the row ``snapshot`` would keep.
    """
    from pyspark.sql import Window

    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1 (snapshot must survive)")
    w = Window.partitionBy("entity", "key", "attribute").orderBy(
        F.col("stamp").desc(), F.col("seq_id").desc()
    )
    ranked = changelog.withColumn("__vrank", F.row_number().over(w))
    cond = F.col("__vrank") <= keep_versions
    if ttl_ms is not None:
        if now_ms is None:
            raise ValueError("ttl_ms requires an explicit now_ms (determinism)")
        cutoff = now_ms - ttl_ms
        us = F.unix_micros(F.col("stamp"))
        stamp_ms = ((us - F.pmod(us, F.lit(1000))) / F.lit(1000)).cast("long")
        cond = cond & ((F.col("__vrank") == 1) | (stamp_ms >= cutoff))
    return ranked.where(cond).drop("__vrank")


def erase_keys(
    changelog: DataFrame,
    keys: DataFrame,
    *,
    erase_stamp_us: int,
    key_col: str = "key",
) -> DataFrame:
    """Right-to-erasure over the changelog: physically remove EVERY version
    of every attribute for the keys in ``keys`` and append one DELETE
    tombstone per erased (entity, key, attribute) cell at
    ``erase_stamp_us`` — so the output is (a) free of the erased payloads
    (the GDPR contract: removal, not masking) and (b) still a valid
    changelog whose tombstones propagate the deletion to replicas and
    caches exactly like any reference delete (SURVEY §2.10.1 semantics;
    replication replays them as ordinary elements).

    Tombstone seq_id = the cell's max erased seq_id + 1, so it wins the
    (stamp, seq_id) compaction order against everything it erases even if
    ``erase_stamp_us`` ties an existing stamp. Determinism: the caller
    supplies the stamp; nothing reads the wall clock.

    Plan: one semi/anti-join pair on the key (same exchange both sides;
    deliberately NOT broadcast-hinted — a small erasure list broadcasts
    via AQE at runtime, but a bulk-erasure list can be huge and a forced
    broadcast is the OOM path, the wildcard-tombstone lesson) + a cell
    groupBy for the tombstones. The erased-key list NEVER collects to the
    driver.
    """
    k = keys.select(F.col(key_col).cast("string").alias("key")).distinct()
    survivors = changelog.join(k, "key", "left_anti")
    cells = (
        changelog.join(k, "key", "left_semi")
        .groupBy("entity", "key", "attribute", "attribute_base")
        .agg(F.max(F.coalesce(F.col("seq_id"), F.lit(0))).alias("__max_seq"))
    )
    tombstones = cells.select(
        "entity",
        "key",
        "attribute",
        "attribute_base",
        (F.col("__max_seq") + 1).alias("seq_id"),
        F.lit(None).cast("string").alias("uuid"),
        F.timestamp_micros(F.lit(erase_stamp_us)).alias("stamp"),
        F.lit(True).alias("delete"),
        F.lit(False).alias("delete_wildcard"),
        F.lit(None).cast("binary").alias("value"),
    )
    return survivors.select(*changelog.columns).unionByName(
        tombstones.select(*changelog.columns)
    )


def snapshot_diff(
    changelog: DataFrame,
    *,
    at_from: Column,
    at_to: Column,
) -> DataFrame:
    """Audit diff between two snapshot instants of the same changelog:
    one row per (entity, key, attribute) cell whose LIVE value differs
    between ``at_from`` and ``at_to`` — ``status`` ∈ {added, deleted,
    updated}, with both values carried. Unchanged cells are excluded.

    This is the stream–table-duality read the reference's time-travel
    cached view enables (LocalCachedPartitionedView snapshot-at
    semantics): two deterministic point-in-time compactions and ONE full
    outer join on the cell key. Both snapshots shuffle on the same cell
    key, so the join reuses their partitioning; the diff never rescans
    raw history beyond the two compactions.
    """
    a = snapshot(changelog, at=at_from).select(
        "entity", "key", "attribute", F.col("value").alias("value_from")
    )
    b = snapshot(changelog, at=at_to).select(
        "entity", "key", "attribute", F.col("value").alias("value_to")
    )
    j = a.join(b, ["entity", "key", "attribute"], "full_outer")
    status = (
        F.when(F.col("value_from").isNull(), F.lit("added"))
        .when(F.col("value_to").isNull(), F.lit("deleted"))
        .otherwise(F.lit("updated"))
    )
    return j.where(
        F.col("value_from").isNull()
        | F.col("value_to").isNull()
        | (F.col("value_from") != F.col("value_to"))
    ).select("entity", "key", "attribute", status.alias("status"),
             "value_from", "value_to")


def history_intervals(changelog: DataFrame) -> DataFrame:
    """SCD2 validity intervals from the changelog: one row per VERSION of
    each (entity, key, attribute) cell, with ``[valid_from, valid_to)``
    half-open bounds and an ``is_current`` flag — the slowly-changing-
    dimension type-2 read of the same history :func:`snapshot` collapses
    to its endpoint (datamodel.md's stream-table duality, materialized as
    intervals instead of a point).

    Semantics (mirrors snapshot's tombstone rules):

    * an upsert opens an interval at its stamp; the NEXT event on the
      same cell (upsert, delete, or applicable wildcard tombstone)
      closes it;
    * a direct delete closes the open interval and emits no row;
    * a ``delete_wildcard`` tombstone acts as a delete on EVERY attribute
      instance under its ``attribute_base`` for that key, applying to
      strictly-older writes only — a write at the same stamp survives
      (the ``stamp >= tombstone`` rule of LocalCachedPartitionedView
      .java:99-121), which the sort key encodes by ordering tombstones
      BEFORE same-stamp instance events;
    * ties between direct events break by seq_id, as in :func:`compact`.

    Invariant (pinned in tests): rows with ``is_current`` reproduce
    ``snapshot(changelog)`` exactly.

    Scale shape: ONE window per (entity, key, attribute) cell — history
    windows parallelize across cells, no global sort; wildcard expansion
    broadcasts the (small by construction) tombstone frame against the
    distinct live-attribute frame. Nothing rescans history twice.
    """
    from pyspark.sql import Window

    direct = changelog.where(~F.col("delete_wildcard")).select(
        "entity", "key", "attribute", "stamp", "seq_id", "delete", "value",
        F.lit(1).alias("__prio"),
    )
    tombs = changelog.where(F.col("delete_wildcard")).select(
        "entity", "key", "attribute_base", "stamp", "seq_id"
    )
    attrs = (
        changelog.where(~F.col("delete_wildcard"))
        .select("entity", "key", "attribute_base", "attribute")
        .distinct()
    )
    synth = F.broadcast(tombs).join(
        attrs, ["entity", "key", "attribute_base"]
    ).select(
        "entity", "key", "attribute", "stamp", "seq_id",
        F.lit(True).alias("delete"),
        F.lit(None).cast("binary").alias("value"),
        F.lit(0).alias("__prio"),  # same-stamp instance writes survive
    )
    events = direct.unionByName(synth)
    w = Window.partitionBy("entity", "key", "attribute").orderBy(
        "stamp", "__prio", "seq_id"
    )
    to = F.lead("stamp").over(w)
    return (
        events.select(
            "entity", "key", "attribute", "delete", "value",
            F.col("stamp").alias("valid_from"),
            to.alias("valid_to"),
        )
        .where(~F.col("delete"))
        .select(
            "entity", "key", "attribute", "value", "valid_from", "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )
