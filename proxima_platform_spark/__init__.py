"""proxima_platform_spark — a PySpark-native stream/batch analytics engine.

A from-scratch reimplementation of the *capabilities* of
O2-Czech-Republic/proxima-platform (studied read-only at /root/reference)
on idiomatic PySpark: DataFrame/SQL for batch, Structured Streaming for
streams, Catalyst/Tungsten/AQE for physical execution.

Core ideas (reference: docs/src/content/book/datamodel.md):
  * the universe is a **changelog of upserts/deletes** over an
    entity-attribute data model;
  * a **snapshot (table)** at time T is the max-stamp compaction of that
    changelog per (entity, key, attribute), with delete / wildcard-delete
    tombstone resolution;
  * queries run through a fluent Stream / WindowedStream DSL whose
    operators map 1:1 onto DataFrame transformations.

Layout:
  catalog/    entity/attribute/family descriptors + scheme (type) registry
  changelog   canonical changelog schema + snapshot compaction
  operators/  Stream / WindowedStream DSL (batch + streaming DataFrames)
  sources/    batch_updates / batch_snapshot / commit-log readers
  functions/  column-expression helpers (calendar windows, text, dedup,
              similarity, multimodal)
  streaming/  structured-streaming parity: replication, cached view
  plans/      plan inspection helpers (explain, shuffle counting)
"""

from proxima_platform_spark.changelog import (
    CHANGELOG_SCHEMA,
    compact,
    snapshot,
    snapshot_map,
    snapshot_wide,
    to_changelog,
)
from proxima_platform_spark.catalog.repository import Repository
from proxima_platform_spark.operators.stream import Stream

__all__ = [
    "CHANGELOG_SCHEMA",
    "Repository",
    "Stream",
    "compact",
    "snapshot",
    "snapshot_map",
    "snapshot_wide",
    "to_changelog",
]

__version__ = "0.1.0"
