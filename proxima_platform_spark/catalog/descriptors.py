"""Entity / attribute / family descriptors.

Python-dataclass equivalents of the reference's repository model:
  * EntityDescriptor   — core/.../repository/EntityDescriptor.java
  * AttributeDescriptor — core/.../repository/AttributeDescriptor.java:36-175
    (wildcard handling :135-168)
  * AttributeFamilyDescriptor — core/.../repository/AttributeFamilyDescriptor.java
  * AccessType — core/.../storage/AccessType.java:37-66
  * StorageType — core/.../storage/StorageType.java:24-34
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql.types import DataType, StructField, StructType

from proxima_platform_spark.catalog.schemes import resolve_scheme

_NAME_RE = re.compile(r"^[a-zA-Z_][a-zA-Z0-9_\-]*(\.\*)?$")


class StorageType(Enum):
    """primary = commit log receiving writes; replica = eventually-consistent
    copy maintained by replication (reference: StorageType.java:24-34)."""

    PRIMARY = "primary"
    REPLICA = "replica"


class AccessType(Enum):
    """Capability flags of an attribute family
    (reference: core/.../storage/AccessType.java:37-66)."""

    COMMIT_LOG = "commit-log"
    STATE_COMMIT_LOG = "state-commit-log"
    BATCH_UPDATES = "batch-updates"
    BATCH_SNAPSHOT = "batch-snapshot"
    RANDOM_ACCESS = "random-access"
    LIST_PRIMARY_KEY = "list-primary-key"
    CACHED_VIEW = "cached-view"
    READ_ONLY = "read-only"
    WRITE_ONLY = "write-only"


@dataclass(frozen=True)
class AttributeDescriptor:
    """A named, typed attribute of an entity.

    ``name`` ending in ``.*`` declares a *wildcard* attribute — an unbounded
    key→value map per entity key (reference: AttributeDescriptor.java:135,
    docs/.../book/datamodel.md:92-99).
    """

    entity: str
    name: str
    scheme: str = "bytes"

    def __post_init__(self) -> None:
        if not _NAME_RE.match(self.name):
            raise ValueError(f"illegal attribute name {self.name!r}")

    @property
    def is_wildcard(self) -> bool:
        return self.name.endswith(".*")

    @property
    def prefix(self) -> str:
        """``a.*`` → ``a.`` (reference: AttributeDescriptor.java:157-168)."""
        return self.name[:-1] if self.is_wildcard else self.name

    @property
    def spark_type(self) -> DataType:
        return resolve_scheme(self.scheme).spark_type

    def matches(self, attribute: str) -> bool:
        """Does a concrete attribute name belong to this descriptor?"""
        if self.is_wildcard:
            return attribute == self.name or attribute.startswith(self.prefix)
        return attribute == self.name


@dataclass(frozen=True)
class EntityDescriptor:
    """Named record type: string key + set of attributes
    (reference: EntityDescriptor.java, docs/.../book/datamodel.md:9-13)."""

    name: str
    attributes: tuple[AttributeDescriptor, ...] = ()

    def attribute(self, name: str) -> AttributeDescriptor:
        for a in self.attributes:
            if a.name == name or a.matches(name):
                return a
        raise KeyError(f"entity {self.name!r} has no attribute {name!r}")

    def snapshot_schema(self) -> StructType:
        """Wide (pivoted) snapshot schema: key + one column per scalar
        attribute; wildcard attributes become map<string, T>."""
        from pyspark.sql.types import MapType, StringType

        fields = [StructField("key", StringType(), False)]
        for a in self.attributes:
            typ = a.spark_type
            if a.is_wildcard:
                fields.append(
                    StructField(a.name[:-2], MapType(StringType(), typ), True)
                )
            else:
                fields.append(StructField(a.name, typ, True))
        return StructType(fields)


@dataclass(frozen=True)
class AttributeFamilyDescriptor:
    """Binding of a set of attributes to one physical storage with an access
    profile (reference: AttributeFamilyDescriptor.java,
    docs/.../book/storages.md:55-121).

    ``storage_uri`` examples: ``parquet:///data/events``, ``kafka://broker/topic``,
    ``inmem://...``; ``format_options`` pass through to the Spark reader/writer.
    """

    name: str
    entity: str
    attributes: tuple[str, ...]
    storage_uri: str
    storage_type: StorageType = StorageType.PRIMARY
    access: frozenset[AccessType] = frozenset({AccessType.COMMIT_LOG})
    format_options: tuple[tuple[str, str], ...] = ()
    # optional python predicate name applied during replication
    # (reference: core/.../storage/StorageFilter.java)
    replication_filter: str | None = None

    def can(self, access: AccessType) -> bool:
        return access in self.access

    @property
    def storage_format(self) -> str:
        return self.storage_uri.split(":", 1)[0]

    @property
    def path(self) -> str:
        return self.storage_uri.split("://", 1)[1] if "://" in self.storage_uri else ""
