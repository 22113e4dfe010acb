"""Repository: parse a config dict into descriptors; access-path selection.

The reference parses HOCON into entities → families → proxies → replications
→ transformations (core/.../repository/ConfigRepository.java:372-401,
entity parsing :507-550). We accept the same shape as a plain Python dict
(YAML/JSON/HOCON all load into this):

    {
      "entities": {
        "user": {"attributes": {
            "details": {"scheme": "string"},
            "preferences": {"scheme": "json"},
            "event.*": {"scheme": "bytes"},
        }},
      },
      "attributeFamilies": {
        "user-commit-log": {
          "entity": "user", "attributes": ["*"],
          "storage": "parquet:///data/user-log",
          "type": "primary", "access": ["commit-log", "batch-updates"],
        },
      },
    }

Access-path selection (the reference's only "optimizer",
beam/core/.../BeamDataOperator.java:217,298,345 findSuitableAccessors) is a
catalog decision made before DataFrame construction: pick the family whose
capability set covers the requested read, preferring pre-materialized
snapshots over changelog reduction (BeamDataOperator.java:366-397).
"""

from __future__ import annotations

from typing import Iterable, Mapping

from proxima_platform_spark.catalog.descriptors import (
    AccessType,
    AttributeDescriptor,
    AttributeFamilyDescriptor,
    EntityDescriptor,
    StorageType,
)


class Repository:
    """Parsed catalog of entities and attribute families."""

    def __init__(
        self,
        entities: Mapping[str, EntityDescriptor],
        families: Mapping[str, AttributeFamilyDescriptor],
    ) -> None:
        self.entities = dict(entities)
        self.families = dict(families)

    # -- construction -----------------------------------------------------

    @classmethod
    def of(cls, config: Mapping) -> "Repository":
        entities: dict[str, EntityDescriptor] = {}
        for ename, espec in (config.get("entities") or {}).items():
            attrs = tuple(
                AttributeDescriptor(
                    entity=ename, name=aname, scheme=aspec.get("scheme", "bytes")
                )
                for aname, aspec in (espec.get("attributes") or {}).items()
            )
            entities[ename] = EntityDescriptor(name=ename, attributes=attrs)

        families: dict[str, AttributeFamilyDescriptor] = {}
        for fname, fspec in (config.get("attributeFamilies") or {}).items():
            entity = fspec["entity"]
            if entity not in entities:
                raise ValueError(f"family {fname!r}: unknown entity {entity!r}")
            # HOCON configs write single-element lists as scalars
            # (`access: commit-log`) — promote to a list, as Typesafe
            # Config's getStringList does for the reference.
            attrs_spec = fspec.get("attributes", ("*",))
            if isinstance(attrs_spec, str):
                attrs_spec = (attrs_spec,)
            access_spec = fspec.get("access", ["commit-log"])
            if isinstance(access_spec, str):
                access_spec = [access_spec]
            families[fname] = AttributeFamilyDescriptor(
                name=fname,
                entity=entity,
                attributes=tuple(attrs_spec),
                storage_uri=fspec["storage"],
                storage_type=StorageType(fspec.get("type", "primary")),
                access=frozenset(AccessType(a) for a in access_spec),
                format_options=tuple(
                    (str(k), str(v)) for k, v in (fspec.get("options") or {}).items()
                ),
                replication_filter=fspec.get("filter"),
            )
        return cls(entities, families)

    @classmethod
    def from_hocon(cls, text: str) -> "Repository":
        """Parse a HOCON repository config (the reference's native format —
        ConfigRepository.java:372-401) into the same catalog ``of`` builds
        from a dict. Uses the built-in minimal HOCON parser
        (catalog/hocon.py); unknown per-family keys (cqlFactory, converter…)
        are tolerated exactly as the dict form tolerates them."""
        from proxima_platform_spark.catalog import hocon

        return cls.of(hocon.loads(text))

    @classmethod
    def from_hocon_file(cls, path: str) -> "Repository":
        from proxima_platform_spark.catalog import hocon

        return cls.of(hocon.load(path))

    # -- lookups -----------------------------------------------------------

    def entity(self, name: str) -> EntityDescriptor:
        return self.entities[name]

    def families_of(
        self, entity: str, attribute: str | None = None
    ) -> list[AttributeFamilyDescriptor]:
        out = []
        for fam in self.families.values():
            if fam.entity != entity:
                continue
            if attribute is None or "*" in fam.attributes:
                out.append(fam)
                continue
            desc = self.entities[entity].attribute(attribute)
            if any(a == desc.name or a == attribute for a in fam.attributes):
                out.append(fam)
        return out

    def find_accessor(
        self,
        entity: str,
        attribute: str | None,
        access: AccessType,
    ) -> AttributeFamilyDescriptor:
        """Pick the family able to serve the requested access
        (reference: BeamDataOperator.findSuitableAccessors)."""
        candidates = [
            f
            for f in self.families_of(entity, attribute)
            if f.can(access) and not f.can(AccessType.WRITE_ONLY)
        ]
        if not candidates:
            raise LookupError(
                f"no family of entity {entity!r} serves {access.value} "
                f"for attribute {attribute!r}"
            )
        # prefer primaries for commit-log reads, replicas for batch
        primary_first = access in (AccessType.COMMIT_LOG, AccessType.STATE_COMMIT_LOG)
        candidates.sort(
            key=lambda f: (f.storage_type == StorageType.PRIMARY) != primary_first
        )
        return candidates[0]

    def snapshot_plan(
        self, entity: str, attributes: Iterable[str]
    ) -> tuple[str, list[AttributeFamilyDescriptor]]:
        """Two-path snapshot planning (BeamDataOperator.java:366-397):
        return ("snapshot", fams) when every attribute has a batch-snapshot
        family, else ("updates", fams) → caller compacts the changelog."""
        attrs = list(attributes)
        snap = []
        for a in attrs:
            try:
                snap.append(self.find_accessor(entity, a, AccessType.BATCH_SNAPSHOT))
            except LookupError:
                break
        if len(snap) == len(attrs):
            return "snapshot", snap
        return "updates", [
            self.find_accessor(entity, a, AccessType.BATCH_UPDATES) for a in attrs
        ]
