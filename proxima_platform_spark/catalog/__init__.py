"""Catalog: entity/attribute/family descriptors + scheme registry.

Mirrors the reference's repository/config layer
(core/.../repository/ConfigRepository.java:372-401) as plain Python
dataclasses that emit Spark StructTypes and source bindings.
"""

from proxima_platform_spark.catalog.descriptors import (
    AccessType,
    AttributeDescriptor,
    AttributeFamilyDescriptor,
    EntityDescriptor,
    StorageType,
)
from proxima_platform_spark.catalog.repository import Repository
from proxima_platform_spark.catalog.schemes import resolve_scheme

__all__ = [
    "AccessType",
    "AttributeDescriptor",
    "AttributeFamilyDescriptor",
    "EntityDescriptor",
    "Repository",
    "StorageType",
    "resolve_scheme",
]
