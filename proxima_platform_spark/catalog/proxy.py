"""Proxy attributes: virtual attributes renaming/transforming a raw
attribute on read and write.

Reference: core/.../repository/AttributeProxyDescriptor.java,
core/.../transform/ElementWiseProxyTransform.java:23-70 (identity /
composite / renaming variants) and RenameTransformation.java — a proxy
attribute is declared over a *target* attribute; reads of the proxy pull
target elements through a read transform (attribute rename + optional value
transform), writes go through the inverse.

Spark form: a catalog-level view over the canonical changelog — pure
`select()` rewrites, fully inside Catalyst (no Python, no extra shuffle; the
rename is a projection so predicate pushdown through the proxy still reaches
the parquet scan).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, functions as F


def _rename_attribute(attr: Column, src: str, dst: str) -> Column:
    """Rename `src` → `dst`; wildcard prefixes keep the instance suffix
    (AttributeDescriptor.toAttributePrefix semantics)."""
    if src.endswith(".*"):
        src_prefix, dst_prefix = src[:-1], dst[:-1]
        return F.when(
            attr.startswith(src_prefix),
            F.concat(F.lit(dst_prefix), attr.substr(F.lit(len(src_prefix) + 1), F.length(attr))),
        ).otherwise(attr)
    return F.when(attr == src, F.lit(dst)).otherwise(attr)


@dataclass(frozen=True)
class AttributeProxyDescriptor:
    """A virtual attribute `name` proxying raw attribute `target`.

    read_value / write_value transform the `value` column on the way out/in
    (ElementWiseProxyTransform identity variant when None).
    """

    name: str  # proxy attribute name, e.g. "dev.*"
    target: str  # raw target attribute, e.g. "device.*"
    read_value: Optional[Callable[[Column], Column]] = None
    write_value: Optional[Callable[[Column], Column]] = None

    @property
    def is_wildcard(self) -> bool:
        return self.name.endswith(".*")

    def apply_read(self, changelog: DataFrame) -> DataFrame:
        """Changelog of the raw target viewed as the proxy attribute:
        keep target rows, rename attribute(+base), transform value."""
        base = F.col("attribute_base")
        kept = changelog.where(base == self.target)
        out = kept.withColumn(
            "attribute", _rename_attribute(F.col("attribute"), self.target, self.name)
        ).withColumn("attribute_base", F.lit(self.name))
        if self.read_value is not None:
            out = out.withColumn("value", self.read_value(F.col("value")))
        return out

    def apply_write(self, changelog: DataFrame) -> DataFrame:
        """Inverse: writes addressed to the proxy land on the raw target."""
        base = F.col("attribute_base")
        kept = changelog.where(base == self.name)
        out = kept.withColumn(
            "attribute", _rename_attribute(F.col("attribute"), self.name, self.target)
        ).withColumn("attribute_base", F.lit(self.target))
        if self.write_value is not None:
            out = out.withColumn("value", self.write_value(F.col("value")))
        return out
