"""Scheme registry: scheme URI → Spark type + encode/decode expressions.

The reference types attribute values by a *scheme URI* resolved to a
ValueSerializer (core/.../scheme/ValueSerializer.java:26-89). Built-in
schemes and their Spark mappings (SURVEY §1.2):

  bytes                 → BinaryType     (BytesSerializer.java:39)
  string                → StringType     (StringUtf8Serializer.java:95)
  integer/long/float/double → primitives (IntSerializer.java:36 etc.)
  json                  → StringType + from_json/get_json_object
                          (JsonSerializer.java:35-36)
  proto:<class>         → from_protobuf/to_protobuf (ProtoSerializerFactory.java:78)
  avro:<class>          → from_avro/to_avro (AvroSerializerFactory.java:44)

In Spark, serialization to/from the wire format is a column expression pair
(encode → binary, decode → typed), so the whole scheme layer stays inside
whole-stage codegen instead of per-element virtual calls.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
)


@dataclass(frozen=True)
class Scheme:
    """A value scheme: Spark type + encode(typed→binary) / decode(binary→typed).

    ``get_default`` mirrors ValueSerializer.getDefault
    (reference: core/.../scheme/ValueSerializer.java:62).
    """

    uri: str
    spark_type: DataType
    encode: Callable[[Column], Column]
    decode: Callable[[Column], Column]
    default: object = None

    def get_default(self) -> Column:
        return F.lit(self.default).cast(self.spark_type)


def _identity_binary(c: Column) -> Column:
    return c.cast(BinaryType())


def _string_encode(c: Column) -> Column:
    return F.encode(c.cast("string"), "UTF-8")


def _string_decode(c: Column) -> Column:
    return F.decode(c, "UTF-8")


def _numeric(uri: str, typ: DataType, default: object) -> Scheme:
    # numbers travel as their UTF-8 string form; at rest in parquet they are
    # stored natively, so this path is only used for raw commit-log bytes
    return Scheme(
        uri=uri,
        spark_type=typ,
        encode=lambda c: F.encode(c.cast("string"), "UTF-8"),
        decode=lambda c, t=typ: F.decode(c, "UTF-8").cast(t),
        default=default,
    )


_BUILTIN: dict[str, Scheme] = {
    "bytes": Scheme("bytes", BinaryType(), _identity_binary, _identity_binary, b""),
    "string": Scheme("string", StringType(), _string_encode, _string_decode, ""),
    "integer": _numeric("integer", IntegerType(), 0),
    "int": _numeric("int", IntegerType(), 0),
    "long": _numeric("long", LongType(), 0),
    "float": _numeric("float", FloatType(), 0.0),
    "double": _numeric("double", DoubleType(), 0.0),
    "boolean": _numeric("boolean", BooleanType(), False),
    # schema-less json travels as its string form; query with
    # F.get_json_object / F.from_json (JsonSerializer.java:35-36)
    "json": Scheme("json", StringType(), _string_encode, _string_decode, "{}"),
}


def resolve_scheme(uri: str) -> Scheme:
    """Resolve a scheme URI. ``proto:``/``avro:`` resolve lazily so the
    engine works without the optional spark-protobuf/avro packages."""
    base = uri.split(":", 1)[0]
    if base in _BUILTIN:
        return _BUILTIN[base]
    if base == "proto":
        message = uri.split(":", 1)[1]
        try:
            from pyspark.sql.protobuf.functions import from_protobuf, to_protobuf
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "proto scheme needs spark-protobuf on the classpath"
            ) from e
        return Scheme(
            uri=uri,
            spark_type=BinaryType(),  # struct type comes from the descriptor set
            encode=lambda c: to_protobuf(c, message),
            decode=lambda c: from_protobuf(c, message),
        )
    if base == "avro":
        schema_json = uri.split(":", 1)[1]
        try:
            from pyspark.sql.avro.functions import from_avro, to_avro
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "avro scheme needs spark-avro on the classpath"
            ) from e
        return Scheme(
            uri=uri,
            spark_type=BinaryType(),
            encode=lambda c: to_avro(c),
            decode=lambda c: from_avro(c, schema_json),
        )
    raise KeyError(f"unknown scheme {uri!r}")


def register_scheme(scheme: Scheme) -> None:
    """Extension point, the analog of ValueSerializerFactory registration."""
    _BUILTIN[scheme.uri.split(":", 1)[0]] = scheme
