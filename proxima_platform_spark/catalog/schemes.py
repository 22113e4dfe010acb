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


#: process-global registry fetcher override (offline/test environments
#: inject a stub once instead of threading it through every resolve call —
#: AttributeDescriptor.spark_type resolves with no argument)
_DEFAULT_REGISTRY_FETCHER = None

#: memoized non-builtin schemes, keyed by (uri, jar tier). Without this,
#: every AttributeDescriptor.spark_type access would rebuild pandas UDFs —
#: and for schema-registry schemes, re-fetch the subject schema over HTTP.
_RESOLVE_CACHE: dict = {}


def set_default_registry_fetcher(fetcher) -> None:
    """Install a process-wide ``fetcher(url) -> str`` used by
    ``schema-registry:`` schemes resolved without an explicit fetcher
    (clears the memo so already-resolved registry schemes re-resolve)."""
    global _DEFAULT_REGISTRY_FETCHER
    _DEFAULT_REGISTRY_FETCHER = fetcher
    for key in [k for k in _RESOLVE_CACHE if k[0].startswith("schema-registry:")]:
        del _RESOLVE_CACHE[key]


def resolve_scheme(uri: str, registry_fetcher=None) -> Scheme:
    """Resolve a scheme URI. ``proto:``/``avro:`` resolve lazily so the
    engine works without the optional spark-protobuf/avro packages;
    ``schema-registry:`` takes an optional injectable ``registry_fetcher``
    (url → response body) so tests run against a stub registry — or install
    one process-wide with ``set_default_registry_fetcher``. Results are
    memoized per (uri, jar tier); explicit-fetcher resolutions bypass the
    memo."""
    base = uri.split(":", 1)[0]
    if base in _BUILTIN:
        return _BUILTIN[base]
    if registry_fetcher is None:
        registry_fetcher = _DEFAULT_REGISTRY_FETCHER
        cache_key = (uri, _jvm_class_available_cached(base))
        cached = _RESOLVE_CACHE.get(cache_key)
        if cached is not None:
            return cached
        scheme = _resolve_uncached(uri, base, registry_fetcher)
        _RESOLVE_CACHE[cache_key] = scheme
        return scheme
    return _resolve_uncached(uri, base, registry_fetcher)


_TIER_CLASSES = {
    "proto": "org.apache.spark.sql.protobuf.ProtobufDataToCatalyst",
    "avro": "org.apache.spark.sql.avro.AvroDataToCatalyst",
}


def _jvm_class_available_cached(base: str) -> bool:
    cls = _TIER_CLASSES.get(base)
    return _jvm_class_available(cls) if cls else False


def _resolve_uncached(uri: str, base: str, registry_fetcher) -> Scheme:
    if base == "proto":
        # Tiered like avro: JVM from_protobuf/to_protobuf when the
        # spark-protobuf jar is loadable; otherwise the pure-python wire
        # codec (catalog/proto.py) for messages registered via
        # register_message — the python analog of the reference's classpath
        # lookup (ProtoSerializerFactory.java:78,124). The python shim module
        # always imports, so the jar is probed explicitly.
        message = uri.split(":", 1)[1]
        if not _jvm_class_available(
            "org.apache.spark.sql.protobuf.ProtobufDataToCatalyst"
        ):
            from proxima_platform_spark.catalog import proto as proto_codec

            try:
                descriptor = proto_codec.resolve_message(message)
            except KeyError as e:
                raise NotImplementedError(
                    "proto scheme needs the spark-protobuf jar on the "
                    f"classpath, or a descriptor registered for {message!r} "
                    "via catalog.proto.register_message"
                ) from e
            return Scheme(
                uri=uri,
                spark_type=proto_codec.proto_to_spark_type(descriptor),
                encode=proto_codec.proto_encode_column(descriptor),
                decode=proto_codec.proto_decode_column(descriptor),
            )
        from pyspark.sql.protobuf.functions import from_protobuf, to_protobuf

        return Scheme(
            uri=uri,
            spark_type=BinaryType(),  # struct type comes from the descriptor set
            encode=lambda c: to_protobuf(c, message),
            decode=lambda c: from_protobuf(c, message),
        )
    if base == "avro":
        # avro:<schema-json | primitive name>. With the spark-avro jar on the
        # classpath, from_avro/to_avro are the JVM fast path; without it (this
        # container) the pure-python codec runs as an Arrow-batched pandas UDF
        # (catalog/avro.py). Delta vs the reference: the URI carries the
        # schema itself, not a SpecificRecord class name (no Java classpath
        # to load generated classes from). Ref: AvroSerializerFactory.java:44.
        from proxima_platform_spark.catalog import avro as avro_codec

        schema_src = uri.split(":", 1)[1]
        schema = avro_codec.parse_schema(schema_src)
        if _spark_avro_jar_available():
            from pyspark.sql.avro.functions import from_avro, to_avro

            return Scheme(
                uri=uri,
                spark_type=avro_codec.avro_to_spark_type(schema),
                encode=lambda c: to_avro(c),
                decode=lambda c: from_avro(
                    c, schema_src if schema_src.lstrip().startswith("{")
                    else f'"{schema_src}"'
                ),
            )
        return Scheme(
            uri=uri,
            spark_type=avro_codec.avro_to_spark_type(schema),
            encode=avro_codec.avro_encode_column(schema),
            decode=avro_codec.avro_decode_column(schema),
        )
    if base == "schema-registry":
        # schema-registry:<registry-url>/<subject> — subject is the last path
        # segment, everything before it the registry base URL, mirroring
        # SchemaRegistryValueSerializer.getSchemaRegistrySubject
        # (SchemaRegistryValueSerializer.java:223-227). Wire format: magic
        # 0x00 + 4-byte BE schema id + avro body (ibid:47-48).
        from proxima_platform_spark.catalog import avro as avro_codec

        registry_url = uri.split(":", 1)[1]
        base_url, _, subject = registry_url.rstrip("/").rpartition("/")
        if not subject:
            raise ValueError(f"schema-registry URI needs a subject path: {uri!r}")
        client = avro_codec.SchemaRegistryClient(base_url, fetcher=registry_fetcher)
        _, schema = client.latest_version(subject)
        return Scheme(
            uri=uri,
            spark_type=avro_codec.avro_to_spark_type(schema),
            encode=avro_codec.confluent_encode_column(client, subject),
            decode=avro_codec.confluent_decode_column(client, subject),
        )
    raise KeyError(f"unknown scheme {uri!r}")


def _jvm_class_available(class_name: str) -> bool:
    """True when ``class_name`` is loadable in the active session's JVM."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        return False
    try:
        spark._jvm.java.lang.Class.forName(class_name)
        return True
    except Exception:
        return False


def _spark_avro_jar_available() -> bool:
    return _jvm_class_available("org.apache.spark.sql.avro.AvroDataToCatalyst")


def register_scheme(scheme: Scheme) -> None:
    """Extension point, the analog of ValueSerializerFactory registration."""
    _BUILTIN[scheme.uri.split(":", 1)[0]] = scheme
