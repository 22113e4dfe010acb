"""Pure-python Avro binary codec + Confluent schema-registry client.

The reference ships Avro and Confluent schema-registry value serializers
(scheme/avro/.../AvroSerializer.java, scheme/confluent/.../
SchemaRegistryValueSerializer.java:47-140). Spark's native path for this is
``from_avro``/``to_avro`` — but those need the spark-avro jar on the
classpath, which this container lacks. Rather than leave the scheme a stub,
this module implements the Avro *binary encoding spec* (zigzag varints,
little-endian floats, length-prefixed bytes/strings, block-encoded
arrays/maps — https://avro.apache.org/docs/current/specification/) in pure
python, and the Confluent wire format (magic 0x00 + 4-byte big-endian
schema id + Avro body — SchemaRegistryValueSerializer.java:47-48).

Execution tiers (picked automatically by ``catalog.schemes``):

* spark-avro jar present → ``from_avro``/``to_avro`` JVM expressions.
* absent → an Arrow-batched pandas UDF wrapping this codec (the documented
  slow path; still never row-at-a-time over the Python socket).

Supported schema forms: all primitives, record, enum, fixed, array, map,
and unions. Logical types are passed through as their base type.
"""

from __future__ import annotations

import json
import struct

import pandas as pd
from typing import Any, Callable

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    NullType,
    StringType,
    StructField,
    StructType,
)

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def parse_schema(schema: "str | dict | list") -> "dict | str | list":
    """Parse/normalize an Avro schema (JSON string or already-parsed)."""
    if isinstance(schema, str):
        s = schema.strip()
        if s.startswith("{") or s.startswith("["):
            return json.loads(s)
        return s  # bare primitive name, e.g. "string"
    return schema


def _schema_type(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


# ---------------------------------------------------------------------------
# binary decoding (Avro spec §binary encoding)
# ---------------------------------------------------------------------------


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos  # zigzag


def _write_long(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode(schema, buf: bytes, pos: int = 0) -> tuple[Any, int]:
    """Decode one datum; returns (value, next_pos)."""
    t = _schema_type(schema)
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] == 1, pos + 1
    if t in ("int", "long"):
        return _read_long(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t in ("bytes", "string"):
        n, pos = _read_long(buf, pos)
        raw = bytes(buf[pos : pos + n])
        return (raw.decode("utf-8") if t == "string" else raw), pos + n
    if t == "union":
        idx, pos = _read_long(buf, pos)
        return decode(schema[idx], buf, pos)
    if t == "record":
        rec = {}
        for field in schema["fields"]:
            rec[field["name"]], pos = decode(field["type"], buf, pos)
        return rec, pos
    if t == "enum":
        idx, pos = _read_long(buf, pos)
        return schema["symbols"][idx], pos
    if t == "fixed":
        n = schema["size"]
        return bytes(buf[pos : pos + n]), pos + n
    if t == "array":
        out = []
        while True:
            count, pos = _read_long(buf, pos)
            if count == 0:
                return out, pos
            if count < 0:  # block with byte-size prefix
                count = -count
                _, pos = _read_long(buf, pos)
            for _ in range(count):
                item, pos = decode(schema["items"], buf, pos)
                out.append(item)
    if t == "map":
        out = {}
        while True:
            count, pos = _read_long(buf, pos)
            if count == 0:
                return out, pos
            if count < 0:
                count = -count
                _, pos = _read_long(buf, pos)
            for _ in range(count):
                k, pos = decode("string", buf, pos)
                out[k], pos = decode(schema["values"], buf, pos)
    raise NotImplementedError(f"avro type {t!r}")


# ---------------------------------------------------------------------------
# schema resolution (Avro spec §Schema Resolution) — decode data written with
# one schema while presenting it under another: field reordering by name,
# reader defaults for missing fields, writer-only fields skipped, numeric
# promotions, string<->bytes, union re-resolution. This is what makes
# schema-registry subjects with mixed writer versions read as ONE stable
# column type (reference: scheme/.../AvroSerializer resolution semantics).
# ---------------------------------------------------------------------------

#: writer type -> reader types it may promote to
_PROMOTIONS = {
    "int": {"long", "float", "double"},
    "long": {"float", "double"},
    "float": {"double"},
    "string": {"bytes"},
    "bytes": {"string"},
}


class AvroResolutionError(ValueError):
    pass


def _resolvable(writer, reader) -> bool:
    wt, rt = _schema_type(writer), _schema_type(reader)
    if wt == "union":
        return True  # checked per-branch at decode time
    if rt == "union":
        return any(_resolvable(writer, b) for b in reader)
    if wt == rt:
        return True
    return rt in _PROMOTIONS.get(wt, ())


def _convert(value, wt: str, rt: str):
    if wt == rt:
        return value
    if rt in ("long", "float", "double") and wt in ("int", "long", "float"):
        return float(value) if rt in ("float", "double") else int(value)
    if wt == "string" and rt == "bytes":
        return value.encode("utf-8") if isinstance(value, str) else value
    if wt == "bytes" and rt == "string":
        return value.decode("utf-8") if isinstance(value, bytes) else value
    raise AvroResolutionError(f"cannot promote {wt} -> {rt}")


def _default_value(field_schema, default):
    """Materialize a reader-field default (spec: JSON defaults; bytes/fixed
    defaults are ISO-8859-1 strings)."""
    t = _schema_type(field_schema)
    if t == "union":
        return _default_value(field_schema[0], default)
    if t in ("bytes", "fixed") and isinstance(default, str):
        return default.encode("iso-8859-1")
    return default


def resolve_decode(writer, reader, buf: bytes, pos: int = 0) -> tuple[Any, int]:
    """Decode one datum written with ``writer`` schema, resolved to
    ``reader`` schema. Returns (value, next_pos)."""
    wt, rt = _schema_type(writer), _schema_type(reader)
    if wt == "union":
        idx, pos = _read_long(buf, pos)
        return resolve_decode(writer[idx], reader, buf, pos)
    if rt == "union":
        for branch in reader:
            if _resolvable(writer, branch):
                return resolve_decode(writer, branch, buf, pos)
        raise AvroResolutionError(f"writer {writer} matches no reader branch")
    if rt == "record" and wt == "record":
        reader_fields = {f["name"]: f for f in reader["fields"]}
        writer_names = {f["name"] for f in writer["fields"]}
        rec = {}
        for wf in writer["fields"]:
            if wf["name"] in reader_fields:
                rec[wf["name"]], pos = resolve_decode(
                    wf["type"], reader_fields[wf["name"]]["type"], buf, pos
                )
            else:
                _, pos = decode(wf["type"], buf, pos)  # writer-only: skip
        for rf in reader["fields"]:
            if rf["name"] not in writer_names:
                if "default" not in rf:
                    raise AvroResolutionError(
                        f"reader field {rf['name']!r} missing from writer "
                        "and has no default"
                    )
                rec[rf["name"]] = _default_value(rf["type"], rf["default"])
        return rec, pos
    if rt == "array" and wt == "array":
        out = []
        while True:
            count, pos = _read_long(buf, pos)
            if count == 0:
                return out, pos
            if count < 0:
                count = -count
                _, pos = _read_long(buf, pos)
            for _ in range(count):
                item, pos = resolve_decode(writer["items"], reader["items"], buf, pos)
                out.append(item)
    if rt == "map" and wt == "map":
        out = {}
        while True:
            count, pos = _read_long(buf, pos)
            if count == 0:
                return out, pos
            if count < 0:
                count = -count
                _, pos = _read_long(buf, pos)
            for _ in range(count):
                k, pos = decode("string", buf, pos)
                out[k], pos = resolve_decode(writer["values"], reader["values"], buf, pos)
    if rt == "enum" and wt == "enum":
        idx, pos = _read_long(buf, pos)
        sym = writer["symbols"][idx]
        if sym in reader["symbols"]:
            return sym, pos
        if "default" in reader:
            return reader["default"], pos
        raise AvroResolutionError(f"enum symbol {sym!r} not in reader schema")
    if wt == rt or rt in _PROMOTIONS.get(wt, ()):
        value, pos = decode(writer, buf, pos)
        return _convert(value, wt, rt), pos
    raise AvroResolutionError(f"cannot resolve writer {wt} to reader {rt}")


def encode(schema, value) -> bytes:
    t = _schema_type(schema)
    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if value else b"\x00"
    if t in ("int", "long"):
        return _write_long(int(value))
    if t == "float":
        return struct.pack("<f", value)
    if t == "double":
        return struct.pack("<d", value)
    if t == "string":
        raw = value.encode("utf-8")
        return _write_long(len(raw)) + raw
    if t == "bytes":
        return _write_long(len(value)) + bytes(value)
    if t == "union":
        for i, branch in enumerate(schema):
            if _matches(branch, value):
                return _write_long(i) + encode(branch, value)
        raise ValueError(f"value {value!r} matches no union branch of {schema}")
    if t == "record":
        out = bytearray()
        for field in schema["fields"]:
            out += encode(field["type"], value.get(field["name"]))
        return bytes(out)
    if t == "enum":
        return _write_long(schema["symbols"].index(value))
    if t == "fixed":
        raw = bytes(value)
        if len(raw) != schema["size"]:
            raise ValueError(f"fixed size {schema['size']} != {len(raw)}")
        return raw
    if t == "array":
        out = bytearray()
        if value:
            out += _write_long(len(value))
            for item in value:
                out += encode(schema["items"], item)
        out += _write_long(0)
        return bytes(out)
    if t == "map":
        out = bytearray()
        if value:
            out += _write_long(len(value))
            for k, v in value.items():
                out += encode("string", k)
                out += encode(schema["values"], v)
        out += _write_long(0)
        return bytes(out)
    raise NotImplementedError(f"avro type {t!r}")


def _matches(branch, value) -> bool:
    t = _schema_type(branch)
    if t == "null":
        return value is None
    if value is None:
        return False
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        # int → double promotion, as standard Avro writers do
        return isinstance(value, (float, int)) and not isinstance(value, bool)
    if t in ("string", "enum"):
        return isinstance(value, str)
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if t == "record" or t == "map":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, list)
    return False


# ---------------------------------------------------------------------------
# Avro schema → Spark type
# ---------------------------------------------------------------------------

_SPARK_PRIMITIVES: dict[str, DataType] = {
    "null": NullType(),
    "boolean": BooleanType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "bytes": BinaryType(),
    "string": StringType(),
}


def avro_to_spark_type(schema) -> DataType:
    """Map an Avro schema to the Spark type ``from_avro`` would produce."""
    t = _schema_type(schema)
    if t in _SPARK_PRIMITIVES:
        return _SPARK_PRIMITIVES[t]
    if t == "union":
        branches = [b for b in schema if _schema_type(b) != "null"]
        if len(branches) == 1:  # nullable column
            return avro_to_spark_type(branches[0])
        raise NotImplementedError("multi-type unions need a struct encoding")
    if t == "record":
        return StructType(
            [
                StructField(
                    f["name"],
                    avro_to_spark_type(f["type"]),
                    nullable=_is_nullable(f["type"]),
                )
                for f in schema["fields"]
            ]
        )
    if t == "enum":
        return StringType()
    if t == "fixed":
        return BinaryType()
    if t == "array":
        return ArrayType(avro_to_spark_type(schema["items"]))
    if t == "map":
        return MapType(StringType(), avro_to_spark_type(schema["values"]))
    raise NotImplementedError(f"avro type {t!r}")


def _is_nullable(schema) -> bool:
    return isinstance(schema, list) and any(_schema_type(b) == "null" for b in schema)


# ---------------------------------------------------------------------------
# Confluent wire format + registry client
# (SchemaRegistryValueSerializer.java:47-48: MAGIC_BYTE=0x0, SCHEMA_ID_SIZE=4)
# ---------------------------------------------------------------------------

MAGIC_BYTE = 0
SCHEMA_ID_SIZE = 4


def confluent_wrap(schema_id: int, body: bytes) -> bytes:
    return bytes([MAGIC_BYTE]) + schema_id.to_bytes(SCHEMA_ID_SIZE, "big") + body


def confluent_unwrap(payload: bytes) -> tuple[int, bytes]:
    if not payload or payload[0] != MAGIC_BYTE:
        raise ValueError("not a Confluent-framed payload (magic byte != 0)")
    schema_id = int.from_bytes(payload[1 : 1 + SCHEMA_ID_SIZE], "big")
    return schema_id, payload[1 + SCHEMA_ID_SIZE :]


class SchemaRegistryClient:
    """Minimal Confluent schema-registry client with an injectable fetcher.

    ``fetcher(url) -> str`` returns the HTTP response body for a registry
    endpoint; tests inject a stub, production uses the default urllib-based
    fetcher. Schemas are cached by id/subject, mirroring the reference's
    CachedSchemaRegistryClient usage (SchemaRegistryValueSerializer.java:60).
    """

    def __init__(self, base_url: str, fetcher: "Callable[[str], str] | None" = None):
        self.base_url = base_url.rstrip("/")
        self._fetch = fetcher or self._http_fetch
        self._by_id: dict[int, Any] = {}
        self._latest: dict[str, tuple[int, Any]] = {}

    @staticmethod
    def _http_fetch(url: str) -> str:  # pragma: no cover — network
        from urllib.request import urlopen

        with urlopen(url, timeout=10) as resp:
            return resp.read().decode("utf-8")

    def schema_by_id(self, schema_id: int):
        if schema_id not in self._by_id:
            body = json.loads(self._fetch(f"{self.base_url}/schemas/ids/{schema_id}"))
            self._by_id[schema_id] = parse_schema(body["schema"])
        return self._by_id[schema_id]

    def latest_version(self, subject: str) -> tuple[int, Any]:
        if subject not in self._latest:
            body = json.loads(
                self._fetch(f"{self.base_url}/subjects/{subject}/versions/latest")
            )
            schema = parse_schema(body["schema"])
            self._latest[subject] = (body["id"], schema)
            self._by_id.setdefault(body["id"], schema)
        return self._latest[subject]


# ---------------------------------------------------------------------------
# Spark column boundary — Arrow-batched pandas UDFs over the pure codec.
# The JVM fast path (from_avro/to_avro) needs the spark-avro jar; these are
# the jar-less tier. Still batched via Arrow, never row-at-a-time python UDF.
# ---------------------------------------------------------------------------


def _null_record(spark_type: StructType) -> dict:
    return {f.name: None for f in spark_type.fields}


def avro_decode_column(schema) -> Callable:
    """binary column → typed column, decoding Avro binary with the pure codec."""
    from pyspark.sql.functions import pandas_udf

    schema = parse_schema(schema)
    spark_type = avro_to_spark_type(schema)

    if isinstance(spark_type, StructType):

        @pandas_udf(spark_type)
        def dec(s: pd.Series) -> pd.DataFrame:
            rows = [
                _null_record(spark_type)
                if b is None
                else decode(schema, bytes(b))[0]
                for b in s
            ]
            return pd.DataFrame(rows, columns=[f.name for f in spark_type.fields])

    else:

        @pandas_udf(spark_type)
        def dec(s: pd.Series) -> pd.Series:
            return pd.Series(
                [None if b is None else decode(schema, bytes(b))[0] for b in s],
                dtype=object,
            )

    return dec


def avro_encode_column(schema) -> Callable:
    """typed column → binary column. Struct inputs arrive as a pandas
    DataFrame (Spark's struct-as-DataFrame pandas UDF convention)."""
    from pyspark.sql.functions import pandas_udf

    schema = parse_schema(schema)
    spark_type = avro_to_spark_type(schema)

    if isinstance(spark_type, StructType):

        @pandas_udf(BinaryType())
        def enc(s: pd.DataFrame) -> pd.Series:
            recs = s.astype(object).where(pd.notna(s), None).to_dict("records")
            return pd.Series([encode(schema, r) for r in recs], dtype=object)

    else:

        @pandas_udf(BinaryType())
        def enc(s: pd.Series) -> pd.Series:
            vals = s.astype(object).where(pd.notna(s), None)
            return pd.Series(
                [None if v is None else encode(schema, v) for v in vals],
                dtype=object,
            )

    return enc


def confluent_decode_column(client: SchemaRegistryClient, subject: str) -> Callable:
    """Confluent-framed binary → typed column. The writer schema is looked up
    **per value** by the embedded schema id (cached in the client), matching
    the reference's per-id serializer cache
    (SchemaRegistryValueSerializer.java:129-137), then *resolved* to the
    subject's latest schema (reader) per the Avro resolution spec — so a
    topic holding a mix of writer versions reads as one stable column type
    (old messages get reader defaults, retired fields are skipped)."""
    from pyspark.sql.functions import pandas_udf

    latest_id, latest_schema = client.latest_version(subject)
    spark_type = avro_to_spark_type(latest_schema)
    if not isinstance(spark_type, StructType):
        raise NotImplementedError("schema-registry subjects must be records")

    @pandas_udf(spark_type)
    def dec(s: pd.Series) -> pd.DataFrame:
        rows = []
        for b in s:
            if b is None:
                rows.append(_null_record(spark_type))
                continue
            schema_id, body = confluent_unwrap(bytes(b))
            if schema_id == latest_id:
                rows.append(decode(latest_schema, body)[0])
            else:
                writer = client.schema_by_id(schema_id)
                rows.append(resolve_decode(writer, latest_schema, body)[0])
        return pd.DataFrame(rows, columns=[f.name for f in spark_type.fields])

    return dec


def confluent_encode_column(client: SchemaRegistryClient, subject: str) -> Callable:
    """typed column → Confluent-framed binary under the subject's latest
    schema id (SchemaRegistryValueSerializer.java:115-121)."""
    from pyspark.sql.functions import pandas_udf

    schema_id, schema = client.latest_version(subject)

    @pandas_udf(BinaryType())
    def enc(s: pd.DataFrame) -> pd.Series:
        recs = s.astype(object).where(pd.notna(s), None).to_dict("records")
        return pd.Series(
            [confluent_wrap(schema_id, encode(schema, r)) for r in recs],
            dtype=object,
        )

    return enc
