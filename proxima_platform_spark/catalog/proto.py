"""Pure-python protobuf wire-format codec + message registry.

The reference's most-used scheme is ``proto:<message class>`` resolved from
the Java classpath (scheme/proto/.../ProtoSerializerFactory.java:78,124;
class lookup via Classpath.findClass). Spark's native path is
``from_protobuf``/``to_protobuf``, which needs both the spark-protobuf jar
and a compiled descriptor set — absent here. This module mirrors the Avro
tiering (catalog/avro.py): the protobuf *wire format*
(https://protobuf.dev/programming-guides/encoding/) implemented directly,
with message shapes supplied as python descriptor dicts registered under
the message name — the python analog of the reference's classpath lookup:

    register_message("my.pkg.User", {
        "fields": {
            1: {"name": "id", "type": "int64"},
            2: {"name": "name", "type": "string"},
            3: {"name": "tags", "type": "string", "repeated": True},
            4: {"name": "addr", "type": "message", "message": "my.pkg.Addr"},
        }
    })

Supported field types: int32/int64/uint32/uint64 (varint), sint32/sint64
(zigzag), bool, enum (int), fixed64/sfixed64/double, fixed32/sfixed32/float,
string, bytes, nested message (by dict or registered name), and repeated
fields (packed primitives on encode; both packed and expanded accepted on
decode). Unknown fields are skipped on decode, per proto semantics.
"""

from __future__ import annotations

import struct
from typing import Any, Callable

import pandas as pd

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_REGISTRY: dict[str, dict] = {}


def register_message(name: str, descriptor: dict) -> None:
    """Register a message descriptor under its fully-qualified name (the
    analog of having the compiled class on the reference's classpath)."""
    _REGISTRY[name] = descriptor


def resolve_message(name: str) -> dict:
    if name not in _REGISTRY:
        raise KeyError(
            f"proto message {name!r} is not registered — call "
            "register_message(name, descriptor) first (python analog of the "
            "reference's classpath lookup)"
        )
    return _REGISTRY[name]


_VARINT = {"int32", "int64", "uint32", "uint64", "bool", "enum", "sint32", "sint64"}
_FIXED64 = {"fixed64", "sfixed64", "double"}
_FIXED32 = {"fixed32", "sfixed32", "float"}
_LENGTH = {"string", "bytes", "message"}

_WIRE_VARINT, _WIRE_64, _WIRE_LEN, _WIRE_32 = 0, 1, 2, 5


def _wire_type(ftype: str) -> int:
    if ftype in _VARINT:
        return _WIRE_VARINT
    if ftype in _FIXED64:
        return _WIRE_64
    if ftype in _FIXED32:
        return _WIRE_32
    return _WIRE_LEN


# -- varints ----------------------------------------------------------------


def _write_varint(n: int) -> bytes:
    if n < 0:  # negative int32/int64 encode as 10-byte two's complement
        n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return acc, pos
        shift += 7


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _to_signed64(n: int) -> int:
    return n - (1 << 64) if n >= (1 << 63) else n


def _to_signed32(n: int) -> int:
    n &= (1 << 32) - 1
    return n - (1 << 32) if n >= (1 << 31) else n


# -- scalar encode/decode ---------------------------------------------------


def _encode_scalar(ftype: str, v, field: dict) -> bytes:
    if ftype in ("int32", "int64", "uint32", "uint64", "enum"):
        return _write_varint(int(v))
    if ftype == "bool":
        return _write_varint(1 if v else 0)
    if ftype in ("sint32", "sint64"):
        return _write_varint(_zigzag(int(v)))
    if ftype == "double":
        return struct.pack("<d", v)
    if ftype == "float":
        return struct.pack("<f", v)
    if ftype in ("fixed64", "sfixed64"):
        return struct.pack("<q" if ftype == "sfixed64" else "<Q", int(v))
    if ftype in ("fixed32", "sfixed32"):
        return struct.pack("<i" if ftype == "sfixed32" else "<I", int(v))
    if ftype == "string":
        raw = v.encode("utf-8")
        return _write_varint(len(raw)) + raw
    if ftype == "bytes":
        raw = bytes(v)
        return _write_varint(len(raw)) + raw
    if ftype == "message":
        body = encode(_field_message(field), v)
        return _write_varint(len(body)) + body
    raise NotImplementedError(f"proto type {ftype!r}")


def _decode_scalar(ftype: str, field: dict, buf: bytes, pos: int) -> tuple[Any, int]:
    if ftype in ("int32", "int64"):
        n, pos = _read_varint(buf, pos)
        return _to_signed64(n), pos
    if ftype in ("uint32", "uint64", "enum"):
        return _read_varint(buf, pos)
    if ftype == "bool":
        n, pos = _read_varint(buf, pos)
        return bool(n), pos
    if ftype in ("sint32", "sint64"):
        n, pos = _read_varint(buf, pos)
        return _unzigzag(n), pos
    if ftype == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if ftype == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if ftype == "fixed64":
        return struct.unpack_from("<Q", buf, pos)[0], pos + 8
    if ftype == "sfixed64":
        return struct.unpack_from("<q", buf, pos)[0], pos + 8
    if ftype == "fixed32":
        return struct.unpack_from("<I", buf, pos)[0], pos + 4
    if ftype == "sfixed32":
        return struct.unpack_from("<i", buf, pos)[0], pos + 4
    if ftype in ("string", "bytes", "message"):
        n, pos = _read_varint(buf, pos)
        raw = bytes(buf[pos : pos + n])
        pos += n
        if ftype == "string":
            return raw.decode("utf-8"), pos
        if ftype == "bytes":
            return raw, pos
        return decode(_field_message(field), raw), pos
    raise NotImplementedError(f"proto type {ftype!r}")


def _field_message(field: dict) -> dict:
    msg = field["message"]
    return resolve_message(msg) if isinstance(msg, str) else msg


# -- message encode/decode --------------------------------------------------


def encode(descriptor: dict, value: dict) -> bytes:
    """Encode a dict as protobuf wire bytes. Missing / None fields are
    omitted (proto3 default semantics); repeated primitives pack."""
    out = bytearray()
    for num, field in sorted(descriptor["fields"].items()):
        v = value.get(field["name"])
        if v is None:
            continue
        ftype = field["type"]
        if field.get("repeated"):
            if not v:
                continue
            if ftype in _LENGTH:  # strings/bytes/messages repeat expanded
                for item in v:
                    out += _write_varint((num << 3) | _wire_type(ftype))
                    out += _encode_scalar(ftype, item, field)
            else:  # primitives pack into one length-delimited blob
                packed = b"".join(_encode_scalar(ftype, item, field) for item in v)
                out += _write_varint((num << 3) | _WIRE_LEN)
                out += _write_varint(len(packed)) + packed
        else:
            out += _write_varint((num << 3) | _wire_type(ftype))
            out += _encode_scalar(ftype, v, field)
    return bytes(out)


def _skip(wire: int, buf: bytes, pos: int) -> int:
    if wire == _WIRE_VARINT:
        _, pos = _read_varint(buf, pos)
        return pos
    if wire == _WIRE_64:
        return pos + 8
    if wire == _WIRE_32:
        return pos + 4
    if wire == _WIRE_LEN:
        n, pos = _read_varint(buf, pos)
        return pos + n
    raise NotImplementedError(f"wire type {wire}")


def decode(descriptor: dict, buf: bytes) -> dict:
    """Decode wire bytes into a dict. Repeated fields accumulate; packed
    and expanded encodings both accepted; unknown field numbers skipped."""
    fields = descriptor["fields"]
    out: dict = {}
    for num, field in fields.items():
        if field.get("repeated"):
            out[field["name"]] = []
        else:
            out[field["name"]] = field.get("default")
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        num, wire = tag >> 3, tag & 0x7
        field = fields.get(num)
        if field is None:
            pos = _skip(wire, buf, pos)
            continue
        ftype = field["type"]
        if field.get("repeated"):
            if ftype not in _LENGTH and wire == _WIRE_LEN:  # packed
                n, pos = _read_varint(buf, pos)
                end = pos + n
                while pos < end:
                    v, pos = _decode_scalar(ftype, field, buf, pos)
                    out[field["name"]].append(v)
            else:
                v, pos = _decode_scalar(ftype, field, buf, pos)
                out[field["name"]].append(v)
        else:
            out[field["name"]], pos = _decode_scalar(ftype, field, buf, pos)
    return out


# -- Spark mapping ----------------------------------------------------------

_SPARK_TYPES: dict[str, DataType] = {
    "int32": IntegerType(),
    "sint32": IntegerType(),
    "sfixed32": IntegerType(),
    "uint32": LongType(),
    "fixed32": LongType(),
    "int64": LongType(),
    "sint64": LongType(),
    "sfixed64": LongType(),
    "uint64": LongType(),
    "fixed64": LongType(),
    "enum": IntegerType(),
    "bool": BooleanType(),
    "float": FloatType(),
    "double": DoubleType(),
    "string": StringType(),
    "bytes": BinaryType(),
}


def proto_to_spark_type(descriptor: dict) -> StructType:
    fields = []
    for num in sorted(descriptor["fields"]):
        f = descriptor["fields"][num]
        if f["type"] == "message":
            base: DataType = proto_to_spark_type(_field_message(f))
        else:
            base = _SPARK_TYPES[f["type"]]
        if f.get("repeated"):
            base = ArrayType(base)
        fields.append(StructField(f["name"], base, nullable=True))
    return StructType(fields)


# -- Spark column boundary (Arrow-batched, mirrors catalog/avro.py) ---------


def _spark_to_plain(v):
    """Row/struct values arrive as Row objects inside pandas cells."""
    if hasattr(v, "asDict"):
        return {k: _spark_to_plain(x) for k, x in v.asDict().items()}
    if isinstance(v, list):
        return [_spark_to_plain(x) for x in v]
    return v


def proto_decode_column(descriptor: dict) -> Callable:
    from pyspark.sql.functions import pandas_udf

    spark_type = proto_to_spark_type(descriptor)

    @pandas_udf(spark_type)
    def dec(s: pd.Series) -> pd.DataFrame:
        rows = [
            {f.name: None for f in spark_type.fields}
            if b is None
            else decode(descriptor, bytes(b))
            for b in s
        ]
        return pd.DataFrame(rows, columns=[f.name for f in spark_type.fields])

    return dec


def proto_encode_column(descriptor: dict) -> Callable:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def enc(s: pd.DataFrame) -> pd.Series:
        recs = s.astype(object).where(pd.notna(s), None).to_dict("records")
        return pd.Series(
            [encode(descriptor, {k: _spark_to_plain(v) for k, v in r.items()}) for r in recs],
            dtype=object,
        )

    return enc
