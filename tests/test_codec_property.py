"""Property-based round-trip tests for the pure-python Avro and protobuf
wire codecs (catalog/avro.py, catalog/proto.py): decode(encode(x)) == x for
arbitrary schema-conforming values, and every byte of the buffer consumed.
Pure-python — no Spark session needed, so these run in milliseconds."""

import math

from hypothesis import given, settings, strategies as st

from proxima_platform_spark.catalog import avro as av
from proxima_platform_spark.catalog import proto as pr

# -- avro -------------------------------------------------------------------

int64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
int32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
# avro float is IEEE single — round-trip through struct to get representable
f32 = st.floats(allow_nan=False, width=32)
f64 = st.floats(allow_nan=False)
utf8 = st.text(max_size=40)
blobs = st.binary(max_size=40)


AVRO_RECORD = {
    "type": "record",
    "name": "R",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "j", "type": "int"},
        {"name": "s", "type": "string"},
        {"name": "b", "type": "bytes"},
        {"name": "d", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "opt", "type": ["null", "string"]},
        {"name": "xs", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
    ],
}

avro_records = st.fixed_dictionaries(
    {
        "i": int64,
        "j": int32,
        "s": utf8,
        "b": blobs,
        "d": f64,
        "flag": st.booleans(),
        "opt": st.none() | utf8,
        "xs": st.lists(int64, max_size=8),
        "m": st.dictionaries(utf8, int64, max_size=5),
    }
)


@settings(max_examples=200, deadline=None)
@given(avro_records)
def test_avro_record_round_trip(rec):
    buf = av.encode(AVRO_RECORD, rec)
    out, pos = av.decode(AVRO_RECORD, buf)
    assert pos == len(buf)  # every byte consumed — no framing drift
    assert out == rec


@settings(max_examples=200, deadline=None)
@given(int64)
def test_avro_zigzag_varint_round_trip(n):
    buf = av.encode("long", n)
    out, pos = av.decode("long", buf)
    assert out == n and pos == len(buf)


@settings(max_examples=100, deadline=None)
@given(f32)
def test_avro_float_round_trip(x):
    out, _ = av.decode("float", av.encode("float", x))
    assert out == x or (math.isnan(out) and math.isnan(x))


# -- proto ------------------------------------------------------------------

PROTO_MSG = {
    "fields": {
        1: {"name": "i64", "type": "int64"},
        2: {"name": "si", "type": "sint64"},
        3: {"name": "u", "type": "uint64"},
        4: {"name": "s", "type": "string"},
        5: {"name": "b", "type": "bytes"},
        6: {"name": "d", "type": "double"},
        7: {"name": "flag", "type": "bool"},
        8: {"name": "xs", "type": "int32", "repeated": True},
        9: {"name": "inner", "type": "message",
            "message": {"fields": {1: {"name": "v", "type": "sfixed64"}}}},
    }
}

proto_msgs = st.fixed_dictionaries(
    {
        "i64": int64,
        "si": int64,
        "u": st.integers(min_value=0, max_value=2**64 - 1),
        "s": utf8,
        "b": blobs,
        "d": f64,
        "flag": st.booleans(),
        "xs": st.lists(int32, max_size=8),
        "inner": st.none() | st.fixed_dictionaries({"v": int64}),
    }
)


@settings(max_examples=200, deadline=None)
@given(proto_msgs)
def test_proto_message_round_trip(msg):
    buf = pr.encode(PROTO_MSG, msg)
    out = pr.decode(PROTO_MSG, buf)
    for name, val in msg.items():
        got = out[name]
        if val is None:
            assert got is None or got == []  # omitted scalar / empty repeated
        else:
            assert got == val, name


@settings(max_examples=200, deadline=None)
@given(int64)
def test_proto_signed_varint_round_trip(n):
    d = {"fields": {1: {"name": "a", "type": "int64"}}}
    assert pr.decode(d, pr.encode(d, {"a": n}))["a"] == n
    dz = {"fields": {1: {"name": "a", "type": "sint64"}}}
    assert pr.decode(dz, pr.encode(dz, {"a": n}))["a"] == n
