"""Proto scheme: pure-python wire-format codec + registered descriptors.

No spark-protobuf jar and no protobuf python package here, so the wire
format (https://protobuf.dev/programming-guides/encoding/) is implemented
directly; message shapes come from registered descriptor dicts — the python
analog of the reference's classpath lookup
(scheme/proto/.../ProtoSerializerFactory.java:78,124)."""

import pytest

from proxima_platform_spark.catalog import proto as pr
from proxima_platform_spark.catalog.schemes import resolve_scheme

ADDR = {
    "fields": {
        1: {"name": "city", "type": "string"},
        2: {"name": "zip", "type": "int32"},
    }
}

USER = {
    "fields": {
        1: {"name": "id", "type": "int64"},
        2: {"name": "name", "type": "string"},
        3: {"name": "score", "type": "double"},
        4: {"name": "tags", "type": "string", "repeated": True},
        5: {"name": "counts", "type": "int32", "repeated": True},
        6: {"name": "addr", "type": "message", "message": ADDR},
        7: {"name": "active", "type": "bool"},
        8: {"name": "delta", "type": "sint64"},
        9: {"name": "raw", "type": "bytes"},
    }
}


class TestWireFormat:
    def test_round_trip_full_record(self):
        rec = {
            "id": 12345,
            "name": "ada",
            "score": -1.5,
            "tags": ["a", "b"],
            "counts": [1, 200, 300000],
            "addr": {"city": "brno", "zip": 60200},
            "active": True,
            "delta": -42,
            "raw": b"\x00\x01",
        }
        buf = pr.encode(USER, rec)
        assert pr.decode(USER, buf) == rec

    def test_missing_fields_get_defaults(self):
        buf = pr.encode(USER, {"id": 1})
        out = pr.decode(USER, buf)
        assert out["id"] == 1 and out["name"] is None
        assert out["tags"] == [] and out["addr"] is None

    def test_varint_wire_bytes_match_spec(self):
        # spec example: field 1 varint 150 → 08 96 01
        d = {"fields": {1: {"name": "a", "type": "int32"}}}
        assert pr.encode(d, {"a": 150}) == b"\x08\x96\x01"
        # negative int32 encodes as 10-byte two's-complement varint
        buf = pr.encode(d, {"a": -1})
        assert len(buf) == 11 and pr.decode(d, buf)["a"] == -1

    def test_zigzag(self):
        d = {"fields": {1: {"name": "a", "type": "sint32"}}}
        # spec: sint 0→0, -1→1, 1→2, -2→3
        assert pr.encode(d, {"a": -1}) == b"\x08\x01"
        assert pr.encode(d, {"a": 1}) == b"\x08\x02"
        assert pr.decode(d, pr.encode(d, {"a": -2**31}))["a"] == -2**31

    def test_packed_and_expanded_repeated_decode(self):
        d = {"fields": {1: {"name": "v", "type": "int32", "repeated": True}}}
        packed = pr.encode(d, {"v": [3, 270]})  # packs: 0A 03 03 8E 02
        assert packed[0] == 0x0A
        assert pr.decode(d, packed)["v"] == [3, 270]
        expanded = b"\x08\x03\x08\x8e\x02"  # same values, unpacked form
        assert pr.decode(d, expanded)["v"] == [3, 270]

    def test_unknown_fields_skipped(self):
        d_writer = {"fields": {1: {"name": "a", "type": "int32"},
                               2: {"name": "b", "type": "string"}}}
        d_reader = {"fields": {1: {"name": "a", "type": "int32"}}}
        buf = pr.encode(d_writer, {"a": 7, "b": "ignored"})
        assert pr.decode(d_reader, buf) == {"a": 7}

    def test_fixed_width_types(self):
        d = {"fields": {
            1: {"name": "f64", "type": "fixed64"},
            2: {"name": "sf32", "type": "sfixed32"},
            3: {"name": "fl", "type": "float"},
        }}
        rec = {"f64": 2**63, "sf32": -5, "fl": 0.5}
        assert pr.decode(d, pr.encode(d, rec)) == rec

    def test_spark_type_mapping(self):
        t = pr.proto_to_spark_type(USER)
        assert [f.name for f in t.fields] == [
            "id", "name", "score", "tags", "counts", "addr", "active", "delta", "raw",
        ]
        assert str(t["counts"].dataType) == "ArrayType(IntegerType(), True)"
        assert t["addr"].dataType.fieldNames() == ["city", "zip"]


class TestProtoScheme:
    def test_unregistered_message_raises_actionable(self):
        with pytest.raises(NotImplementedError, match="register_message"):
            resolve_scheme("proto:com.example.Nope")

    def test_registered_message_round_trips_through_spark(self, spark):
        pr.register_message("test.Simple", {
            "fields": {
                1: {"name": "k", "type": "int64"},
                2: {"name": "label", "type": "string"},
            }
        })
        scheme = resolve_scheme("proto:test.Simple")
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(1, "x"), (2, "y")], "k long, label string")
        packed = df.select(scheme.encode(F.struct("k", "label")).alias("bin"))
        out = (
            packed.select(scheme.decode(F.col("bin")).alias("m"))
            .select("m.*")
            .orderBy("k")
            .collect()
        )
        assert [(r.k, r.label) for r in out] == [(1, "x"), (2, "y")]
