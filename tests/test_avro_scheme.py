"""Avro scheme + Confluent schema-registry scheme.

The container has no spark-avro jar and no python avro package, so the
codec under test is the pure-python Avro binary implementation
(catalog/avro.py) running as Arrow-batched pandas UDFs. Wire-format parity
targets: scheme/avro/.../AvroSerializer.java and
scheme/confluent/.../SchemaRegistryValueSerializer.java:47-140."""

import json

import pytest

from proxima_platform_spark.catalog import avro as av
from proxima_platform_spark.catalog.schemes import resolve_scheme

USER_SCHEMA = {
    "type": "record",
    "name": "User",
    "namespace": "test",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "email", "type": ["null", "string"], "default": None},
        {"name": "score", "type": "double"},
    ],
}


class TestBinaryCodec:
    @pytest.mark.parametrize(
        "schema,value",
        [
            ("long", 0),
            ("long", -1),
            ("long", 2**40),
            ("long", -(2**40)),
            ("int", 64),  # zigzag boundary
            ("boolean", True),
            ("float", 1.5),
            ("double", -2.25),
            ("string", "héllo"),
            ("bytes", b"\x00\xff"),
            (["null", "string"], None),
            (["null", "string"], "x"),
            ({"type": "array", "items": "long"}, [1, -2, 300]),
            ({"type": "map", "values": "string"}, {"a": "1", "b": "2"}),
            ({"type": "enum", "name": "E", "symbols": ["A", "B"]}, "B"),
            ({"type": "fixed", "name": "F", "size": 3}, b"abc"),
        ],
    )
    def test_round_trip(self, schema, value):
        buf = av.encode(schema, value)
        out, pos = av.decode(schema, buf)
        assert out == value and pos == len(buf)

    def test_record_round_trip(self):
        rec = {"id": 7, "name": "ada", "email": None, "score": 0.5}
        buf = av.encode(USER_SCHEMA, rec)
        assert av.decode(USER_SCHEMA, buf)[0] == rec
        rec2 = {"id": 8, "name": "bob", "email": "b@x", "score": -1.0}
        assert av.decode(USER_SCHEMA, av.encode(USER_SCHEMA, rec2))[0] == rec2

    def test_zigzag_matches_spec_examples(self):
        # Avro spec: 0→00, -1→01, 1→02, -2→03, 2→04
        for n, b in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03")]:
            assert av.encode("long", n) == b

    def test_spark_type_mapping(self):
        t = av.avro_to_spark_type(USER_SCHEMA)
        assert [f.name for f in t.fields] == ["id", "name", "email", "score"]
        assert t["email"].nullable and not t["id"].nullable
        assert str(av.avro_to_spark_type({"type": "array", "items": "int"})) == (
            "ArrayType(IntegerType(), True)"
        )


class TestAvroScheme:
    def test_resolve_and_spark_round_trip(self, spark):
        scheme = resolve_scheme("avro:" + json.dumps(USER_SCHEMA))
        df = spark.createDataFrame(
            [(1, "ada", None, 0.5), (2, "bob", "b@x", 1.5)],
            "id long, name string, email string, score double",
        )
        from pyspark.sql import functions as F

        packed = df.select(
            scheme.encode(F.struct("id", "name", "email", "score")).alias("bin")
        )
        out = packed.select(scheme.decode(F.col("bin")).alias("u")).select(
            "u.*"
        ).orderBy("id").collect()
        assert [(r.id, r.name, r.email, r.score) for r in out] == [
            (1, "ada", None, 0.5),
            (2, "bob", "b@x", 1.5),
        ]

    def test_primitive_avro_scheme(self, spark):
        scheme = resolve_scheme("avro:string")
        from pyspark.sql import functions as F

        df = spark.createDataFrame([("x",), ("yz",)], "v string")
        out = (
            df.select(scheme.encode(F.col("v")).alias("b"))
            .select(scheme.decode(F.col("b")).alias("v"))
            .orderBy("v")
            .collect()
        )
        assert [r.v for r in out] == ["x", "yz"]


def make_stub_fetcher():
    """In-memory Confluent registry: one subject 'users', schema id 42.

    Returned as a closure so cloudpickle serializes it BY VALUE — a
    module-level function would pickle by reference to this test module,
    which Spark executor workers cannot import."""
    schema_str = json.dumps(USER_SCHEMA)

    def fetch(url: str) -> str:
        if url.endswith("/subjects/users/versions/latest"):
            return json.dumps({"id": 42, "version": 1, "schema": schema_str})
        if url.endswith("/schemas/ids/42"):
            return json.dumps({"schema": schema_str})
        raise AssertionError(f"unexpected registry URL {url}")

    return fetch


stub_registry_fetcher = make_stub_fetcher()


class TestSchemaRegistryScheme:
    def test_resolve_no_longer_keyerror(self):
        scheme = resolve_scheme(
            "schema-registry:http://registry:8081/users",
            registry_fetcher=stub_registry_fetcher,
        )
        assert [f.name for f in scheme.spark_type.fields] == [
            "id",
            "name",
            "email",
            "score",
        ]

    def test_confluent_wire_format(self):
        body = av.encode(USER_SCHEMA, {"id": 1, "name": "a", "email": None, "score": 0.0})
        framed = av.confluent_wrap(42, body)
        assert framed[0] == 0 and framed[1:5] == (42).to_bytes(4, "big")
        schema_id, unframed = av.confluent_unwrap(framed)
        assert schema_id == 42 and unframed == body
        with pytest.raises(ValueError):
            av.confluent_unwrap(b"\x01xxxx")

    def test_spark_round_trip_through_registry(self, spark):
        scheme = resolve_scheme(
            "schema-registry:http://registry:8081/users",
            registry_fetcher=stub_registry_fetcher,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(10, "eve", "e@x", 2.5)], "id long, name string, email string, score double"
        )
        packed = df.select(
            scheme.encode(F.struct("id", "name", "email", "score")).alias("bin")
        )
        raw = bytes(packed.collect()[0].bin)
        assert raw[0] == 0 and int.from_bytes(raw[1:5], "big") == 42
        out = packed.select(scheme.decode(F.col("bin")).alias("u")).select("u.*").collect()[0]
        assert (out.id, out.name, out.email, out.score) == (10, "eve", "e@x", 2.5)

    def test_registry_caches_fetches(self):
        calls = []

        def counting_fetcher(url):
            calls.append(url)
            return stub_registry_fetcher(url)

        client = av.SchemaRegistryClient("http://r:8081", fetcher=counting_fetcher)
        client.latest_version("users")
        client.latest_version("users")
        client.schema_by_id(42)  # seeded by latest_version
        assert len(calls) == 1


USER_SCHEMA_V1 = {
    "type": "record",
    "name": "User",
    "namespace": "test",
    "fields": [
        {"name": "id", "type": "int"},
        {"name": "nick", "type": "string"},
        {"name": "legacy_flag", "type": "boolean"},
    ],
}

USER_SCHEMA_V2 = {
    "type": "record",
    "name": "User",
    "namespace": "test",
    "fields": [
        # reordered vs writer; id promoted int->long; legacy_flag retired;
        # email added with default
        {"name": "nick", "type": "string"},
        {"name": "id", "type": "long"},
        {"name": "email", "type": ["null", "string"], "default": None},
    ],
}


class TestSchemaResolution:
    """Avro spec §Schema Resolution on the pure codec (resolve_decode)."""

    def test_reorder_promote_skip_default(self):
        body = av.encode(USER_SCHEMA_V1, {"id": 7, "nick": "n", "legacy_flag": True})
        out, _ = av.resolve_decode(USER_SCHEMA_V1, USER_SCHEMA_V2, body)
        assert out == {"nick": "n", "id": 7, "email": None}

    def test_missing_field_without_default_raises(self):
        reader = {
            "type": "record", "name": "User",
            "fields": [{"name": "absent", "type": "string"}],
        }
        body = av.encode(USER_SCHEMA_V1, {"id": 1, "nick": "x", "legacy_flag": False})
        with pytest.raises(av.AvroResolutionError, match="absent"):
            av.resolve_decode(USER_SCHEMA_V1, reader, body)

    @pytest.mark.parametrize(
        "wt,rt,value,expect",
        [
            ("int", "long", 5, 5),
            ("int", "double", 5, 5.0),
            ("long", "float", 12, 12.0),
            ("string", "bytes", "ab", b"ab"),
            ("bytes", "string", b"ab", "ab"),
        ],
    )
    def test_primitive_promotions(self, wt, rt, value, expect):
        out, _ = av.resolve_decode(wt, rt, av.encode(wt, value))
        assert out == expect and type(out) is type(expect)

    def test_incompatible_raises(self):
        with pytest.raises(av.AvroResolutionError):
            av.resolve_decode("double", "int", av.encode("double", 1.5))

    def test_union_writer_resolved_against_reader_branch(self):
        writer = ["null", "int"]
        reader = ["null", "long"]
        out, _ = av.resolve_decode(writer, reader, av.encode(writer, 9))
        assert out == 9
        out_null, _ = av.resolve_decode(writer, reader, av.encode(writer, None))
        assert out_null is None

    def test_array_and_map_resolve_elementwise(self):
        w = {"type": "array", "items": "int"}
        r = {"type": "array", "items": "double"}
        out, _ = av.resolve_decode(w, r, av.encode(w, [1, 2, 3]))
        assert out == [1.0, 2.0, 3.0]
        wm = {"type": "map", "values": "int"}
        rm = {"type": "map", "values": "long"}
        out2, _ = av.resolve_decode(wm, rm, av.encode(wm, {"a": 1}))
        assert out2 == {"a": 1}

    def test_enum_symbol_fallback_to_reader_default(self):
        w = {"type": "enum", "name": "E", "symbols": ["A", "B", "C"]}
        r = {"type": "enum", "name": "E", "symbols": ["A", "B"], "default": "A"}
        out, _ = av.resolve_decode(w, r, av.encode(w, "C"))
        assert out == "A"


def make_two_version_fetcher():
    """Registry stub with subject 'users2' at v2 (id 43) and the old writer
    schema still resolvable by id 41."""
    v1, v2 = json.dumps(USER_SCHEMA_V1), json.dumps(USER_SCHEMA_V2)

    def fetch(url: str) -> str:
        if url.endswith("/subjects/users2/versions/latest"):
            return json.dumps({"id": 43, "version": 2, "schema": v2})
        if url.endswith("/schemas/ids/41"):
            return json.dumps({"schema": v1})
        if url.endswith("/schemas/ids/43"):
            return json.dumps({"schema": v2})
        raise AssertionError(f"unexpected registry URL {url}")

    return fetch


class TestMixedWriterVersions:
    def test_topic_with_old_and_new_messages_reads_as_latest(self, spark):
        """A commit-log family whose payloads span writer versions decodes
        to ONE stable column type: old rows get reader defaults / promoted
        ints, retired fields vanish (resolution, not positional decode)."""
        from pyspark.sql import functions as F

        client = av.SchemaRegistryClient(
            "http://r:8081", fetcher=make_two_version_fetcher()
        )
        old = av.confluent_wrap(
            41, av.encode(USER_SCHEMA_V1, {"id": 1, "nick": "old", "legacy_flag": True})
        )
        new = av.confluent_wrap(
            43, av.encode(USER_SCHEMA_V2, {"nick": "new", "id": 2, "email": "n@x"})
        )
        df = spark.createDataFrame([(old,), (new,)], "bin binary")
        dec = av.confluent_decode_column(client, "users2")
        out = {
            r.u.nick: r.u
            for r in df.select(dec(F.col("bin")).alias("u")).collect()
        }
        assert out["old"].id == 1 and out["old"].email is None
        assert out["new"].id == 2 and out["new"].email == "n@x"
