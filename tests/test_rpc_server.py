"""Ingest/retrieve RPC façade (reference: rpc/src/main/proto/rpc.proto,
direct/ingest-server/.../IngestService.java, RetrieveService.java).

Every call here crosses the protobuf wire format through LocalChannel —
requests and responses are encoded to bytes and decoded back, so the
message descriptors (field numbers, types, nesting) are exercised exactly
as a real gRPC transport would."""

import pytest

from proxima_platform_spark.catalog import proto as pproto
from proxima_platform_spark.catalog.repository import Repository
from proxima_platform_spark.changelog import CHANGELOG_SCHEMA
from proxima_platform_spark.server import (
    IngestClient,
    LocalChannel,
    RetrieveClient,
    RpcError,
    RpcServer,
)
from proxima_platform_spark.server.rpc import (
    TXN_COMMITTED,
    TXN_FAILED,
    TXN_REJECTED,
)
from proxima_platform_spark.sources.registry import DataOperator


def config():
    return {
        "entities": {
            "user": {
                "attributes": {
                    "status": {"scheme": "string"},
                    "score": {"scheme": "integer"},
                    "device.*": {"scheme": "bytes"},
                }
            }
        },
        "attributeFamilies": {
            "user-log": {
                "entity": "user",
                "attributes": ["*"],
                "storage": "inmem://user-log",
                "type": "primary",
                "access": ["commit-log", "batch-updates"],
            }
        },
    }


@pytest.fixture()
def rig(spark):
    repo = Repository.of(config())
    op = DataOperator(repo, spark)
    op.register_inmem("user-log", spark.createDataFrame([], CHANGELOG_SCHEMA))
    server = RpcServer(op)
    ch = LocalChannel(server)
    return IngestClient(ch), RetrieveClient(ch), server


class TestWireFormat:
    def test_ingest_roundtrip_bytes(self):
        desc = pproto.resolve_message("proxima.rpc.Ingest")
        msg = {
            "uuid": "u-1", "entity": "user", "attribute": "device.1",
            "key": "k", "value": b"\x00\xffpayload", "stamp": 1234567890123,
            "delete": True, "transactionId": "t-9",
        }
        assert pproto.decode(desc, pproto.encode(desc, msg)) == msg

    def test_nested_repeated_messages(self):
        desc = pproto.resolve_message("proxima.rpc.MultifetchResponse")
        msg = {
            "getResponse": [
                {"status": 200, "statusMessage": "", "value": b"a",
                 "stamp": 5},
                {"status": 404, "statusMessage": "missing", "value": b"",
                 "stamp": 0},
            ],
            "listResponse": [
                {"status": 200, "statusMessage": "", "value": [
                    {"attribute": "device.1", "value": b"x", "stamp": 7},
                ]},
            ],
        }
        assert pproto.decode(desc, pproto.encode(desc, msg)) == msg

    def test_scan_result_reserved_field_numbers(self):
        # rpc.proto reserves 1-4 in ScanResult; the payload rides on 5
        desc = pproto.resolve_message("proxima.rpc.ScanResult")
        wire = pproto.encode(desc, {"value": [{"key": "k", "attribute": "a",
                                               "value": b"v", "stamp": 1}]})
        # first tag must be field 5, length-delimited
        assert wire[0] == (5 << 3) | 2


class TestIngestService:
    def test_ingest_then_get(self, rig):
        ingest, retrieve, _ = rig
        st = ingest.ingest(entity="user", key="u1", attribute="status",
                           value=b"active", stamp=1000, uuid="q1")
        assert (st["uuid"], st["status"]) == ("q1", 200)
        got = retrieve.get(entity="user", key="u1", attribute="status")
        assert got["status"] == 200
        assert got["value"] == b"active"
        assert got["stamp"] == 1000

    def test_missing_fields_400(self, rig):
        ingest, _, _ = rig
        st = ingest.ingest(entity="user", key="", attribute="status")
        assert st["status"] == 400

    def test_unknown_entity_404(self, rig):
        ingest, _, _ = rig
        st = ingest.ingest(entity="ghost", key="k", attribute="status")
        assert st["status"] == 404
        assert "ghost" in st["statusMessage"]

    def test_unknown_attribute_404(self, rig):
        ingest, _, _ = rig
        st = ingest.ingest(entity="user", key="k", attribute="nope")
        assert st["status"] == 404

    def test_invalid_scheme_412(self, rig):
        ingest, _, _ = rig
        st = ingest.ingest(entity="user", key="k", attribute="score",
                           value=b"not-a-number")
        assert st["status"] == 412
        # deletes are always valid (IngestService.java:393)
        st = ingest.ingest(entity="user", key="k", attribute="score",
                           delete=True)
        assert st["status"] == 200

    def test_wildcard_delete_clears_instances(self, rig):
        ingest, retrieve, _ = rig
        for i in (1, 2, 3):
            ingest.ingest(entity="user", key="u1", attribute=f"device.{i}",
                          value=b"d%d" % i, stamp=10 * i)
        listed = retrieve.list_attributes(entity="user", key="u1",
                                          wildcard_prefix="device")
        assert [v["attribute"] for v in listed["value"]] == [
            "device.1", "device.2", "device.3"]
        # deleteWildcard via attribute == "device.*" + delete
        st = ingest.ingest(entity="user", key="u1", attribute="device.*",
                           delete=True, stamp=100)
        assert st["status"] == 200
        listed = retrieve.list_attributes(entity="user", key="u1",
                                          wildcard_prefix="device")
        assert listed["value"] == []

    def test_ingest_bulk_stream(self, rig):
        ingest, _, _ = rig
        bulks = [
            {"ingest": [
                {"uuid": "a", "entity": "user", "key": "k1",
                 "attribute": "status", "value": b"x"},
                {"uuid": "b", "entity": "user", "key": "",
                 "attribute": "status", "value": b"y"},
            ]},
            {"ingest": [
                {"uuid": "c", "entity": "nope", "key": "k",
                 "attribute": "status", "value": b"z"},
            ]},
        ]
        out = list(ingest.ingest_bulk(bulks))
        statuses = {s["uuid"]: s["status"] for b in out for s in b["status"]}
        assert statuses == {"a": 200, "b": 400, "c": 404}

    def test_bulk_transactional_group_is_all_or_nothing(self, rig):
        # IngestService.java:231-255 — one invalid write in a bulk's
        # transactional group keeps its own status, every VALID write of
        # the group gets 412 'Invalid update was part of transaction',
        # and the transaction rolls back (commit -> FAILED); an unrelated
        # non-transactional write in the same bulk is untouched
        ingest, retrieve, _ = rig
        txn = retrieve.begin()
        bulk = {"ingest": [
            {"uuid": "t1", "entity": "user", "key": "k1",
             "attribute": "status", "value": b"ok", "transactionId": txn},
            {"uuid": "t2", "entity": "user", "key": "k2",
             "attribute": "score", "value": b"not-a-number",
             "transactionId": txn},
            {"uuid": "n1", "entity": "user", "key": "k3",
             "attribute": "status", "value": b"plain"},
        ]}
        [out] = list(ingest.ingest_bulk([bulk]))
        st = {s["uuid"]: s for s in out["status"]}
        assert st["t2"]["status"] == 412            # its own failure
        assert "Invalid scheme" in st["t2"]["statusMessage"]
        assert st["t1"]["status"] == 412            # poisoned group member
        assert "part of transaction" in st["t1"]["statusMessage"]
        assert st["n1"]["status"] == 200            # independent write
        # a read inside the rolled-back transaction is rejected 412
        # (reference: non-DUPLICATE TransactionRejectedException)
        got = retrieve.get(entity="user", key="k1", attribute="status",
                           transaction_id=txn)
        assert got["status"] == 412
        assert ingest.commit(txn) == TXN_FAILED     # rolled back
        # nothing from the transactional group reached storage
        assert retrieve.get(entity="user", key="k1",
                            attribute="status")["status"] == 404

    def test_bulk_transactional_group_all_valid_buffers(self, rig):
        ingest, retrieve, _ = rig
        txn = retrieve.begin()
        bulk = {"ingest": [
            {"uuid": "u1", "entity": "user", "key": "k1",
             "attribute": "status", "value": b"a", "transactionId": txn},
            {"uuid": "u2", "entity": "user", "key": "k1",
             "attribute": "score", "value": b"7", "transactionId": txn},
        ]}
        [out] = list(ingest.ingest_bulk([bulk]))
        assert all(s["status"] == 200 for s in out["status"])
        assert ingest.commit(txn) == TXN_COMMITTED
        got = retrieve.get(entity="user", key="k1", attribute="score")
        assert (got["status"], got["value"]) == (200, b"7")


class TestRetrieveService:
    def test_get_missing_key_404(self, rig):
        _, retrieve, _ = rig
        got = retrieve.get(entity="user", key="absent", attribute="status")
        assert got["status"] == 404

    def test_get_missing_fields_400(self, rig):
        _, retrieve, _ = rig
        assert retrieve.get(entity="user", key="", attribute="status")[
            "status"] == 400

    def test_list_pagination(self, rig):
        ingest, retrieve, _ = rig
        for i in range(5):
            ingest.ingest(entity="user", key="u1", attribute=f"device.{i}",
                          value=b"v", stamp=1)
        page1 = retrieve.list_attributes(entity="user", key="u1",
                                         wildcard_prefix="device", limit=2)
        names1 = [v["attribute"] for v in page1["value"]]
        assert names1 == ["device.0", "device.1"]
        page2 = retrieve.list_attributes(entity="user", key="u1",
                                         wildcard_prefix="device",
                                         offset=names1[-1], limit=2)
        assert [v["attribute"] for v in page2["value"]] == [
            "device.2", "device.3"]

    def test_list_prefix_longer_than_attribute_filters(self, rig):
        # RetrieveService.java:152-156 — 'device.1a' against 'device.*'
        # must return only instances with the requested longer prefix
        ingest, retrieve, _ = rig
        for name in ("1a.x", "1a.y", "1b.x", "2"):
            ingest.ingest(entity="user", key="u1",
                          attribute=f"device.{name}", value=b"v", stamp=1)
        listed = retrieve.list_attributes(entity="user", key="u1",
                                          wildcard_prefix="device.1a")
        assert [v["attribute"] for v in listed["value"]] == [
            "device.1a.x", "device.1a.y"]
        # limit applies after the prefix filter
        limited = retrieve.list_attributes(entity="user", key="u1",
                                           wildcard_prefix="device.1a",
                                           limit=1)
        assert [v["attribute"] for v in limited["value"]] == ["device.1a.x"]

    def test_list_strips_wildcard_suffix(self, rig):
        # 'device.*' and 'device' are the same request (:117-120)
        ingest, retrieve, _ = rig
        ingest.ingest(entity="user", key="u1", attribute="device.7",
                      value=b"v", stamp=1)
        a = retrieve.list_attributes(entity="user", key="u1",
                                     wildcard_prefix="device.*")
        b = retrieve.list_attributes(entity="user", key="u1",
                                     wildcard_prefix="device")
        assert a["status"] == b["status"] == 200
        assert a["value"] == b["value"]

    def test_list_offset_must_extend_prefix_400(self, rig):
        # :186-196 — offset not starting with wildcardPrefix is rejected
        _, retrieve, _ = rig
        resp = retrieve.list_attributes(entity="user", key="u1",
                                        wildcard_prefix="device",
                                        offset="elsewhere.1")
        assert resp["status"] == 400
        assert "Offset must have prefix" in resp["statusMessage"]

    def test_multifetch_preserves_order(self, rig):
        ingest, retrieve, _ = rig
        ingest.ingest(entity="user", key="u1", attribute="status", value=b"a",
                      stamp=1)
        resp = retrieve.multifetch(gets=[
            {"entity": "user", "key": "zzz", "attribute": "status"},
            {"entity": "user", "key": "u1", "attribute": "status"},
        ], lists=[
            {"entity": "user", "key": "u1", "wildcardPrefix": "device"},
        ])
        assert [g["status"] for g in resp["getResponse"]] == [404, 200]
        assert resp["getResponse"][1]["value"] == b"a"
        assert resp["listResponse"][0]["status"] == 200

    def test_scan_streams_chunks(self, rig):
        ingest, retrieve, server = rig
        server.SCAN_CHUNK = 2
        for i in range(5):
            ingest.ingest(entity="user", key=f"u{i}", attribute="status",
                          value=b"s%d" % i, stamp=1)
        chunks = list(retrieve.scan(entity="user", attributes=["status"]))
        assert [len(c["value"]) for c in chunks] == [2, 2, 1]
        seen = {kv["key"]: kv["value"] for c in chunks for kv in c["value"]}
        assert seen == {f"u{i}": b"s%d" % i for i in range(5)}

    def test_scan_unknown_attribute_errors(self, rig):
        _, retrieve, _ = rig
        with pytest.raises(RpcError):
            list(retrieve.scan(entity="user", attributes=["nope"]))


class TestRpcTransactions:
    def test_begin_ingest_commit_then_visible(self, rig):
        ingest, retrieve, _ = rig
        txn = retrieve.begin([{"entity": "user", "key": "u1",
                               "attribute": "status"}])
        st = ingest.ingest(entity="user", key="u1", attribute="status",
                           value=b"committed", stamp=5, transaction_id=txn)
        assert st["status"] == 200
        # buffered, not yet visible
        assert retrieve.get(entity="user", key="u1",
                            attribute="status")["status"] == 404
        assert ingest.commit(txn) == TXN_COMMITTED
        got = retrieve.get(entity="user", key="u1", attribute="status")
        assert (got["status"], got["value"]) == (200, b"committed")

    def test_conflicting_commit_rejected(self, rig):
        ingest, retrieve, _ = rig
        t1 = retrieve.begin()
        t2 = retrieve.begin()
        # both transactions read u1.status …
        retrieve.get(entity="user", key="u1", attribute="status",
                     transaction_id=t1)
        retrieve.get(entity="user", key="u1", attribute="status",
                     transaction_id=t2)
        # … and both write it; first commit wins, second is rejected
        ingest.ingest(entity="user", key="u1", attribute="status",
                      value=b"t1", stamp=1, transaction_id=t1)
        ingest.ingest(entity="user", key="u1", attribute="status",
                      value=b"t2", stamp=2, transaction_id=t2)
        assert ingest.commit(t1) == TXN_COMMITTED
        assert ingest.commit(t2) == TXN_REJECTED

    def test_read_after_commit_204(self, rig):
        ingest, retrieve, _ = rig
        txn = retrieve.begin()
        assert ingest.commit(txn) == TXN_COMMITTED
        got = retrieve.get(entity="user", key="u1", attribute="status",
                           transaction_id=txn)
        assert got["status"] == 204

    def test_commit_unknown_or_duplicate_failed(self, rig):
        ingest, retrieve, _ = rig
        assert ingest.commit("no-such-txn") == TXN_FAILED
        txn = retrieve.begin()
        assert ingest.commit(txn) == TXN_COMMITTED
        assert ingest.commit(txn) == TXN_FAILED

    def test_limited_list_in_transaction_400(self, rig):
        _, retrieve, _ = rig
        txn = retrieve.begin()
        resp = retrieve.list_attributes(entity="user", key="u1",
                                        wildcard_prefix="device", limit=3,
                                        transaction_id=txn)
        assert resp["status"] == 400
        # an offset inside a transaction is equally rejected
        # (RetrieveService.java:126-130 checks offset OR limit)
        resp = retrieve.list_attributes(entity="user", key="u1",
                                        wildcard_prefix="device",
                                        offset="device.1",
                                        transaction_id=txn)
        assert resp["status"] == 400

    def test_commit_replay_failure_returns_failed(self, rig, monkeypatch):
        # a storage failure while replaying committed outputs must yield a
        # well-formed FAILED response, never a raw exception
        ingest, retrieve, server = rig
        txn = retrieve.begin()
        ingest.ingest(entity="user", key="u1", attribute="status",
                      value=b"x", stamp=1, transaction_id=txn)

        def boom(*a, **k):
            raise RuntimeError("storage down")

        monkeypatch.setattr(server, "_attr_env", boom)
        assert ingest.commit(txn) == TXN_FAILED

    def test_commit_replay_failure_documents_partial_commit_window(
            self, rig, monkeypatch):
        # the FAILED response must spell out that the ledger already recorded
        # COMMITTED (a duplicate commit/get reports already-committed), so a
        # client acting on FAILED is not surprised by the contradiction
        ingest, retrieve, server = rig
        txn = retrieve.begin()
        ingest.ingest(entity="user", key="u1", attribute="status",
                      value=b"x", stamp=1, transaction_id=txn)

        def boom(*a, **k):
            raise RuntimeError("storage down")

        monkeypatch.setattr(server, "_attr_env", boom)
        resp = server.commit({"transactionId": txn})
        assert resp["status"] == TXN_FAILED
        assert "COMMITTED in the ledger" in resp["statusMessage"]
        # and the ledger indeed reports the duplicate as already committed
        dup = server.commit({"transactionId": txn})
        assert dup["status"] == TXN_FAILED


class TestSchemeValidity:
    def test_numeric_validity_mirrors_spark_cast(self):
        from proxima_platform_spark.server.rpc import _value_valid

        assert _value_valid("integer", b"42")
        assert _value_valid("integer", b"-7")
        assert not _value_valid("integer", b"1_0")   # python-int-only form
        assert not _value_valid("integer", b"4.2")
        assert not _value_valid("integer", b"")
        assert _value_valid("double", b"3.14")
        assert _value_valid("double", b"-1e9")
        assert not _value_valid("double", b"nan")    # python-float-only form
        assert not _value_valid("double", b"infinity")
        assert _value_valid("boolean", b"True")
        assert not _value_valid("boolean", b"1")
        assert not _value_valid("string", b"\xff\xfe")  # not utf-8
        assert _value_valid("bytes", b"\xff\xfe")


class TestListContractProperty:
    """Property check of the listAttributes contract against a pure-python
    model of RetrieveService.java:113-228: strip trailing '.*', default
    offset to the raw prefix, validate offset extends the raw prefix
    (400), exclusive keyset pagination, filter by a longer-than-attribute
    prefix, limit after the filter."""

    INSTANCES = ["1", "1a", "1a.x", "1a.y", "1b", "2", "2a", "30"]

    @staticmethod
    def model(instances, raw, offset, limit):
        prefix = raw[:-2] if raw.endswith(".*") else raw
        eff = offset or raw
        if not eff.startswith(raw):
            return 400, None
        names = sorted(f"device.{i}" for i in instances)
        rows = [a for a in names if a > eff]
        if prefix not in ("device", "device."):
            rows = [a for a in rows if a.startswith(prefix)]
        if limit > 0:
            rows = rows[:limit]
        return 200, rows

    def test_matches_model(self, rig):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        ingest, retrieve, _ = rig
        for i in self.INSTANCES:
            ingest.ingest(entity="user", key="u1", attribute=f"device.{i}",
                          value=b"v", stamp=1)

        raw_st = st.sampled_from(
            ["device", "device.*", "device.1", "device.1a", "device.1a.*",
             "device.2", "device.3"])
        offset_st = st.sampled_from(
            ["", "device", "device.1", "device.1a", "device.1a.x",
             "device.2", "elsewhere.9", "dev"])
        limit_st = st.sampled_from([0, 1, 2, 3, 100])

        @settings(
            max_examples=40, deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(raw=raw_st, offset=offset_st, limit=limit_st)
        def check(raw, offset, limit):
            want_status, want_rows = self.model(
                self.INSTANCES, raw, offset, limit
            )
            resp = retrieve.list_attributes(
                entity="user", key="u1", wildcard_prefix=raw,
                offset=offset, limit=limit,
            )
            assert resp["status"] == want_status, (raw, offset, limit)
            if want_status == 200:
                got = [v["attribute"] for v in resp["value"]]
                assert got == want_rows, (raw, offset, limit)

        check()
