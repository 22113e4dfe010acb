"""IngestService / RetrieveService semantics over the proto wire format.

Reference surface: ``rpc/src/main/proto/rpc.proto`` (IngestService :119-148,
RetrieveService :387-412) served by
``direct/ingest-server/src/main/java/cz/o2/proxima/direct/server/
IngestService.java`` and ``RetrieveService.java``. This module reproduces

- the message set, field numbers and types (registered with the pure-python
  wire codec in catalog/proto.py, so requests/responses round-trip through
  real protobuf bytes);
- the validation/status contract: 400 missing fields
  (IngestService.java:366-372), 404 unknown entity/attribute (:376-390),
  412 scheme-invalid value (:393-405), 500 handler error (:338),
  404 absent key on get (RetrieveService.java:288-293), 204 on reads in an
  already-terminated transaction (RetrieveService.java:309),
  400 for limited list requests inside a transaction
  (RetrieveService.java:129-130);
- the engine bindings: ingest → commit-log write (the console ``put`` path,
  env.py), get/list/scan → snapshot random access (sources/batch.py),
  begin/commit → TransactionManager (transactions.py) with the server-side
  per-transaction output buffer of the reference's TransactionContext
  (server/transaction/TransactionContext.java).

Scale note: get/list are point lookups against the compacted snapshot —
the reference serves them from random-access/cached-view replicas; here
each call is a keyed Spark filter (partition-prunable on key-partitioned
replicas). ``scan`` streams the snapshot through ``toLocalIterator`` in
bounded ScanResult chunks (RetrieveService.java:377-470 does the same with
gRPC flow control) — the server never materializes the table.

Only the HTTP/2 transport is absent (no grpcio in this environment);
``LocalChannel.call`` is the in-process stand-in: client dict → request
bytes → server decode → handler → response dict → response bytes → client
decode. Swapping it for a real grpc channel is transport plumbing only.
"""

from __future__ import annotations

import uuid as _uuid
from dataclasses import dataclass, field
from typing import Iterable, Iterator

from proxima_platform_spark.catalog import proto as _proto
from proxima_platform_spark.catalog.descriptors import (
    AttributeDescriptor,
    EntityDescriptor,
)
from proxima_platform_spark.catalog.schemes import resolve_scheme
from proxima_platform_spark.env import AttributeEnv
from proxima_platform_spark.transactions import (
    KeyAttribute,
    TransactionManager,
    TransactionState,
    Upsert,
)

# -- rpc.proto message registry (field numbers match rpc.proto exactly) -----

_P = "proxima.rpc."


def _register_messages() -> None:
    m = _proto.register_message
    m(_P + "Ingest", {"fields": {
        1: {"name": "uuid", "type": "string", "default": ""},
        2: {"name": "entity", "type": "string", "default": ""},
        3: {"name": "attribute", "type": "string", "default": ""},
        4: {"name": "key", "type": "string", "default": ""},
        5: {"name": "value", "type": "bytes", "default": b""},
        7: {"name": "stamp", "type": "uint64", "default": 0},
        6: {"name": "delete", "type": "bool", "default": False},
        8: {"name": "transactionId", "type": "string", "default": ""},
    }})
    m(_P + "Status", {"fields": {
        1: {"name": "uuid", "type": "string", "default": ""},
        2: {"name": "status", "type": "uint32", "default": 0},
        3: {"name": "statusMessage", "type": "string", "default": ""},
    }})
    m(_P + "IngestBulk", {"fields": {
        1: {"name": "ingest", "type": "message", "message": _P + "Ingest",
            "repeated": True},
    }})
    m(_P + "StatusBulk", {"fields": {
        1: {"name": "status", "type": "message", "message": _P + "Status",
            "repeated": True},
    }})
    m(_P + "TransactionCommitRequest", {"fields": {
        1: {"name": "transactionId", "type": "string", "default": ""},
    }})
    # enum Status { UNKNOWN=0 COMMITTED=1 REJECTED=2 FAILED=3 }
    m(_P + "TransactionCommitResponse", {"fields": {
        1: {"name": "status", "type": "enum", "default": 0},
    }})
    m(_P + "GetRequest", {"fields": {
        1: {"name": "entity", "type": "string", "default": ""},
        2: {"name": "key", "type": "string", "default": ""},
        3: {"name": "attribute", "type": "string", "default": ""},
        4: {"name": "transactionId", "type": "string", "default": ""},
    }})
    m(_P + "GetResponse", {"fields": {
        1: {"name": "status", "type": "uint32", "default": 0},
        2: {"name": "statusMessage", "type": "string", "default": ""},
        3: {"name": "value", "type": "bytes", "default": b""},
        4: {"name": "stamp", "type": "uint64", "default": 0},
    }})
    m(_P + "ListRequest", {"fields": {
        1: {"name": "entity", "type": "string", "default": ""},
        2: {"name": "key", "type": "string", "default": ""},
        3: {"name": "wildcardPrefix", "type": "string", "default": ""},
        4: {"name": "offset", "type": "string", "default": ""},
        5: {"name": "limit", "type": "uint32", "default": 0},
        6: {"name": "transactionId", "type": "string", "default": ""},
    }})
    m(_P + "ListResponse.AttrValue", {"fields": {
        1: {"name": "attribute", "type": "string", "default": ""},
        2: {"name": "value", "type": "bytes", "default": b""},
        3: {"name": "stamp", "type": "uint64", "default": 0},
    }})
    m(_P + "ListResponse", {"fields": {
        1: {"name": "status", "type": "uint32", "default": 0},
        2: {"name": "statusMessage", "type": "string", "default": ""},
        3: {"name": "value", "type": "message",
            "message": _P + "ListResponse.AttrValue", "repeated": True},
    }})
    m(_P + "MultifetchRequest", {"fields": {
        1: {"name": "getRequest", "type": "message",
            "message": _P + "GetRequest", "repeated": True},
        2: {"name": "listRequest", "type": "message",
            "message": _P + "ListRequest", "repeated": True},
        3: {"name": "transactionId", "type": "string", "default": ""},
    }})
    m(_P + "MultifetchResponse", {"fields": {
        1: {"name": "getResponse", "type": "message",
            "message": _P + "GetResponse", "repeated": True},
        2: {"name": "listResponse", "type": "message",
            "message": _P + "ListResponse", "repeated": True},
    }})
    m(_P + "KeyAttribute", {"fields": {
        1: {"name": "entity", "type": "string", "default": ""},
        2: {"name": "key", "type": "string", "default": ""},
        3: {"name": "attribute", "type": "string", "default": ""},
    }})
    m(_P + "BeginTransactionRequest", {"fields": {
        1: {"name": "attributesInvolved", "type": "message",
            "message": _P + "KeyAttribute", "repeated": True},
        2: {"name": "transactionId", "type": "string", "default": ""},
    }})
    m(_P + "BeginTransactionResponse", {"fields": {
        1: {"name": "transactionId", "type": "string", "default": ""},
    }})
    m(_P + "ScanRequest", {"fields": {
        1: {"name": "entity", "type": "string", "default": ""},
        2: {"name": "attribute", "type": "string", "repeated": True},
    }})
    m(_P + "KeyValue", {"fields": {
        1: {"name": "key", "type": "string", "default": ""},
        2: {"name": "attribute", "type": "string", "default": ""},
        3: {"name": "value", "type": "bytes", "default": b""},
        4: {"name": "stamp", "type": "uint64", "default": 0},
    }})
    # fields 1-4 are `reserved` in rpc.proto (:370-373)
    m(_P + "ScanResult", {"fields": {
        5: {"name": "value", "type": "message", "message": _P + "KeyValue",
            "repeated": True},
    }})


_register_messages()

# TransactionCommitResponse.Status enum values (rpc.proto:106-111)
TXN_UNKNOWN, TXN_COMMITTED, TXN_REJECTED, TXN_FAILED = 0, 1, 2, 3


class RpcError(Exception):
    """Transport-level error (gRPC onError path, e.g. scan validation —
    RetrieveService.java:459-469 maps these to INTERNAL/INVALID_ARGUMENT)."""

    def __init__(self, code: str, message: str) -> None:
        super().__init__(f"{code}: {message}")
        self.code = code
        self.message = message


# -- scheme validity (ValueSerializer.isValid analog) ------------------------


def _value_valid(scheme_uri: str, value: bytes) -> bool:
    """Python-side mirror of ``attr.getValueSerializer().isValid(bytes)``
    (IngestService.java:393-397): try to parse the payload under the
    attribute's scheme. Non-builtin (avro/proto/registry) schemes decode
    lazily inside Spark, so the façade accepts them here — the reference
    equivalent of a serializer whose isValid defers to read time."""
    import re as _re

    base = scheme_uri.split(":", 1)[0]
    try:
        if base in ("bytes",):
            return True
        text = value.decode("utf-8")
        if base in ("string", "json"):
            return True
        # validity must mirror what the Spark-side decode (cast from the
        # UTF-8 string form, schemes.py) will accept — python's int()/
        # float() are LOOSER (underscore separators, 'nan', 'infinity'),
        # and accepting here what decode later nulls would turn a 412 into
        # silent data loss
        if base in ("integer", "int", "long"):
            return _re.fullmatch(r"[+-]?\d+", text) is not None
        if base in ("float", "double"):
            return (
                _re.fullmatch(
                    r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", text
                )
                is not None
            )
        if base == "boolean":
            return text.lower() in ("true", "false")
    except UnicodeDecodeError:
        return False
    return True


@dataclass
class _ServerTransaction:
    """Server-side transaction context: buffered outputs + the engine
    transaction (reference: server/transaction/TransactionContext.java
    keeps outputs per transactionId until commit)."""

    txn: object
    outputs: list = field(default_factory=list)
    terminated: bool = False


class RpcServer:
    """Both rpc.proto services over one DataOperator.

    Handlers take/return plain dicts shaped like their proto messages;
    ``LocalChannel`` adds the wire-format boundary.
    """

    SCAN_CHUNK = 1000  # KeyValues per streamed ScanResult

    def __init__(self, op, txn_manager: TransactionManager | None = None) -> None:
        self._op = op
        self._repo = op.repo
        self._txns = txn_manager or TransactionManager(op.spark)
        self._open: dict[str, _ServerTransaction] = {}

    # -- shared lookups ------------------------------------------------------

    def _find_entity(self, name: str) -> EntityDescriptor | None:
        try:
            return self._repo.entity(name)
        except KeyError:
            return None

    @staticmethod
    def _find_attribute(
        entity: EntityDescriptor, attribute: str
    ) -> AttributeDescriptor | None:
        for a in entity.attributes:
            if a.matches(attribute):
                return a
        return None

    def _attr_env(self, entity: EntityDescriptor, attr: AttributeDescriptor):
        return AttributeEnv(self._op, entity, attr)

    # == IngestService =======================================================

    def _validate_ingest(self, request: dict):
        """Validation half of the ingest path (IngestService.java:364-407):
        returns ``(error_status, None)`` or ``(None, (entity, attr))``."""
        uuid = request.get("uuid") or ""
        key = request.get("key") or ""
        entity_name = request.get("entity") or ""
        attribute = request.get("attribute") or ""
        if not key or not entity_name or not attribute:
            return (
                _status(uuid, 400, "Missing required fields in input message"),
                None,
            )
        entity = self._find_entity(entity_name)
        if entity is None:
            return _status(uuid, 404, f"Entity {entity_name} not found"), None
        attr = self._find_attribute(entity, attribute)
        if attr is None:
            return (
                _status(
                    uuid, 404,
                    f"Attribute {attribute} of entity {entity_name} not found",
                ),
                None,
            )
        delete = bool(request.get("delete"))
        value = request.get("value") or b""
        # delete is always valid (IngestService.java:393)
        if not delete and not _value_valid(attr.scheme, value):
            return (
                _status(
                    uuid, 412, f"Invalid scheme for {entity_name}.{attr.name}"
                ),
                None,
            )
        return None, (entity, attr)

    def ingest(self, request: dict) -> dict:
        """Synchronous ingest (rpc.proto:142; IngestService.java:330-348,
        validation :364-407)."""
        uuid = request.get("uuid") or ""
        key = request.get("key") or ""
        entity_name = request.get("entity") or ""
        attribute = request.get("attribute") or ""
        err, parsed = self._validate_ingest(request)
        if err is not None:
            return err
        entity, attr = parsed
        delete = bool(request.get("delete"))
        value = request.get("value") or b""
        stamp = int(request.get("stamp") or 0) or _now_ms()
        txn_id = request.get("transactionId") or ""
        if txn_id:
            ctx = self._open.get(txn_id)
            if ctx is None or ctx.terminated:
                return _status(uuid, 412, f"Transaction {txn_id} is not open")
            wildcard_all = delete and attr.is_wildcard and attribute == attr.name
            ctx.outputs.append(
                Upsert(
                    entity=entity_name, key=key, attribute=attribute,
                    value=None if delete else bytes(value), stamp_ms=stamp,
                    delete=delete and not wildcard_all,
                    delete_wildcard=wildcard_all,
                )
            )
            return _status(uuid, 200, "")
        try:
            env = self._attr_env(entity, attr)
            if delete and attr.is_wildcard and attribute == attr.name:
                env.delete_all(key, stamp_ms=stamp)
            elif delete:
                env.delete(key, stamp_ms=stamp, attribute=attribute)
            else:
                env.put(key, bytes(value), stamp_ms=stamp, attribute=attribute)
        except Exception as err:  # writer failure → 500 (IngestService.java:338)
            return _status(uuid, 500, str(err))
        return _status(uuid, 200, "")

    def ingest_single(self, requests: Iterable[dict]) -> Iterator[dict]:
        """stream Ingest → stream Status (rpc.proto:136-139)."""
        for req in requests:
            yield self.ingest(req)

    def ingest_bulk(self, bulks: Iterable[dict]) -> Iterator[dict]:
        """stream IngestBulk → stream StatusBulk (rpc.proto:126-133). The
        server may regroup statuses arbitrarily (the reference flushes on a
        timer/size); we flush one StatusBulk per input bulk, statuses in
        request order.

        Transactional writes in a bulk are grouped per transactionId and
        validated ALL-OR-NOTHING (IngestService.java:231-255): one invalid
        write keeps its own error status, every VALID write of the group
        gets 412 'Invalid update was part of transaction <id>', and the
        transaction is rolled back (a later commit returns FAILED).
        Non-transactional writes process independently."""
        from proxima_platform_spark.transactions import TransactionState

        for bulk in bulks:
            reqs = list(bulk.get("ingest") or [])
            statuses: dict[int, dict] = {}
            groups: dict[str, list[int]] = {}
            for i, r in enumerate(reqs):
                groups.setdefault(r.get("transactionId") or "", []).append(i)
            for txn_id, idxs in groups.items():
                if not txn_id:
                    for i in idxs:
                        statuses[i] = self.ingest(reqs[i])
                    continue
                validated = [(i, self._validate_ingest(reqs[i])[0]) for i in idxs]
                if any(err is not None for _, err in validated):
                    for i, err in validated:
                        statuses[i] = err if err is not None else _status(
                            reqs[i].get("uuid") or "",
                            412,
                            "Invalid update was part of transaction "
                            + txn_id,
                        )
                    ctx = self._open.get(txn_id)
                    if ctx is not None and not ctx.terminated:
                        ctx.terminated = True
                        ctx.txn.state = TransactionState.ABORTED
                else:
                    for i, _ in validated:
                        statuses[i] = self.ingest(reqs[i])
            yield {"status": [statuses[i] for i in range(len(reqs))]}

    def commit(self, request: dict) -> dict:
        """TransactionCommitRequest → TransactionCommitResponse
        (IngestService.java:436-470): COMMITTED on success, REJECTED on
        serializable-isolation conflict, FAILED otherwise."""
        txn_id = request.get("transactionId") or ""
        ctx = self._open.get(txn_id)
        if ctx is None:
            return {"status": TXN_FAILED}
        if ctx.terminated:
            return {"status": TXN_FAILED}
        ctx.terminated = True
        try:
            state = self._txns.commit(ctx.txn, ctx.outputs)
        except Exception:
            return {"status": TXN_FAILED}
        if state is not TransactionState.COMMITTED:
            return {"status": TXN_REJECTED}
        # committed outputs flow to the target commit logs, exactly like the
        # reference's TransactionLogObserver replaying committed transactions
        # into the output families — this gives read-your-committed-writes
        # through RetrieveService.get. The replay is guarded: the ledger has
        # already recorded COMMITTED, so a storage failure mid-loop must NOT
        # escape the handler as a raw exception — the reference maps any
        # commit-path error to a well-formed FAILED response
        # (IngestService.java:436-470); partially-applied outputs are then a
        # replication catch-up concern, not a protocol violation.
        try:
            for out in ctx.outputs:
                entity = self._find_entity(out.entity)
                attr = self._find_attribute(entity, out.attribute)
                env = self._attr_env(entity, attr)
                if out.delete_wildcard:
                    env.delete_all(out.key, stamp_ms=out.stamp_ms)
                elif out.delete:
                    env.delete(out.key, stamp_ms=out.stamp_ms,
                               attribute=out.attribute)
                else:
                    env.put(out.key, out.value or b"", stamp_ms=out.stamp_ms,
                            attribute=out.attribute)
        except Exception:  # storage failure during replay
            # Partial-commit window: the ledger has ALREADY recorded
            # COMMITTED (source of truth) — a later duplicate commit() or a
            # transactional get will report already-committed/204 even though
            # this response says FAILED. The message makes that window
            # explicit so a client retrying on FAILED is not surprised by
            # the contradictory duplicate-commit answer; outputs missing
            # from storage are a replication catch-up concern.
            return {"status": TXN_FAILED,
                    "statusMessage": (
                        "commit replay to storage failed; transaction is "
                        "COMMITTED in the ledger (duplicate commit/get will "
                        "report already-committed) — outputs will surface "
                        "after replication catch-up")}
        return {"status": TXN_COMMITTED}

    # == RetrieveService =====================================================

    def begin(self, request: dict) -> dict:
        """BeginTransactionRequest → BeginTransactionResponse
        (RetrieveService.java:102-110). ``attributesInvolved`` seeds the
        read set; the set grows as transactional reads arrive."""
        read_set = [
            KeyAttribute(
                entity=ka.get("entity") or "",
                key=ka.get("key") or "",
                attribute=ka.get("attribute") or "",
            )
            for ka in request.get("attributesInvolved") or []
        ]
        txn = self._txns.begin(read_set)
        requested = request.get("transactionId") or ""
        txn_id = requested or txn.txn_id
        self._open[txn_id] = _ServerTransaction(txn=txn)
        return {"transactionId": txn_id}

    def _observe_read(self, txn_id: str, entity: str, key: str, attribute: str):
        """Reads inside a transaction extend its read set
        (RetrieveService.java:181-208 routes reads through the transaction).
        Returns an error status tuple or None."""
        ctx = self._open.get(txn_id)
        if ctx is None:
            return 400, f"Unknown transaction {txn_id}"
        if ctx.terminated:
            from proxima_platform_spark.transactions import TransactionState

            # reference maps TransactionRejectedException to 204 only for
            # Flags.DUPLICATE (an already-committed txn), 412 otherwise —
            # e.g. a transaction rolled back by a poisoned bulk
            # (RetrieveService.java:307-312)
            if ctx.txn.state is TransactionState.ABORTED:
                return 412, f"Transaction {txn_id} rejected"
            return 204, "Already committed transaction"
        ctx.txn.update([KeyAttribute(entity=entity, key=key, attribute=attribute)])
        return None

    def get(self, request: dict) -> dict:
        """GetRequest → GetResponse (RetrieveService.java:253-318)."""
        entity_name = request.get("entity") or ""
        key = request.get("key") or ""
        attribute = request.get("attribute") or ""
        if not entity_name or not key or not attribute:
            return {"status": 400, "statusMessage": "Missing some required fields"}
        entity = self._find_entity(entity_name)
        if entity is None:
            return {"status": 404,
                    "statusMessage": f"Entity {entity_name} not found"}
        attr = self._find_attribute(entity, attribute)
        if attr is None:
            # reference wording (RetrieveService.java:266-276)
            return {"status": 404,
                    "statusMessage":
                        f"Entity {entity_name} does not have attribute"
                        f" {attribute}"}
        txn_id = request.get("transactionId") or ""
        if txn_id:
            err = self._observe_read(txn_id, entity_name, key, attribute)
            if err is not None:
                return {"status": err[0], "statusMessage": err[1]}
        try:
            row = self._attr_env(entity, attr).get(key, attribute)
        except Exception as ex:  # pragma: no cover - storage failure
            return {"status": 500, "statusMessage": str(ex)}
        if row is None:
            return {"status": 404,
                    "statusMessage":
                        f"Key {key} and/or attribute {attribute} not found"}
        d = row.asDict()
        return {
            "status": 200,
            "value": bytes(d.get("value") or b""),
            "stamp": _ms(d.get("stamp")),
        }

    def list_attributes(self, request: dict) -> dict:
        """ListRequest → ListResponse (RetrieveService.java:113-228):
        keyset pagination by `offset` (exclusive), `limit <= 0` unlimited.

        Contract mirrored from the reference:
          * a trailing ``.*`` on ``wildcardPrefix`` is stripped first
            (RetrieveService.java:117-120), required-fields checked after;
          * a transactional list with a non-empty ``offset`` OR positive
            ``limit`` is rejected 400 (:126-130);
          * ``offset`` (defaulted to the raw request prefix when empty)
            must start with the raw ``wildcardPrefix`` — else 400
            (:186-196);
          * when the prefix is LONGER than the wildcard attribute's own
            prefix (e.g. ``device.1a`` against ``device.*``), returned
            rows are filtered to ``startswith(prefix)`` (:152-156). The
            reference's unlimited prefixed scan pages internally at 100
            rows per round but keeps looping until the first
            non-matching row, so its final result is ALL matching rows
            (:197-227) — matching rows are contiguous in attribute
            order, which is also why filter-then-limit below equals the
            reference's fill-to-limit loop.
        """
        entity_name = request.get("entity") or ""
        key = request.get("key") or ""
        raw = request.get("wildcardPrefix") or ""
        # strip '.*' like the reference; 'device.*' and 'device' are the
        # same request
        prefix = raw[: -2] if raw.endswith(".*") else raw
        if not entity_name or not key or not prefix:
            return {"status": 400, "statusMessage": "Missing some required fields"}
        limit = int(request.get("limit") or 0)
        offset = request.get("offset") or ""
        txn_id = request.get("transactionId") or ""
        if txn_id and (offset or limit > 0):
            return {"status": 400,
                    "statusMessage":
                        "Unsupported: transactions do not support limited"
                        " list requests, currently"}
        entity = self._find_entity(entity_name)
        if entity is None:
            return {"status": 404,
                    "statusMessage": f"Entity {entity_name} not found"}
        attr = self._find_attribute(entity, prefix + ".*")
        if attr is None or not attr.is_wildcard:
            return {"status": 404,
                    "statusMessage":
                        f"Entity {entity_name} does not have wildcard"
                        f" attribute {prefix}"}
        effective_offset = offset or raw
        if not effective_offset.startswith(raw):
            return {"status": 400,
                    "statusMessage":
                        "Offset must have prefix given by wildcardPrefix,"
                        f" got {effective_offset} and {raw}"}
        if txn_id:
            err = self._observe_read(txn_id, entity_name, key, attr.name)
            if err is not None:
                return {"status": err[0], "statusMessage": err[1]}
        # filter only when the request prefix is strictly longer than the
        # attribute's own prefix (reference predicate, :152-156)
        prefixed = prefix not in (attr.prefix, attr.prefix.rstrip("."))
        env = self._attr_env(entity, attr)
        if prefixed and limit > 0:
            # reference's paged fill-to-limit loop (RetrieveService.java:
            # 113-228, 100-row pages): driver memory stays O(page + limit)
            # instead of materializing the full unlimited listing before
            # filtering. Early exit is sound because the listing is sorted
            # by attribute and the offset already extends the prefix: any
            # row NOT matching the request prefix must first differ from it
            # at some position with a GREATER character (a lesser one would
            # sort it below the offset, which env.list excludes), so it
            # sorts after every possible match.
            page = max(limit, 100)
            rows: list = []
            cursor = effective_offset
            while len(rows) < limit:
                batch = env.list(key, limit=page, offset=cursor)
                if not batch:
                    break
                exhausted = False
                for r in batch:
                    if not r["attribute"].startswith(prefix):
                        exhausted = True
                        break
                    rows.append(r)
                    if len(rows) >= limit:
                        exhausted = True
                        break
                if exhausted or len(batch) < page:
                    break
                cursor = batch[-1]["attribute"]
        else:
            rows = env.list(
                key,
                limit=limit if limit > 0 else None,
                offset=effective_offset,
            )
            if prefixed:
                rows = [r for r in rows if r["attribute"].startswith(prefix)]
        return {
            "status": 200,
            "value": [
                {
                    "attribute": r["attribute"],
                    "value": bytes(r["value"] or b""),
                    "stamp": _ms(r["stamp"]),
                }
                for r in rows
            ],
        }

    def multifetch(self, request: dict) -> dict:
        """MultifetchRequest → MultifetchResponse (RetrieveService.java:
        323-372): responses in request order; the shared transactionId is
        applied to every sub-request (rpc.proto requires sub-request ids
        empty)."""
        txn_id = request.get("transactionId") or ""

        def with_txn(r: dict) -> dict:
            return {**r, "transactionId": txn_id} if txn_id else r

        return {
            "getResponse": [
                self.get(with_txn(r)) for r in request.get("getRequest") or []
            ],
            "listResponse": [
                self.list_attributes(with_txn(r))
                for r in request.get("listRequest") or []
            ],
        }

    def scan(self, request: dict) -> Iterator[dict]:
        """ScanRequest → stream ScanResult (RetrieveService.java:377-470).

        Streams the compacted snapshot of the requested attributes in
        SCAN_CHUNK-sized ScanResult messages via ``toLocalIterator`` —
        Spark computes partitions on demand; the driver holds one chunk at
        a time (the reference's flow-controlled onNext loop).

        Two deliberate relaxations vs the reference: (1) it rejects scans
        whose attributes span multiple batch-snapshot families
        (Preconditions at :404-408) — here the snapshot engine unions
        families natively, so such scans are served rather than refused;
        (2) chunk boundaries are row-counted rather than the reference's
        ~64 KiB serialized-size estimate (:428-434) — chunking is a
        transport detail with no observable semantics (clients
        concatenate)."""
        entity_name = request.get("entity") or ""
        attributes = list(request.get("attribute") or [])
        if not entity_name or not attributes:
            raise RpcError("INVALID_ARGUMENT", "Missing some required fields")
        entity = self._find_entity(entity_name)
        if entity is None:
            raise RpcError("INVALID_ARGUMENT", f"Entity {entity_name} not found")
        names = []
        for a in attributes:
            attr = self._find_attribute(entity, a)
            if attr is None:
                raise RpcError(
                    "INVALID_ARGUMENT",
                    f"Attribute {a} of entity {entity_name} not found",
                )
            names.append(attr.name)
        snap = self._op.batch_snapshot(entity_name, names)
        it = snap.select("key", "attribute", "value", "stamp").toLocalIterator()
        chunk: list[dict] = []
        for row in it:
            chunk.append({
                "key": row["key"],
                "attribute": row["attribute"],
                "value": bytes(row["value"] or b""),
                "stamp": _ms(row["stamp"]),
            })
            if len(chunk) >= self.SCAN_CHUNK:
                yield {"value": chunk}
                chunk = []
        if chunk:
            yield {"value": chunk}


def _status(uuid: str, code: int, message: str) -> dict:
    return {"uuid": uuid, "status": code, "statusMessage": message}


def _now_ms() -> int:
    import time

    return int(time.time() * 1000)


def _ms(stamp) -> int:
    """datetime → epoch ms (proto uint64 stamps are milliseconds)."""
    if stamp is None:
        return 0
    from datetime import timezone

    if stamp.tzinfo is None:
        stamp = stamp.replace(tzinfo=timezone.utc)
    return int(stamp.timestamp() * 1000)


# -- transport stand-in ------------------------------------------------------

#: (service, method) → (request message, response message, streaming kind)
_METHODS: dict[tuple[str, str], tuple[str, str, str]] = {
    ("IngestService", "ingest"): (_P + "Ingest", _P + "Status", "unary"),
    ("IngestService", "ingestSingle"): (_P + "Ingest", _P + "Status", "stream"),
    ("IngestService", "ingestBulk"): (
        _P + "IngestBulk", _P + "StatusBulk", "stream"),
    ("IngestService", "commit"): (
        _P + "TransactionCommitRequest", _P + "TransactionCommitResponse",
        "unary"),
    ("RetrieveService", "get"): (_P + "GetRequest", _P + "GetResponse", "unary"),
    ("RetrieveService", "listAttributes"): (
        _P + "ListRequest", _P + "ListResponse", "unary"),
    ("RetrieveService", "multifetch"): (
        _P + "MultifetchRequest", _P + "MultifetchResponse", "unary"),
    ("RetrieveService", "begin"): (
        _P + "BeginTransactionRequest", _P + "BeginTransactionResponse",
        "unary"),
    ("RetrieveService", "scan"): (
        _P + "ScanRequest", _P + "ScanResult", "server_stream"),
}

_HANDLERS = {
    ("IngestService", "ingest"): "ingest",
    ("IngestService", "ingestSingle"): "ingest_single",
    ("IngestService", "ingestBulk"): "ingest_bulk",
    ("IngestService", "commit"): "commit",
    ("RetrieveService", "get"): "get",
    ("RetrieveService", "listAttributes"): "list_attributes",
    ("RetrieveService", "multifetch"): "multifetch",
    ("RetrieveService", "begin"): "begin",
    ("RetrieveService", "scan"): "scan",
}


class LocalChannel:
    """In-process transport: every call serializes the request to protobuf
    wire bytes, dispatches, and deserializes the response bytes — the
    full gRPC data path minus HTTP/2 framing."""

    def __init__(self, server: RpcServer) -> None:
        self._server = server

    def unary(self, service: str, method: str, request: dict) -> dict:
        req_msg, resp_msg, kind = _METHODS[(service, method)]
        if kind != "unary":
            raise RpcError("UNIMPLEMENTED", f"{method} is not unary")
        handler = getattr(self._server, _HANDLERS[(service, method)])
        wire = _proto.encode(_proto.resolve_message(req_msg), request)
        resp = handler(_proto.decode(_proto.resolve_message(req_msg), wire))
        out = _proto.encode(_proto.resolve_message(resp_msg), resp)
        return _proto.decode(_proto.resolve_message(resp_msg), out)

    def stream(
        self, service: str, method: str, requests: Iterable[dict]
    ) -> Iterator[dict]:
        req_msg, resp_msg, kind = _METHODS[(service, method)]
        handler = getattr(self._server, _HANDLERS[(service, method)])
        req_desc = _proto.resolve_message(req_msg)
        resp_desc = _proto.resolve_message(resp_msg)
        if kind == "server_stream":
            wire = _proto.encode(req_desc, next(iter(requests)))
            responses = handler(_proto.decode(req_desc, wire))
        else:  # bidirectional stream
            decoded = (
                _proto.decode(req_desc, _proto.encode(req_desc, r))
                for r in requests
            )
            responses = handler(decoded)
        for resp in responses:
            yield _proto.decode(resp_desc, _proto.encode(resp_desc, resp))


class IngestClient:
    """Typed client of IngestService (the reference ships generated stubs;
    this is their hand-written python analog)."""

    def __init__(self, channel: LocalChannel) -> None:
        self._ch = channel

    def ingest(self, *, entity: str, key: str, attribute: str,
               value: bytes = b"", stamp: int = 0, delete: bool = False,
               transaction_id: str = "", uuid: str | None = None) -> dict:
        return self._ch.unary("IngestService", "ingest", {
            "uuid": uuid or str(_uuid.uuid4()),
            "entity": entity, "key": key, "attribute": attribute,
            "value": value, "stamp": stamp, "delete": delete,
            "transactionId": transaction_id,
        })

    def ingest_single(self, requests: Iterable[dict]) -> Iterator[dict]:
        return self._ch.stream("IngestService", "ingestSingle", requests)

    def ingest_bulk(self, bulks: Iterable[dict]) -> Iterator[dict]:
        return self._ch.stream("IngestService", "ingestBulk", bulks)

    def commit(self, transaction_id: str) -> int:
        resp = self._ch.unary("IngestService", "commit",
                              {"transactionId": transaction_id})
        return int(resp["status"])


class RetrieveClient:
    """Typed client of RetrieveService."""

    def __init__(self, channel: LocalChannel) -> None:
        self._ch = channel

    def get(self, *, entity: str, key: str, attribute: str,
            transaction_id: str = "") -> dict:
        return self._ch.unary("RetrieveService", "get", {
            "entity": entity, "key": key, "attribute": attribute,
            "transactionId": transaction_id,
        })

    def list_attributes(self, *, entity: str, key: str, wildcard_prefix: str,
                        offset: str = "", limit: int = 0,
                        transaction_id: str = "") -> dict:
        return self._ch.unary("RetrieveService", "listAttributes", {
            "entity": entity, "key": key, "wildcardPrefix": wildcard_prefix,
            "offset": offset, "limit": limit, "transactionId": transaction_id,
        })

    def multifetch(self, *, gets: Iterable[dict] = (),
                   lists: Iterable[dict] = (),
                   transaction_id: str = "") -> dict:
        return self._ch.unary("RetrieveService", "multifetch", {
            "getRequest": list(gets), "listRequest": list(lists),
            "transactionId": transaction_id,
        })

    def begin(self, attributes_involved: Iterable[dict] = (),
              transaction_id: str = "") -> str:
        resp = self._ch.unary("RetrieveService", "begin", {
            "attributesInvolved": list(attributes_involved),
            "transactionId": transaction_id,
        })
        return resp["transactionId"]

    def scan(self, *, entity: str, attributes: Iterable[str]) -> Iterator[dict]:
        return self._ch.stream("RetrieveService", "scan", [{
            "entity": entity, "attribute": list(attributes),
        }])
