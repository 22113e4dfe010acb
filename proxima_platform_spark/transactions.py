"""Transactions: serializable-isolation writes over the canonical changelog.

Reference semantics (capability parity, not architecture —
docs/.../book/transactions.md:100-187):

  * client: ``writer.transactional().begin()`` → ``update(List<KeyAttribute>)``
    declaring the *read set* (exact attributes and wildcard-query
    fingerprints) → ``commitWrite(outputs)``; rejected commits retry
    (direct/core/.../transaction/TransactionalOnlineAttributeWriter.java:62,170-226,577-581).
  * manager: a single logical server consuming a ``_transaction`` request
    commit-log, assigning monotonic **sequential ids**, detecting conflicts
    by comparing the last committed seq-id per KeyWithAttribute — including
    wildcard-query conflicts (any instance written under a read prefix) —
    with transaction states OPEN/COMMITTED/ABORTED/DUPLICATE
    (direct/transaction-manager/.../TransactionLogObserver.java:81-694:
    ``lastUpdateSeqId`` at :175, ``updatesToWildcard`` at :179;
    core/.../transaction/State.java:46-50).

Spark form: the manager is **driver-side** state (exactly the reference's
"single logical manager" role — the driver already owns global coordination
in Spark, as it owns the streaming watermark); committed outputs append to a
changelog whose readers get serializable snapshots because compaction breaks
stamp ties by seq_id (SURVEY §2.10.3). At production scale the ledger and
log live in a transactional table store (e.g. Delta Lake optimistic
concurrency) instead of driver memory; the conflict rule is identical.
"""

from __future__ import annotations

import base64
import itertools
import json
import os
import uuid as _uuid
from dataclasses import dataclass, field
from enum import Enum
from typing import Iterable, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from proxima_platform_spark.changelog import to_changelog


class TransactionState(Enum):
    """core/.../transaction/State.java:46-50."""

    OPEN = "open"
    COMMITTED = "committed"
    ABORTED = "aborted"
    DUPLICATE = "duplicate"


@dataclass(frozen=True)
class KeyAttribute:
    """One element of a transaction's read set
    (core/.../transaction/KeyAttributes.java): either an exact
    (entity, key, attribute) or a wildcard *query* fingerprint — reading
    ``device.*`` of a key conflicts with any later write under that prefix.
    """

    entity: str
    key: str
    attribute: str  # exact instance, or "prefix.*" for a wildcard query

    @property
    def is_wildcard_query(self) -> bool:
        return self.attribute.endswith(".*")

    @property
    def prefix(self) -> str:
        return self.attribute[:-1]  # "device.*" -> "device."

    def covers(self, entity: str, key: str, attribute: str) -> bool:
        if (entity, key) != (self.entity, self.key):
            return False
        if self.is_wildcard_query:
            return attribute.startswith(self.prefix) or attribute == self.attribute
        return attribute == self.attribute


@dataclass
class Transaction:
    txn_id: str
    read_seq: int  # ledger position the reads observed
    read_set: list[KeyAttribute] = field(default_factory=list)
    state: TransactionState = TransactionState.OPEN
    commit_seq: Optional[int] = None

    def update(self, key_attributes: Iterable[KeyAttribute]) -> "Transaction":
        """Extend the declared read set (reference ``update(List<KeyAttribute>)``)."""
        if self.state is not TransactionState.OPEN:
            raise ValueError(f"transaction {self.txn_id} is {self.state.name}")
        self.read_set.extend(key_attributes)
        return self


@dataclass(frozen=True)
class Upsert:
    """One transactional output element (maps onto the canonical changelog)."""

    entity: str
    key: str
    attribute: str
    value: Optional[bytes] = None
    stamp_ms: int = 0
    delete: bool = False
    delete_wildcard: bool = False


def output_conflicts_read(ka: KeyAttribute, outputs: Iterable[Upsert]) -> bool:
    """Does one committed transaction's output set clash with read-set entry
    ``ka``? Covers all four directions (TransactionLogObserver.java:175-179):
    exact↔exact, wildcard-read↔exact-write, exact-read↔wildcard-write,
    wildcard↔wildcard."""
    for out in outputs:
        if ka.covers(out.entity, out.key, out.attribute):
            return True
        if out.attribute.endswith(".*") or out.delete_wildcard:
            prefix = (
                out.attribute[:-1] if out.attribute.endswith(".*") else out.attribute
            )
            if (out.entity, out.key) == (ka.entity, ka.key) and (
                ka.attribute.startswith(prefix) or ka.attribute == out.attribute
            ):
                return True
    return False


def _log_to_changelog(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    df = spark.createDataFrame(
        rows,
        "entity string, key string, attribute string, seq long, txn string, "
        "stamp_ms long, del boolean, del_wildcard boolean, val binary",
    )
    return to_changelog(
        df,
        entity=F.col("entity"),
        key="key",
        attribute="attribute",
        stamp=F.timestamp_millis(F.col("stamp_ms")),
        value="val",
        seq_id="seq",
        uuid="txn",
        delete="del",
        delete_wildcard="del_wildcard",
    )


class TransactionManager:
    """Single logical transaction manager (TransactionLogObserver semantics).

    Conflict rule: a commit is rejected iff any element of its read set was
    overwritten — exact attribute, or any instance under a wildcard-query
    prefix — by a transaction that committed after this one's ``read_seq``.
    This is precisely the reference's last-committed-seq-id comparison
    (TransactionLogObserver.java:175,179), which yields serializable
    isolation (transactions.md:187).
    """

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self._seq = itertools.count(1)
        self._ledger_seq = 0  # seq of the newest committed txn
        # last committed seq per exact (entity, key, attribute)
        self._last_committed: dict[tuple[str, str, str], int] = {}
        # last committed seq per wildcard write prefix (entity, key, "prefix.")
        # — the reference's updatesToWildcard bookkeeping
        # (TransactionLogObserver.java:179): a wildcard write (delete_wildcard
        # or an output on "prefix.*") conflicts with later exact reads of any
        # attribute under that prefix
        self._wildcard_committed: dict[tuple[str, str, str], int] = {}
        self._transactions: dict[str, Transaction] = {}
        self._log: list[tuple] = []  # committed changelog rows (driver-side log)

    # -- client API (TransactionalOnlineAttributeWriter) --------------------

    def begin(self, read_set: Iterable[KeyAttribute] = ()) -> Transaction:
        txn = Transaction(
            txn_id=str(_uuid.uuid4()),
            read_seq=self._ledger_seq,
            read_set=list(read_set),
        )
        self._transactions[txn.txn_id] = txn
        return txn

    def commit(self, txn: Transaction, outputs: Iterable[Upsert]) -> TransactionState:
        """Validate the read set and atomically append outputs.

        Returns COMMITTED or ABORTED; committing an already-terminated
        transaction returns DUPLICATE (idempotent response, State.java).
        """
        if txn.state is not TransactionState.OPEN:
            return TransactionState.DUPLICATE

        for ka in txn.read_set:
            if self._conflicts(ka, after_seq=txn.read_seq):
                txn.state = TransactionState.ABORTED
                return txn.state

        seq = next(self._seq)
        for out in outputs:
            self._log.append(
                (
                    out.entity,
                    out.key,
                    out.attribute,
                    seq,
                    txn.txn_id,
                    out.stamp_ms,
                    out.delete,
                    out.delete_wildcard,
                    out.value,
                )
            )
            self._last_committed[(out.entity, out.key, out.attribute)] = seq
            if out.attribute.endswith(".*") or out.delete_wildcard:
                prefix = (
                    out.attribute[:-1]
                    if out.attribute.endswith(".*")
                    else out.attribute
                )
                self._wildcard_committed[(out.entity, out.key, prefix)] = seq
        self._ledger_seq = seq
        txn.state = TransactionState.COMMITTED
        txn.commit_seq = seq
        return txn.state

    def run(self, read_set, build_outputs, *, max_retries: int = 10) -> Transaction:
        """Reference client retry loop (transactions.md:100-175): begin →
        build outputs → commit; on ABORTED re-begin (re-observing current
        state) and retry."""
        for _ in range(max_retries):
            txn = self.begin(read_set)
            if self.commit(txn, build_outputs()) is TransactionState.COMMITTED:
                return txn
        raise RuntimeError(f"transaction aborted {max_retries} times")

    # -- conflict detection (TransactionLogObserver.java:175-179) -----------

    def _conflicts(self, ka: KeyAttribute, *, after_seq: int) -> bool:
        if ka.is_wildcard_query:
            return any(
                seq > after_seq and ka.covers(e, k, a)
                for (e, k, a), seq in self._last_committed.items()
            )
        last = self._last_committed.get((ka.entity, ka.key, ka.attribute))
        if last is not None and last > after_seq:
            return True
        # an exact read also conflicts with a later *wildcard* write whose
        # prefix covers it (updatesToWildcard mirror)
        return any(
            seq > after_seq
            for (e, k, p), seq in self._wildcard_committed.items()
            if (e, k) == (ka.entity, ka.key) and ka.attribute.startswith(p)
        )

    # -- log access ---------------------------------------------------------

    def changelog(self) -> DataFrame:
        """The committed transaction log as a canonical changelog DataFrame
        (stamp ties across transactions resolve by seq_id — SURVEY §2.10.3)."""
        return _log_to_changelog(self.spark, self._log)


class PersistentTransactionManager:
    """Table-backed transaction manager with *optimistic concurrency*.

    The ledger is a directory of immutable commit files
    ``commits/{seq:020d}.json`` — the same protocol a Delta/Iceberg
    transaction log uses: a commit is claimed by atomically linking a fully-
    written file into the next sequence slot (``os.link`` fails if the slot
    is taken), so concurrent writers — other threads, other *processes*, or
    other Spark drivers sharing the storage — serialize without any lock
    server. Losing a claim re-validates the read set against the commits
    that won (TransactionLogObserver.java:81-694 replay semantics) and
    retries or aborts.

    The in-memory :class:`TransactionManager` is the unit-test double with
    identical semantics; this is the durable form the docs previously only
    described in prose (DELTAS.md #7).
    """

    def __init__(self, spark: SparkSession, path: str, *, max_claim_retries: int = 50) -> None:
        self.spark = spark
        self.path = path.rstrip("/")
        self.max_claim_retries = max_claim_retries
        os.makedirs(f"{self.path}/commits", exist_ok=True)

    # -- ledger access ------------------------------------------------------

    def _commit_seqs(self) -> list[int]:
        return sorted(
            int(f[: -len(".json")])
            for f in os.listdir(f"{self.path}/commits")
            if f.endswith(".json") and not f.startswith(".")
        )

    def ledger_seq(self) -> int:
        seqs = self._commit_seqs()
        return seqs[-1] if seqs else 0

    def _load_commit(self, seq: int) -> dict:
        with open(f"{self.path}/commits/{seq:020d}.json") as f:
            return json.load(f)

    @staticmethod
    def _decode_outputs(commit: dict) -> list[Upsert]:
        return [
            Upsert(
                entity=o["entity"],
                key=o["key"],
                attribute=o["attribute"],
                value=base64.b64decode(o["value"]) if o["value"] is not None else None,
                stamp_ms=o["stamp_ms"],
                delete=o["delete"],
                delete_wildcard=o["delete_wildcard"],
            )
            for o in commit["outputs"]
        ]

    # -- client API ---------------------------------------------------------

    def begin(self, read_set: Iterable[KeyAttribute] = ()) -> Transaction:
        return Transaction(
            txn_id=str(_uuid.uuid4()),
            read_seq=self.ledger_seq(),
            read_set=list(read_set),
        )

    def commit(self, txn: Transaction, outputs: Iterable[Upsert]) -> TransactionState:
        """Validate the read set against every commit newer than ``read_seq``
        and atomically claim the next ledger slot. Losing a claim race
        re-validates against the interleaved commits and retries."""
        if txn.state is not TransactionState.OPEN:
            return TransactionState.DUPLICATE
        outputs = list(outputs)

        validated_through = txn.read_seq
        for _ in range(self.max_claim_retries):
            for seq in self._commit_seqs():
                if seq <= validated_through:
                    continue
                committed = self._decode_outputs(self._load_commit(seq))
                if any(output_conflicts_read(ka, committed) for ka in txn.read_set):
                    txn.state = TransactionState.ABORTED
                    return txn.state
                validated_through = seq

            next_seq = validated_through + 1
            payload = {
                "seq": next_seq,
                "txn_id": txn.txn_id,
                "outputs": [
                    {
                        "entity": o.entity,
                        "key": o.key,
                        "attribute": o.attribute,
                        "value": (
                            base64.b64encode(o.value).decode()
                            if o.value is not None
                            else None
                        ),
                        "stamp_ms": o.stamp_ms,
                        "delete": o.delete,
                        "delete_wildcard": o.delete_wildcard,
                    }
                    for o in outputs
                ],
            }
            # write the full content aside, then atomically link it into the
            # slot — readers can never observe a half-written commit
            tmp = f"{self.path}/commits/.tmp-{txn.txn_id}"
            with open(tmp, "w") as f:
                json.dump(payload, f)
            try:
                os.link(tmp, f"{self.path}/commits/{next_seq:020d}.json")
            except FileExistsError:
                os.unlink(tmp)
                continue  # lost the race — re-validate against the winner(s)
            os.unlink(tmp)
            txn.state = TransactionState.COMMITTED
            txn.commit_seq = next_seq
            return txn.state
        raise RuntimeError(
            f"could not claim a ledger slot after {self.max_claim_retries} races"
        )

    def run(self, read_set, build_outputs, *, max_retries: int = 10) -> Transaction:
        """Reference client retry loop (transactions.md:100-175)."""
        for _ in range(max_retries):
            txn = self.begin(read_set)
            if self.commit(txn, build_outputs()) is TransactionState.COMMITTED:
                return txn
        raise RuntimeError(f"transaction aborted {max_retries} times")

    # -- log access ---------------------------------------------------------

    def changelog(self) -> DataFrame:
        rows = []
        for seq in self._commit_seqs():
            commit = self._load_commit(seq)
            for o in self._decode_outputs(commit):
                rows.append(
                    (
                        o.entity, o.key, o.attribute, seq, commit["txn_id"],
                        o.stamp_ms, o.delete, o.delete_wildcard, o.value,
                    )
                )
        return _log_to_changelog(self.spark, rows)
