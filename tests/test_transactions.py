"""Transaction-manager semantics (ref
direct/transaction-manager/.../TransactionLogObserver.java:81-694 conflict
detection, core/.../transaction/State.java states,
docs/.../book/transactions.md isolation scenarios)."""

import pytest

from pyspark.sql import functions as F

from proxima_platform_spark import snapshot
from proxima_platform_spark.transactions import (
    KeyAttribute,
    TransactionManager,
    TransactionState,
    Upsert,
)


def ka(key, attribute, entity="user"):
    return KeyAttribute(entity=entity, key=key, attribute=attribute)


def up(key, attribute, value=b"v", stamp_ms=1000, **kw):
    return Upsert(
        entity="user", key=key, attribute=attribute, value=value,
        stamp_ms=stamp_ms, **kw,
    )


class TestConflictDetection:
    def test_write_write_conflict_aborts_second(self, spark):
        mgr = TransactionManager(spark)
        t1 = mgr.begin([ka("k1", "balance")])
        t2 = mgr.begin([ka("k1", "balance")])
        assert mgr.commit(t1, [up("k1", "balance", b"10")]) is TransactionState.COMMITTED
        # t2 read balance before t1's commit → stale read set → abort
        assert mgr.commit(t2, [up("k1", "balance", b"20")]) is TransactionState.ABORTED

    def test_disjoint_sets_both_commit(self, spark):
        mgr = TransactionManager(spark)
        t1 = mgr.begin([ka("k1", "balance")])
        t2 = mgr.begin([ka("k2", "balance")])
        assert mgr.commit(t1, [up("k1", "balance")]) is TransactionState.COMMITTED
        assert mgr.commit(t2, [up("k2", "balance")]) is TransactionState.COMMITTED

    def test_wildcard_query_conflict(self, spark):
        """Reading device.* conflicts with any later write under the prefix
        (TransactionLogObserver.updatesToWildcard:179)."""
        mgr = TransactionManager(spark)
        t1 = mgr.begin([ka("k1", "device.*")])
        t2 = mgr.begin([])
        assert mgr.commit(t2, [up("k1", "device.a")]) is TransactionState.COMMITTED
        assert mgr.commit(t1, [up("k1", "summary")]) is TransactionState.ABORTED

    def test_wildcard_query_no_conflict_other_key(self, spark):
        mgr = TransactionManager(spark)
        t1 = mgr.begin([ka("k1", "device.*")])
        t2 = mgr.begin([])
        assert mgr.commit(t2, [up("k2", "device.a")]) is TransactionState.COMMITTED
        assert mgr.commit(t1, [up("k1", "summary")]) is TransactionState.COMMITTED

    def test_wildcard_write_conflicts_exact_read(self, spark):
        """A wildcard *write* (delete_wildcard on device.*) conflicts with a
        concurrent exact read of device.x under the prefix — the other
        direction of updatesToWildcard (TransactionLogObserver.java:179)."""
        mgr = TransactionManager(spark)
        t1 = mgr.begin([ka("k1", "device.x")])
        t2 = mgr.begin([])
        assert (
            mgr.commit(t2, [up("k1", "device.*", value=None, delete_wildcard=True)])
            is TransactionState.COMMITTED
        )
        assert mgr.commit(t1, [up("k1", "summary")]) is TransactionState.ABORTED

    def test_wildcard_write_other_prefix_no_conflict(self, spark):
        mgr = TransactionManager(spark)
        t1 = mgr.begin([ka("k1", "gps.x")])
        t2 = mgr.begin([])
        assert (
            mgr.commit(t2, [up("k1", "device.*", value=None, delete_wildcard=True)])
            is TransactionState.COMMITTED
        )
        assert mgr.commit(t1, [up("k1", "summary")]) is TransactionState.COMMITTED

    def test_duplicate_commit(self, spark):
        mgr = TransactionManager(spark)
        t1 = mgr.begin([ka("k1", "balance")])
        assert mgr.commit(t1, [up("k1", "balance")]) is TransactionState.COMMITTED
        assert mgr.commit(t1, [up("k1", "balance")]) is TransactionState.DUPLICATE

    def test_update_extends_read_set(self, spark):
        mgr = TransactionManager(spark)
        t1 = mgr.begin([ka("k1", "a")])
        t1.update([ka("k1", "b")])
        t2 = mgr.begin([])
        assert mgr.commit(t2, [up("k1", "b")]) is TransactionState.COMMITTED
        assert mgr.commit(t1, [up("k1", "a")]) is TransactionState.ABORTED

    def test_retry_loop_commits(self, spark):
        mgr = TransactionManager(spark)
        stale = mgr.begin([ka("k1", "x")])
        mgr.commit(mgr.begin([]), [up("k1", "x")])
        assert mgr.commit(stale, [up("k1", "x")]) is TransactionState.ABORTED
        txn = mgr.run([ka("k1", "x")], lambda: [up("k1", "x", b"new")])
        assert txn.state is TransactionState.COMMITTED


class TestTransactionLog:
    def test_changelog_snapshot_seq_tiebreak(self, spark):
        """Equal stamps: the later-committed transaction wins via seq_id
        (SURVEY §2.10.3 upsert-overwrite-on-equal-stamp)."""
        mgr = TransactionManager(spark)
        mgr.commit(mgr.begin([]), [up("k1", "balance", b"first", stamp_ms=5000)])
        mgr.commit(mgr.begin([]), [up("k1", "balance", b"second", stamp_ms=5000)])
        snap = snapshot(mgr.changelog())
        rows = snap.select(F.decode("value", "UTF-8").alias("v")).collect()
        assert [r.v for r in rows] == ["second"]

    def test_delete_in_transaction(self, spark):
        mgr = TransactionManager(spark)
        mgr.commit(mgr.begin([]), [up("k1", "balance", b"x", stamp_ms=1000)])
        mgr.commit(
            mgr.begin([]),
            [up("k1", "balance", None, stamp_ms=2000, delete=True)],
        )
        assert snapshot(mgr.changelog()).count() == 0


class TestPersistentLedger:
    """File-backed ledger with optimistic concurrency — the durable form of
    the manager (reference TransactionLogObserver.java:81-694; commit-claim
    protocol as in a Delta/Iceberg transaction log)."""

    def mgr(self, spark, tmp_path, sub="ledger"):
        from proxima_platform_spark.transactions import PersistentTransactionManager

        return PersistentTransactionManager(spark, str(tmp_path / sub))

    def test_conflict_aborts_second_writer(self, spark, tmp_path):
        m1 = self.mgr(spark, tmp_path)
        m2 = self.mgr(spark, tmp_path)  # separate manager, same ledger
        t1 = m1.begin([ka("k1", "balance")])
        t2 = m2.begin([ka("k1", "balance")])
        assert m1.commit(t1, [up("k1", "balance", b"10")]) is TransactionState.COMMITTED
        assert m2.commit(t2, [up("k1", "balance", b"20")]) is TransactionState.ABORTED

    def test_wildcard_write_conflicts_exact_read(self, spark, tmp_path):
        m = self.mgr(spark, tmp_path)
        t1 = m.begin([ka("k1", "device.x")])
        t2 = m.begin([])
        assert (
            m.commit(t2, [up("k1", "device.*", value=None, delete_wildcard=True)])
            is TransactionState.COMMITTED
        )
        assert m.commit(t1, [up("k1", "summary")]) is TransactionState.ABORTED

    def test_concurrent_threads_exactly_one_commits(self, spark, tmp_path):
        """True concurrent writers racing on the same read/write set: the
        atomic slot claim serializes them and exactly one commits."""
        import threading

        m1 = self.mgr(spark, tmp_path)
        m2 = self.mgr(spark, tmp_path)
        t1 = m1.begin([ka("k1", "balance")])
        t2 = m2.begin([ka("k1", "balance")])
        barrier = threading.Barrier(2)
        results = {}

        def worker(name, m, t, val):
            barrier.wait()
            results[name] = m.commit(t, [up("k1", "balance", val)])

        threads = [
            threading.Thread(target=worker, args=("a", m1, t1, b"10")),
            threading.Thread(target=worker, args=("b", m2, t2, b"20")),
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert sorted(r.value for r in results.values()) == ["aborted", "committed"]

    def test_disjoint_claim_race_both_commit(self, spark, tmp_path):
        """Writers with disjoint read sets both commit even when racing for
        the same ledger slot (loser retries with the next seq)."""
        import threading

        m1 = self.mgr(spark, tmp_path)
        m2 = self.mgr(spark, tmp_path)
        t1 = m1.begin([ka("k1", "a")])
        t2 = m2.begin([ka("k2", "b")])
        barrier = threading.Barrier(2)
        results = {}

        def worker(name, m, t, key, attr):
            barrier.wait()
            results[name] = m.commit(t, [up(key, attr)])

        threads = [
            threading.Thread(target=worker, args=("a", m1, t1, "k1", "a")),
            threading.Thread(target=worker, args=("b", m2, t2, "k2", "b")),
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert [r.value for r in results.values()] == ["committed", "committed"]
        assert {t1.commit_seq, t2.commit_seq} == {1, 2}

    def test_ledger_survives_reopen_and_changelog_compacts(self, spark, tmp_path):
        m = self.mgr(spark, tmp_path)
        m.commit(m.begin([]), [up("k1", "balance", b"first", stamp_ms=5000)])
        m.commit(m.begin([]), [up("k1", "balance", b"second", stamp_ms=5000)])
        reopened = self.mgr(spark, tmp_path)
        assert reopened.ledger_seq() == 2
        snap = snapshot(reopened.changelog())
        rows = snap.select(F.decode("value", "UTF-8").alias("v")).collect()
        assert [r.v for r in rows] == ["second"]  # seq_id breaks the stamp tie

    def test_retry_loop_commits_against_interference(self, spark, tmp_path):
        m = self.mgr(spark, tmp_path)
        stale = m.begin([ka("k1", "x")])
        m.commit(m.begin([]), [up("k1", "x")])
        assert m.commit(stale, [up("k1", "x")]) is TransactionState.ABORTED
        done = m.run([ka("k1", "x")], lambda: [up("k1", "x", b"final")])
        assert done.state is TransactionState.COMMITTED
