"""Bucketed attribute families + writer partitioners (sources/bucketed.py).

The scale story: a family bucketed by ``key`` at write time makes the
platform's two dominant shuffles — changelog compaction and key joins —
exchange-free on every subsequent read (reference partitioning contract:
core/.../storage/commitlog/Partitioner.java:30-36)."""

import uuid as uuidlib

import pytest

from conftest import changelog_element, changelog_ts as ts

from pyspark.sql import functions as F

from proxima_platform_spark.changelog import CHANGELOG_SCHEMA, compact
from proxima_platform_spark.plans import count_exchanges, physical_plan
from proxima_platform_spark.sources.bucketed import (
    apply_partitioner,
    compact_bucketed,
    first_partition_partitioner,
    key_attribute_partitioner,
    key_partitioner,
    read_bucketed,
    snapshot_bucketed,
    write_bucketed,
)


def element(key, attribute, stamp_ms, value=None, **kw):
    return changelog_element("device", key, attribute, stamp_ms, value=value, **kw)


@pytest.fixture()
def changelog_df(spark):
    rows = [
        element(f"k{i % 7}", a, 1000 + i, value=f"v{i}", seq_id=i)
        for i in range(200)
        for a in ("status", "metric.cpu")
    ]
    rows.append(element("k1", "status", 5000, delete=True, seq_id=999))
    rows.append(element("k2", "metric.*", 5000, delete_wildcard=True, seq_id=1000))
    return spark.createDataFrame(rows, CHANGELOG_SCHEMA)


@pytest.fixture()
def bucketed_table(spark, changelog_df):
    name = "chl_" + uuidlib.uuid4().hex[:8]
    write_bucketed(changelog_df, name, num_buckets=4)
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


class TestBucketedCompaction:
    def test_compaction_has_no_exchange(self, spark, bucketed_table):
        df = compact_bucketed(spark, bucketed_table)
        assert count_exchanges(df) == 0, physical_plan(df)

    def test_compaction_matches_unbucketed(self, spark, changelog_df, bucketed_table):
        expected = {
            (r.key, r.attribute, r.stamp, bytes(r.value).decode() if r.value else None)
            for r in compact(changelog_df).collect()
        }
        got = {
            (r.key, r.attribute, r.stamp, bytes(r.value).decode() if r.value else None)
            for r in compact_bucketed(spark, bucketed_table).collect()
        }
        assert got == expected

    def test_snapshot_resolves_tombstones(self, spark, changelog_df, bucketed_table):
        snap = snapshot_bucketed(spark, bucketed_table)
        rows = {(r.key, r.attribute) for r in snap.collect()}
        # delete of k1.status wins by stamp; wildcard tombstone kills all
        # earlier k2.metric.* instances
        assert ("k1", "status") not in rows
        assert not any(k == "k2" and a.startswith("metric.") for k, a in rows)
        assert ("k1", "metric.cpu") in rows


class TestColocatedJoin:
    def test_same_bucket_join_has_no_exchange(self, spark, changelog_df):
        left_name = "chl_l_" + uuidlib.uuid4().hex[:8]
        right_name = "chl_r_" + uuidlib.uuid4().hex[:8]
        write_bucketed(changelog_df.where(F.col("attribute") == "status"), left_name, num_buckets=4)
        write_bucketed(
            changelog_df.where(F.col("attribute") != "status"), right_name, num_buckets=4
        )
        try:
            left = read_bucketed(spark, left_name).select("key", "stamp")
            right = read_bucketed(spark, right_name).select(
                F.col("key").alias("rkey"), "attribute"
            )
            joined = left.join(right, left["key"] == right["rkey"])
            assert count_exchanges(joined) == 0, physical_plan(joined)
            assert joined.count() > 0
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {left_name}")
            spark.sql(f"DROP TABLE IF EXISTS {right_name}")


class TestTimePartitionedRead:
    def test_partition_pruning_and_rows(self, spark, tmp_path):
        """Time-range reads of a bulk family prune whole stamp_bucket
        directories (BatchLogReader.getPartitions:65 analog) and still apply
        the exact row bound on stamp."""
        from proxima_platform_spark.sources.batch import read_time_partitioned

        out = str(tmp_path / "bulk")
        rows = [
            element("k1", "status", 1 * 60_000, "a"),        # bucket 00:00
            element("k2", "status", 12 * 60_000, "b"),       # bucket 00:10
            element("k3", "status", 14 * 60_000, "c"),       # bucket 00:10
            element("k4", "status", 25 * 60_000, "d"),       # bucket 00:20
        ]
        df = spark.createDataFrame(rows, CHANGELOG_SCHEMA).withColumn(
            "stamp_bucket",
            F.date_format(
                F.window("stamp", "10 minutes").getField("start"), "yyyyMMdd-HHmm"
            ),
        )
        df.write.partitionBy("stamp_bucket").parquet(out)

        got = read_time_partitioned(
            spark, out, start=ts(12 * 60_000), end=ts(25 * 60_000)
        )
        plan = physical_plan(got)
        pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
        assert pf and "stamp_bucket" in pf[0], plan
        assert {r.key for r in got.collect()} == {"k2", "k3"}

    def test_open_range_reads_all(self, spark, tmp_path):
        from proxima_platform_spark.sources.batch import read_time_partitioned

        out = str(tmp_path / "bulk2")
        rows = [element("k1", "status", 0, "a"), element("k2", "status", 60_000, "b")]
        df = spark.createDataFrame(rows, CHANGELOG_SCHEMA).withColumn(
            "stamp_bucket",
            F.date_format(
                F.window("stamp", "10 minutes").getField("start"), "yyyyMMdd-HHmm"
            ),
        )
        df.write.partitionBy("stamp_bucket").parquet(out)
        assert read_time_partitioned(spark, out).count() == 2


class TestWriterPartitioners:
    def _partition_map(self, df, expr, n):
        out = (
            apply_partitioner(df, expr, n)
            .withColumn("pid", F.spark_partition_id())
            .select("key", "attribute", "pid")
            .collect()
        )
        return out

    def test_key_partitioner_colocates_keys(self, spark, changelog_df):
        rows = self._partition_map(changelog_df, key_partitioner(), 4)
        per_key = {}
        for r in rows:
            per_key.setdefault(r.key, set()).add(r.pid)
        assert all(len(pids) == 1 for pids in per_key.values())

    def test_key_attribute_partitioner_colocates_pairs(self, spark, changelog_df):
        rows = self._partition_map(changelog_df, key_attribute_partitioner(), 4)
        per_pair = {}
        for r in rows:
            per_pair.setdefault((r.key, r.attribute), set()).add(r.pid)
        assert all(len(pids) == 1 for pids in per_pair.values())

    def test_first_partition_partitioner_single_partition(self, spark, changelog_df):
        rows = self._partition_map(changelog_df, first_partition_partitioner(), 4)
        assert len({r.pid for r in rows}) == 1
