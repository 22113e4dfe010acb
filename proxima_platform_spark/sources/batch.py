"""Batch reads: batch_updates / batch_snapshot / random-access queries.

Reference mapping:
  * batch_updates(from,to) — bounded scan of raw updates in a time range
    (beam/core/.../BeamDataOperator.java:281-318, BatchLogRead.java).
    Spark: parquet/delta scan + ``stamp BETWEEN`` — the predicate reaches the
    scan (partition pruning when the table is stamp-partitioned; check
    ``PushedFilters`` in explain).
  * batch_snapshot(from,to) — latest value per (key, attribute) ≤ T
    (BeamDataOperator.java:328-397 with the reduce fallback
    PCollectionTools.reduceAsSnapshot:42-66). Spark: pre-materialized
    snapshot table when the catalog has one, else changelog compaction.
  * random access get/scanWildcard/listEntities
    (direct/core/.../randomaccess/RandomAccessReader.java:172-340):
    point/prefix/keyset-paged queries on the snapshot.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from proxima_platform_spark.changelog import snapshot as _snapshot


def _time_range(
    df: DataFrame, start=None, end=None, stamp_col: str = "stamp"
) -> DataFrame:
    if start is not None:
        df = df.where(F.col(stamp_col) >= F.lit(start))
    if end is not None:
        df = df.where(F.col(stamp_col) < F.lit(end))
    return df


def batch_updates(
    changelog: DataFrame,
    *,
    start=None,
    end=None,
    attributes: Iterable[str] | None = None,
) -> DataFrame:
    """Bounded scan of raw updates in [start, end).

    The attribute filter mirrors BeamDataOperator.filterAttrs (applied after
    family fan-in, :236,317,393) — here Catalyst pushes it into the scan.
    """
    df = _time_range(changelog, start, end)
    if attributes is not None:
        df = df.where(F.col("attribute_base").isin(list(attributes)))
    return df


def batch_snapshot(
    changelog: DataFrame,
    *,
    start=None,
    end=None,
    attributes: Iterable[str] | None = None,
) -> DataFrame:
    """Table view: latest live value per (entity, key, attribute) at ``end``.

    The reduce-fallback path (BeamDataOperator.java:394-397); with a
    pre-materialized snapshot family use DataOperator.batch_snapshot which
    short-circuits to the materialized table (:366-393).
    """
    df = batch_updates(changelog, start=start, attributes=attributes)
    return _snapshot(df, at=F.lit(end) if end is not None else None)


# -- random access (RandomAccessReader.java) --------------------------------


def get(snapshot_df: DataFrame, key: str, attribute: str) -> DataFrame:
    """Point lookup (RandomAccessReader.get:172)."""
    return snapshot_df.where(
        (F.col("key") == key) & (F.col("attribute") == attribute)
    )


def multi_get(snapshot_df: DataFrame, keys: Iterable[str], attribute: str) -> DataFrame:
    """multiFetch (RandomAccessReader.java:181-196)."""
    return snapshot_df.where(
        F.col("key").isin(list(keys)) & (F.col("attribute") == attribute)
    )


def scan_wildcard(
    snapshot_df: DataFrame,
    key: str,
    attribute_prefix: str,
    *,
    offset: str | None = None,
    limit: int | None = None,
) -> DataFrame:
    """List instances of a wildcard attribute of one key, keyset-paged
    (RandomAccessReader.java:245-312): ``WHERE key=? AND attribute LIKE
    'prefix.%' [AND attribute > offset] ORDER BY attribute [LIMIT n]``."""
    df = snapshot_df.where(
        (F.col("key") == key) & F.col("attribute").startswith(attribute_prefix)
    )
    if offset is not None:
        df = df.where(F.col("attribute") > offset)
    df = df.orderBy("attribute")
    return df.limit(limit) if limit else df


def list_entities(
    snapshot_df: DataFrame, *, offset: str | None = None, limit: int | None = None
) -> DataFrame:
    """Paged scan of all keys (RandomAccessReader.java:325-340)."""
    df = snapshot_df.select("key").distinct()
    if offset is not None:
        df = df.where(F.col("key") > offset)
    df = df.orderBy("key")
    return df.limit(limit) if limit else df


# -- time-partitioned bulk families -----------------------------------------


def _as_datetime(t):
    """Accept datetime (naive = UTC) or epoch **milliseconds**."""
    from datetime import datetime, timezone

    if isinstance(t, (int, float)):
        return datetime.fromtimestamp(t / 1000, tz=timezone.utc)
    if t.tzinfo is None:
        return t.replace(tzinfo=timezone.utc)
    return t


def _bucket_of(t, roll_minutes: int, tz_name: str) -> str:
    """stamp_bucket value ("yyyyMMdd-HHmm") of the roll window containing
    ``t``, rendered in the same timezone the writer's ``date_format`` used
    (the Spark session timezone) so bounds compare against the directory
    names the writer actually produced."""
    from datetime import datetime, timezone

    t = _as_datetime(t)
    epoch_min = int(t.timestamp()) // 60
    floored = (epoch_min // roll_minutes) * roll_minutes
    floored_dt = datetime.fromtimestamp(floored * 60, tz=timezone.utc)
    try:
        from zoneinfo import ZoneInfo

        floored_dt = floored_dt.astimezone(ZoneInfo(tz_name))
    except Exception:
        pass  # unknown tz spelling: fall back to UTC rendering
    return floored_dt.strftime("%Y%m%d-%H%M")


def read_time_partitioned(
    spark: SparkSession,
    path: str,
    *,
    start=None,
    end=None,
    roll_minutes: int = 10,
) -> DataFrame:
    """Read a bulk time-partitioned family (the layout streaming.sink
    ``write_bulk`` produces) with **directory-level pruning**.

    The analog of ``BatchLogReader.getPartitions(startStamp, endStamp)``
    (direct/core/.../batch/BatchLogReader.java:65) and the blob-store naming
    convention listing (direct/io-bulkfs/.../NamingConvention.java): time
    buckets outside [start, end) are pruned at the partition-directory level
    (``PartitionFilters`` in the scan — at 100 TB this skips whole
    directories, not rows), while the exact row bound still applies on
    ``stamp``. ``roll_minutes`` must match the writer's ``roll_interval``.

    ``start``/``end`` accept datetimes (naive = UTC) or epoch milliseconds.
    Bucket strings are rendered in the session timezone — the same one the
    writer's ``date_format`` used. Caveat: in a DST-observing session
    timezone the local-time bucket names are not strictly monotonic across
    a fall-back transition; run bulk families under a UTC session (the
    default everywhere in this engine) for exact pruning year-round.
    """
    df = spark.read.parquet(path)
    tz_name = spark.conf.get("spark.sql.session.timeZone")
    if start is not None:
        start = _as_datetime(start)
        df = df.where(
            (F.col("stamp_bucket") >= _bucket_of(start, roll_minutes, tz_name))
            & (F.col("stamp") >= F.lit(start))
        )
    if end is not None:
        # end is exclusive on stamp, but its enclosing bucket may still hold
        # earlier in-range rows — keep that bucket
        end = _as_datetime(end)
        df = df.where(
            (F.col("stamp_bucket") <= _bucket_of(end, roll_minutes, tz_name))
            & (F.col("stamp") < F.lit(end))
        )
    return df
