"""Sources & sinks: batch / commit-log / random-access readers over families.

Maps the reference's DataAccessor layer (direct/core/.../batch/BatchLogReader,
commitlog/CommitLogReader, randomaccess/RandomAccessReader) to Spark reads.
"""

from proxima_platform_spark.sources.batch import (
    batch_snapshot,
    batch_updates,
    get,
    list_entities,
    multi_get,
    scan_wildcard,
)
from proxima_platform_spark.sources.registry import DataOperator

__all__ = [
    "DataOperator",
    "batch_snapshot",
    "batch_updates",
    "get",
    "list_entities",
    "multi_get",
    "scan_wildcard",
]
