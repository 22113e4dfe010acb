"""As-of join semantics (extension; DuckDB ASOF JOIN is the oracle shape)."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from proxima_platform_spark.operators.asof import asof_join


def ts(ms):
    return datetime.fromtimestamp(ms / 1000, tz=timezone.utc)


def frames(spark):
    left = spark.createDataFrame(
        [("a", ts(1000), "L1"), ("a", ts(3000), "L2"), ("b", ts(500), "L3")],
        "k string, stamp timestamp, lv string",
    )
    right = spark.createDataFrame(
        [("a", ts(900), "R1"), ("a", ts(3000), "R2"), ("a", ts(5000), "R3")],
        "k string, stamp timestamp, rv string",
    )
    return left, right


class TestAsofJoin:
    def test_latest_at_or_before(self, spark):
        left, right = frames(spark)
        out = asof_join(left, right, key="k").orderBy("stamp").collect()
        got = [(r.lv, r.right_rv) for r in out]
        # L1@1000 → R1@900; L2@3000 → R2@3000 (tie visible); L3 (key b) → null
        assert got == [("L3", None), ("L1", "R1"), ("L2", "R2")]

    def test_strict_excludes_equal_stamp(self, spark):
        left, right = frames(spark)
        out = asof_join(left, right, key="k", strict=True).orderBy("stamp").collect()
        got = [(r.lv, r.right_rv) for r in out]
        assert got == [("L3", None), ("L1", "R1"), ("L2", "R1")]

    def test_tolerance_bounds_lookback(self, spark):
        left, right = frames(spark)
        out = asof_join(left, right, key="k", tolerance_ms=150).orderBy("stamp").collect()
        got = [(r.lv, r.right_rv) for r in out]
        # L1@1000: R1@900 is 100ms old → in; L2@3000: R2 exact → in
        assert got == [("L3", None), ("L1", "R1"), ("L2", "R2")]
        out2 = asof_join(left, right, key="k", tolerance_ms=50).orderBy("stamp").collect()
        assert [(r.lv, r.right_rv) for r in out2] == [
            ("L3", None), ("L1", None), ("L2", "R2")
        ]

    def test_left_columns_preserved(self, spark):
        left, right = frames(spark)
        out = asof_join(left, right, key="k")
        assert set(out.columns) == {"k", "stamp", "lv", "right_rv"}
