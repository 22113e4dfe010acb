"""Proxy-attribute semantics (ref AttributeProxyDescriptor.java,
ElementWiseProxyTransform.java:23-70 — rename on read, inverse on write)."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from proxima_platform_spark import to_changelog
from proxima_platform_spark.catalog.proxy import AttributeProxyDescriptor


def ts(ms):
    return datetime.fromtimestamp(ms / 1000, tz=timezone.utc)


def clog(spark, rows):
    """rows: (key, attribute, stamp_ms); attribute_base derived by
    to_changelog (wildcard instances → prefix.*)"""
    df = spark.createDataFrame(
        [(k, a, ts(s)) for k, a, s in rows],
        "key string, attr string, stamp timestamp",
    )
    return to_changelog(df, entity="e", key="key", attribute="attr", stamp="stamp")


class TestProxyRead:
    def test_wildcard_rename_keeps_suffix(self, spark):
        c = clog(spark, [("k1", "device.a", 1000), ("k1", "other", 2000)])
        proxy = AttributeProxyDescriptor(name="dev.*", target="device.*")
        out = proxy.apply_read(c).select("attribute", "attribute_base").collect()
        assert [(r.attribute, r.attribute_base) for r in out] == [("dev.a", "dev.*")]

    def test_scalar_rename(self, spark):
        c = clog(spark, [("k1", "status", 1000)])
        proxy = AttributeProxyDescriptor(name="state", target="status")
        out = proxy.apply_read(c).select("attribute").collect()
        assert out[0].attribute == "state"

    def test_write_inverse(self, spark):
        c = clog(spark, [("k1", "dev.a", 1000)])
        proxy = AttributeProxyDescriptor(name="dev.*", target="device.*")
        out = proxy.apply_write(c).select("attribute", "attribute_base").collect()
        assert [(r.attribute, r.attribute_base) for r in out] == [
            ("device.a", "device.*")
        ]

    def test_read_value_transform(self, spark):
        c = clog(spark, [("k1", "status", 1000)])
        proxy = AttributeProxyDescriptor(
            name="state",
            target="status",
            read_value=lambda v: F.encode(F.lit("mapped"), "UTF-8"),
        )
        out = proxy.apply_read(c).select(F.decode("value", "UTF-8").alias("v")).collect()
        assert out[0].v == "mapped"


class TestImpulse:
    def test_impulse_single_element(self, spark):
        from proxima_platform_spark.operators import Stream

        rows = Stream.impulse(spark, stamp_ms=5000).df.collect()
        assert len(rows) == 1 and rows[0].tick == 0

    def test_periodic_impulse_spacing(self, spark):
        from proxima_platform_spark.operators import Stream

        s = Stream.periodic_impulse(spark, count=4, interval_ms=1000, start_ms=0)
        stamps = sorted(r.stamp for r in s.df.collect())
        deltas = {
            (b - a).total_seconds() for a, b in zip(stamps, stamps[1:])
        }
        assert len(stamps) == 4 and deltas == {1.0}


class TestEmbeddingNearDup:
    def test_exact_pairs_above_threshold(self, spark):
        from proxima_platform_spark.functions.dedup import embedding_near_dup_pairs

        df = spark.createDataFrame(
            [
                (1, [1.0, 0.0]),
                (2, [1.0, 0.01]),   # ~parallel to 1
                (3, [0.0, 1.0]),    # orthogonal
            ],
            "vec_id int, embedding array<float>",
        )
        got = {
            (r.id_a, r.id_b)
            for r in embedding_near_dup_pairs(df, threshold=0.9).collect()
        }
        assert got == {(1, 2)}

    def test_lsh_bucketed_subset_of_exact(self, spark):
        from proxima_platform_spark.functions.dedup import embedding_near_dup_pairs

        df = spark.createDataFrame(
            [(i, [float(i % 7), float((i * 3) % 5), 1.0]) for i in range(20)],
            "vec_id int, embedding array<float>",
        )
        exact = {
            (r.id_a, r.id_b)
            for r in embedding_near_dup_pairs(df, threshold=0.99).collect()
        }
        approx = {
            (r.id_a, r.id_b)
            for r in embedding_near_dup_pairs(
                df, threshold=0.99, num_planes=4
            ).collect()
        }
        assert approx <= exact
