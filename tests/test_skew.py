"""Salting utilities: results must equal the unsalted plans exactly."""

from pyspark.sql import functions as F

from proxima_platform_spark.operators.skew import salted_join, salted_two_phase_agg


def skewed(spark):
    # key "hot" carries 90% of rows
    rows = [("hot", i, float(i % 7)) for i in range(900)]
    rows += [(f"k{i%10}", i, float(i % 5)) for i in range(100)]
    return spark.createDataFrame(rows, "k string, id long, v double")


class TestSaltedJoin:
    def test_equals_plain_inner_join(self, spark):
        big = skewed(spark)
        small = spark.createDataFrame(
            [("hot", "H"), ("k1", "A"), ("k2", "B")], "k string, label string"
        )
        plain = big.join(small, on="k").groupBy("k", "label").count()
        salted = salted_join(big, small, "k", buckets=8).groupBy("k", "label").count()
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    def test_left_join_keeps_unmatched(self, spark):
        big = skewed(spark)
        small = spark.createDataFrame([("hot", "H")], "k string, label string")
        out = salted_join(big, small, "k", buckets=4, how="left")
        assert out.count() == 1000
        assert out.where(F.col("label").isNull()).count() == 100

    def test_spreads_hot_key(self, spark):
        big = skewed(spark).repartition(8)
        small = spark.createDataFrame([("hot", "H")], "k string, label string")
        salted = big.withColumn(
            "__salt",
            F.pmod(F.spark_partition_id() + F.crc32(F.col("k").cast("string")), F.lit(8)),
        )
        n_salts = (
            salted.where(F.col("k") == "hot").select("__salt").distinct().count()
        )
        assert n_salts > 1  # hot key no longer collapses onto one reducer


class TestSaltedTwoPhaseAgg:
    def test_equals_plain_aggregation(self, spark):
        df = skewed(spark)
        plain = df.groupBy("k").agg(
            F.sum("v").alias("total"), F.count(F.lit(1)).alias("n")
        )
        salted = salted_two_phase_agg(
            df,
            "k",
            partial_aggs=[F.sum("v").alias("p_total"), F.count(F.lit(1)).alias("p_n")],
            merge_aggs=[F.sum("p_total").alias("total"), F.sum("p_n").alias("n")],
            buckets=8,
        )
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
