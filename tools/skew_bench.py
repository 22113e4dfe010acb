"""Measured skew experiment: what the salting operators actually buy, and
where AQE already does the job (SCALE.md row 'skew salting, MEASURED').

The skew.py docstring layers the three standard answers (map-side partials,
AQE skew-join, explicit salting) — this tool turns that from an argument
into numbers, the way layout_skip_sweep did for the layout keys.

Workload: sf1 lineitem (6M rows, `tools/make_sf_big.py` output) with a
DERIVED hot key — ``hk = l_orderkey`` except rows with even ``l_orderkey``
(a deterministic ~50% of the table, real rows, nothing synthesized)
collapse onto key 0. One key owning half the input is the canonical
straggler: unsalted, one task carries 50% of the stage at ANY cluster
size.

Five measurements, median of 3 warm runs each:

  A.  straggler SHAPE (deterministic, no timing): per-partition row counts
      after Exchange(hk) vs Exchange(hk, salt) — max-partition share is
      the fraction of the stage one task must carry. This is the
      scale-invariant quantity: on a real cluster a 0.52-share task IS
      the stage wall-clock.
  B.  non-algebraic aggregation (sort_array(collect_list)): naive groupBy
      vs salted_two_phase_agg.
  B2. same, with a heavy string payload (md5) — more per-row sort work.
  B3. bounded partial (per-key top-100): the decomposition salting is
      textbook-FOR — phase-2 merges buckets·100 elements, not the data.
  C.  SMJ join to a per-key dim (broadcast disabled to model a
      beyond-threshold dim): plain with AQE skew-join ON, plain OFF, and
      salted_join OFF. AQE thresholds lowered (16 MB) so the at-scale
      trigger fires at sf1 volumes; the 256 MB defaults are sized for
      real clusters and would never fire locally.

MEASURED FINDING (this box, local[32], recorded in SCALE.md): salting
LOSES wall-clock in every aggregation variant (0.5–0.8×) and the join
(AQE's runtime split wins outright) — on a shared-memory-bus local box
the extra full shuffle a salted phase-1 pays always exceeds what the
~1–2s hot-key sort costs, even at a 0.52 straggler share. The honest
conclusion for 100 TB: AQE skew-join is the default answer for join
skew; explicit salting pays only when the hot key's WORK dominates the
stage — per-key Python compute, super-linear per-group algorithms — or
on a real cluster where the straggler is hours, not seconds. The shape
number (0.516 -> 0.116 max share) is what transfers; the local
wall-clocks are what keeps this honest.

Usage: python tools/skew_bench.py  (idle box, never concurrent with bench;
needs .scaledata/sf1 — run tools/make_sf_big.py first if absent)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from proxima_platform_spark.operators.skew import (
    salted_join,
    salted_two_phase_agg,
)

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SF1 = os.environ.get(
    "SPARK_GRAFT_SCALE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".scaledata", "sf1"),
)
BUCKETS = 16
PARTS = 32


def hot_key_frame(spark):
    """sf1 lineitem with the derived hot key: even l_orderkey -> 0
    (~50% of rows), odd keeps its real key (~1.5M distinct cold keys)."""
    li = spark.read.parquet(os.path.join(SF1, "lineitem.parquet"))
    return li.select(
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(0))
        .otherwise(F.col("l_orderkey"))
        .alias("hk"),
        "l_quantity",
        "l_extendedprice",
    )


def median3(fn) -> float:
    runs = []
    for _ in range(3):
        t0 = time.time()
        fn()
        runs.append(time.time() - t0)
    return round(statistics.median(runs), 3)


def partition_shares(df, parts: int) -> tuple[float, float]:
    """(max, median) fraction of stage rows landing on one partition."""
    counts = (
        df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
    )
    total = sum(counts)
    return (round(max(counts) / total, 4),
            round(statistics.median(counts) / total, 4))


def main() -> int:
    if not os.path.isdir(SF1):
        raise SystemExit(f"{SF1} missing — run tools/make_sf_big.py first")
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(PARTS))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        # model a beyond-threshold dim: no broadcast escape hatch
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        # at-scale skew triggers, scaled to sf1 volumes (defaults are
        # 256 MB / cluster-sized and would never fire on this box)
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "16m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf1_dir": SF1, "buckets": BUCKETS, "partitions": PARTS, "cpus": int(CPUS)}

    df = hot_key_frame(spark).localCheckpoint()  # pin: measure the operator,
    n = df.count()                               # not the scan
    out["rows"] = n

    # --- A: straggler shape -------------------------------------------
    plain = df.repartition(PARTS, "hk")
    salted = df.repartition(
        PARTS, "hk",
        F.pmod(F.spark_partition_id() + F.crc32(F.col("hk").cast("string")),
               F.lit(BUCKETS)),
    )
    out["shape"] = {
        "unsalted_max_share": partition_shares(plain, PARTS)[0],
        "salted_max_share": partition_shares(salted, PARTS)[0],
    }

    # --- B: non-algebraic agg ------------------------------------------
    def naive_agg():
        (df.groupBy("hk")
         .agg(F.size(F.sort_array(F.collect_list("l_quantity"))).alias("n_q"))
         .write.format("noop").mode("overwrite").save())

    def salted_agg():
        (salted_two_phase_agg(
            df, "hk",
            partial_aggs=[
                F.sort_array(F.collect_list("l_quantity")).alias("part")],
            merge_aggs=[F.size(F.flatten(F.collect_list("part"))).alias("n_q")],
            buckets=BUCKETS,
        ).write.format("noop").mode("overwrite").save())

    naive_agg(); salted_agg()  # warm both paths before timing
    out["agg"] = {"naive_sec": median3(naive_agg),
                  "salted_sec": median3(salted_agg)}
    out["agg"]["speedup"] = round(
        out["agg"]["naive_sec"] / out["agg"]["salted_sec"], 2)

    # --- B2: same shape, HEAVY per-row payload -------------------------
    # 32-char md5 strings instead of decimals: more per-row sort work on
    # the hot key's single task. The regime knob: salting pays a constant
    # overhead (extra full shuffle + merge) and buys parallelism on the
    # hot key's work — the measured finding is that even this payload
    # stays below the local crossover.
    heavy = df.select(
        "hk", F.md5(F.concat_ws("|", "hk", "l_quantity", "l_extendedprice"))
        .alias("payload"),
    ).localCheckpoint()

    def naive_heavy():
        (heavy.groupBy("hk")
         .agg(F.size(F.sort_array(F.collect_list("payload"))).alias("n_p"))
         .write.format("noop").mode("overwrite").save())

    def salted_heavy():
        (salted_two_phase_agg(
            heavy, "hk",
            partial_aggs=[
                F.sort_array(F.collect_list("payload")).alias("part")],
            merge_aggs=[F.size(F.flatten(F.collect_list("part"))).alias("n_p")],
            buckets=BUCKETS,
        ).write.format("noop").mode("overwrite").save())

    naive_heavy(); salted_heavy()
    out["agg_heavy"] = {"naive_sec": median3(naive_heavy),
                        "salted_sec": median3(salted_heavy)}
    out["agg_heavy"]["speedup"] = round(
        out["agg_heavy"]["naive_sec"] / out["agg_heavy"]["salted_sec"], 2)

    # --- B3: BOUNDED partial (per-key top-100) -------------------------
    # The decomposition salting is actually FOR: phase 1 reduces each
    # (key, salt) slice to a bounded partial (top-100 here), phase 2
    # merges buckets*100 elements — the hot key's 3M-row sort spreads
    # over `buckets` tasks while the merge stays trivial. Unbounded list
    # buffers (A/B2) structurally cannot win: their merge re-concentrates
    # every element on one task regardless of salt.
    def naive_topk():
        (heavy.groupBy("hk")
         .agg(F.slice(F.sort_array(F.collect_list("payload")), 1, 100)
              .alias("top"))
         .write.format("noop").mode("overwrite").save())

    def salted_topk():
        (salted_two_phase_agg(
            heavy, "hk",
            partial_aggs=[
                F.slice(F.sort_array(F.collect_list("payload")), 1, 100)
                .alias("part")],
            merge_aggs=[
                F.slice(F.sort_array(F.flatten(F.collect_list("part"))),
                        1, 100).alias("top")],
            buckets=BUCKETS,
        ).write.format("noop").mode("overwrite").save())

    naive_topk(); salted_topk()
    out["agg_topk"] = {"naive_sec": median3(naive_topk),
                       "salted_sec": median3(salted_topk)}
    out["agg_topk"]["speedup"] = round(
        out["agg_topk"]["naive_sec"] / out["agg_topk"]["salted_sec"], 2)

    # --- C: SMJ join vs AQE skew split vs salted ------------------------
    dim = (df.select("hk").distinct()
           .withColumn("label", F.md5(F.col("hk").cast("string")))
           .localCheckpoint())

    def run_join(aqe: str, use_salt: bool):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe)

        def go():
            j = (salted_join(df, dim, "hk", buckets=BUCKETS) if use_salt
                 else df.join(dim, "hk"))
            (j.select("hk", "label", "l_extendedprice")
             .write.format("noop").mode("overwrite").save())

        go()  # warm
        return median3(go)

    out["join"] = {
        "plain_aqe_skew_on_sec": run_join("true", False),
        "plain_aqe_skew_off_sec": run_join("false", False),
        "salted_aqe_skew_off_sec": run_join("false", True),
    }

    spark.stop()
    print(json.dumps(out, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
