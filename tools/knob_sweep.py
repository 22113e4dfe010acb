"""Scaled-knob sf1 pricing runs (VERDICT r09 'Next round' #3): measure
the LSH-family heavyweights at sf1 with their candidate-volume knob
scaled per the documented occupancy law (the ``negative_sampling``
buckets=160 treatment), and record the ratios as first-class rows in
BENCH_SF1.json under ``<query>@<knob>`` keys.

The law being priced: bucket occupancy is n/2^planes, so a 10× corpus
holds per-bucket candidate volume constant at planes += log2(10) ≈ +3
(recall per remaining pair is unchanged; total recall needs tables or
multi-probe to rise with planes — the structural fix is
``multiprobe_lsh_top_k``, which spends that budget query-side).

Usage: python tools/knob_sweep.py            (all entries)
       python tools/knob_sweep.py ann_knn_join@planes11 ...
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SF01 = "/root/testdata/sf0.1"
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "3"))


def _knn(planes: int, tables: int):
    def run(spark, sf):
        from proxima_platform_spark.functions.similarity import knn_join_lsh

        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        dim = emb.select(F.size("embedding").alias("d")).first().d
        return knn_join_lsh(
            emb, k=3, num_planes=planes, num_tables=tables, dim=dim
        )

    return run


def _hnm(planes: int, tables: int):
    def run(spark, sf):
        from proxima_platform_spark.functions.similarity import (
            hard_negative_mining,
        )

        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        labeled = emb.withColumn("label", (F.col("vec_id") % 4).cast("int"))
        return hard_negative_mining(
            labeled,
            label_col="label",
            k=3,
            num_planes=planes,
            num_tables=tables,
        )

    return run


# (name, small-knob runner for sf0.1, scaled-knob runner for sf1)
ENTRIES = {
    # baseline knob at sf0.1 (the declared query's planes=8/tables=2),
    # occupancy-preserving knob at 10x (planes 8 -> 11; +3 ~= log2(10))
    "ann_knn_join@planes11": (_knn(8, 2), _knn(11, 2)),
    "hard_negative_mining@planes11": (_hnm(8, 2), _hnm(11, 2)),
}


def main() -> None:
    from tools.make_sf_big import OUT, build

    names = sys.argv[1:] or list(ENTRIES)
    sf1 = OUT
    if not os.path.isdir(os.path.join(sf1, "embeddings.parquet")):
        print("building sf1 scale-up ...", file=sys.stderr)
        build()

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("proxima-platform-spark-knob-sweep")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def hygiene() -> None:
        spark.catalog.clearCache()
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    def median_sec(fn, sf_dir: str) -> float:
        def once() -> float:
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.time() - t0

        once()  # warmup
        runs = sorted(once() for _ in range(RUNS))
        return round(runs[len(runs) // 2], 3)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    artifact = os.path.join(repo, "BENCH_SF1.json")
    out: dict = {"factor": 10, "runs": RUNS, "queries": {}}
    if os.path.exists(artifact):
        with open(artifact) as fh:
            out = json.load(fh)
        out.setdefault("queries", {})
    for name in names:
        small_fn, big_fn = ENTRIES[name]
        t_small = median_sec(small_fn, SF01)
        hygiene()
        t_big = median_sec(big_fn, sf1)
        hygiene()
        ratio = round(t_big / t_small, 2) if t_small > 0 else None
        out["queries"][name] = {
            "sf0.1_sec": t_small,
            "sf1_sec": t_big,
            "ratio": ratio,
            "note": "sf1 side runs the occupancy-scaled knob (see tools/knob_sweep.py)",
        }
        print(f"{name}: {t_small}s -> {t_big}s  ({ratio}x)", file=sys.stderr)

    with open(artifact, "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
