"""Per-query bench-protocol re-measure: EXACTLY bench.py's session confs
and timing methodology (1 untimed warmup, median of 5 noop-sink runs,
banded-cache clear + cache/GC hygiene before every timed run), for a
subset of queries. Used for cold A/B of individual optimizations on an
idle box.

Usage: python tools/ab_bench.py query [query ...]
Prints one JSON line {"queries": {name: median_sec}, "runs": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main(names: list[str]) -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("proxima-platform-spark-ab")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = dict(entrymod.queries())

    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in ("events", "lineitem", "documents"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    spark.range(1_000_000).groupBy(F.pmod("id", F.lit(7))).count()
    import pandas as pd

    spark.range(100).groupBy(F.pmod("id", F.lit(4)).alias("g")).applyInPandas(
        lambda pdf: pd.DataFrame({"n": [len(pdf)]}), "n long"
    ).count()

    def run_once(name: str) -> float:
        from proxima_platform_spark.functions.dedup import clear_banded_cache

        clear_banded_cache()
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def between_queries() -> None:
        import gc

        spark.catalog.clearCache()
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    timings: dict[str, float] = {}
    allruns: dict[str, list[float]] = {}
    for name in names:
        run_once(name)
        runs = sorted(run_once(name) for _ in range(5))
        allruns[name] = [round(r, 3) for r in runs]
        timings[name] = round(runs[2], 3)
        between_queries()

    spark.stop()
    print(json.dumps({"queries": timings, "runs": allruns}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
