"""Shuffle-volume probe (VERDICT r10 'Next round' #5): measure TOTAL
shuffle-write bytes per query at sf1 for the MinHash signature family —
the axis the wall-clock sf1 sweep cannot see at this absolute scale
(OPH's one-hash-pass and b-bit's 4-byte signatures are shuffle/storage
wins, not local[32] latency wins).

Per query: a FRESH SparkSession (so stage attribution is trivial), one
noop-write execution (bench.py's sink), then the Spark UI REST API's
completed-stage metrics summed over the app. Results append to
SCALE.md by hand.

Usage: python tools/shuffle_bytes.py [query ...]
       (default: dedup_minhash dedup_minhash_oph dedup_minhash_bbit)
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = ["dedup_minhash", "dedup_minhash_oph", "dedup_minhash_bbit"]
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def measure(name: str, sf_dir: str) -> dict:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4050")
        .config("spark.port.maxRetries", "64")
        .config("spark.driver.memory", os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    try:
        import __spark_entry__ as e

        e.queries()[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        base = spark.sparkContext.uiWebUrl
        apps = json.load(
            urllib.request.urlopen(f"{base}/api/v1/applications")
        )
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/stages"
                "?status=complete"
            )
        )
        return {
            "query": name,
            "n_stages": len(stages),
            "shuffle_write_bytes": sum(
                s.get("shuffleWriteBytes", 0) for s in stages
            ),
            "shuffle_read_bytes": sum(
                s.get("shuffleReadBytes", 0) for s in stages
            ),
            "input_bytes": sum(s.get("inputBytes", 0) for s in stages),
        }
    finally:
        spark.stop()


def main() -> None:
    from tools.make_sf_big import OUT, build

    build()  # no-op if the sf1 replica already exists
    names = sys.argv[1:] or DEFAULT
    for name in names:
        r = measure(name, OUT)
        r["sf_dir"] = OUT
        print(json.dumps(r))


if __name__ == "__main__":
    main()
