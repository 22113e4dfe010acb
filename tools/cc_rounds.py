"""Measure the alternating-star CC stage of dedup_cluster_keep_best
(VERDICT r11 'Next round' #6): rounds-to-convergence and the per-round
edge-set size (contraction trajectory) at a given SF dir.

The scale argument in SCALE.md is that large-star/small-star converges in
O(log n) ROUNDS (Kiveris et al. SoCC'14), so the 2.62x sf1/sf0.1 bench
ratio of dedup_cluster_keep_best is a constant-rounds effect, not a
superlinear term. This tool produces the evidence: the same MinHash pair
frame the query builds (n=3, num_hashes=8, bands=4), then the exact
connected_components loop with the per-round fingerprint count recorded
(the count the loop already computes for convergence — zero extra passes).

Usage:
    python tools/cc_rounds.py [sf_dir ...]
    (default: /root/testdata/sf0.1 and .scaledata/sf1 when present)

Prints one JSON line per sf_dir:
    {"sf_dir": ..., "n_docs": N, "rounds": R,
     "edges_per_round": [e0, e1, ...], "sec": S}
where e0 is the canonicalized input pair count and e_i the edge count
after alternating round i (the final entry repeats when the fingerprint
check needs one confirming round).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

DEFAULT_DIRS = [
    "/root/testdata/sf0.1",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".scaledata", "sf1"),
]


def measure(spark: SparkSession, sf_dir: str) -> dict:
    from proxima_platform_spark.functions.dedup import minhash_candidate_pairs
    from proxima_platform_spark.functions.graph import (
        _canonical,
        _large_star,
        _small_star,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_candidate_pairs(
        docs, "doc_id", "text", n=3, num_hashes=8, bands=4
    )
    t0 = time.monotonic()
    e = _canonical(
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    ).localCheckpoint(eager=False)

    def fp(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("s"),
        ).first()
        return (row["n"], row["s"])

    edges = [fp(e)[0]]
    prev = None
    rounds = 0
    for _ in range(25):
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        cur = fp(e)
        edges.append(cur[0])
        rounds += 1
        if cur == prev:
            break
        prev = cur
    return {
        "sf_dir": sf_dir,
        "n_docs": docs.count(),
        "rounds": rounds,
        "edges_per_round": edges,
        "sec": round(time.monotonic() - t0, 3),
    }


def main() -> None:
    dirs = sys.argv[1:] or [d for d in DEFAULT_DIRS if os.path.isdir(d)]
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("cc-rounds")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    for d in dirs:
        print(json.dumps(measure(spark, d)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
