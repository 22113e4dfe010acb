"""sf1 scale-validation sweep (VERDICT r07 'Next round' #4): run the
heaviest clean-box queries at sf0.1 AND at the 10× scale-up built by
``tools/make_sf_big.py``, on the same session/box, and record
sec-per-query ratios in BENCH_SF1.json.

The scale-up is linear by construction (disjoint-id replicas with
content divergence — see make_sf_big.py), so the expected ratio is
~10× (≤ ~12 allowing constant factors); anything materially above
that is a superlinear term no plan assert can see — diagnose before
trusting the 100 TB argument.

Usage: python tools/scale_sweep.py [query ...]   (default: HEAVY list)
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

HEAVY = [
    "triangle_counts",
    "multimodal_phash_dup",
    "semantic_dedup",
    "dedup_groups",
    "similarity_join_exact",
    "negative_sampling",
    "ann_knn_join",
    "dsir_resample",
    "kmeans_cluster",
    "dedup_minhash",
    # r09 additions (VERDICT r08 #5): the r08/r09 heavyweights
    "ann_ivfpq_topk",
    "dedup_substrings_maximal",
    "label_propagation",
    "dedup_winnow",
    # late-r09 heavyweights
    "kneser_ney_score",
    "perplexity_band_prep",
    "hard_negative_mining",
    "winnow_decontaminate",
    "exact_quantile_bisect",
    # r13 addition: the tokenizer tier's heavy member (greedy vocab-frame
    # join loop over the distinct-word frame)
    "wordpiece_fertility",
]

SF01 = "/root/testdata/sf0.1"
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "3"))


def main() -> None:
    from tools.make_sf_big import OUT, build

    names = sys.argv[1:] or HEAVY
    sf1 = OUT
    if not os.path.isdir(os.path.join(sf1, "lineitem.parquet")):
        print("building sf1 scale-up ...", file=sys.stderr)
        build()

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("proxima-platform-spark-scale-sweep")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    def hygiene() -> None:
        spark.catalog.clearCache()
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    def median_sec(name: str, sf_dir: str) -> float:
        def once() -> float:
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.time() - t0

        once()  # warmup
        runs = sorted(once() for _ in range(RUNS))
        return round(runs[len(runs) // 2], 3)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    artifact = os.path.join(repo, "BENCH_SF1.json")
    out: dict = {"factor": 10, "runs": RUNS, "queries": {}}
    if sys.argv[1:] and os.path.exists(artifact):
        # explicit-name run: MERGE into the existing artifact so a
        # late-round partial sweep doesn't discard the full-set ratios
        with open(artifact) as fh:
            out = json.load(fh)
        out.setdefault("queries", {})
    for name in names:
        t_small = median_sec(name, SF01)
        hygiene()
        t_big = median_sec(name, sf1)
        hygiene()
        ratio = round(t_big / t_small, 2) if t_small > 0 else None
        out["queries"][name] = {
            "sf0.1_sec": t_small,
            "sf1_sec": t_big,
            "ratio": ratio,
        }
        flag = "  <-- SUPERLINEAR" if ratio and ratio > 12 else ""
        print(f"{name}: {t_small}s -> {t_big}s  ({ratio}x){flag}",
              file=sys.stderr)

    with open(artifact, "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
