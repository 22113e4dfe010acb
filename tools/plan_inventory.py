"""Plan-regression guard: snapshot the scale-relevant physical-plan shape of
EVERY declared query and diff it against the committed baseline.

The bench catches *time* regressions, but only for the 134-query headline
suite and only after the damage is done; this tool catches *plan* regressions
— an extra shuffle, a join that fell off broadcast into a nested loop, a
scalar Python UDF sneaking into a hot path, a hash aggregate degrading to
SortAggregate — for all 249 declared queries, mechanically, before any
benchmark runs. The per-query counters are exactly the quantities the
100 TB scale arguments in SCALE.md are written in terms of, so a diff here
is a diff in the scale story itself.

Counted on the pre-execution physical plan (AQE's initial plan — runtime
re-planning only ever *removes* exchanges, so the static count is the upper
bound the scale argument must defend):

  ex      Exchange hashpartitioning/rangepartitioning — real data shuffles
  ex1     Exchange SinglePartition — global-agg/limit funnels (tiny rows by
          design, tracked separately so a new one is visible but not fatal)
  bex     BroadcastExchange — broadcast builds (informational: count moves
          with the autoBroadcast threshold vs input stats)
  cart    CartesianProduct + BroadcastNestedLoopJoin — must never grow; the
          existing ones are the audited broadcast-bounded 1-row/k-row frames
  pyudf   BatchEvalPython — scalar Python UDFs; contract: 0 everywhere
  arrow   ArrowEvalPython / *MapInPandas / FlatMapGroupsInPandas* — the
          sanctioned vectorized Python path; growth needs a reason
  sortagg SortAggregate — hash-agg fallback (re-sorts its input); growth
          means a grouping key lost its hashable/fixed-width shape

Building a query is NOT free for the driver-coordinated ones (BPE/WordPiece
loops, EM training, k-means, CC) — they run real sf0.01 jobs while the
DataFrame is constructed, same as the oracle sweep's build step. Run this on
an otherwise idle box, never concurrently with bench.

Usage:
  python tools/plan_inventory.py            # regenerate PLAN_INVENTORY.json
  python tools/plan_inventory.py --check    # recompute and diff vs the
                                            # committed PLAN_INVENTORY.json;
                                            # exit 1 on any regression
  python tools/plan_inventory.py q1 q2 ...  # regenerate only these entries
                                            # (in-place update of the json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "PLAN_INVENTORY.json")

# (metric, fail-if-increases) — bex/ex1 are informational: broadcast counts
# move with input stats vs the threshold, SinglePartition funnels carry
# bounded rows by design. Everything else growing is a regression.
METRICS = [
    ("ex", True),
    ("ex1", False),
    ("bex", False),
    ("cart", True),
    ("pyudf", True),
    ("arrow", True),
    ("sortagg", True),
]


def plan_metrics(plan: str) -> dict[str, int]:
    return {
        "ex": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "ex1": plan.count("Exchange SinglePartition"),
        "bex": plan.count("BroadcastExchange"),
        "cart": plan.count("CartesianProduct")
        + plan.count("BroadcastNestedLoopJoin"),
        "pyudf": plan.count("BatchEvalPython"),
        # FlatMapGroupsInPandasWithState contains FlatMapGroupsInPandas as a
        # substring — both are Arrow paths, double-counting the WithState
        # node as one arrow site is the intended reading
        "arrow": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("FlatMapCoGroupsInPandas"),
        "sortagg": plan.count("SortAggregate"),
    }


def diff_inventories(
    baseline: dict[str, dict[str, int]], fresh: dict[str, dict[str, int]]
) -> tuple[list[str], list[str]]:
    """(regressions, informational) line lists. A query present on only one
    side is a regression by policy: the baseline is part of the declaration
    discipline and must be regenerated deliberately, never drift silently."""
    regressions: list[str] = []
    infos: list[str] = []
    for name in sorted(set(baseline) | set(fresh)):
        if name not in fresh:
            regressions.append(f"{name}: in baseline but no longer declared "
                               "(regenerate the baseline deliberately)")
            continue
        if name not in baseline:
            regressions.append(f"{name}: declared but not in baseline "
                               "(regenerate the baseline deliberately)")
            continue
        for metric, fatal in METRICS:
            b, n = baseline[name].get(metric, 0), fresh[name].get(metric, 0)
            if n == b:
                continue
            line = f"{name}: {metric} {b} -> {n}"
            if fatal and n > b:
                regressions.append(line)
            else:
                infos.append(line + ("  (improved — regenerate baseline)"
                                     if n < b else "  (informational)"))
    return regressions, infos


def build_inventory(only: list[str]) -> dict:
    from pyspark.sql import SparkSession

    from proxima_platform_spark.plans import physical_plan

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from proxima_platform_spark.functions.dedup import clear_banded_cache

    qs = entrymod.queries()
    names = only or list(qs)
    out: dict[str, dict[str, int]] = {}
    errors = 0
    for name in names:
        t0 = time.time()
        # Capture the cache-independent COLD plan: a banded frame left
        # persisted by an earlier build truncates this query's visible
        # plan at an InMemoryTableScan, making the exchange count a
        # function of build order / cache capacity instead of the query.
        clear_banded_cache()
        try:
            m = plan_metrics(physical_plan(qs[name](spark, SF_DIR)))
        except Exception as e:  # a query that cannot BUILD is a hard fail
            print(f"FAIL {name}: build error: {str(e)[:300]}")
            errors += 1
            continue
        out[name] = m
        flags = " ".join(f"{k}={v}" for k, v in m.items() if v)
        print(f"ok   {name}: {flags or 'no flagged nodes'} "
              f"[{time.time() - t0:.1f}s]")
    spark.stop()
    if errors:
        raise SystemExit(f"{errors} queries failed to build")
    return out


def main(argv: list[str]) -> int:
    check = "--check" in argv
    only = [a for a in argv if not a.startswith("-")]
    if check and only:
        raise SystemExit("--check always covers every declared query")

    fresh = build_inventory(only)

    if not check:
        base = {"sf_dir": SF_DIR, "queries": {}}
        if only and os.path.exists(OUT):
            with open(OUT) as f:
                base = json.load(f)
        base["queries"].update(fresh)
        base["queries"] = dict(sorted(base["queries"].items()))
        base["sf_dir"] = SF_DIR
        with open(OUT, "w") as f:
            json.dump(base, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"\nwrote {len(base['queries'])} entries -> {OUT}")
        return 0

    with open(OUT) as f:
        baseline = json.load(f)["queries"]
    regressions, infos = diff_inventories(baseline, fresh)
    for line in infos:
        print(f"info {line}")
    for line in regressions:
        print(f"REGRESSION {line}")
    print(f"\n{len(fresh)} queries checked: "
          f"{len(regressions)} regressions, {len(infos)} informational")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
