"""Unit tests for the plan-regression guard (tools/plan_inventory.py):
the metric extraction and the diff policy are pure string/dict logic, so
they are pinned here without a Spark session; the full 249-query sweep
runs per round via `tools/verify_all.sh plans` against the committed
PLAN_INVENTORY.json."""

import importlib.util
import os
import sys

_TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools", "plan_inventory.py",
)
_spec = importlib.util.spec_from_file_location("plan_inventory", _TOOL)
pi = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(pi)


FAKE_PLAN = """AdaptiveSparkPlan isFinalPlan=false
+- SortAggregate(key=[k], functions=[min(v)])
   +- Exchange hashpartitioning(k, 8), ENSURE_REQUIREMENTS
      +- BroadcastHashJoin [k], [k2], Inner, BuildRight
         :- FlatMapGroupsInPandasWithState stateFunc
         :  +- Exchange hashpartitioning(k, 8), ENSURE_REQUIREMENTS
         +- BroadcastExchange HashedRelationBroadcastMode
            +- BatchEvalPython [slow_udf(x)]
               +- Exchange rangepartitioning(x ASC, 8)
                  +- Exchange SinglePartition
                     +- CartesianProduct
"""


class TestPlanMetrics:
    def test_counts_every_flagged_node_kind(self):
        m = pi.plan_metrics(FAKE_PLAN)
        assert m == {
            "ex": 3,       # 2 hash + 1 range
            "ex1": 1,
            "bex": 1,
            "cart": 1,
            "pyudf": 1,
            # the WithState node intentionally counts as one arrow site via
            # its FlatMapGroupsInPandas substring
            "arrow": 1,
            "sortagg": 1,
        }

    def test_clean_plan_is_all_zero(self):
        m = pi.plan_metrics("*(2) HashAggregate\n+- *(1) ColumnarToRow\n"
                            "   +- FileScan parquet")
        assert all(v == 0 for v in m.values())


class TestDiffPolicy:
    BASE = {"q": {"ex": 2, "ex1": 0, "bex": 1, "cart": 0,
                  "pyudf": 0, "arrow": 1, "sortagg": 0}}

    def test_identical_is_green(self):
        reg, info = pi.diff_inventories(self.BASE, dict(self.BASE))
        assert reg == [] and info == []

    def test_shuffle_growth_is_a_regression(self):
        fresh = {"q": dict(self.BASE["q"], ex=3)}
        reg, info = pi.diff_inventories(self.BASE, fresh)
        assert reg == ["q: ex 2 -> 3"] and info == []

    def test_new_scalar_udf_is_a_regression(self):
        fresh = {"q": dict(self.BASE["q"], pyudf=1)}
        reg, _ = pi.diff_inventories(self.BASE, fresh)
        assert reg == ["q: pyudf 0 -> 1"]

    def test_cartesian_and_sortagg_growth_regress(self):
        fresh = {"q": dict(self.BASE["q"], cart=1, sortagg=2)}
        reg, _ = pi.diff_inventories(self.BASE, fresh)
        assert reg == ["q: cart 0 -> 1", "q: sortagg 0 -> 2"]

    def test_improvement_is_informational_not_fatal(self):
        fresh = {"q": dict(self.BASE["q"], ex=1)}
        reg, info = pi.diff_inventories(self.BASE, fresh)
        assert reg == []
        assert info == ["q: ex 2 -> 1  (improved — regenerate baseline)"]

    def test_broadcast_and_single_partition_moves_are_informational(self):
        fresh = {"q": dict(self.BASE["q"], bex=2, ex1=1)}
        reg, info = pi.diff_inventories(self.BASE, fresh)
        assert reg == []
        assert sorted(info) == [
            "q: bex 1 -> 2  (informational)",
            "q: ex1 0 -> 1  (informational)",
        ]

    def test_membership_drift_is_fatal_both_ways(self):
        reg, _ = pi.diff_inventories(self.BASE, {})
        assert len(reg) == 1 and "no longer declared" in reg[0]
        reg, _ = pi.diff_inventories({}, self.BASE)
        assert len(reg) == 1 and "not in baseline" in reg[0]
