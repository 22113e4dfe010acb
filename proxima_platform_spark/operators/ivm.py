"""Incremental view maintenance (IVM) of snapshot aggregates.

The reference keeps materialized snapshot state hot (cached views over the
commit log: direct/core/.../view/LocalCachedPartitionedView.java — build
once, then apply each incoming upsert to the cached table). This module
runs the same idea one level higher: maintain an *aggregate* over the
snapshot without ever recomputing it from history. Given

* ``base_cells`` — the materialized snapshot at time t0 (what the cached
  view already stores),
* ``delta``     — the changelog slice with t0 < stamp <= t1 (what the
  commit log delivers),

``incremental_snapshot_agg`` produces per-group ``(n_cells, total)`` of
the snapshot at t1 by pure delta arithmetic:

    agg(t1) = agg(base_cells) + Σ contrib(new state of changed cells)
                              - Σ contrib(old state of changed cells)

The new state of a changed cell is ``snapshot(old row ∪ its delta rows)``
— a compaction over the cell's OWN rows only, so the full history is
never rescanned and untouched cells are never read beyond the base agg.
Delete winners simply drop out of the snapshot and therefore retract
their old contribution — the classic retraction rule, inherited from
:func:`proxima_platform_spark.changelog.snapshot` rather than reimplemented.

Exactness: contributions are summed as DECIMAL, which is associative and
order-independent — so the incremental result is BIT-equal to a full
recompute at t1 (pinned in tests and by the DuckDB oracle), not merely
close. Doubles would drift here: base+delta associates differently than
a full re-sum.

100 TB scale: cost is O(|delta|) + a semi-join of the base snapshot
against the (typically tiny) changed-cell key set — both hash-partitioned
on the cell key, no full-table shuffle. The base agg itself is a
map-side-combining groupBy of the materialized snapshot the platform
already stores; in steady state a deployment would persist that agg frame
and feed it back as ``base_agg``, making each maintenance step
O(|delta| + |changed cells| + |groups|).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from proxima_platform_spark.changelog import snapshot

CELL_KEY = ["entity", "key", "attribute"]


def cell_contributions(
    cells: DataFrame, value: Column, group_cols: list[str]
) -> DataFrame:
    """Per-group (n_cells, total) of a snapshot-cell frame. ``value`` must
    be an exact (decimal / integral) expression — see module docstring."""
    return cells.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_cells"), F.sum(value).alias("total")
    )


def changed_cell_rows(base_cells: DataFrame, delta: DataFrame) -> DataFrame:
    """Old (t0) state of exactly the cells the delta touches: a semi-join
    of the base snapshot against the delta's direct cell keys, plus — for
    wildcard tombstones — a semi-join on the attribute PREFIX (those cells
    never appear as direct delta keys, so without the second branch their
    retraction would be silently skipped). A base cell is unique per
    CELL_KEY, so the dropDuplicates between the branches is exact. This is
    the operator's changed-cell restriction in the raw — the caller pins
    the result; plan tests assert the LeftSemi shape HERE because the pin
    truncates it out of the combined query's visible plan."""
    direct_keys = delta.select(*CELL_KEY).distinct()
    old_direct = base_cells.join(direct_keys, CELL_KEY, "left_semi")
    wc_keys = (
        delta.where(F.col("delete_wildcard"))
        .select("entity", "key", "attribute_base")
        .distinct()
    )
    old_wc = base_cells.join(
        wc_keys, ["entity", "key", "attribute_base"], "left_semi"
    )
    return old_direct.unionByName(old_wc).dropDuplicates(CELL_KEY)


def incremental_snapshot_agg(
    base_cells: DataFrame,
    delta: DataFrame,
    *,
    group_cols: list[str],
    value: Column,
    base_agg: DataFrame | None = None,
) -> DataFrame:
    """Aggregate of the t1 snapshot, maintained incrementally.

    ``base_cells``: snapshot(changelog, at=t0) — full changelog schema.
    ``delta``: changelog rows with t0 < stamp <= t1.
    ``value``: exact per-cell contribution expression over the cell row.
    ``base_agg``: optionally the already-materialized per-group agg of
    ``base_cells`` (the steady-state deployment shape); computed from
    ``base_cells`` when absent.
    """
    # staged once (lazy localCheckpoint): base_cells is a FULL snapshot
    # build (compact agg + tombstone agg + resolve join) and feeds three
    # consumers (both changed-cell semi-joins and, when base_agg is not
    # supplied, the base contributions agg); delta feeds three (direct
    # keys, wildcard keys, the compaction union). Without the pins
    # Catalyst inlines each subtree once per consumer — the kmv_set_ops
    # lesson applied to the IVM step
    base_cells = base_cells.localCheckpoint(eager=False)
    delta = delta.localCheckpoint(eager=False)
    # pinned: old_rows (changed cells only — small) feeds the new-state
    # compaction AND the minus contributions agg
    old_rows = changed_cell_rows(base_cells, delta).localCheckpoint(
        eager=False
    )
    # new state of changed cells: compact each cell's (old row ∪ delta
    # rows) — snapshot() applies the same winner + tombstone rules as a
    # full rebuild, restricted to exactly these cells' own rows
    new_rows = snapshot(old_rows.unionByName(delta))
    if base_agg is None:
        base_agg = cell_contributions(base_cells, value, group_cols)
    plus = cell_contributions(new_rows, value, group_cols).select(
        *group_cols,
        F.col("n_cells").alias("dn_plus"),
        F.col("total").alias("dt_plus"),
    )
    minus = cell_contributions(old_rows, value, group_cols).select(
        *group_cols,
        F.col("n_cells").alias("dn_minus"),
        F.col("total").alias("dt_minus"),
    )
    zero = F.lit(0)
    merged = (
        base_agg.join(plus, group_cols, "full_outer")
        .join(minus, group_cols, "full_outer")
    )
    return merged.select(
        *group_cols,
        (
            F.coalesce(F.col("n_cells"), zero)
            + F.coalesce(F.col("dn_plus"), zero)
            - F.coalesce(F.col("dn_minus"), zero)
        ).alias("n_cells"),
        (
            F.coalesce(F.col("total"), zero)
            + F.coalesce(F.col("dt_plus"), zero)
            - F.coalesce(F.col("dt_minus"), zero)
        ).alias("total"),
    ).where(F.col("n_cells") > 0)
