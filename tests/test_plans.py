"""Physical-plan assertions: the plans we designed for are the plans
Catalyst actually produces (pushdown reaches the scan, dims broadcast,
no redundant shuffles). The reference has no optimizer (SURVEY §4) —
these guard the *Spark-side* execution story of each operator."""

import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entry
from proxima_platform_spark.plans import count_exchanges, physical_plan


class TestPushdownAndPruning:
    def test_filter_pushed_to_parquet_scan(self, spark, sf_dir):
        plan = physical_plan(entry.q_filter_where(spark, sf_dir))
        # (the PushedFilters list renders truncated — assert on the prefix)
        assert "PushedFilters: [IsNotNull" in plan
        assert "GreaterThan(l_quantity" in plan

    def test_projection_prunes_scan_columns(self, spark, sf_dir):
        plan = physical_plan(entry.q_map_project(spark, sf_dir))
        # 4 columns of 16 read: the projection reached the scan
        assert "ReadSchema: struct<l_orderkey:bigint,l_linenumber" in plan
        assert "l_shipdate" not in plan.split("ReadSchema:")[1]

    def test_snapshot_prunes_to_used_columns(self, spark, sf_dir):
        plan = physical_plan(entry.q_batch_snapshot(spark, sf_dir))
        read = plan.split("ReadSchema:")[1].splitlines()[0]
        assert "props" not in read  # unused wide column never scanned


class TestBroadcastJoins:
    def test_tpch_q5ish_broadcasts_dims(self, spark, sf_dir):
        plan = physical_plan(entry.q_tpch_q5ish(spark, sf_dir))
        assert plan.count("BroadcastHashJoin") >= 3

    def test_inner_join_autobroadcasts_small_dim(self, spark, sf_dir):
        # customer at test SF is far below the broadcast threshold; Catalyst
        # must pick BroadcastHashJoin without a hint
        plan = physical_plan(entry.q_join_inner(spark, sf_dir))
        assert "BroadcastHashJoin" in plan


class TestShuffleCounts:
    def test_integrate_per_key_single_shuffle(self, spark, sf_dir):
        df = entry.q_integrate_per_key(spark, sf_dir)
        assert count_exchanges(df) == 1  # one partition-by-key, nothing else

    def test_tumbling_window_sum_single_shuffle(self, spark, sf_dir):
        df = entry.q_tumbling_window_sum(spark, sf_dir)
        assert count_exchanges(df) == 1  # partial+final agg over one exchange

    def test_snapshot_bounded_shuffles(self, spark, sf_dir):
        # compaction (1) + tombstone aggregation (1) + tombstone join (≤2);
        # anything above means a redundant exchange crept in
        df = entry.q_batch_snapshot(spark, sf_dir)
        assert count_exchanges(df) <= 4

    def test_count_by_key_partial_aggregation(self, spark, sf_dir):
        # partial_count on the map side keeps the shuffle at ~1 row per key
        # per partition — the HashAggregate pair must surround the exchange
        plan = physical_plan(entry.q_count_by_key(spark, sf_dir))
        assert plan.count("HashAggregate") >= 2
        assert "partial_count" in plan


class TestCodegen:
    def test_text_quality_arrow_stage_narrow(self, spark, sf_dir):
        # r13: text_quality scores through quality_lang_arrow, the
        # parity-pinned Arrow twin of the expression stack (the old
        # guard asserted the expression tree stayed in codegen; with no
        # expression tree left, the invariants are: the sanctioned
        # vectorized path, zero scalar Python UDFs, and a narrow stage —
        # no exchange feeds the projection)
        plan = physical_plan(entry.q_text_quality(spark, sf_dir))
        assert "MapInPandas" in plan or "ArrowEvalPython" in plan
        assert "BatchEvalPython" not in plan
        assert "Exchange" not in plan

    def test_minhash_signature_hash_aggregates(self, spark, sf_dir):
        # integer min-hash buffers must hash-aggregate; SortAggregate here
        # would re-sort every shingle row
        plan = physical_plan(entry.q_dedup_minhash(spark, sf_dir))
        assert "SortAggregate" not in plan

    def test_pii_scrub_is_one_codegen_projection(self, spark, sf_dir):
        # detect + redact are regexp Column expressions over one scan:
        # no shuffle, no Python, single whole-stage-codegen span
        df = entry.q_pii_scrub(spark, sf_dir)
        plan = physical_plan(df)
        assert count_exchanges(df) == 0
        assert plan.lstrip().startswith("*(1)")

    def test_tpch_q18ish_pruned_and_top_k(self, spark, sf_dir):
        plan = physical_plan(entry.q_tpch_q18ish(spark, sf_dir))
        assert "TakeOrderedAndProject" in plan  # no global sort for LIMIT
        # lineitem scan pruned to the two columns the aggregate needs
        li_read = [
            seg.splitlines()[0]
            for seg in plan.split("ReadSchema: ")[1:]
            if "l_orderkey" in seg.splitlines()[0]
        ]
        assert li_read and all(
            "l_shipdate" not in r and "l_comment" not in r for r in li_read
        )

    def test_bm25_corpus_never_shuffles(self, spark, sf_dir):
        # corpus stats reduce to one single-row aggregate; scoring re-attaches
        # via broadcast — the document table itself is never hash-partitioned
        plan = physical_plan(entry.q_bm25_rank(spark, sf_dir))
        assert "Exchange hashpartitioning" not in plan

    def test_dedup_groups_no_cartesian(self, spark, sf_dir):
        # the component contraction is equi-joins on node id throughout;
        # a CartesianProduct/BroadcastNestedLoop here means the band join
        # or a star round regressed to all-pairs
        plan = physical_plan(entry.q_dedup_groups(spark, sf_dir))
        assert "CartesianProduct" not in plan

    def test_dedup_embedding_no_cartesian(self, spark, sf_dir):
        # embedding near-dup must candidate via the sign-LSH bucket
        # equi-join; a nested-loop theta join on id_a < id_b is the O(n²)
        # scale-killer this query previously shipped
        plan = physical_plan(entry.q_dedup_embedding(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestR03ExtensionPlans:
    def test_repetition_signals_no_shuffle(self, spark, sf_dir):
        # Arrow-batched count stage (narrow, no exchange) + expression
        # fractions; the interpreted-lambda expression form measured
        # ~100x slower, so Python-in-plan here is the deliberate fast path
        df = entry.q_repetition_signals(spark, sf_dir)
        assert count_exchanges(df) == 0
        assert "MapInPandas" in physical_plan(df)

    def test_chunk_documents_no_shuffle(self, spark, sf_dir):
        # posexplode is a narrow generate — chunking must not repartition
        df = entry.q_chunk_documents(spark, sf_dir)
        assert count_exchanges(df) == 0
        assert "Generate posexplode" in physical_plan(df)

    def test_sequence_pack_single_shuffle(self, spark, sf_dir):
        # one hash exchange on shard for the window cumsum; nothing else
        df = entry.q_sequence_pack(spark, sf_dir)
        assert count_exchanges(df) == 1

    def test_tfidf_broadcasts_corpus_size(self, spark, sf_dir):
        # the single-row corpus-size aggregate must attach via broadcast,
        # never shuffle the (doc,term) table against it
        plan = physical_plan(entry.q_tfidf_top_terms(spark, sf_dir))
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan

    def test_embedding_quantize_no_shuffle(self, spark, sf_dir):
        df = entry.q_embedding_quantize(spark, sf_dir)
        assert count_exchanges(df) == 0

    def test_tpch_q7ish_broadcasts_dims(self, spark, sf_dir):
        plan = physical_plan(entry.q_tpch_q7ish(spark, sf_dir))
        assert plan.count("BroadcastHashJoin") >= 3

    def test_tpch_q7ish_not_vacuous(self, spark, sf_dir):
        # Guard against the r03 defect: the nation-pair literals must exist in
        # the fixture's nation table so the bilateral join selects real rows.
        # A green oracle hash on an empty result certifies nothing.
        assert entry.q_tpch_q7ish(spark, sf_dir).count() > 0

    def test_tpch_q10ish_topk_no_global_sort(self, spark, sf_dir):
        plan = physical_plan(entry.q_tpch_q10ish(spark, sf_dir))
        assert "TakeOrderedAndProject" in plan


class TestR04ExtensionPlans:
    def test_dedup_paragraphs_no_cartesian_bounded_shuffles(self, spark, sf_dir):
        df = entry.q_dedup_paragraphs(spark, sf_dir)
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # explode is narrow; winner-agg, reassembly-agg, and the id join are
        # the only exchanges (hash partial agg on the fingerprint — no
        # hot-paragraph window funnel)
        assert count_exchanges(df) <= 4

    def test_dedup_paragraphs_near_no_cartesian(self, spark, sf_dir):
        plan = physical_plan(entry.q_dedup_paragraphs_near(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_multimodal_audio_stays_narrow(self, spark, sf_dir):
        # synth -> encode -> decode -> window rows: two Arrow stages, no
        # shuffle anywhere (output inherits the scan partitioning)
        df = entry.q_multimodal_audio(spark, sf_dir)
        assert count_exchanges(df) == 0

    def test_range_join_no_nested_loop(self, spark, sf_dir):
        # the whole point of the binned range join: the theta predicate
        # must NOT plan as BroadcastNestedLoopJoin/CartesianProduct
        plan = physical_plan(entry.q_range_join_ship_week(spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_dedup_paragraphs_actually_drops_duplicates(self, spark, sf_dir):
        # non-vacuity: the fixture's segment collisions must produce at
        # least one dropped paragraph corpus-wide
        agg = entry.q_dedup_paragraphs(spark, sf_dir).agg(
            F.sum(F.col("n_para") - F.col("n_kept")).alias("dropped")
        ).collect()[0]
        assert agg.dropped > 0


class TestR04EventAnalyticsPlans:
    def test_range_join_aggregates_below_the_join(self, spark, sf_dir):
        # the point side must collapse to per-day rows BEFORE the bin join
        # (the aggregate-pushdown that keeps the pair set off the wire) —
        # the optimized plan has an Aggregate under the Join on the
        # lineitem branch
        from pyspark.sql import functions as F

        df = entry.q_range_join_ship_week(spark, sf_dir)
        logical = df._jdf.queryExecution().optimizedPlan().toString()
        join_pos = logical.find("Join")
        assert join_pos != -1
        below = logical[join_pos:]
        assert "Aggregate" in below, "no pre-join aggregate on the point side"

    def test_funnel_no_cartesian_single_key_exchanges(self, spark, sf_dir):
        df = entry.q_funnel_steps(spark, sf_dir)
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # every exchange in the chain hashes user_id (exchange-reuse shape):
        # no other partitioning expression appears
        import re

        for m in re.finditer(r"hashpartitioning\(([^,)]+)", plan):
            assert "user_id" in m.group(1), m.group(0)

    def test_bloom_decontaminate_prefilter_is_broadcast(self, spark, sf_dir):
        plan = physical_plan(entry.q_bloom_decontaminate(spark, sf_dir))
        assert "CartesianProduct" not in plan
        # the 1-row bitset side arrives by broadcast; no Python anywhere
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        for bad in ("BatchEvalPython", "ArrowEvalPython"):
            assert bad not in plan

    def test_kmeans_no_python_no_cartesian_blowup_on_wire(self, spark, sf_dir):
        plan = physical_plan(entry.q_kmeans_cluster(spark, sf_dir))
        for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
            assert bad not in plan
        # assignment argmin is an aggregate (map-side combined), not a
        # row_number window over the k-times-n scored rows
        assert "row_number" not in plan

    def test_session_ids_one_exchange(self, spark, sf_dir):
        df = entry.q_session_ids(spark, sf_dir)
        assert count_exchanges(df) == 1

    def test_gapfill_no_cartesian(self, spark, sf_dir):
        plan = physical_plan(entry.q_gapfill_locf(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_quota_sample_binds_at_oracle_sf(self, spark):
        # non-vacuity guard (the tpch_q7ish lesson): at the driver's oracle
        # scale the quota must actually cut — every source has more docs
        # than the quota keeps
        import os

        sf001 = "/root/testdata/sf0.01"
        if not os.path.exists(sf001):
            import pytest

            pytest.skip("sf0.01 fixture not present")
        kept = entry.q_source_quota_sample(spark, sf001).count()
        total = spark.read.parquet(f"{sf001}/documents.parquet").count()
        assert kept < total


class TestLateR04Plans:
    """Plan-shape asserts for the late-r04 block — pins the SCALE.md
    inventory rows (sketch prefilters broadcast, window ops share one
    exchange, layout/mixing stay codegen, no Python, no cartesian)."""

    def test_heavy_hitters_prefilter_broadcast_no_python(self, spark, sf_dir):
        plan = physical_plan(entry.q_heavy_hitters(spark, sf_dir))
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
            assert bad not in plan

    def test_ewma_single_exchange_no_python(self, spark, sf_dir):
        df = entry.q_ewma_value(spark, sf_dir)
        assert count_exchanges(df) == 1
        plan = physical_plan(df)
        for bad in ("BatchEvalPython", "ArrowEvalPython"):
            assert bad not in plan

    def test_zscore_single_exchange_single_sort(self, spark, sf_dir):
        df = entry.q_anomaly_zscore(spark, sf_dir)
        assert count_exchanges(df) == 1
        # Catalyst may split the window expressions into stacked Window
        # operators, but they must share ONE sort over ONE exchange (the
        # second Window consumes the first's ordering for free)
        assert physical_plan(df).count("+- Sort") == 1

    def test_attribution_single_user_exchange(self, spark, sf_dir):
        df = entry.q_attribution(spark, sf_dir)
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan
        import re

        parts = {m.group(1) for m in re.finditer(r"hashpartitioning\(([^,)]+)", plan)}
        assert all("user_id" in p or "channel" in p for p in parts), parts

    def test_ohlc_one_exchange_no_window(self, spark, sf_dir):
        df = entry.q_ohlc_bars(spark, sf_dir)
        assert count_exchanges(df) == 1
        # open/close ride the hash agg — no Sort-based Window over raw ticks
        assert "Window" not in physical_plan(df)

    def test_pagerank_no_python_no_cartesian(self, spark, sf_dir):
        plan = physical_plan(entry.q_pagerank_types(spark, sf_dir))
        for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
            assert bad not in plan

    def test_pit_enrich_hash_join_not_bnlj(self, spark, sf_dir):
        plan = physical_plan(entry.q_pit_enrich(spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_temperature_mix_corpus_never_shuffles(self, spark, sf_dir):
        df = entry.q_temperature_mix(spark, sf_dir)
        plan = physical_plan(df)
        # the corpus side joins the broadcast rate table and filters —
        # any hashpartitioning exchange must belong to the tiny count agg,
        # never carry doc text
        assert "CartesianProduct" not in plan
        assert "BroadcastExchange" in plan
        for bad in ("BatchEvalPython", "ArrowEvalPython"):
            assert bad not in plan

    def test_zorder_layout_pure_codegen(self, spark, sf_dir):
        df = entry.q_zorder_layout(spark, sf_dir)
        assert count_exchanges(df) == 0
        plan = physical_plan(df)
        for bad in ("BatchEvalPython", "ArrowEvalPython"):
            assert bad not in plan

    def test_hilbert_layout_pure_codegen(self, spark, sf_dir):
        # the DFA step chain must stay narrow JVM bit arithmetic: zero
        # exchanges, zero python eval nodes, linear plan (no exponential
        # accumulator inlining from projection collapsing)
        df = entry.q_hilbert_layout(spark, sf_dir)
        assert count_exchanges(df) == 0
        plan = physical_plan(df)
        for bad in ("BatchEvalPython", "ArrowEvalPython"):
            assert bad not in plan
        assert len(plan) < 100_000, len(plan)

    def test_mad_joins_reuse_key_partitioning(self, spark, sf_dir):
        plan = physical_plan(entry.q_mad_outliers(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        for bad in ("BatchEvalPython", "ArrowEvalPython"):
            assert bad not in plan

    def test_retention_vacuum_one_exchange(self, spark, sf_dir):
        assert count_exchanges(entry.q_retention_vacuum(spark, sf_dir)) == 1

    def test_late_r04_not_vacuous_at_oracle_sf(self, spark):
        import os

        sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
        if not os.path.exists(f"{sf}/events.parquet"):
            import pytest as _p

            _p.skip("no testdata")
        # filters/joins must both keep and drop rows at the driver's scale
        hh = entry.q_heavy_hitters(spark, sf).count()
        assert 0 < hh < 750
        anom = entry.q_anomaly_zscore(spark, sf).count()
        assert 0 < anom < 10_000
        mad = entry.q_mad_outliers(spark, sf).count()
        assert 0 < mad < 10_000
        tm = entry.q_temperature_mix(spark, sf).count()
        assert 0 < tm < 500
        pe = entry.q_pit_enrich(spark, sf).count()
        assert 0 < pe < 2_500


class TestTpchDecorrelation:
    """The r04c subquery block: Catalyst must rewrite every correlated
    subquery into a join (no per-row re-execution exists in Spark — if the
    rewrite failed, planning itself errors) and the join strategies must be
    the ones the queries were designed around. Non-vacuity is checked at the
    driver's oracle scale so a filter matching nothing can't silently turn
    the hash check into a no-op."""

    def test_q2_correlated_min_becomes_aggregate_join(self, spark, sf_dir):
        plan = physical_plan(entry.q_tpch_q2ish(spark, sf_dir))
        # the correlated min() reappears as a standalone aggregate joined back
        assert "min(" in plan and "Join" in plan

    def test_q17_correlated_avg_no_cartesian(self, spark, sf_dir):
        plan = physical_plan(entry.q_tpch_q17ish(spark, sf_dir))
        assert "CartesianProduct" not in plan

    def test_q21_exists_becomes_semi_and_anti(self, spark, sf_dir):
        plan = physical_plan(entry.q_tpch_q21ish(spark, sf_dir))
        assert "LeftSemi" in plan
        assert "LeftAnti" in plan

    def test_q16_not_in_no_cartesian(self, spark, sf_dir):
        plan = physical_plan(entry.q_tpch_q16ish(spark, sf_dir))
        assert "CartesianProduct" not in plan

    def test_q19_disjunction_prunes_part_columns(self, spark, sf_dir):
        plan = physical_plan(entry.q_tpch_q19ish(spark, sf_dir))
        # part scan must read only the 3 join/predicate columns, not p_name etc.
        assert "p_name" not in plan
        assert plan.count("BroadcastHashJoin") >= 1

    def test_q8_broadcasts_all_dims(self, spark, sf_dir):
        plan = physical_plan(entry.q_tpch_q8ish(spark, sf_dir))
        assert plan.count("BroadcastHashJoin") >= 4

    def test_block_not_vacuous_at_oracle_sf(self, spark):
        import os

        sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
        if not os.path.exists(f"{sf}/lineitem.parquet"):
            pytest.skip("no testdata")
        # every filter/subquery must both keep and drop rows at driver scale
        assert 0 < entry.q_tpch_q2ish(spark, sf).count() < 3000
        assert 0 < entry.q_tpch_q11ish(spark, sf).count() < 2000
        assert 0 < entry.q_tpch_q13ish(spark, sf).count() < 1500
        assert entry.q_tpch_q15ish(spark, sf).count() >= 1
        assert 0 < entry.q_tpch_q16ish(spark, sf).count() < 300
        assert 0 < entry.q_tpch_q17ish(spark, sf).count() <= 3
        assert 0 < entry.q_tpch_q21ish(spark, sf).count() < 1000
        assert 0 < entry.q_tpch_q22ish(spark, sf).count() < 1500


class TestSetOpsAndUnpivot:
    def test_intersect_plans_as_semi_join(self, spark, sf_dir):
        plan = physical_plan(entry.q_set_intersect_buyers(spark, sf_dir))
        assert "LeftSemi" in plan

    def test_except_all_no_cartesian(self, spark, sf_dir):
        plan = physical_plan(entry.q_set_except_priorities(spark, sf_dir))
        assert "CartesianProduct" not in plan

    def test_unpivot_single_exchange(self, spark, sf_dir):
        # the melt itself is narrow; only the final aggregate shuffles
        from proxima_platform_spark.plans import count_exchanges
        assert count_exchanges(entry.q_unpivot_metrics(spark, sf_dir)) <= 1

    def test_not_vacuous_at_oracle_sf(self, spark):
        import os

        sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
        if not os.path.exists(f"{sf}/orders.parquet"):
            pytest.skip("no testdata")
        # intersect keeps some but not all customers; except-all drops 5-LOW
        n = entry.q_set_intersect_buyers(spark, sf).count()
        assert 0 < n < 1500
        prios = {r["o_orderpriority"] for r in entry.q_set_except_priorities(spark, sf).collect()}
        assert prios and len(prios) < 5


class TestTwaAndCorr:
    def test_twa_single_exchange(self, spark, sf_dir):
        # window partitioning on (user, day) must be reused by the aggregate
        from proxima_platform_spark.plans import count_exchanges
        assert count_exchanges(entry.q_twa_value(spark, sf_dir)) == 1

    def test_corr_matches_numpy(self, spark, sf_dir):
        # independent cross-check of the power-sum decomposition against
        # numpy's two-pass kernel (scale-invariance makes cents == price)
        import numpy as np

        pdf = (
            entry._load(spark, sf_dir, "lineitem")
            .select("l_returnflag", "l_quantity", "l_extendedprice")
            .toPandas()
        )
        got = {
            r["l_returnflag"]: r["corr_qty_price"]
            for r in entry.q_corr_price_qty(spark, sf_dir).collect()
        }
        for flag, grp in pdf.groupby("l_returnflag"):
            expect = np.corrcoef(grp["l_quantity"], grp["l_extendedprice"])[0, 1]
            assert abs(got[flag] - expect) < 1e-6, (flag, got[flag], expect)

    def test_corr_single_pass_no_python(self, spark, sf_dir):
        plan = physical_plan(entry.q_corr_price_qty(spark, sf_dir))
        for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
            assert bad not in plan


class TestGroupingSetsRanksStringAgg:
    def test_grouping_sets_single_expand_single_exchange(self, spark, sf_dir):
        from proxima_platform_spark.plans import count_exchanges
        df = entry.q_grouping_sets_sales(spark, sf_dir)
        plan = physical_plan(df)
        assert "Expand" in plan
        assert count_exchanges(df) == 1

    def test_percent_rank_one_window_pass(self, spark, sf_dir):
        df = entry.q_percent_rank_orders(spark, sf_dir)
        plan = physical_plan(df)
        # both rank functions share one Window operator and one exchange
        assert plan.count("Window") == 1
        from proxima_platform_spark.plans import count_exchanges
        assert count_exchanges(df) == 1

    def test_percent_rank_values(self, spark, sf_dir):
        rows = entry.q_percent_rank_orders(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 0.0 <= r["pct_rank"] <= 1.0
            assert 0.0 < r["cume"] <= 1.0

    def test_string_agg_deterministic_order(self, spark, sf_dir):
        rows = {r["r_name"]: r["nations"] for r in
                entry.q_string_agg_nations(spark, sf_dir).collect()}
        assert rows
        for joined in rows.values():
            parts = joined.split(",")
            assert parts == sorted(parts)


class TestLateralAndRangeFrame:
    def test_lateral_becomes_rank_not_rescan(self, spark, sf_dir):
        # the per-order LIMIT must plan as a partitioned window/limit over
        # one lineitem scan — not a nested re-scan per outer row
        plan = physical_plan(entry.q_lateral_top_lines(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert plan.count("Scan parquet") <= 2

    def test_range_frame_single_exchange(self, spark, sf_dir):
        from proxima_platform_spark.plans import count_exchanges
        df = entry.q_rolling_range_revenue(spark, sf_dir)
        assert count_exchanges(df) == 1
        assert "RangeFrame" in physical_plan(df)

    def test_not_vacuous_at_oracle_sf(self, spark):
        import os

        sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
        if not os.path.exists(f"{sf}/orders.parquet"):
            pytest.skip("no testdata")
        n = entry.q_lateral_top_lines(spark, sf).count()
        assert 0 < n  # 1997 orders only
        # the lateral LIMIT actually limits: ≤ 2 rows per order
        import pyspark.sql.functions as SF
        mx = (entry.q_lateral_top_lines(spark, sf)
              .groupBy("o_orderkey").count().agg(SF.max("count")).first()[0])
        assert mx <= 2


class TestNullSafeJoin:
    def test_null_safe_join_is_hash_join(self, spark, sf_dir):
        plan = physical_plan(entry.q_null_safe_join(spark, sf_dir))
        assert "BroadcastHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_null_group_present(self, spark, sf_dir):
        rows = {r["grp"]: r["pairs"] for r in
                entry.q_null_safe_join(spark, sf_dir).collect()}
        assert None in rows and rows[None] > 0  # NULL x NULL pairs matched


class TestDqAudit:
    def test_one_job_no_cartesian(self, spark, sf_dir):
        plan = physical_plan(entry.q_dq_audit(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "Window" not in plan  # counts and anti-joins only

    def test_fire_and_nofire_paths(self, spark):
        import os

        sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
        if not os.path.exists(f"{sf}/lineitem.parquet"):
            pytest.skip("no testdata")
        rows = {r["constraint"]: r["violations"]
                for r in entry.q_dq_audit(spark, sf).collect()}
        assert rows["l_quantity_in_1_40"] > 0       # the audit can fire
        assert rows["lineitem_fk_orders"] == 0      # and reports clean checks
        assert rows["orders_pk_unique"] == 0


class TestR05ExtensionPlans:
    def test_fuzzy_decontaminate_broadcasts_eval_side(self, spark, sf_dir):
        df = entry.q_fuzzy_decontaminate(spark, sf_dir)
        plan = physical_plan(df)
        # the eval set is benchmark-sized: its banded keys AND shingle sets
        # must ride broadcast joins — the corpus is never shuffled by key
        # for the candidate join and never self-joined
        assert plan.count("BroadcastHashJoin") >= 2
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_fuzzy_decontaminate_not_vacuous(self, spark, sf_dir):
        # the eval split must cross real near-dup pairs so the drop path
        # is exercised (the q7ish lesson)
        rows = entry.q_fuzzy_decontaminate(spark, sf_dir).collect()
        assert len(rows) > 0
        assert all(r["jac_micro"] >= 500_000 for r in rows)

    def test_bpe_encode_distinct_vocab_join(self, spark, sf_dir):
        df = entry.q_bpe_encode(spark, sf_dir)
        plan = physical_plan(df)
        # encode cost is paid per DISTINCT word: the plan must contain the
        # vocab dedup agg + join back, and no cartesian anywhere
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_embedding_covariance_one_exchange_no_join(self, spark, sf_dir):
        # one pass, NO self-join: the only exchange is the d²-bounded cell
        # agg; everything before it is a narrow pair-explode
        df = entry.q_embedding_covariance(spark, sf_dir)
        plan = physical_plan(df)
        assert count_exchanges(df) == 1
        assert "Join" not in plan

    def test_token_budget_pack_bounded_shuffles(self, spark, sf_dir):
        # vocab dedup + shard window + manifest agg are the only exchanges;
        # the vocab joins back broadcast (encode cost paid per DISTINCT word)
        df = entry.q_token_budget_pack(spark, sf_dir)
        plan = physical_plan(df)
        assert count_exchanges(df) <= 3
        assert plan.count("BroadcastHashJoin") >= 1
        assert "CartesianProduct" not in plan


class TestR06ExtensionPlans:
    def test_quality_model_score_zero_shuffle(self, spark, sf_dir):
        # literal-weight linear model: one projection over the scan — no
        # exchange, no join, no Python boundary anywhere in the plan
        df = entry.q_quality_model_score(spark, sf_dir)
        plan = physical_plan(df)
        assert count_exchanges(df) == 0
        assert "Join" not in plan
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan

    def test_self_dedup_spans_bounded_shuffles(self, spark, sf_dir):
        # explode → (doc, span) min-agg → per-doc reassembly → one join
        # back on the doc id; no window over raw spans, no cartesian
        df = entry.q_self_dedup_spans(spark, sf_dir)
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert count_exchanges(df) <= 5
        assert "Window" not in plan

    def test_bpe_encode_bytes_distinct_vocab_join(self, spark, sf_dir):
        # same scale shape as char-level bpe_encode: vocab dedup agg + join
        # back; the byte remap is a foldable map expression, not a join
        df = entry.q_bpe_encode_bytes(spark, sf_dir)
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_semantic_dedup_cluster_bounded_pairs(self, spark, sf_dir):
        # pair scoring is an Arrow stage grouped on the cluster id (exact
        # int64 Gram matmul per cluster) — candidates never cross
        # clusters; no cartesian, no BNLJ (the kmeans centroid crossJoins
        # live behind the localCheckpoint and never reach this plan)
        df = entry.q_semantic_dedup(spark, sf_dir)
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsIn" in plan
        assert any(
            "hashpartitioning(cid" in line for line in plan.splitlines()
        )

    def test_dup_ngram_coverage_no_countdistinct_no_cartesian(self, spark, sf_dir):
        # distinct-doc counting per gram is two map-side-combined aggs —
        # the plan must contain partial_count HashAggregates and no
        # expand-based distinct aggregate, no cartesian
        df = entry.q_dup_ngram_coverage(spark, sf_dir)
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Expand" not in plan  # no count(distinct) expansion

    def test_ann_knn_join_bucketed_candidates(self, spark, sf_dir):
        # candidates come from LSH bucket equi-joins; ranking is one
        # window over candidates — never an n^2 product
        df = entry.q_ann_knn_join(spark, sf_dir)
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Window" in plan

    def test_curation_pipeline_bounded_shuffles(self, spark, sf_dir):
        # zero-shuffle gate projection + the span operator's keyed aggs +
        # one source-bounded agg; no cartesian, no window over raw spans
        df = entry.q_curation_pipeline(spark, sf_dir)
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Window" not in plan
        assert count_exchanges(df) <= 6

    def test_curation_pipeline_gate_bites(self, spark, sf_dir):
        # the quality gate must actually drop documents (the q7ish lesson)
        total = entry._load(spark, sf_dir, "documents").count()
        kept = entry.q_curation_pipeline(spark, sf_dir).agg(
            F.sum("n_docs")
        ).collect()[0][0]
        assert 0 < kept < total


class TestR07ExtensionPlans:
    def test_dedup_substrings_keyed_no_cartesian(self, spark, sf_dir):
        # ExactSubstr cutter (r13 shape): gram ladder (two map-side-
        # combined aggs) → winner join on fp → removal-window explode →
        # ONE bounded collect_set row per affected doc → LEFT OUTER join
        # back onto the pinned token frame → pure array_except
        # projection. The corpus-token explode, the (doc,pos) LeftAnti
        # and the collect_list reassembly shuffle are GONE; every
        # remaining stage keyed, no cartesian, no window over raw
        # occurrences, no count(distinct) Expand, no Python
        df = entry.q_dedup_substrings(spark, sf_dir)
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Window" not in plan
        assert "Expand" not in plan
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan
        assert "LeftAnti" not in plan  # the corpus-token anti-join is gone
        assert "LeftOuter" in plan  # bounded removed-set attach
        assert "collect_set" in plan  # one position-set row per doc

    def test_dedup_substrings_maximal_keyed_no_cartesian(self, spark, sf_dir):
        # variable-length ExactSubstr (r13 shape): same keyed gram
        # ladder as the fixed-n cutter plus a bounded winner-window
        # explode; the cut is the bounded collect_set position-set row
        # LEFT OUTER joined onto the pinned token frame, run stats are
        # array expressions over the sorted set — no cartesian, no
        # Python, no corpus-token anti-join, no run-stats Window at all
        df = entry.q_dedup_substrings_maximal(spark, sf_dir)
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan
        # the one remaining LeftAnti is the bounded winner-window
        # immunity join (removed minus kept windows) — dup-volume sized
        assert plan.count("LeftAnti") == 1
        assert "LeftOuter" in plan  # bounded cut-set attach
        assert "collect_set" in plan  # one position-set row per doc
        assert "Window" not in plan  # run stats are array expressions

    def test_multimodal_phash_dup_pigeonhole_join(self, spark, sf_dir):
        # candidates come from the 16-bit pigeonhole chunk equi-join —
        # never an n^2 image product; the decode/DCT stage is the one
        # sanctioned Arrow boundary (same contract as image_ahash)
        df = entry.q_multimodal_phash_dup(spark, sf_dir)
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # any EQUI join is fine (tiny sf broadcasts; scale shuffles)
        assert any(
            j in plan
            for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
        )

    def test_distinct_hll_two_hashaggs_no_expand(self, spark, sf_dir):
        # register build = one map-side-combining agg (≤ m rows/group out),
        # estimate = a second tiny agg; no count(distinct) Expand, no
        # joins, no Python anywhere — the whole sketch is codegen exprs
        df = entry.q_distinct_hll(spark, sf_dir)
        plan = physical_plan(df)
        assert "Expand" not in plan
        assert "Join" not in plan
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan
        assert count_exchanges(df) <= 2  # build agg + estimate agg

    def test_hll_union_registers_single_merge_agg(self, spark, sf_dir):
        # two slice builds + max-merge: the merge is itself a hash agg on
        # bucket — the mergeability story; still no Python, no Expand
        df = entry.q_hll_union_distinct(spark, sf_dir)
        plan = physical_plan(df)
        assert "Expand" not in plan
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan
        assert "Union" in plan

    def test_kmv_sketches_are_takeordered(self, spark, sf_dir):
        # bottom-k per set = TakeOrdered (per-partition partial top-k, one
        # k-row merge) — never a full sort of the distinct keys. The
        # combiner pins each sketch behind a localCheckpoint (r13), which
        # truncates the combined query's VISIBLE plan at the pins — so the
        # shape is asserted on the sketch-build frames themselves, exactly
        # as the query constructs them.
        from pyspark.sql import functions as F

        from proxima_platform_spark.functions.sketch import kmv_build

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        for sk in (
            kmv_build(
                li.where(F.year("l_shipdate") == 1996),
                ["l_orderkey"], k=256, salt="kmv-v1", set_name="a",
            ),
            kmv_build(
                li.where(F.col("l_discount") > 0.06),
                ["l_orderkey"], k=256, salt="kmv-v1", set_name="b",
            ),
        ):
            plan = physical_plan(sk)
            assert "TakeOrderedAndProject" in plan
            # the scans push the set predicates down
            assert "PushedFilters" in plan
        # (the estimate combiners crossJoin 1-row frames — a broadcast
        # nested loop over single rows, not a data-scale product; the
        # k-row sketch joins themselves must stay equi) — the combined
        # query must still not re-sort anything at data scale: the only
        # Sorts allowed are the ≤ k-row union-sketch cut
        df = entry.q_kmv_set_ops(spark, sf_dir)
        plan = physical_plan(df)
        assert "SortMergeJoin" not in plan

    def test_ivm_agg_apply_no_full_history_rescan(self, spark, sf_dir):
        # the t1 state of changed cells comes from (base ∪ delta) of those
        # cells only — the plan must not contain a second full-table
        # snapshot at t1: the changed-cell restriction is a semi join.
        # r13 pinned base_cells/delta/old_rows behind lazy localCheckpoints
        # (one snapshot build per step instead of three), which truncates
        # the combined query's VISIBLE plan at the pins — so the LeftSemi
        # shape is asserted on the operator's own pre-pin frame
        # (ivm.changed_cell_rows), exactly as incremental_snapshot_agg
        # builds it (the kmv_set_ops precedent).
        from proxima_platform_spark.changelog import snapshot
        from proxima_platform_spark.operators.ivm import changed_cell_rows

        clog = entry._events_changelog(spark, sf_dir)
        ts0 = F.timestamp_millis(F.lit(entry.T0))
        ts1 = F.timestamp_millis(F.lit(entry.T1))
        base_cells = snapshot(clog, at=ts0)
        delta = clog.where((F.col("stamp") > ts0) & (F.col("stamp") <= ts1))
        plan = physical_plan(changed_cell_rows(base_cells, delta))
        # the direct-key semi join; the wildcard-prefix branch constant-
        # folds away here (this changelog has delete_wildcard = lit(false))
        # — its semantics are pinned by tests/test_ivm.py's wildcard case
        assert "LeftSemi" in plan
        df = entry.q_ivm_agg_apply(spark, sf_dir)
        plan = physical_plan(df)
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan

    def test_semantic_decontaminate_closure_eval_no_join(self, spark, sf_dir):
        # r07 Arrow-probe shape: the eval side's quantized bucket matrices
        # ship in the probe closure, so the scoring path has NO join at
        # all — the train corpus never shuffles before scoring; the only
        # exchange is the best-match window's partitioning
        df = entry.q_semantic_decontaminate(spark, sf_dir)
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Join" not in plan  # scoring is join-free by construction
        assert "MapInPandas" in plan or "ArrowEvalPython" in plan
        assert "Window" in plan  # top-1 eval match per train vector

    def test_semantic_decontaminate_not_vacuous(self, spark, sf_dir):
        n = entry.q_semantic_decontaminate(spark, sf_dir).count()
        assert n >= 5  # the fixture has real cross-split near-dups


class TestNoRddProbe:
    def test_narrow_scan_spread_never_converts_to_rdd(self, spark, sf_dir, monkeypatch):
        """VERDICT r07 #6: the spread-narrow-scan guard must read the
        partition estimate from Catalyst plan stats, never from
        df.rdd.getNumPartitions() (the RDD conversion costs ~1s of
        driver-side analysis per call). Poison the .rdd property and
        build both operators' plans — setup must complete."""
        from pyspark.sql import DataFrame, functions as F

        from proxima_platform_spark.functions.dedup import (
            similarity_join_prefix,
            snm_candidate_pairs,
        )

        def boom(self):
            raise AssertionError("DataFrame.rdd accessed during setup")

        monkeypatch.setattr(DataFrame, "rdd", property(boom))
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = similarity_join_prefix(docs, id_col="doc_id", text_col="text")
        b = snm_candidate_pairs(
            docs, "doc_id", F.substring(F.col("text"), 1, 12)
        )
        # plan construction + analysis only — no execution needed to
        # prove the probe stayed JVM-plan-side
        assert a.columns and b.columns


class TestR09ExtensionPlans:
    def test_random_projection_zero_shuffles(self, spark, sf_dir):
        """The JL projection is one broadcast crossJoin of a 16-row R
        frame over pure codegen expressions — no Exchange anywhere."""
        df = entry.q_random_projection(spark, sf_dir)
        assert count_exchanges(df) == 0
        assert "BroadcastNestedLoopJoin" in physical_plan(df)

    def test_pmi_topk_never_globally_sorts(self, spark, sf_dir):
        plan = physical_plan(entry.q_pmi_bigrams(spark, sf_dir))
        assert "TakeOrderedAndProject" in plan

    def test_hard_negative_mining_no_cartesian(self, spark, sf_dir):
        plan = physical_plan(entry.q_hard_negative_mining(spark, sf_dir))
        assert "CartesianProduct" not in plan

    def test_kneser_ney_no_cartesian(self, spark, sf_dir):
        """The 1-row N1+(..) total rides a broadcast, the stats joins are
        hash/broadcast equi-joins — never a cartesian."""
        plan = physical_plan(entry.q_kneser_ney_score(spark, sf_dir))
        assert "CartesianProduct" not in plan

    def test_quantile_bisect_pass_filter_pushes_to_scan(self, spark, sf_dir):
        """Each bisection pass filters the RAW column on the widened
        range precisely so the predicate reaches the parquet scan —
        the min/max pruning the operator's 100 TB story depends on.
        (The exact micro-unit BETWEEN is an expression and cannot push;
        the raw-range twin filter is the pushable one.)"""
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        v = F.round(F.col("l_extendedprice").cast("double") * 1_000_000).cast(
            "long"
        )
        vals = df.select(
            F.col("l_extendedprice").cast("double").alias("__raw"),
            v.alias("__v"),
        ).where(F.col("__v").isNotNull())
        one_pass = vals.where(
            (F.col("__raw") >= 2.0)
            & (F.col("__raw") <= 50_000.0)
            & F.col("__v").between(2_000_000, 50_000_000_000)
        )
        plan = physical_plan(one_pass)
        assert "GreaterThanOrEqual(l_extendedprice,2.0)" in plan


class TestR10ExtensionPlans:
    def test_oph_pairs_no_cartesian(self, spark, sf_dir):
        # candidate pairs must come from the band-key equi-join; a nested
        # loop on id_a < id_b is the all-pairs regression
        plan = physical_plan(entry.q_dedup_minhash_oph(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_bbit_pairs_no_cartesian(self, spark, sf_dir):
        plan = physical_plan(entry.q_dedup_minhash_bbit(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_naive_bayes_model_joins_are_equi(self, spark, sf_dir):
        # scoring joins the token stream on (class, token); the only
        # nested-loop allowed is the broadcast of 1-row / |classes|-row
        # frames (priors, vocab size)
        plan = physical_plan(entry.q_naive_bayes_langid(spark, sf_dir))
        assert "CartesianProduct" not in plan

    def test_bleu_pair_scoring_no_cartesian(self, spark, sf_dir):
        # per-pair gram work must ride the pair equi-join; nested loop
        # over pairs x grams is the corpus-quadratic failure
        plan = physical_plan(entry.q_bleu_dedup_verify(spark, sf_dir))
        assert "CartesianProduct" not in plan

    def test_zipf_top_terms_is_take_ordered(self, spark, sf_dir):
        # top-100 terms must be a TakeOrdered, never a global sort of the
        # vocabulary
        plan = physical_plan(entry.q_zipf_slope(spark, sf_dir))
        assert "TakeOrderedAndProject" in plan

    def test_kn5_occurrence_stream_single_join(self, spark, sf_dir):
        # the type-table plan: the occurrence stream carries id_col and
        # crosses exactly ONE join (grams -> (type, lp)); the stats joins
        # run on type tables only. Count joins whose output includes the
        # doc id — the occurrence side.
        plan = physical_plan(entry.q_kneser_ney5_score(spark, sf_dir))
        assert "CartesianProduct" not in plan

    def test_unimax_corpus_work_is_one_aggregation(self, spark, sf_dir):
        # only the per-source token count touches corpus-scale data; the
        # ladder runs on |sources| rows with broadcast 1-row totals
        plan = physical_plan(entry.q_unimax_mixture(spark, sf_dir))
        assert "CartesianProduct" not in plan

    def test_domain_jsd_grid_is_equi_join(self, spark, sf_dir):
        plan = physical_plan(entry.q_domain_jsd(spark, sf_dir))
        assert "CartesianProduct" not in plan


class TestR11ExtensionPlans:
    def test_keep_best_uses_agg_not_window(self, spark, sf_dir):
        # the keeper argmax must be a map-side-combinable struct-max agg,
        # never a per-group window (a hot cluster would funnel through
        # one reducer); and the pair machinery stays equi-join
        plan = physical_plan(entry.q_dedup_cluster_keep_best(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Window" not in plan

    def test_nb_topk_prune_is_bounded_window(self, spark, sf_dir):
        # the prune window runs over the classes x vocab model frame —
        # allowed; the corpus-scale scoring side must stay equi-join
        plan = physical_plan(entry.q_naive_bayes_topk_langid(spark, sf_dir))
        assert "CartesianProduct" not in plan

    def test_ccnet_pipeline_no_cartesian(self, spark, sf_dir):
        # the composed chain inherits each stage's plan contract: no
        # all-pairs anywhere — dedup is explode->agg->agg->join, NB model
        # joins are equi/broadcast, KN5 crosses the occurrence stream
        # once. BroadcastNestedLoopJoin appears ONLY as the NB/KN bounded
        # 1-row / |classes|-row crossJoins (priors, vocab, totals) — the
        # same allowance the naive_bayes plan assert makes.
        plan = physical_plan(entry.q_ccnet_pipeline(spark, sf_dir))
        assert "CartesianProduct" not in plan
