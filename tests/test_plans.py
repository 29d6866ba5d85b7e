"""Physical-plan assertions — the 100 TB posture, checked.

Correctness says the operator works at sf0.01; these tests pin the
*plan shapes* that make it work at 1000 executors: dimension joins must
broadcast (no shuffle of the big side), scans must prune columns and
push predicates into the parquet reader, top-k must compile to
TakeOrderedAndProject (no global sort), per-group top-N must insert the
pre-shuffle WindowGroupLimit, and the range join must never fall back
to a nested-loop/cartesian plan."""

from __future__ import annotations

import re

from movie_data_etl_pipeline_spark.plans.fixture_queries import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_dim_join_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "v1_top_actors")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan  # dim side must not shuffle-sort


def test_scan_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "v1_top_actors")
    # the lineitem scan must read exactly the join + agg keys, none of
    # the 14 other columns
    scans = [l for l in plan.split("\n") if "lineitem.parquet" in l]
    assert scans and re.search(r"FileScan parquet \[l_orderkey#\d+L?,l_suppkey#\d+L?\]", scans[0]), scans


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, plan


def test_topk_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "t5_top20")
    assert "TakeOrderedAndProject(limit=20" in plan, plan
    assert "rangepartitioning" not in plan  # LIMIT must avoid the global sort


def test_per_group_topn_has_group_limit(spark, sf_dir):
    plan = _plan(spark, sf_dir, "o7_top_n_per_group")
    # Spark 3.5+/4.x WindowGroupLimit: partial top-N before the shuffle
    assert "WindowGroupLimit" in plan, plan


def test_range_join_never_nested_loop(spark, sf_dir):
    plan = _plan(spark, sf_dir, "rj_range_join")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan


def test_asof_join_is_single_window_pass(spark, sf_dir):
    plan = _plan(spark, sf_dir, "aj_asof_join")
    # the as-of join must be union+window, not a join at all
    assert "Join" not in plan, plan
    assert plan.count("Window") >= 1


def test_agg_has_partial_phase(spark, sf_dir):
    plan = _plan(spark, sf_dir, "st_tumbling")
    # map-side combine: two HashAggregates around one exchange
    assert plan.count("HashAggregate") >= 2, plan


def test_q5_broadcasts_dims_and_pushes_date(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_local_supplier_volume")
    # region, nation, supplier (and customer at fixture sizes) broadcast;
    # the only allowed shuffle join is the orders⋈lineitem fact side
    assert plan.count("BroadcastHashJoin") >= 3, plan
    # the orders date-range filter must reach the parquet reader
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in plan, plan


def test_q6_all_filters_pushed(spark, sf_dir):
    # executedPlan().toString() truncates long scan descriptions, so use
    # the formatted explain, which prints PushedFilters in full
    qe = QUERIES["q6_revenue_delta"](spark, sf_dir)._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = qe.explainString(mode)
    # every predicate must reach the parquet reader — at 100 TB this is
    # the difference between scanning a year and scanning the table
    assert "PushedFilters: [" in plan, plan
    for frag in [
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.02)",
        "LessThanOrEqual(l_discount,0.06)",
        "LessThan(l_quantity,24.0)",
    ]:
        assert frag in plan, (frag, plan)


def test_scalar_surface_single_codegen_no_exchange(spark, sf_dir):
    plan = _plan(spark, sf_dir, "fn_scalar_surface")
    assert "Exchange" not in plan, plan  # pure projection: no shuffle
    assert plan.lstrip().startswith("*(1)"), plan  # one codegen span covers it
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_q4_exists_compiles_to_semi_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q4_order_priority")
    # correlated EXISTS must become one semi join carrying the extra
    # inequality — never a rewrite through distinct+inner join
    assert "LeftSemi" in plan, plan
    assert "l_shipdate" in plan and "o_orderdate" in plan
    # the quarter filter prunes the orders scan before the join
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in plan, plan


def test_q10_topk_and_returnflag_pushdown(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q10_returned_items")
    assert "TakeOrderedAndProject(limit=20" in plan, plan
    assert "rangepartitioning" not in plan  # top-k, not a global sort
    assert "EqualTo(l_returnflag,R)" in plan, plan  # filter reaches the scan


def test_q18_agg_side_builds_hash_table(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q18_large_orders")
    # the aggregated >threshold orderkey set is small: it must be the
    # build side of a broadcast join, not force a sort-merge of orders
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject(limit=100" in plan, plan


def test_ts_gapfill_generates_grid_without_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ts_gapfill")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert "Generate explode" in plan, plan  # the day grid is generated, not stored


def test_q21_single_lineitem_scan(spark, sf_dir):
    # the EXISTS + NOT EXISTS pair is answered by window aggregates over
    # one (order, supplier, late) relation — the textbook three scans of
    # lineitem must collapse to exactly one
    plan = _plan(spark, sf_dir, "q21_waiting_suppliers")
    assert plan.count("lineitem.parquet") == 1, plan
    assert "WindowExec" in plan or "Window" in plan, plan


def test_centroid_aggregation_stays_jvm_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sim_label_centroids")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "Generate posexplode" in plan, plan


def test_q19_disjunction_stays_hash_join(spark, sf_dir):
    # the OR of brand×quantity bands shares a partkey equality — the
    # optimizer must extract it and keep a hash join; a nested-loop
    # here would be quadratic at scale
    plan = _plan(spark, sf_dir, "q19_disjunctive_revenue")
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan


def test_q20_single_lineitem_scan(spark, sf_dir):
    # both nested aggregates (1996 qty, all-time qty) come from ONE
    # conditional-sum pass — the correlated-subquery double scan is gone
    plan = _plan(spark, sf_dir, "q20_concentrated_suppliers")
    assert plan.count("lineitem.parquet") == 1, plan


# ---------------------------------------------------------------------------
# Wave 8-19 plan pins
# ---------------------------------------------------------------------------


def test_m4_window_is_bucket_partitioned(spark, sf_dir):
    """The M4 full-frame window must be PARTITIONED by the hour
    bucket — an unpartitioned frame would serialize the series."""
    plan = _plan(spark, sf_dir, "ts_m4_downsample")
    m = re.search(r"Window .*windowspecdefinition\(h#\d+", plan)
    assert m, plan


def test_target_encode_is_broadcast_no_fact_shuffle(spark, sf_dir):
    """The category aggregate must broadcast back into the fact scan;
    the fact table itself must not shuffle (no SortMergeJoin, no
    hash-partitioned exchange of the orders scan)."""
    plan = _plan(spark, sf_dir, "fe_target_encode")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_pareto_front_has_no_pairwise_join(spark, sf_dir):
    """The skyline must come from the sort-scan identity — any
    nested-loop/cartesian means the O(n²) formulation snuck back."""
    plan = _plan(spark, sf_dir, "w8_pareto_front")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interleave_has_no_global_sort_before_limit(spark, sf_dir):
    """Global position is COMPUTED (rank·S + idx), not sorted for:
    apart from the final presentation orderBy, the only sorts allowed
    are the per-source window sorts (partitioned by source)."""
    plan = _plan(spark, sf_dir, "px_interleave_order")
    # per-source rank window must be partitioned
    assert re.search(r"windowspecdefinition\(source#\d+", plan), plan


def test_trigram_posting_filter_is_inside_projection(spark, sf_dir):
    """The needle-trigram filter must run before the distinct/groupBy
    (the posting list materialized is needle-bounded, not |text|):
    the explode feeds a Filter with the IN list, not a bare
    aggregation of all trigrams."""
    plan = _plan(spark, sf_dir, "ix_trigram_search")
    # Catalyst collapses the projection, so the filter appears over the
    # inlined substring expression with the literal needle-trigram set
    assert re.search(r"Filter .*substring\(.*\) IN \(", plan), plan


def test_content_dedup_shuffles_digests_not_payloads(spark, sf_dir):
    """The CAS grouping must aggregate on the digest — the binary
    payload column may appear only below the first projection, never
    in an exchange."""
    plan = _plan(spark, sf_dir, "mm_content_dedup")
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "payload" not in line, line


def test_cohort_ltv_no_extra_fact_exchange(spark, sf_dir):
    """Cohorting (first-month window) and the month aggregation share
    the o_custkey shuffle: at most 1 hash exchange may carry the
    orders fact before the cohort-grain aggregation (the window and
    the groupBy reuse it), plus bounded-grain exchanges after."""
    plan = _plan(spark, sf_dir, "ag_cohort_ltv")
    fact_exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning(o_custkey" in ln
    ]
    assert len(fact_exchanges) <= 2, plan
