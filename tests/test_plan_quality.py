"""Physical-plan assertions: the scale properties we design for must be
visible in the plans Catalyst actually produces — broadcasts for dims,
filter/column pushdown into the parquet scan, no accidental cartesian or
sort-merge joins on dimension lookups."""

from __future__ import annotations

from uma_etl_iis_loader_spark.plans.registry import QUERIES


def _plan(spark, name, sf_dir):
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_flagship_uses_broadcast_joins_only(spark, sf_dir):
    plan = _plan(spark, "flagship_occupancy", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pricing_summary_pushes_filter_to_scan(spark, sf_dir):
    plan = _plan(spark, "agg_pricing_summary", sf_dir)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the 11-column lineitem scan reads only what Q1 needs
    assert "l_comment" not in plan
    assert "l_partkey" not in plan


def test_semi_and_anti_joins_broadcast(spark, sf_dir):
    for name in ("semi_join_fk_filter", "anti_join_deletion"):
        plan = _plan(spark, name, sf_dir)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    # map-side combine: HashAggregate appears below the exchange
    plan = _plan(spark, "agg_pricing_summary", sf_dir)
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_cube_and_grouping_sets_single_shuffle(spark, sf_dir):
    # Expand + one aggregation exchange — NOT one scan/shuffle per grouping
    for name in ("cube_order_totals", "grouping_sets_status_year"):
        plan = _plan(spark, name, sf_dir)
        assert "Expand" in plan, name
        assert plan.count("Scan parquet") == 1, name


def test_window_sorts_within_single_partition_exchange(spark, sf_dir):
    # lag + running sum share one window spec → one shuffle, one sort
    plan = _plan(spark, "window_lag_running_total", sf_dir)
    assert plan.count("Window") == 1
    assert "SortMergeJoin" not in plan


def test_ngram_jaccard_no_cartesian(spark, sf_dir):
    plan = _plan(spark, "dedup_ngram_jaccard", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tiled_cosine_single_shuffle_no_cartesian(spark, sf_dir):
    """The tiled exact cosine pair join must shuffle ONCE (replicated
    vectors grouped by tile pair) and never fall back to a cartesian —
    the whole point of replacing the crossJoin."""
    plan = _plan(spark, "dedup_embedding_cosine", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "FlatMapGroupsInPandas" in plan


def test_text_analysis_zero_shuffles(spark, sf_dir):
    """All seven per-document text features fuse into one narrow
    projection over a single scan — zero exchanges."""
    plan = _plan(spark, "text_analysis", sf_dir)
    assert "Exchange" not in plan
    assert plan.count("FileScan") == 1
