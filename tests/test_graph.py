"""PageRank: agreement with a driver-side power-iteration reference,
conservation of rank mass, dangling-node handling, determinism."""

from __future__ import annotations

import pytest

from uma_etl_iis_loader_spark.operators.graph import pagerank


def _reference_pagerank(edges, damping=0.85, iters=100):
    """Pure-python power iteration with uniform dangling redistribution."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = {}
    for u, v in set(edges):
        out.setdefault(u, set()).add(v)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(rank[v] for v in nodes if v not in out)
        new = {}
        for v in nodes:
            new[v] = (1 - damping) / n + damping * dangling / n
        for u, targets in out.items():
            share = rank[u] / len(targets)
            for v in targets:
                new[v] += damping * share
        rank = new
    return rank


EDGE_SETS = {
    "chain_with_dangling": [(1, 2), (2, 3), (3, 4)],  # 4 dangles
    "star": [(1, 5), (2, 5), (3, 5), (4, 5), (5, 1)],
    "two_cliques_bridge": [
        (1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1),
        (3, 4),
        (4, 5), (5, 4), (5, 6), (6, 5), (4, 6), (6, 4),
    ],
}


@pytest.mark.parametrize("name", sorted(EDGE_SETS))
def test_pagerank_matches_reference(spark, name):
    edges = EDGE_SETS[name]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, tol=1e-10, max_iter=100).collect()}
    want = _reference_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6), (name, v)
    # rank mass is conserved exactly (dangling redistribution, not loss)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_duplicate_edges_collapse(spark):
    """A repeated edge must not double its weight (edge set, not bag)."""
    df1 = spark.createDataFrame([(1, 2), (1, 2), (2, 1)], "src long, dst long")
    df2 = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    r1 = {r.node: r.rank for r in pagerank(df1).collect()}
    r2 = {r.node: r.rank for r in pagerank(df2).collect()}
    for v in r2:
        assert r1[v] == pytest.approx(r2[v], abs=1e-12)


def test_pagerank_authority_ordering(spark):
    """The hub of a star graph out-ranks its spokes — the property
    downstream quality filters actually use."""
    df = spark.createDataFrame(EDGE_SETS["star"], "src long, dst long")
    ranks = {r.node: r.rank for r in pagerank(df).collect()}
    hub = ranks[5]
    assert all(hub > ranks[v] for v in (2, 3, 4))


@pytest.mark.parametrize("name", sorted(EDGE_SETS))
def test_pagerank_fixed_round_sql_path(spark, name):
    """tol=0 (fixed-round mode) builds the recurrence as one WITH-CTE
    plan (r12 optimization) — pin that it matches the pure-python
    reference run for the same round count, that mass is conserved, and
    that it agrees with the convergence path's arithmetic."""
    edges = EDGE_SETS[name]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, tol=0.0, max_iter=8).collect()}
    want = _reference_pagerank(edges, iters=8)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), (name, v)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_zero_rounds_returns_uniform(spark):
    """r13 (advice): tol=0 with max_iter=0 must return the uniform
    initial ranks, not None (the segment loop never runs)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1)], "src long, dst long"
    )
    out = pagerank(edges, max_iter=0, tol=0.0)
    rows = {r.node: r.rank for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert all(abs(v - 0.25) < 1e-12 for v in rows.values())


def test_fixed_round_segment_plan_bounded(spark):
    """r13: Catalyst inlines the fixed-round mode's multi-ref CTEs, so
    the OPTIMIZED tree holds ~2^seg copies of the leaf relations. seg=4
    measured 61 LogicalRDD leaves / ~25k plan chars per segment; seg=8
    would be ~16x that and re-open the multi-second analysis cliff
    (12 unsegmented rounds = 5.7 s, r12). Bound the blowup so a future
    edit to _FIXED_ROUND_SEG can't silently reintroduce it."""
    from uma_etl_iis_loader_spark.operators.graph import _FIXED_ROUND_SEG

    assert _FIXED_ROUND_SEG <= 5
    edges = spark.createDataFrame(
        [(i, (i * 7) % 20) for i in range(40)], "src long, dst long"
    )
    out = pagerank(edges, max_iter=_FIXED_ROUND_SEG, tol=0.0)  # one segment
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("LogicalRDD") <= 150, opt.count("LogicalRDD")
    assert len(opt) <= 120_000, len(opt)
