"""Funnel semantics: strictly-ordered earliest chain, cohort rows only,
max-gap window, determinism under repartitioning."""

from __future__ import annotations

from datetime import datetime

from uma_etl_iis_loader_spark.operators.funnel import funnel_steps


def _ts(m):
    return datetime(2024, 1, 1, 0, m)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, e, _ts(m)) for u, e, m in rows],
        "user_id long, event_type string, ts timestamp",
    )


def test_funnel_golden(spark):
    rows = [
        # u1: full conversion in order
        (1, "view", 0), (1, "click", 5), (1, "purchase", 9),
        # u2: clicked BEFORE first view — click must not count
        (2, "click", 1), (2, "view", 2), (2, "purchase", 3),
        # u3: view only
        (3, "view", 4),
        # u4: no view at all -> not in the cohort
        (4, "click", 1), (4, "purchase", 2),
        # u5: equal timestamps — strictly-after excludes the tie
        (5, "view", 7), (5, "click", 7),
    ]
    out = {
        r.user_id: (r.depth, r.t_1, r.t_2, r.t_3)
        for r in funnel_steps(
            _events(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert set(out) == {1, 2, 3, 5}
    assert out[1] == (3, _ts(0), _ts(5), _ts(9))
    # u2: the chain is STRICT — with no valid click (t_2 NULL), the
    # purchase at t=3 cannot count either, so depth stays 1
    assert out[2] == (1, _ts(2), None, None)
    assert out[3] == (1, _ts(4), None, None)
    assert out[5] == (1, _ts(7), None, None)


def test_funnel_earliest_chain_not_any_chain(spark):
    """t_i is the EARLIEST valid step-i time — later matches don't move
    earlier anchors (min per step, chained)."""
    rows = [
        (1, "view", 0), (1, "view", 3),
        (1, "click", 1), (1, "click", 8),
        (1, "purchase", 2),
    ]
    r = funnel_steps(_events(spark, rows), ["view", "click", "purchase"]).collect()[0]
    assert (r.t_1, r.t_2, r.t_3, r.depth) == (_ts(0), _ts(1), _ts(2), 3)


def test_funnel_max_gap(spark):
    rows = [
        (1, "view", 0), (1, "click", 30),   # outside a 10-min gap
        (2, "view", 0), (2, "click", 8),    # inside
    ]
    out = {
        r.user_id: r.depth
        for r in funnel_steps(
            _events(spark, rows), ["view", "click"], max_gap_s=600
        ).collect()
    }
    assert out == {1: 1, 2: 2}


def test_funnel_deterministic_under_repartition(spark):
    import random

    rng = random.Random(3)
    rows = [
        (u, rng.choice(["view", "click", "purchase", "error"]), rng.randrange(0, 59))
        for u in range(40)
        for _ in range(6)
    ]
    ev = _events(spark, rows)
    a = {
        (r.user_id, r.depth, r.t_1, r.t_2, r.t_3)
        for r in funnel_steps(ev, ["view", "click", "purchase"]).collect()
    }
    b = {
        (r.user_id, r.depth, r.t_1, r.t_2, r.t_3)
        for r in funnel_steps(
            ev.repartition(13), ["view", "click", "purchase"]
        ).collect()
    }
    assert a == b and a
