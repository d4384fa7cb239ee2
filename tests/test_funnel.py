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


# ---------------------------------------------------------------------------
# cohort_retention
# ---------------------------------------------------------------------------


def test_cohort_retention_golden(spark):
    from uma_etl_iis_loader_spark.operators.funnel import cohort_retention

    def _sec(s):
        return datetime(2024, 1, 1, 0, s // 60, s % 60)

    # epoch bucket base for 2024-01-01 00:00 (UTC), period = 60 s
    base = 1_704_067_200
    # users 1,2 start in period 0; user 3 starts period 1
    rows = [
        (1, _sec(5)), (1, _sec(65)),    # active periods 0, 1
        (2, _sec(10)),                  # active period 0 only
        (3, _sec(70)), (3, _sec(190)),  # starts period 1, back at rel 2
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r.cohort - base, r.period): (r.n_active, r.n_cohort, r.retention)
        for r in cohort_retention(df, period_s=60).collect()
    }
    assert out == {
        (0, 0): (2, 2, 1.0),
        (0, 1): (1, 2, 0.5),
        (60, 0): (1, 1, 1.0),
        (60, 2): (1, 1, 1.0),
    }


def test_cohort_retention_matches_brute_force(spark):
    """Random activity vs a python recomputation of the matrix; period-0
    retention is always 1.0 and max_periods bounds the output."""
    import random
    from collections import defaultdict

    from uma_etl_iis_loader_spark.operators.funnel import cohort_retention

    rng = random.Random(9)
    # random second in [0, 600)
    rows = [
        (u, datetime(2024, 1, 1, 0, rng.randrange(0, 10), rng.randrange(0, 60)))
        for u in range(60)
        for _ in range(5)
    ]
    period = 120
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort, r.period): (r.n_active, r.n_cohort)
        for r in cohort_retention(df, period_s=period, max_periods=3).collect()
    }

    base = datetime(1970, 1, 1)
    per_user = defaultdict(set)
    for u, t in rows:
        per_user[u].add(int((t - base).total_seconds()) // period * period)
    firsts = {u: min(ps) for u, ps in per_user.items()}
    cohort_n = defaultdict(int)
    for u, c in firsts.items():
        cohort_n[c] += 1
    want = defaultdict(int)
    for u, ps in per_user.items():
        c = firsts[u]
        for p in ps:
            rel = (p - c) // period
            if rel <= 3:
                want[(c, rel)] += 1
    expected = {k: (n, cohort_n[k[0]]) for k, n in want.items()}
    assert got == expected
    for (c, p), (n_active, n_cohort) in got.items():
        if p == 0:
            assert n_active == n_cohort
        assert p <= 3


def test_funnel_property_matches_python_reference(spark):
    """Hypothesis: for arbitrary small event sets, funnel_steps equals a
    direct python evaluation of the chain definition."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    event = st.tuples(
        st.integers(min_value=1, max_value=4),               # user
        st.sampled_from(["view", "click", "purchase", "x"]),  # type
        st.integers(min_value=0, max_value=30),              # minute
    )

    def reference(rows, steps):
        out = {}
        users = {u for u, e, _ in rows if e == steps[0]}
        for u in users:
            chain = []
            prev = None
            for s in steps:
                cand = [
                    m for uu, e, m in rows
                    if uu == u and e == s and (prev is None or m > prev)
                ]
                if not cand:
                    break
                prev = min(cand)
                chain.append(prev)
            if chain:
                out[u] = (len(chain), chain + [None] * (len(steps) - len(chain)))
        return out

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=st.lists(event, min_size=1, max_size=20))
    def inner(rows):
        steps = ["view", "click", "purchase"]
        df = spark.createDataFrame(
            [(u, e, _ts(m)) for u, e, m in rows],
            "user_id long, event_type string, ts timestamp",
        )
        got = {
            r.user_id: (r.depth, [r.t_1, r.t_2, r.t_3])
            for r in funnel_steps(df, steps).collect()
        }
        want = {
            u: (d, [(_ts(m) if m is not None else None) for m in chain])
            for u, (d, chain) in reference(rows, steps).items()
        }
        assert got == want

    inner()


def test_funnel_same_ts_policy(spark):
    """'inclusive' accepts an equal-timestamp progression the strict
    default rejects; on distinct timestamps both policies agree."""
    rows = [
        # u1: click co-timestamped with the view (coarse logger)
        (1, "view", 0), (1, "click", 0), (1, "purchase", 5),
        # u2: distinct timestamps throughout
        (2, "view", 1), (2, "click", 2), (2, "purchase", 3),
    ]
    df = _events(spark, rows)
    steps = ["view", "click", "purchase"]
    strict = {r.user_id: r.depth for r in funnel_steps(df, steps).collect()}
    incl = {
        r.user_id: r.depth
        for r in funnel_steps(df, steps, same_ts_policy="inclusive").collect()
    }
    assert strict[1] == 1  # click at t_1 not strictly after
    assert incl[1] == 3  # inclusive: co-timestamped click counts
    assert strict[2] == incl[2] == 3  # distinct timestamps: identical

    # distinct-timestamp equivalence over the whole fixture slice
    rows2 = [(u, e, u * 7 + m) for u, e, m in rows if u == 2] + [
        (3, "view", 10), (3, "click", 12), (3, "x", 13),
    ]
    df2 = _events(spark, rows2)
    a = {(r.user_id, r.depth) for r in funnel_steps(df2, steps).collect()}
    b = {
        (r.user_id, r.depth)
        for r in funnel_steps(df2, steps, same_ts_policy="inclusive").collect()
    }
    assert a == b


def test_funnel_window_from_first(spark):
    """'first' bounds the WHOLE funnel within max_gap_s of t_1 (the
    conversion-window definition); 'prev' bounds each hop. A chain whose
    hops are each short but whose total exceeds the window converts
    under 'prev' and not under 'first'."""
    rows = [
        # u1: hops of 4 min each — total 8 min from entry
        (1, "view", 0), (1, "click", 4), (1, "purchase", 8),
        # u2: converts fully inside 5 min of entry
        (2, "view", 0), (2, "click", 2), (2, "purchase", 4),
    ]
    df = _events(spark, rows)
    steps = ["view", "click", "purchase"]
    per_hop = {
        r.user_id: r.depth
        for r in funnel_steps(df, steps, max_gap_s=300).collect()
    }
    window = {
        r.user_id: r.depth
        for r in funnel_steps(
            df, steps, max_gap_s=300, window_from="first"
        ).collect()
    }
    assert per_hop[1] == 3  # each hop 4 min <= 5 min
    assert window[1] == 2  # purchase at +8 min falls out of the window
    assert per_hop[2] == window[2] == 3
    # no max_gap_s -> the flag is inert
    x = {
        (r.user_id, r.depth)
        for r in funnel_steps(df, steps, window_from="first").collect()
    }
    y = {(r.user_id, r.depth) for r in funnel_steps(df, steps).collect()}
    assert x == y


def test_funnel_policy_validation(spark):
    import pytest

    df = _events(spark, [(1, "view", 0), (1, "click", 1)])
    with pytest.raises(ValueError, match="same_ts_policy"):
        funnel_steps(df, ["view", "click"], same_ts_policy="loose")
    with pytest.raises(ValueError, match="window_from"):
        funnel_steps(df, ["view", "click"], window_from="entry")


def test_funnel_ignores_null_timestamps(spark):
    """NULL-ts events are excluded on both faces: a user whose only view
    is timestampless is NOT in the cohort; a NULL-ts click can't
    advance a chain."""
    from pyspark.sql import functions as F

    rows = [
        (1, "view", None),                      # cohort? no
        (2, "view", "2024-01-01 10:00:00"),
        (2, "click", None),                     # can't advance
        (2, "click", "2024-01-01 10:05:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.user_id: r.depth for r in funnel_steps(df, ["view", "click"]).collect()}
    assert 1 not in got
    assert got[2] == 2
