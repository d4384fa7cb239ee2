"""Ordered-event funnel analysis: per-key earliest strictly-ordered
step chain (view → click → purchase), the conversion primitive of
event analytics.

Semantics: ``t_1`` = earliest step-1 event per key; ``t_i`` = earliest
step-i event STRICTLY after ``t_{i-1}`` (and, with ``max_gap_s``,
within that many seconds of it). A key appears in the output iff it
reached step 1 (the funnel cohort); unreached steps are NULL and
``depth`` counts the reached prefix. Deterministic: every step picks a
``min`` timestamp — no scan-order dependence.

Scale shape: the input is filtered to the step events once (narrow),
then each step is one keyed join + min-aggregation over (key, ts)
PAIRS only — shuffle volume is step-event counts, never the raw event
stream; hot keys reduce through partial min. Steps are a fixed small
list (funnels are 3-6 steps), so the chain length is bounded and each
round's state is one row per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cohort_retention", "funnel_steps"]


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    key: str = "user_id",
    event_col: str = "event_type",
    ts_col: str = "ts",
    max_gap_s: int | None = None,
    same_ts_policy: str = "strict",
    window_from: str = "prev",
) -> DataFrame:
    """(key, t_1..t_n timestamp, depth int) for every key that reached
    ``steps[0]``. See module docstring for semantics.

    Policy flags (the two axes real funnel tools disagree on):

    - ``same_ts_policy``: ``"strict"`` (default) requires step i
      STRICTLY after step i-1 (``>``); ``"inclusive"`` accepts an
      equal timestamp (``>=``) — the convention of systems whose event
      time is coarse (second-granularity loggers emit co-timestamped
      view+click pairs that strict ordering would reject). On data with
      distinct timestamps the two are identical (property-pinned).
      Inclusive semantics are per-SLOT minimums with event REUSE: each
      slot independently takes the earliest qualifying event, so one
      event can satisfy several co-timestamped slots — in particular a
      repeated-step funnel (['view','view']) reports depth 2 from a
      single view under 'inclusive' (t_2 == t_1). Use 'strict' when
      each step must be witnessed by a distinct later event. The
      streaming face reproduces these semantics exactly (co-timestamped
      groups iterate to a fixpoint in the updater).
    - ``window_from``: with ``max_gap_s``, ``"prev"`` (default) bounds
      each step's gap FROM THE PREVIOUS step (per-hop timeout);
      ``"first"`` bounds every step within ``max_gap_s`` of ``t_1`` —
      the "conversion window" definition (complete the whole funnel
      within N days of entering it). ``"first"`` is never more
      permissive per-hop than ``"prev"`` with the same gap is from
      step 1's side; with no ``max_gap_s`` the flag is inert.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    if same_ts_policy not in ("strict", "inclusive"):
        raise ValueError(f"same_ts_policy must be strict|inclusive, got {same_ts_policy}")
    if window_from not in ("prev", "first"):
        raise ValueError(f"window_from must be prev|first, got {window_from}")
    # NULL-timestamp events carry no ordering signal: excluded up front
    # (otherwise min() vs NULL-comparison semantics make a user whose
    # ONLY step-1 events are timestampless appear with t_1 NULL in the
    # batch face but never emit in the streaming face)
    relevant = events.filter(
        F.col(event_col).isin(list(steps)) & F.col(ts_col).isNotNull()
    ).select(key, event_col, ts_col)
    out = (
        relevant.filter(F.col(event_col) == steps[0])
        .groupBy(key)
        .agg(F.min(ts_col).alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t_{i - 1}"
        nxt = relevant.filter(F.col(event_col) == step).select(
            key, F.col(ts_col).alias("__nt")
        )
        if same_ts_policy == "strict":
            cond = F.col("__nt") > F.col(prev)
        else:
            cond = F.col("__nt") >= F.col(prev)
        if max_gap_s is not None:
            anchor = "t_1" if window_from == "first" else prev
            cond = cond & (
                F.col("__nt")
                <= F.col(anchor) + F.expr(f"INTERVAL {int(max_gap_s)} SECONDS")
            )
        prior = [f"t_{j}" for j in range(1, i)]
        out = (
            out.join(nxt, key, "left")
            .groupBy(key)
            .agg(
                # priors are constant per key — min() re-emits them
                *[F.min(c).alias(c) for c in prior],
                F.min(F.when(cond, F.col("__nt"))).alias(f"t_{i}"),
            )
        )
    depth = F.lit(1)
    for i in range(2, len(steps) + 1):
        depth = depth + F.col(f"t_{i}").isNotNull().cast("int")
    return out.withColumn("depth", depth.cast("int"))


def cohort_retention(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    period_s: int = 7 * 86_400,
    max_periods: int = 12,
) -> DataFrame:
    """Cohort retention matrix: (cohort bigint, period int, n_active
    bigint, n_cohort bigint, retention double) — cohort = the period
    (epoch-seconds bucket of ``period_s``) of a key's FIRST activity,
    ``n_active`` = distinct keys of that cohort active again exactly
    ``period`` periods later (period 0 = the cohort size itself,
    retention 1.0 by construction).

    Plan shape: one min-agg for first-activity (map-side partial), one
    distinct over (key, period-bucket) — activity collapses to ≤
    max_periods+1 rows per key BEFORE the join — then a broadcast-size
    cohort join and one count agg. Shuffles scale with distinct
    (key, period) pairs, never raw events; ``max_periods`` bounds the
    matrix (later activity is simply not reported, not wrong).
    """
    epoch = F.col(ts_col).cast("timestamp").cast("double")
    bucket = (F.floor(epoch / period_s) * period_s).cast("long")
    activity = events.select(F.col(key), bucket.alias("__p")).distinct()
    firsts = activity.groupBy(key).agg(F.min("__p").alias("cohort"))
    cohort_sizes = firsts.groupBy("cohort").agg(
        F.count("*").alias("n_cohort")
    )
    joined = (
        activity.join(firsts, key)
        .select(
            "cohort",
            ((F.col("__p") - F.col("cohort")) / period_s).cast("int").alias("period"),
            F.col(key),
        )
        .filter(F.col("period") <= max_periods)
        .distinct()
    )
    return (
        joined.groupBy("cohort", "period")
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(cohort_sizes), "cohort")
        .select(
            "cohort",
            "period",
            "n_active",
            "n_cohort",
            F.round(F.col("n_active") / F.col("n_cohort"), 6).alias("retention"),
        )
    )
