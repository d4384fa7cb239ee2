"""Mergeable distinct-count sketches (Apache DataSketches HLL via the
Spark built-ins): build once per partition-unit (day / shard / source),
persist the binary sketches, and answer any rolling or regrouped
distinct-count question by UNIONING sketches — never rescanning the
fact data.

The warehouse pattern at 100 TB: an exact `count(DISTINCT user)` over a
rolling 30-day window re-shuffles a month of events on every question;
per-day sketches are built once in the daily load (one narrow agg per
day), are a few KB each, and any window/regrouping is an
O(days×groups) union over the sketch table. HLL union at equal lgK is
LOSSLESS: the union of per-day sketches is byte-equivalent in estimate
to one sketch built over the whole window (law pytest-pinned), so
pre-aggregation costs no accuracy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """One HLL sketch per group: (group_cols..., sketch binary).
    ``lgk`` trades size for error (2^lgk buckets; 12 → ~1.6% RSE, ~2.5
    KB). Sketches at the SAME lgk merge losslessly; persist this next to
    the partition unit it summarizes (day, shard, source)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sketch")
    )


def merge_distinct_sketches(
    sketches: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """Re-aggregate persisted sketches to any coarser grouping:
    (group_cols..., approx_distinct). The union is a partial-aggregatable
    binary op — Spark combines map-side, so merging a year of daily
    sketches shuffles KBs per group."""
    agg = F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
        "approx_distinct"
    )
    if group_cols:
        return sketches.groupBy(*group_cols).agg(agg)
    return sketches.agg(agg)


def build_theta_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """One Theta sketch per group: (group_cols..., tsketch). Unlike HLL,
    Theta sketches support set ALGEBRA — intersection and difference —
    so 'distinct users who did BOTH X and Y' (audience overlap) is a
    sketch op, not a re-scan. Sketches are exact below the nominal
    entry count and ~2% RSE beyond it."""
    return df.groupBy(*group_cols).agg(
        F.theta_sketch_agg(value_col).alias("tsketch")
    )


def theta_pair_overlap(sketches: DataFrame, key_col: str) -> DataFrame:
    """All ordered pairs (a < b by ``key_col``) with the estimated
    distinct-count of intersection, difference (a minus b), and union —
    computed entirely from the persisted sketches (the fact table is
    never touched). The sketch table is one row per group (tiny), so the
    pair join broadcasts."""
    a, b = sketches.alias("a"), sketches.alias("b")
    ka, kb = F.col(f"a.{key_col}"), F.col(f"b.{key_col}")
    return a.join(F.broadcast(b), ka < kb).select(
        ka.alias("key_a"),
        kb.alias("key_b"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("a.tsketch"), F.col("b.tsketch"))
        ).alias("common"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("a.tsketch"), F.col("b.tsketch"))
        ).alias("only_a"),
        F.theta_sketch_estimate(
            F.theta_union(F.col("a.tsketch"), F.col("b.tsketch"))
        ).alias("either"),
    )


def build_quantile_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 200,
) -> DataFrame:
    """One KLL(double) sketch per group unit: (group_cols..., qsketch).
    ``k`` trades size for rank error (200 → ~1.65% normalized rank error
    at 99% confidence). Like the HLL family: build once per day/shard,
    answer any regrouped quantile question by merging."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(value_col, F.lit(k)).alias("qsketch")
    )


def merge_quantile_sketches(
    sketches: DataFrame,
    group_cols: list[str],
    probs: dict[str, float],
) -> DataFrame:
    """Merge persisted KLL sketches to a coarser grouping and extract
    quantiles: one output column per ``probs`` entry (name → p). KLL
    merge keeps the rank-error guarantee (unlike naively averaging
    per-shard quantiles, which has NO error bound — the classic wrong
    way to combine percentiles)."""
    agg = F.kll_merge_agg_double("qsketch").alias("qsketch")
    merged = (
        sketches.groupBy(*group_cols).agg(agg)
        if group_cols
        else sketches.agg(agg)
    )
    return merged.select(
        *group_cols,
        *[
            F.kll_sketch_get_quantile_double("qsketch", F.lit(p)).alias(name)
            for name, p in probs.items()
        ],
    )
