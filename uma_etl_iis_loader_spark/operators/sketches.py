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
