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


def build_cms_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """One Count-Min sketch per group unit: (group_cols..., cms binary)
    — the mergeable POINT-FREQUENCY / heavy-hitter primitive the
    HLL (distincts) / Theta (set algebra) / KLL (quantiles) families
    don't cover. Spark's built-in `count_min_sketch` aggregate (public
    `org.apache.spark.util.sketch.CountMinSketch` format): width =
    ceil(2/eps) counters x depth = ceil(ln(1/(1-confidence))) rows, a
    few hundred KB at the defaults, built map-side-combining in one
    narrow agg per shard.

    Guarantees (Cormode & Muthukrishnan 2005): estimate >= true count
    ALWAYS (no underestimates), and estimate <= true + eps*N with
    probability >= confidence per query. Sketches built with the SAME
    (eps, confidence, seed) merge LOSSLESSLY (counter-wise sum), so
    per-day shards answer any rolling-window frequency question without
    rescanning facts — pinned exactly in tests."""
    return df.groupBy(*group_cols).agg(
        F.expr(
            f"count_min_sketch({value_col}, CAST({eps} AS DOUBLE), "
            f"CAST({confidence} AS DOUBLE), {seed})"
        ).alias("cms")
    )


def merge_cms(spark, sketches: DataFrame, cms_col: str = "cms"):
    """Merge persisted CMS binaries into ONE driver-side
    ``CountMinSketch`` (the public Spark class). Sketch blobs are
    KB-sized by construction and one-per-shard — a bounded driver
    collect, the same class of driver data as IVF centroids. Returns
    the merged JVM sketch; query with ``estimateCount`` (via
    :func:`cms_point_estimates` for a DataFrame-shaped answer)."""
    rows = sketches.select(cms_col).collect()
    if not rows:
        return None
    jcls = spark._jvm.org.apache.spark.util.sketch.CountMinSketch
    merged = None
    for r in rows:
        s = jcls.readFrom(bytearray(r[cms_col]))
        merged = s if merged is None else merged.mergeInPlace(s)
    return merged


def cms_point_estimates(spark, sketches: DataFrame, keys, cms_col: str = "cms"):
    """{key: estimated count} over the merged shard sketches for a
    driver-sized key list (heavy-hitter candidates, a dimension's
    domain). Estimates are deterministic given the build seed."""
    merged = merge_cms(spark, sketches, cms_col)
    if merged is None:
        return {k: 0 for k in keys}
    return {k: int(merged.estimateCount(k)) for k in keys}
