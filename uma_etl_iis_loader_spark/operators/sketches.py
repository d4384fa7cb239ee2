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
    :func:`cms_point_estimates` for a DataFrame-shaped answer).

    For shard counts where even collecting the blobs is unreasonable
    (10⁵+ units), :func:`merge_cms_distributed` performs the same
    counter-wise sum as a partial-aggregatable Spark job and returns a
    single merged blob — bit-identical to this path (law pinned in
    tests/test_approx.py)."""
    rows = sketches.select(cms_col).collect()
    if not rows:
        return None
    jcls = spark._jvm.org.apache.spark.util.sketch.CountMinSketch
    merged = None
    for r in rows:
        s = jcls.readFrom(bytearray(r[cms_col]))
        merged = s if merged is None else merged.mergeInPlace(s)
    return merged


# Public serialized layout of org.apache.spark.util.sketch.CountMinSketch
# (CountMinSketchImpl.writeTo, DataOutputStream => big-endian), all
# fixed-length given (depth, width):
#   int32  version (1)
#   int64  totalCount
#   int32  depth
#   int32  width
#   int64  hashA[depth]          -- the seeded hash coefficients
#   int64  table[depth][width]   -- the counters
# Two sketches built with the same (eps, confidence, seed) share
# (depth, width, hashA); their merge is totalCount-sum + counter-wise
# table-sum — a commutative, associative binary op, i.e. exactly the
# shape Spark partial aggregation wants.
_CMS_HEADER = 4 + 8 + 4 + 4


def _cms_meta(blob: bytes):
    """(version, total, depth, width) from a serialized sketch."""
    import struct

    version, total, depth, width = struct.unpack_from(">iqii", blob, 0)
    if version != 1:
        raise ValueError(f"unsupported CountMinSketch version {version}")
    expect = _CMS_HEADER + 8 * depth + 8 * depth * width
    if len(blob) != expect:
        raise ValueError(
            f"CMS blob length {len(blob)} != expected {expect} for "
            f"depth={depth} width={width}"
        )
    return version, total, depth, width


def _cms_merge_blobs(blobs) -> bytes:
    """Counter-wise sum of same-parameter CMS blobs in numpy — byte-equal
    to the JVM ``mergeInPlace`` chain (pytest-pinned)."""
    import struct

    import numpy as np

    it = iter(blobs)
    first = bytes(next(it))
    _, total, depth, width = _cms_meta(first)
    hash_end = _CMS_HEADER + 8 * depth
    hash_a = first[_CMS_HEADER:hash_end]
    table = np.frombuffer(first[hash_end:], dtype=">i8").astype(np.int64)
    for b in it:
        b = bytes(b)
        _, t, d, w = _cms_meta(b)
        if (d, w) != (depth, width) or b[_CMS_HEADER:hash_end] != hash_a:
            raise ValueError(
                "CMS merge requires identical (eps, confidence, seed): "
                "depth/width/hash coefficients differ between shards"
            )
        total += t
        table += np.frombuffer(b[hash_end:], dtype=">i8")
    return (
        struct.pack(">iqii", 1, total, depth, width)
        + hash_a
        + table.astype(">i8").tobytes()
    )


def merge_cms_distributed(
    sketches: DataFrame,
    cms_col: str = "cms",
    partials: int = 32,
) -> DataFrame:
    """Merge an UNBOUNDED number of CMS shard blobs without collecting
    them: a two-level partial-aggregation tree over the public
    serialized layout. Level 1 hash-buckets shards into ``partials``
    groups and counter-sums each group in an Arrow-batched kernel;
    level 2 sums the ≤``partials`` group blobs into one. Shuffle volume
    is ``partials + 1`` KB-sized blobs regardless of shard count — the
    10⁵-shard case the driver loop in :func:`merge_cms` shouldn't eat.

    Returns a one-row DataFrame ``(cms binary)`` whose blob is
    BIT-IDENTICAL to the driver merge and to one sketch built globally
    with the same parameters (integer counter sums are exact and
    order-independent; law pinned in tests/test_approx.py); an EMPTY
    input yields zero rows (the distributed analogue of ``merge_cms``
    returning None — check before indexing into the result). Feed it
    back through ``merge_cms`` / ``cms_point_estimates`` to query."""
    import pandas as pd

    def level(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"cms": pd.Series(dtype=object)})
        return pd.DataFrame({"cms": [_cms_merge_blobs(pdf["cms"])]})

    one = (
        sketches.select(F.col(cms_col).alias("cms"))
        .withColumn("__g", F.pmod(F.xxhash64("cms"), F.lit(partials)))
        .groupBy("__g")
        .applyInPandas(lambda pdf: level(pdf), "cms binary")
    )
    return (
        one.withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(lambda pdf: level(pdf), "cms binary")
    )


def cms_point_estimates(spark, sketches: DataFrame, keys, cms_col: str = "cms"):
    """{key: estimated count} over the merged shard sketches for a
    driver-sized key list (heavy-hitter candidates, a dimension's
    domain). Estimates are deterministic given the build seed."""
    merged = merge_cms(spark, sketches, cms_col)
    if merged is None:
        return {k: 0 for k in keys}
    return {k: int(merged.estimateCount(k)) for k in keys}
