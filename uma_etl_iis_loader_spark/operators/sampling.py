"""Sampling operators for training-data pipelines.

Two tiers:

- ``stratified_sample`` — seeded per-stratum Bernoulli sampling
  (``sampleBy``): the map-side, shuffle-free way to downsample a corpus
  while controlling per-class rates. Sampling decisions are per-row PRNG
  draws — deterministic for a fixed seed AND fixed partitioning, but not
  reproducible across engines (rows-only driver check; rate/determinism
  bounds pinned in tests/test_sampling.py).

- ``deterministic_split`` — train/val/test assignment by Knuth
  multiplicative hashing of a stable id: bucket = ((id * 2654435761)
  mod 2^32) mod ``buckets``, then cumulative-weight thresholds. Pure
  integer arithmetic → identical in any engine (exact DuckDB oracle),
  stable under repartitioning and incremental appends — the property
  that matters at 100 TB: a document's split NEVER changes when the
  corpus grows, so train/test contamination can't creep in across
  pipeline runs. Zero shuffles: one narrow projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Knuth's multiplicative constant (2^32 / phi)
_KNUTH = 2654435761
_M32 = 4294967296


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample: keep ~fractions[v] of rows whose
    ``strata_col`` equals v (strata absent from the dict are dropped,
    matching ``sampleBy`` semantics)."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def hash_stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    salt: int = 1013904223,
    buckets: int = 10000,
) -> DataFrame:
    """Deterministic stratified sample: keep a row iff its salted hash
    bucket falls below fractions[stratum]·buckets (strata absent from the
    dict are dropped, matching ``sampleBy``). Same multiplicative-hash
    family as ``deterministic_split`` but salted so sample membership is
    independent of split assignment. Engine-independent integer
    arithmetic — exactly reproducible (DuckDB oracle), repartition- and
    append-stable, zero shuffles."""
    c = F.col(id_col)
    b = F.pmod(F.pmod(c * F.lit(_KNUTH) + F.lit(salt), F.lit(_M32)), F.lit(buckets))
    thresh = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        cut = F.lit(int(round(frac * buckets)))
        thresh = F.when(cond, cut) if thresh is None else thresh.when(cond, cut)
    thresh = thresh.otherwise(F.lit(0)) if thresh is not None else F.lit(0)
    return df.filter(b < thresh)


def split_bucket(id_col, buckets: int = 10000):
    """Deterministic hash bucket 0..buckets-1 from an integer id column."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(F.pmod(c * F.lit(_KNUTH), F.lit(_M32)), F.lit(buckets))


def deterministic_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    buckets: int = 10000,
) -> DataFrame:
    """Append a ``split`` column ('train'/'val'/... per ``weights``,
    default 90/5/5) assigned by hash bucket — engine-independent,
    repartition-stable, append-stable."""
    weights = weights or {"train": 0.90, "val": 0.05, "test": 0.05}
    b = split_bucket(id_col, buckets)
    acc = 0.0
    expr = None
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = b < int(round(acc * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn("split", expr)


def temperature_mixture(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    budget: int,
    alpha: float = 0.5,
    salt: int = 1013904223,
) -> tuple[DataFrame, dict[str, float]]:
    """Temperature-rebalanced domain mixture: sample ``budget`` rows
    total with per-domain shares ∝ n_i^alpha (the published multilingual
    temperature-sampling recipe — alpha=1 keeps the natural distribution,
    alpha→0 approaches uniform-over-domains; 0.3-0.7 are the values the
    multilingual-pretraining literature uses to keep head domains from
    drowning the tail).

    Two-step: ONE aggregation computes exact per-domain counts (the only
    shuffle; domains are driver-sized by definition), shares and
    per-domain keep-rates derive arithmetically (rates cap at 1.0 — a
    tail domain smaller than its target contributes all it has rather
    than oversampling), then membership is the deterministic salted-hash
    filter of ``hash_stratified_sample`` — append- and repartition-stable
    like every sampling op here. Returns (sampled_df, rates) so the
    caller can log/persist the realized mixture."""
    counts = {
        r[0]: r[1]
        for r in df.groupBy(strata_col).count().collect()
        if r[0] is not None
    }
    rates = temperature_rates(counts, budget, alpha)
    if not rates:
        return df.limit(0), {}
    return hash_stratified_sample(df, id_col, strata_col, rates, salt), rates


def temperature_rates(
    counts: dict[str, int], budget: int, alpha: float
) -> dict[str, float]:
    """Pure rate arithmetic behind :func:`temperature_mixture` (separated
    so the invariants are property-testable without a SparkSession):
    share_i ∝ n_i^alpha, keep-rate_i = min(1, budget·share_i / n_i)."""
    if not counts or budget <= 0:
        return {}
    weights = {s: n**alpha for s, n in counts.items()}
    z = sum(weights.values())
    return {
        s: min(1.0, (budget * w / z) / counts[s]) for s, w in weights.items()
    }
