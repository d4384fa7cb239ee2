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


def _portable_hash64(cols, seed: int):
    """60-bit md5-prefix hash of ':'-joined column strings + seed —
    bit-identical in DuckDB as ``CAST('0x' || substr(md5(c1 || ':' ||
    … || ':<seed>'), 1, 15) AS BIGINT)`` (the DSIR portable-feature
    precedent). Slower than xxhash64; used by the ``portable_hash``
    faces of the samplers so their FULL draw is oracle-replayable.

    NULL caveat: ``concat_ws`` SKIPS null parts while SQL ``||``
    propagates NULL — keep NULL keys out of portable-hash draws (the
    samplers hash non-null ids by contract; the adjudication fixtures
    carry none)."""
    parts = [
        (F.col(c) if isinstance(c, str) else c).cast("string")
        for c in cols
    ]
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", *parts, F.lit(str(seed)))), 1, 15),
        16,
        10,
    ).cast("long")


def negative_sample_buckets(n_items: int, k: int, target: int = 32) -> int:
    """Deterministic bucket count for :func:`negative_sample`:
    ``ceil(n_items / target)`` — pure integer arithmetic from the one
    corpus scalar, so expected items per bucket is EXACTLY ~``target``
    at every corpus size (an earlier power-of-two floor let bucket
    size drift across [target, 2·target), which showed up as a 1.9x
    extra candidate constant at the 10x scale step). Floored at ``k``
    (an anchor addresses k DISTINCT buckets). Constant bucket size is
    what keeps candidates linear in |anchors|·k under corpus growth."""
    return max((max(n_items, 1) + target - 1) // target, max(k, 1))


def negative_sample(
    anchors: DataFrame,
    corpus: DataFrame,
    k: int,
    anchor_id: str = "anchor_id",
    item_id: str = "item_id",
    positives: DataFrame | None = None,
    buckets: int | None = None,
    seed: int = 0,
    portable_hash: bool = False,
) -> DataFrame:
    """k pseudo-random negatives per anchor for contrastive training
    pairs — deterministic (same inputs → same samples, any partitioning)
    and scale-safe (no per-anchor corpus scan, no driver-side sampling).

    Scheme: corpus items hash into ``buckets`` groups; anchor ``a``
    draws the k CONSECUTIVE buckets starting at ``hash(a) % buckets``
    (k distinct buckets → k distinct items, no within-anchor dupes) and
    takes, per drawn bucket, the item minimizing ``xxhash64(item, a)``
    (so two anchors drawing the same bucket still pick independently).
    ``positives`` (anchor_id, item_id pairs) are anti-joined out of the
    candidates BEFORE the min, so exclusion never costs a sample while
    any non-positive remains in the bucket.

    Cost shape: candidates = k × |corpus|/buckets rows per anchor —
    ``buckets`` must keep corpus/buckets a SMALL CONSTANT (10-100 items
    per bucket) or candidate volume grows with the corpus and the whole
    op turns quadratic under joint anchor+corpus scaling. The default
    (``buckets=None``) derives that automatically: one cheap scalar
    ``corpus.count()`` → :func:`negative_sample_buckets` (exact
    ``ceil(n / 32)``, i.e. ~32 items/bucket at any scale, floored at
    ``k`` so every anchor can draw k distinct buckets). Pass ``buckets``
    explicitly
    only when samples must stay bit-stable while the corpus grows —
    results are a pure function of (inputs, k, buckets, seed), so a
    FIXED bucket count pins the draw and the auto default re-derives it
    per corpus size. One shuffle each for the bucket join, the
    positives anti-join, and the per-(anchor, draw) min. Sampling is
    approximately uniform (hash buckets are balanced by construction);
    it is NOT a perfect uniform-without-replacement draw — documented
    trade for determinism without a global shuffle. Buckets beyond the
    corpus size come back empty (fewer than k rows for some anchors).

    ``portable_hash=True`` draws the SAME scheme from the md5-prefix
    hash instead of xxhash64 — a different (equally pseudo-random)
    sample whose every step replays bit-exactly in ANSI SQL, which is
    how the sampling_ops oracle adjudicates the full draw (bucket
    addressing, positives anti-join, per-draw argmin). Production keeps
    the faster xxhash64 default.
    """
    if buckets is None:
        buckets = negative_sample_buckets(corpus.count(), k)
    if k > buckets:
        raise ValueError(f"k={k} must be <= buckets={buckets}")

    def h(cols, s):
        if portable_hash:
            return _portable_hash64(cols, s)
        return F.xxhash64(*[F.col(c) for c in cols], F.lit(s))

    a = anchors.select(anchor_id).distinct()
    draws = a.select(
        anchor_id, F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__j")
    ).withColumn(
        "__b",
        F.pmod(
            F.pmod(h([anchor_id], seed), F.lit(buckets)) + F.col("__j"),
            F.lit(buckets),
        ),
    )
    items = corpus.select(
        F.col(item_id),
        F.pmod(h([item_id], seed), F.lit(buckets)).alias("__b"),
    )
    cand = draws.join(items, "__b")
    if positives is not None:
        cand = cand.join(
            positives.select(anchor_id, item_id), [anchor_id, item_id], "left_anti"
        )
    out = (
        cand.groupBy(anchor_id, "__j")
        .agg(
            F.min_by(
                F.col(item_id), h([item_id, anchor_id], seed + 1)
            ).alias(item_id)
        )
        .select(anchor_id, item_id)
    )
    return out


def _ares_key(id_col: str, weight_col: str, seed: int, portable: bool = False):
    """Efraimidis-Spirakis A-Res key with ``u`` uniform in (0,1) from a
    salted id hash — shared by the global and per-group faces so their
    documented equivalence stays bit-exact per mode.

    Default: ``u^(1/w)`` from ``xxhash64`` (fast path). Portable:
    ``round(ln(u)/w, 8)`` from the md5-prefix hash — the LOG of the same
    key (a strictly monotone transform, identical selection order), in
    the rounded-single-``ln`` form the Gumbel keys use so the ordering
    replays bit-exactly in ANSI SQL (``pow`` is libm-dependent across
    engines; ``ln``+division round-trip exactly)."""
    if portable:
        u = (
            F.pmod(_portable_hash64([id_col], seed), F.lit(1 << 31)) + 0.5
        ) / F.lit(float(1 << 31))
        return F.round(F.log(u) / F.col(weight_col).cast("double"), 8)
    u = (
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1 << 31)) + 0.5
    ) / F.lit(float(1 << 31))
    return F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
    portable_hash: bool = False,
) -> DataFrame:
    """k-item weighted sample WITHOUT replacement (Efraimidis-Spirakis
    A-Res): each row draws ``key = u^(1/w)`` with ``u`` uniform in (0,1)
    and the k largest keys win — inclusion odds proportional to weight,
    exactly the quality-weighted corpus-selection recipe (w = a quality
    score) without ever materializing a cumulative distribution.

    Deterministic: ``u`` derives from ``xxhash64(id, seed)`` — same
    inputs, same sample, any partitioning; vary ``seed`` for fresh
    draws. Rows with weight <= 0 or NULL are excluded (zero weight =
    never sampled). Scale shape: the sort-limit compiles to
    TakeOrderedAndProject — partition-local top-k then a k-row merge on
    the driver side of the exchange, never a global sort.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn(
            "__wkey", _ares_key(id_col, weight_col, seed, portable_hash)
        )
        # id tie-break: u^(1/w) collides in double precision for huge
        # weights (keys pile up within an ulp of 1.0), and a tie at the
        # k boundary under a bare orderBy would pick a partition-order-
        # dependent winner — breaking determinism AND the pinned
        # per-group==global equivalence
        .orderBy(F.desc("__wkey"), F.col(id_col).asc())
        .limit(k)
        .drop("__wkey")
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
    portable_hash: bool = False,
) -> DataFrame:
    """k-item weighted sample WITHOUT replacement PER GROUP (the
    per-domain/per-source face of :func:`weighted_sample`): within each
    ``group_col`` value, the k largest Efraimidis-Spirakis keys
    ``u^(1/w)`` win — the quality-weighted per-domain corpus-selection
    recipe (keep the best k documents of every source) in ONE window
    pass over the group partitioning, never a global sort and never a
    per-group driver loop.

    Deterministic like the global variant (``u`` from
    ``xxhash64(id, seed)``; ties broken by id); weight <= 0 or NULL
    rows are excluded. Scale shape: one shuffle on ``group_col``; a
    group's rows sort within its partition — for groups too large for
    one task, pre-thin with a per-partition top-k (the standard
    two-phase rung) before the window."""
    from pyspark.sql.window import Window

    if k <= 0:
        raise ValueError("k must be positive")
    w = Window.partitionBy(group_col).orderBy(
        F.desc("__wkey"), F.col(id_col).asc()
    )
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn(
            "__wkey", _ares_key(id_col, weight_col, seed, portable_hash)
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__wkey", "__rn")
    )


def shuffle_for_training(
    df: DataFrame,
    shards: int,
    id_col: str = "doc_id",
    seed: int = 22695477,
) -> DataFrame:
    """Reproducible global shuffle — the LAST step before a training
    run reads the corpus: every row gets a deterministic (shard, pos)
    from a seeded multiplicative hash, so any reader streaming shard by
    shard in pos order sees the SAME pseudo-random document order on
    every run, on any cluster, after any repartitioning (no PRNG state,
    no Spark `rand()` — the same engine-portable integer family as
    ``deterministic_split``). Appends don't perturb existing rows'
    positions (append-stable, like every hash op in this family).

    The seed enters as the affine OFFSET and, crucially, folded into
    the (odd) MULTIPLIER — a purely additive seed would make every
    epoch order a cyclic ROTATION of one fixed order (pos₂ = pos₁ + Δ
    for all docs), i.e. the same document sequence every epoch.
    Seed-dependent multipliers give genuinely different permutations.
    The shard is the hash's HIGH bits ((u·shards) div 2³²) — the
    well-mixed end of a multiplicative hash; low bits (u mod shards)
    are affine in (id mod shards), which round-robins periodic id
    assignments (e.g. 8 parallel writers) straight into
    source-clustered shards. The default seed is deliberately distinct
    from the family's split/strat/Gumbel salts so position never
    correlates with split membership or DSIR tie-breaking.

    Returns df + (shard, pos); readers break pos ties (32-bit hash
    collisions) by id — sort by (pos, id). Writer shape:
    ``.repartition(shards, "shard").sortWithinPartitions("pos")`` then
    ``write.partitionBy("shard")`` — ONE hash-partition exchange and a
    per-shard local sort; no global sort ever (a global orderBy would
    range-exchange the whole corpus through a single sampled
    boundary pass)."""
    s = seed % _M32
    # odd multiplier (K odd, 2s even, 2^31 even ⇒ parity survives the
    # mod) bounded below 2^31 so (id mod 2^31)·A stays inside a long
    # even under ANSI mode
    a = (_KNUTH + 2 * s) % 2147483648
    c = F.col(id_col)
    u = F.pmod(
        F.pmod(c, F.lit(2147483648)) * F.lit(a) + F.lit(s),
        F.lit(_M32),
    )
    return df.select(
        "*",
        F.floor(u * F.lit(shards) / F.lit(float(_M32)))
        .cast("int")
        .alias("shard"),
        u.alias("pos"),
    )
