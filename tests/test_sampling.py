"""Sampling operators: rate bounds, determinism, split stability."""

from __future__ import annotations

from pyspark.sql import functions as F

from uma_etl_iis_loader_spark.io import read_fixture
from uma_etl_iis_loader_spark.operators.sampling import (
    deterministic_split,
    stratified_sample,
)


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    docs = read_fixture(spark, sf_dir, "documents").select("doc_id", "lang")
    fractions = {"en": 0.5, "de": 1.0, "zh": 0.0}
    a = stratified_sample(docs, "lang", fractions, seed=7).collect()
    b = stratified_sample(docs, "lang", fractions, seed=7).collect()
    # same seed + same partitioning → identical sample
    assert {r.doc_id for r in a} == {r.doc_id for r in b}

    totals = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    got = {}
    for r in a:
        got[r.lang] = got.get(r.lang, 0) + 1
    assert got.get("de") == totals["de"]  # fraction 1.0 keeps everything
    assert "zh" not in got  # fraction 0.0 drops everything
    assert "fr" not in got  # stratum absent from dict → dropped
    # Bernoulli(0.5): 4-sigma binomial band
    n, p = totals["en"], 0.5
    sigma = (n * p * (1 - p)) ** 0.5
    assert abs(got.get("en", 0) - n * p) <= 4 * sigma


def test_deterministic_split_stability(spark, sf_dir):
    docs = read_fixture(spark, sf_dir, "documents").select("doc_id")
    out = deterministic_split(docs, "doc_id")
    frac = {
        r.split: r["count"] for r in out.groupBy("split").count().collect()
    }
    n = sum(frac.values())
    assert 0.85 <= frac["train"] / n <= 0.95
    # repartition-stable: assignment is a pure function of the id
    shuffled = deterministic_split(docs.repartition(7), "doc_id")
    assert {
        (r.doc_id, r.split) for r in shuffled.collect()
    } == {(r.doc_id, r.split) for r in out.collect()}
    # append-stable: a subset's rows keep their split in the full corpus
    subset = deterministic_split(docs.filter(F.col("doc_id") % 2 == 0), "doc_id")
    full_map = {r.doc_id: r.split for r in out.collect()}
    assert all(full_map[r.doc_id] == r.split for r in subset.collect())


def test_hash_stratified_sample_deterministic_and_stable(spark, sf_dir):
    """Salted-hash stratified sampling: engine-independent arithmetic →
    identical across runs and repartitioning; per-stratum rates within a
    binomial band; membership independent of the split hash."""
    from uma_etl_iis_loader_spark.operators.sampling import (
        hash_stratified_sample,
    )

    docs = read_fixture(spark, sf_dir, "documents").select("doc_id", "lang")
    fractions = {"en": 0.5, "de": 1.0, "zh": 0.0}
    a = {r.doc_id for r in hash_stratified_sample(docs, "doc_id", "lang", fractions).collect()}
    b = {
        r.doc_id
        for r in hash_stratified_sample(
            docs.repartition(7), "doc_id", "lang", fractions
        ).collect()
    }
    assert a == b
    totals = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    kept = {
        r.lang: r["count"]
        for r in hash_stratified_sample(docs, "doc_id", "lang", fractions)
        .groupBy("lang")
        .count()
        .collect()
    }
    assert kept.get("de") == totals["de"]
    assert "zh" not in kept and "fr" not in kept
    n, p = totals["en"], 0.5
    sigma = (n * p * (1 - p)) ** 0.5
    assert abs(kept.get("en", 0) - n * p) <= 4 * sigma


def test_temperature_mixture_rebalances_domains(spark, sf_dir):
    """alpha<1 shifts share from head to tail domains; rates are exact
    arithmetic over one count aggregation; membership deterministic."""
    from uma_etl_iis_loader_spark.io import read_fixture
    from uma_etl_iis_loader_spark.operators.sampling import (
        temperature_mixture,
    )

    docs = read_fixture(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = {r[0]: r[1] for r in docs.groupBy("lang").count().collect()}
    head = max(counts, key=counts.get)
    tail = min(counts, key=counts.get)

    out_nat, rates_nat = temperature_mixture(
        docs, "doc_id", "lang", budget=200, alpha=1.0
    )
    out_t, rates_t = temperature_mixture(
        docs, "doc_id", "lang", budget=200, alpha=0.3
    )
    # alpha=1: keep-rate identical across domains (natural distribution)
    vals = {round(v, 6) for v in rates_nat.values()}
    assert len(vals) == 1 or all(v == 1.0 for v in rates_nat.values())
    # alpha<1: tail keep-rate strictly above head keep-rate
    assert rates_t[tail] > rates_t[head]
    # tail SHARE of the sample grows vs its natural share
    n_t = {r[0]: r[1] for r in out_t.groupBy("lang").count().collect()}
    nat_share = counts[tail] / sum(counts.values())
    t_share = n_t.get(tail, 0) / max(sum(n_t.values()), 1)
    assert t_share > nat_share
    # determinism: same call, same membership
    out_t2, _ = temperature_mixture(docs, "doc_id", "lang", budget=200, alpha=0.3)
    assert sorted(r.doc_id for r in out_t.collect()) == sorted(
        r.doc_id for r in out_t2.collect()
    )


from hypothesis import given
from hypothesis import strategies as st


@given(
    counts=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        st.integers(1, 100_000),
        min_size=1,
        max_size=5,
    ),
    budget=st.integers(1, 200_000),
    alpha=st.floats(0.05, 1.0),
)
def test_temperature_rate_laws(counts, budget, alpha):
    """Pure arithmetic invariants of the temperature-mixture rates:

    1. every rate in (0, 1];
    2. expected sample Σ rate_i·n_i ≤ budget + ε (capping can only
       shrink it, never overshoot);
    3. uncapped domains realize exactly budget·share_i docs;
    4. alpha < 1 never gives a LARGER head-domain rate than a tail
       domain's (n_i ≥ n_j ⇒ rate_i ≤ rate_j) — the rebalancing
       direction.
    """
    from uma_etl_iis_loader_spark.operators.sampling import (
        temperature_rates,
    )

    rates = temperature_rates(counts, budget, alpha)
    assert set(rates) == set(counts)
    for r in rates.values():
        assert 0.0 < r <= 1.0
    expected = sum(rates[s] * n for s, n in counts.items())
    assert expected <= budget + 1e-6 * max(budget, 1)
    z = sum(n**alpha for n in counts.values())
    for s, n in counts.items():
        target = budget * (n**alpha) / z
        if rates[s] < 1.0:
            assert abs(rates[s] * n - target) <= 1e-6 * max(target, 1)
    items = sorted(counts.items(), key=lambda kv: kv[1])
    for (s_small, n_small), (s_big, n_big) in zip(items, items[1:]):
        if n_small == n_big:
            continue
        assert rates[s_big] <= rates[s_small] + 1e-12


# ---------------------------------------------------------------------------
# negative_sample — deterministic contrastive negatives
# ---------------------------------------------------------------------------


def test_negative_sample_contract(spark):
    """k distinct negatives per anchor, no positives, deterministic
    across recomputation and repartitioning."""
    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.operators.sampling import negative_sample

    corpus = spark.range(0, 2000).select(F.col("id").alias("item_id"))
    anchors = spark.range(0, 50).select(F.col("id").alias("anchor_id"))
    positives = spark.range(0, 50).select(
        F.col("id").alias("anchor_id"), (F.col("id") * 3).alias("item_id")
    )
    out = negative_sample(
        anchors, corpus, k=5, positives=positives, buckets=200
    )
    rows = [(r.anchor_id, r.item_id) for r in out.collect()]
    per_anchor = {}
    for a, i in rows:
        per_anchor.setdefault(a, []).append(i)
    assert set(per_anchor) == set(range(50))
    for a, items in per_anchor.items():
        assert len(items) == 5, (a, items)
        assert len(set(items)) == 5  # distinct buckets -> distinct items
        assert a * 3 not in items    # positive excluded

    # determinism: recompute + repartition the inputs
    out2 = negative_sample(
        anchors.repartition(7), corpus.repartition(13), k=5,
        positives=positives, buckets=200,
    )
    assert set(rows) == {(r.anchor_id, r.item_id) for r in out2.collect()}


def test_negative_sample_buckets_derivation():
    """The auto-derived bucket count is a pure, deterministic integer
    function of the corpus scalar: EXACTLY ~target items per bucket at
    every scale (ceil(n/target)), never below k — so the per-anchor
    candidate constant is scale-invariant, not a pow2-band drifter."""
    from uma_etl_iis_loader_spark.operators.sampling import (
        negative_sample_buckets,
    )

    for n in (1_000, 100_000, 1_000_000, 10_000_000, 10**9):
        b = negative_sample_buckets(n, k=8)
        assert 31 <= n / b <= 32  # items/bucket pinned at ~target
    # tiny corpus: floor at k
    assert negative_sample_buckets(100, k=8) == 8
    assert negative_sample_buckets(100, k=5) == 5
    assert negative_sample_buckets(0, k=3) == 3
    # 10x corpus -> exactly 10x buckets (candidates scale linearly)
    assert negative_sample_buckets(10_000_000, k=8) == \
        10 * negative_sample_buckets(1_000_000, k=8)


def test_negative_sample_buckets_properties():
    """Property sweep: for any (n, k) the derivation keeps items/bucket
    ≤ target, stays ≥ k, and is monotone in n — so candidates per
    anchor are bounded by k·target at EVERY corpus size."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from uma_etl_iis_loader_spark.operators.sampling import (
        negative_sample_buckets,
    )

    @settings(max_examples=300, deadline=None)
    @given(
        n=st.integers(min_value=0, max_value=10**12),
        k=st.integers(min_value=1, max_value=4096),
        target=st.integers(min_value=1, max_value=1024),
    )
    def law(n, k, target):
        b = negative_sample_buckets(n, k, target)
        assert b >= k
        assert max(n, 1) / b <= target  # bounded candidate constant
        b2 = negative_sample_buckets(n + max(n // 10, 1), k, target)
        assert b2 >= b  # monotone in corpus size

    law()


def test_portable_hash_matches_duckdb(spark):
    """Cross-engine law under the negsample/wsample/dsir_wb
    adjudications: the md5-prefix 60-bit hash is bit-identical between
    Spark (conv(substr(md5,1,15),16,10)) and DuckDB
    (CAST('0x'||substr(md5,1,15) AS BIGINT)), for multi-part keys and
    unicode."""
    import duckdb

    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.operators.sampling import _portable_hash64

    rows = [
        (1, "hello"), (2, "héllo wörld"), (3, ""), (4, "a:b:c"),
        (5, "кириллица"), (6, "0"), (7, " " * 10), (8, "日本語テスト"),
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        r["id"]: (r["h1"], r["h2"])
        for r in df.select(
            "id",
            _portable_hash64(["id"], 7).alias("h1"),
            _portable_hash64(["s", "id"], 8).alias("h2"),
        ).collect()
    }
    con = duckdb.connect()
    for i, s in rows:
        h1 = con.execute(
            "SELECT CAST(('0x' || substr(md5(? || ':7'), 1, 15)) AS BIGINT)",
            [str(i)],
        ).fetchone()[0]
        h2 = con.execute(
            "SELECT CAST(('0x' || substr(md5(? || ':' || ? || ':8'), 1, 15))"
            " AS BIGINT)",
            [s, str(i)],
        ).fetchone()[0]
        assert got[i] == (h1, h2), (i, s)


def test_negative_sample_fixed_buckets_pin_the_draw(spark):
    """LAW: sampled ids are a pure function of (inputs, k, buckets,
    seed) — holding buckets FIXED yields identical ids whether passed
    explicitly or resolved by the auto default, and the auto default
    resolves to negative_sample_buckets(corpus.count(), k)."""
    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.operators.sampling import (
        negative_sample,
        negative_sample_buckets,
    )

    corpus = spark.range(0, 2000).select(F.col("id").alias("item_id"))
    anchors = spark.range(0, 40).select(F.col("id").alias("anchor_id"))
    b = negative_sample_buckets(2000, k=5)
    auto = {
        (r.anchor_id, r.item_id)
        for r in negative_sample(anchors, corpus, k=5).collect()
    }
    pinned = {
        (r.anchor_id, r.item_id)
        for r in negative_sample(anchors, corpus, k=5, buckets=b).collect()
    }
    assert auto == pinned
    assert len(auto) == 40 * 5


def test_negative_sample_portable_face_contract(spark):
    """The portable (md5-prefix) face honors the same contract as the
    xxhash64 default: k distinct negatives per anchor, positives
    excluded, deterministic under repartitioning. (Its draw differs —
    different uniform source — which is exactly why the oracle can
    replay it.)"""
    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.operators.sampling import negative_sample

    corpus = spark.range(0, 1000).select(F.col("id").alias("item_id"))
    anchors = spark.range(0, 30).select(F.col("id").alias("anchor_id"))
    pos = anchors.select("anchor_id", F.col("anchor_id").alias("item_id"))
    out = negative_sample(
        anchors, corpus, k=4, positives=pos, buckets=64, seed=7,
        portable_hash=True,
    )
    rows = [(r.anchor_id, r.item_id) for r in out.collect()]
    per = {}
    for a, i in rows:
        per.setdefault(a, []).append(i)
    assert set(per) == set(range(30))
    for a, items in per.items():
        assert len(items) == 4 and len(set(items)) == 4
        assert a not in items  # self-positive excluded
    out2 = negative_sample(
        anchors.repartition(3), corpus.repartition(9), k=4, positives=pos,
        buckets=64, seed=7, portable_hash=True,
    )
    assert set(rows) == {(r.anchor_id, r.item_id) for r in out2.collect()}


def test_weighted_sample_portable_face_contract(spark):
    """Portable A-Res face: exactly k rows, deterministic, and heavier
    weights win more often (same inclusion-odds law as the default —
    the log-domain key is a monotone transform of u^(1/w))."""
    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.operators.sampling import weighted_sample

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, 1000.0).otherwise(1.0).alias("w"),
    )
    got = {
        r.doc_id
        for r in weighted_sample(
            df, "doc_id", "w", k=80, seed=3, portable_hash=True
        ).collect()
    }
    assert len(got) == 80
    # the 100 heavy rows (1000x weight) dominate the sample
    assert sum(1 for d in got if d < 100) > 60
    got2 = {
        r.doc_id
        for r in weighted_sample(
            df.repartition(7), "doc_id", "w", k=80, seed=3,
            portable_hash=True,
        ).collect()
    }
    assert got == got2


def test_negative_sample_spread(spark):
    """No item dominates: with many anchors the sample frequency of any
    single item stays within a small multiple of the mean (hash buckets
    are balanced; per-bucket choice varies by anchor)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.operators.sampling import negative_sample

    corpus = spark.range(0, 500).select(F.col("id").alias("item_id"))
    anchors = spark.range(0, 400).select(F.col("id").alias("anchor_id"))
    out = negative_sample(anchors, corpus, k=4, buckets=100)
    counts = Counter(r.item_id for r in out.collect())
    mean = (400 * 4) / 500
    assert max(counts.values()) <= mean * 15  # loose, catches degeneracy
    # a healthy fraction of the corpus gets sampled at all
    assert len(counts) > 150


def test_weighted_sample_contract(spark):
    """Exactly k rows, deterministic under repartition, zero/NULL weights
    excluded, and the plan is a TakeOrdered top-k (no global sort)."""
    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.operators.sampling import weighted_sample

    df = spark.range(0, 1000).select(
        F.col("id").alias("item_id"),
        F.when(F.col("id") == 0, F.lit(None).cast("double"))
        .when(F.col("id") == 1, F.lit(0.0))
        .otherwise((F.col("id") % 7 + 1).cast("double"))
        .alias("w"),
    )
    s1 = {r.item_id for r in weighted_sample(df, "item_id", "w", 50).collect()}
    s2 = {
        r.item_id
        for r in weighted_sample(df.repartition(11), "item_id", "w", 50).collect()
    }
    assert s1 == s2 and len(s1) == 50
    assert 0 not in s1 and 1 not in s1  # NULL and zero weight excluded
    plan = (
        weighted_sample(df, "item_id", "w", 50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_respects_weights(spark):
    """Across seeds, heavy items (w=9) are sampled ~9x as often as light
    items (w=1) — the A-Res inclusion-probability property (loose bound,
    catches inverted or ignored weights)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.operators.sampling import weighted_sample

    df = spark.range(0, 400).select(
        F.col("id").alias("item_id"),
        F.when(F.col("id") % 2 == 0, F.lit(9.0)).otherwise(F.lit(1.0)).alias("w"),
    )
    heavy = light = 0
    for seed in range(12):
        for r in weighted_sample(df, "item_id", "w", 40, seed=seed).collect():
            if r.item_id % 2 == 0:
                heavy += 1
            else:
                light += 1
    assert heavy + light == 12 * 40
    ratio = heavy / max(light, 1)
    assert ratio > 3.0, (heavy, light)  # ~9 expected; 3 is a loose floor


def test_weighted_sample_per_group_portable_equals_global(spark):
    """The portable face preserves the documented per-group == global
    equivalence (both faces share ONE key formula per mode)."""
    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.operators.sampling import (
        weighted_sample,
        weighted_sample_per_group,
    )

    df = spark.range(0, 600).select(
        F.col("id"),
        (F.col("id") % 2).cast("string").alias("src"),
        (F.col("id") % 7 + 1).cast("double").alias("wgt"),
    )
    per = {}
    for r in weighted_sample_per_group(
        df, "src", "id", "wgt", k=40, seed=3, portable_hash=True
    ).collect():
        per.setdefault(r.src, set()).add(r.id)
    for g in ("0", "1"):
        want = {
            r.id
            for r in weighted_sample(
                df.filter(F.col("src") == g), "id", "wgt", k=40, seed=3,
                portable_hash=True,
            ).collect()
        }
        assert per[g] == want, g


def test_lsh_bucket_balance_empty_and_collision_free(spark):
    """Telemetry zeros out cleanly on a corpus with no colliding
    buckets (all-distinct docs) — the coalesce paths, not a crash."""
    from uma_etl_iis_loader_spark.operators.dedup import (
        lsh_bucket_balance,
        lsh_bucket_stats,
    )

    docs = spark.createDataFrame(
        [(i, f"utterly unique document number {i} " + " ".join(
            f"w{i}x{j}" for j in range(12))) for i in range(6)],
        "doc_id long, text string",
    )
    bal = lsh_bucket_balance(
        lsh_bucket_stats(docs, num_hashes=64, bands=16, n=5)
    )
    assert bal == {
        "candidate_pairs": 0, "n_buckets": 0,
        "max_bucket": 0, "mean_bucket": 0.0,
    }


def test_weighted_sample_per_group(spark):
    """Per-group A-Res: exactly min(k, group size) rows per group; the
    kept set equals an independent per-group evaluation of the global
    operator's key formula; deterministic under repartitioning; heavy
    weights dominate inclusion."""
    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.operators.sampling import (
        weighted_sample,
        weighted_sample_per_group,
    )

    df = spark.range(0, 3000).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("src"),
        # group 0 gets a few huge-weight rows; others weight 1
        F.when((F.col("id") % 3 == 0) & (F.col("id") < 30), 1e6)
        .otherwise(1.0)
        .alias("wgt"),
    )
    out = weighted_sample_per_group(df, "src", "id", "wgt", k=50)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r.src, set()).add(r.id)
    assert set(per) == {"0", "1", "2"}
    assert all(len(v) == 50 for v in per.values())
    # group-0's huge-weight rows always survive (u^(1/1e6) ~ 1)
    assert {i for i in range(0, 30, 3)} <= per["0"]
    # equals the global operator applied per group
    for g in ("0", "1", "2"):
        want = {
            r.id
            for r in weighted_sample(
                df.filter(F.col("src") == g), "id", "wgt", k=50
            ).collect()
        }
        assert per[g] == want, g
    # deterministic under repartitioning
    again = {
        (r.src, r.id)
        for r in weighted_sample_per_group(
            df.repartition(17), "src", "id", "wgt", k=50
        ).collect()
    }
    assert again == {(r.src, r.id) for r in rows}
    # small groups return all their rows
    tiny = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 1.0), ("b", 3, 1.0)],
        "src string, id long, wgt double",
    )
    assert weighted_sample_per_group(tiny, "src", "id", "wgt", k=50).count() == 3


def test_shuffle_for_training_contract(spark):
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.sampling import (
        shuffle_for_training,
    )

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(500), "text": ["x"] * 500})
    )
    out = shuffle_for_training(docs, shards=8)
    rows = out.collect()
    # shard is the hash's HIGH bits; deterministic under repartitioning
    assert all(r["shard"] == (r["pos"] * 8) // 4294967296 for r in rows)
    again = {r["doc_id"]: (r["shard"], r["pos"])
             for r in shuffle_for_training(docs.repartition(7), 8).collect()}
    assert again == {r["doc_id"]: (r["shard"], r["pos"]) for r in rows}
    # every shard populated, sizes roughly balanced (hash-uniform)
    from collections import Counter
    sizes = Counter(r["shard"] for r in rows)
    assert set(sizes) == set(range(8))
    assert max(sizes.values()) < 3 * min(sizes.values())
    # shard must NOT be round-robin by id (the low-bit trap): ids
    # congruent mod 8 spread across multiple shards
    by_residue = {}
    for r in rows:
        by_residue.setdefault(r["doc_id"] % 8, set()).add(r["shard"])
    assert all(len(s) > 1 for s in by_residue.values())
    # the order is genuinely shuffled, not id order
    order = [r["doc_id"] for r in sorted(rows, key=lambda r: (r["pos"], r["doc_id"]))]
    assert order != sorted(order)
    # a different seed yields a different PERMUTATION — not a cyclic
    # rotation of the same order (the additive-seed trap: pos2-pos1
    # constant across docs)
    pos1 = {r["doc_id"]: r["pos"] for r in rows}
    rows2 = shuffle_for_training(docs, 8, seed=7).collect()
    pos2 = {r["doc_id"]: r["pos"] for r in rows2}
    deltas = {(pos2[d] - pos1[d]) % 4294967296 for d in pos1}
    assert len(deltas) > 100  # a rotation would give exactly 1
    order2 = [
        r["doc_id"]
        for r in sorted(rows2, key=lambda r: (r["pos"], r["doc_id"]))
    ]
    assert order != order2
    # append stability: adding docs never moves existing positions
    more = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(500, 600), "text": ["y"] * 100})
    )
    grown = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shuffle_for_training(docs.unionByName(more), 8).collect()
    }
    for r in rows:
        assert grown[r["doc_id"]] == (r["shard"], r["pos"])
