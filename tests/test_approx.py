"""Sketch accuracy: HLL++ distinct estimate within its rsd bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from uma_etl_iis_loader_spark.io import read_fixture


def test_approx_count_distinct_within_bound(spark, sf_dir):
    events = read_fixture(spark, sf_dir, "events")
    got = (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
            F.count_distinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert len(got) > 0
    for r in got:
        assert abs(r.approx - r.exact) / r.exact <= 0.06  # 3x rsd margin


def test_percentile_approx_within_rank_error(spark, sf_dir):
    """GK sketch at accuracy=10000 → rank error ≤ 1/10000; on 10k-ish rows
    the approx quantile must sit within a few exact order statistics.
    (The registered approx_sketches_by_type query now performs this same
    rank check IN-PLAN and emits it as a driver-hashed boolean; this test
    pins the underlying sketch guarantee independently.)"""
    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.io import read_fixture

    got = {
        r.event_type: [float(x) for x in r.qa]
        for r in read_fixture(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.percentile_approx(
                "value",
                F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)),
                F.lit(10000),
            ).alias("qa")
        )
        .collect()
    }
    # rank-based criterion (the GK guarantee IS a rank bound; a value band
    # misbehaves at tail quantiles of small groups): the fraction of group
    # values ≤ approx must sit within rank_error + one order statistic of
    # the target quantile
    vals = {
        r.event_type: sorted(v for v in r.vs)
        for r in read_fixture(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.collect_list("value").alias("vs"))
        .collect()
    }
    for et, approx in got.items():
        xs = vals[et]
        n = len(xs)
        for q, a in zip([0.5, 0.95, 0.99], approx):
            rank = sum(1 for x in xs if x <= a) / n
            tol = 1 / 10000 + 1.5 / n
            assert q - tol <= rank <= q + tol, (et, q, a, rank, n)


def test_freq_items_candidates_no_false_negatives(spark, sf_dir):
    """KPS sketch guarantee: every item with frequency > support MUST be
    among the sketch candidates (false positives allowed, false negatives
    not) — the property the verified heavy-hitter query relies on."""
    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.io import read_fixture

    events = read_fixture(spark, sf_dir, "events")
    cand = {
        r[0]
        for r in events.select("user_id")
        .stat.freqItems(["user_id"], support=0.005)
        .select(F.explode("user_id_freqItems"))
        .collect()
    }
    n = events.count()
    truly = {
        r.user_id
        for r in events.groupBy("user_id").count().filter(F.col("count") * 200 > n).collect()
    }
    assert truly <= cand


def test_freq_items_query_is_exact(spark, sf_dir):
    """The registered two-pass heavy-hitter query equals the exact >5%
    user set (sketch candidates ⊇ truth; verify pass prunes the rest)."""
    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.io import read_fixture
    from uma_etl_iis_loader_spark.plans.registry import QUERIES

    got = {
        (r.user_id, r.n_events)
        for r in QUERIES["freq_items_users"](spark, sf_dir).collect()
    }
    events = read_fixture(spark, sf_dir, "events")
    n = events.count()
    truly = {
        (r.user_id, r["count"])
        for r in events.groupBy("user_id").count().filter(F.col("count") * 200 > n).collect()
    }
    assert got == truly


def test_hll_union_is_lossless(spark, sf_dir):
    """HLL sketches at equal lgK merge LOSSLESSLY: the union of per-day
    sketches estimates exactly what one sketch over the whole window
    estimates — pre-aggregation costs no accuracy. Also: the estimate is
    within the configured RSE of exact."""
    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.io import read_fixture
    from uma_etl_iis_loader_spark.operators.sketches import (
        build_distinct_sketches,
        merge_distinct_sketches,
    )

    events = read_fixture(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    daily = build_distinct_sketches(events, ["event_type", "day"], "user_id")
    merged = {
        r.event_type: r.approx_distinct
        for r in merge_distinct_sketches(daily, ["event_type"]).collect()
    }
    whole = {
        r.event_type: r.approx_distinct
        for r in merge_distinct_sketches(
            build_distinct_sketches(events, ["event_type"], "user_id"),
            ["event_type"],
        ).collect()
    }
    assert merged == whole  # lossless union, estimate-exact
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        assert abs(merged[et] - n) <= 0.05 * n


def test_theta_set_algebra_laws(spark):
    """Theta sketches on known sets: A∩B, A\\B, A∪B estimates are EXACT
    below the nominal entry count (the common case for per-group
    audiences); inclusion-exclusion holds."""
    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.operators.sketches import (
        build_theta_sketches,
        theta_pair_overlap,
    )

    # A = {0..599}, B = {400..999}: |A∩B| = 200, |A\B| = 400, |A∪B| = 1000
    rows = [("A", i) for i in range(600)] + [("B", i) for i in range(400, 1000)]
    df = spark.createDataFrame(rows, "grp string, user_id long")
    out = theta_pair_overlap(
        build_theta_sketches(df, ["grp"], "user_id"), "grp"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.key_a, r.key_b) == ("A", "B")
    assert round(r.common) == 200
    assert round(r.only_a) == 400
    assert round(r.either) == 1000


def test_kll_merge_preserves_rank_bound(spark, sf_dir):
    """Merging per-day KLL sketches keeps the rank guarantee: the merged
    q50/q95 estimates rank within ±3% of the target on the full data."""
    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.io import read_fixture
    from uma_etl_iis_loader_spark.operators.sketches import (
        build_quantile_sketches,
        merge_quantile_sketches,
    )

    events = read_fixture(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    daily = build_quantile_sketches(events, ["event_type", "day"], "value")
    est = merge_quantile_sketches(
        daily, ["event_type"], {"q50": 0.5, "q95": 0.95}
    ).collect()
    vals = {
        r.event_type: sorted(
            v.value
            for v in events.filter(F.col("event_type") == r.event_type)
            .select("value")
            .collect()
        )
        for r in est
    }
    import bisect

    for r in est:
        v = vals[r.event_type]
        for name, p in (("q50", 0.5), ("q95", 0.95)):
            rank = bisect.bisect_right(v, getattr(r, name)) / len(v)
            assert abs(rank - p) <= 0.03, (r.event_type, name, rank)


# ---------------------------------------------------------------------------
# Count-Min sketches (point frequency / heavy hitters)
# ---------------------------------------------------------------------------


def test_cms_bounds_and_lossless_merge(spark, sf_dir):
    """CMS laws on the events fixture: (a) estimate >= true count for
    every key (never underestimates); (b) estimate <= true + eps*N for
    every key at these parameters; (c) merging per-day shard sketches
    gives BIT-IDENTICAL estimates to one global sketch (same eps/conf/
    seed -> counter-wise sum -> same counters)."""
    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.operators.sketches import (
        build_cms_sketches,
        cms_point_estimates,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    days = events.withColumn("day", F.to_date("ts"))
    per_day = build_cms_sketches(days, ["day"], "event_type", eps=0.001)
    global_sk = build_cms_sketches(events, [], "event_type", eps=0.001)

    true = {
        r.event_type: r.n
        for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(true.values())
    keys = sorted(true)

    est_merged = cms_point_estimates(spark, per_day, keys)
    est_global = cms_point_estimates(spark, global_sk, keys)
    assert est_merged == est_global  # lossless merge, bit-identical

    for k in keys:
        assert est_merged[k] >= true[k], (k, est_merged[k], true[k])
        assert est_merged[k] <= true[k] + 0.001 * n_total + 1, k


def test_cms_empty_and_unseen_keys(spark):
    from uma_etl_iis_loader_spark.operators.sketches import (
        build_cms_sketches,
        cms_point_estimates,
    )

    df = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    sk = build_cms_sketches(df, [], "k")
    est = cms_point_estimates(spark, sk, ["a", "b", "zzz"])
    assert est["a"] >= 2 and est["b"] >= 1
    # unseen key: bounded by eps*N (tiny N -> exact 0 expected)
    assert est["zzz"] <= 1
    empty = build_cms_sketches(df.filter("k = 'none'"), [], "k")
    assert cms_point_estimates(spark, empty, ["a"]) == {"a": 0}


def test_cms_distributed_merge_bit_equals_driver_and_global(spark, sf_dir):
    """The partial-aggregatable distributed CMS merge must produce a blob
    BIT-IDENTICAL to (a) the driver-side JVM mergeInPlace chain and (b)
    one sketch built globally with the same parameters — integer counter
    sums are exact and order-independent, so pre-sharding costs nothing.
    Also pins the parameter guard: shards built with a different seed
    refuse to merge."""
    import pytest
    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.operators.sketches import (
        _cms_merge_blobs,
        build_cms_sketches,
        merge_cms,
        merge_cms_distributed,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    days = events.withColumn("day", F.to_date("ts"))
    per_day = build_cms_sketches(days, ["day"], "event_type", eps=0.01)
    global_sk = build_cms_sketches(events, [], "event_type", eps=0.01)

    dist_rows = merge_cms_distributed(per_day, partials=4).collect()
    assert len(dist_rows) == 1
    dist_blob = bytes(dist_rows[0].cms)

    driver = merge_cms(spark, per_day)
    buf = spark._jvm.java.io.ByteArrayOutputStream()
    driver.writeTo(buf)
    driver_blob = bytes(buf.toByteArray())
    assert dist_blob == driver_blob

    global_blob = bytes(global_sk.collect()[0].cms)
    assert dist_blob == global_blob

    # python merge helper agrees with the JVM merge on a pair too
    blobs = [bytes(r.cms) for r in per_day.select("cms").collect()[:2]]
    if len(blobs) == 2:
        jcls = spark._jvm.org.apache.spark.util.sketch.CountMinSketch
        a = jcls.readFrom(bytearray(blobs[0]))
        a.mergeInPlace(jcls.readFrom(bytearray(blobs[1])))
        buf2 = spark._jvm.java.io.ByteArrayOutputStream()
        a.writeTo(buf2)
        assert _cms_merge_blobs(blobs) == bytes(buf2.toByteArray())

    # different seed → different hash coefficients → guarded
    other = build_cms_sketches(events, [], "event_type", eps=0.01, seed=7)
    mixed = [global_blob, bytes(other.collect()[0].cms)]
    with pytest.raises(ValueError, match="seed"):
        _cms_merge_blobs(mixed)
