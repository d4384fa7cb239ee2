"""Public k-means: determinism, nearest-centroid law, refinement gain."""

import numpy as np
import pandas as pd
import pytest

from uma_etl_iis_loader_spark.operators.clustering import (
    kmeans_assign,
    kmeans_centroids_df,
    kmeans_cluster_sizes,
    kmeans_fit,
)


def _blobs(spark, n_per=20, d=8, seed=7):
    # three well-separated direction blobs on the sphere
    rng = np.random.default_rng(seed)
    centers = np.eye(d)[:3] * 10
    rows = []
    vid = 0
    for c in centers:
        for _ in range(n_per):
            v = c + rng.normal(0, 0.5, d)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows],
                      "embedding": [r[1] for r in rows]})
    )


def test_kmeans_recovers_blobs_and_is_deterministic(spark):
    df = _blobs(spark)
    model = kmeans_fit(df, k=3)
    a = {r["vec_id"]: r["cluster_id"] for r in kmeans_assign(df, model).collect()}
    # each blob lands in ONE cluster, clusters are distinct
    blobs = [set(a[i] for i in range(j * 20, (j + 1) * 20)) for j in range(3)]
    assert all(len(b) == 1 for b in blobs)
    assert len(set().union(*blobs)) == 3
    # rerun + repartition: identical model and assignment
    model2 = kmeans_fit(df.repartition(5), k=3)
    assert np.array_equal(model["matrix"], model2["matrix"])
    a2 = {
        r["vec_id"]: r["cluster_id"]
        for r in kmeans_assign(df.repartition(7), model2).collect()
    }
    assert a == a2


def test_kmeans_distributed_refine_parity_on_blobs(spark):
    """On blob data small enough that the driver sample IS the corpus,
    the distributed Lloyd option converges to the same solution as the
    sample-only fit: identical cluster assignments, centroids within
    float tolerance (decimal-quantized distributed sums vs numpy
    float64 means differ below 1e-9). And it's deterministic under
    repartitioning (exact-decimal sums are order-insensitive)."""
    df = _blobs(spark)
    sample_model = kmeans_fit(df, k=3)
    dist_model = kmeans_fit(df, k=3, refine_distributed=True)
    assert dist_model["matrix"].shape == sample_model["matrix"].shape
    assert np.max(
        np.abs(dist_model["matrix"] - sample_model["matrix"])
    ) < 1e-6
    a_s = {r["vec_id"]: r["cluster_id"]
           for r in kmeans_assign(df, sample_model).collect()}
    a_d = {r["vec_id"]: r["cluster_id"]
           for r in kmeans_assign(df, dist_model).collect()}
    assert a_s == a_d
    # bit-stable rerun under different partitioning
    dist2 = kmeans_fit(df.repartition(7), k=3, refine_distributed=True)
    assert np.array_equal(dist_model["matrix"], dist2["matrix"])


def test_kmeans_lloyd_iteration_single_shuffle_plan(spark):
    """The per-iteration update statistic runs ONE exchange: assignment
    is a shuffle-free mapInPandas matmul, the explode is narrow, and
    the (centroid, dim) groupBy is the only shuffle (map-side
    partials)."""
    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.operators.clustering import (
        _lloyd_iteration_stats,
    )

    df = _blobs(spark)
    c = df.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<float>").alias("cvec"),
    )
    model = kmeans_fit(df, k=3)
    plan = (
        _lloyd_iteration_stats(c, model["matrix"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_kmeans_distributed_refine_beats_sample_when_sample_misses(spark):
    """When the init sample is too small to see every blob, full-corpus
    refinement recovers cohesion the sample path can't: distributed
    refine must not be WORSE than sample-only on mean max-cosine."""
    from pyspark.sql import functions as F

    df = _blobs(spark, n_per=40)

    def cohesion(model):
        import numpy as np

        rows = df.collect()
        mat = model["matrix"]
        tot = 0.0
        for r in rows:
            v = np.asarray(r["embedding"])
            v = v / np.linalg.norm(v)
            tot += float(np.max(mat @ v))
        return tot / len(rows)

    base = kmeans_fit(df, k=3, refine_iters=2)
    dist = kmeans_fit(df, k=3, refine_iters=2, refine_distributed=True)
    # Lloyd monotonicity: full-corpus assign+mean iterations from the
    # sample-refined start never decrease full-corpus cohesion
    assert cohesion(dist) >= cohesion(base) - 1e-12


def test_kmeans_assign_is_nearest_centroid(spark):
    df = _blobs(spark, n_per=10)
    model = kmeans_fit(df, k=3)
    cents = model["matrix"]
    rows = df.collect()
    a = {r["vec_id"]: r["cluster_id"] for r in kmeans_assign(df, model).collect()}
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        v = v / np.linalg.norm(v)
        sims = cents @ v
        best = int(np.argsort(-sims, kind="stable")[0])
        assert a[r["vec_id"]] == best


def test_kmeans_refinement_does_not_hurt_cohesion(spark):
    df = _blobs(spark, n_per=15)
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in df.collect()
    }

    def mean_cos(model):
        a = {
            r["vec_id"]: r["cluster_id"]
            for r in kmeans_assign(df, model).collect()
        }
        tot = 0.0
        for vid, v in vecs.items():
            v = v / np.linalg.norm(v)
            tot += float(model["matrix"][a[vid]] @ v)
        return tot / len(vecs)

    raw = mean_cos(kmeans_fit(df, k=3, refine_iters=0))
    refined = mean_cos(kmeans_fit(df, k=3, refine_iters=3))
    assert refined >= raw - 1e-9


def test_kmeans_centroid_frame_and_sizes(spark):
    df = _blobs(spark, n_per=10)
    model = kmeans_fit(df, k=3)
    cdf = kmeans_centroids_df(model, spark)
    assert cdf.count() == 3
    got = {
        r["cluster_id"]: np.asarray(r["centroid"], dtype=np.float32)
        for r in cdf.collect()
    }
    for i in range(3):
        np.testing.assert_allclose(
            got[i], model["matrix"][i].astype(np.float32), rtol=1e-6
        )
    sizes = {
        r["cluster_id"]: r["n"]
        for r in kmeans_cluster_sizes(kmeans_assign(df, model)).collect()
    }
    assert sum(sizes.values()) == 30 and len(sizes) == 3


def test_kmeans_assign_plan_zero_exchanges(spark):
    df = _blobs(spark, n_per=5)
    model = kmeans_fit(df, k=3)
    plan = (
        kmeans_assign(df, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_kmeans_string_ids_and_k_guard(spark):
    df = _blobs(spark, n_per=5)
    sdf = df.selectExpr("concat('doc-', vec_id) AS vec_id", "embedding")
    model = kmeans_fit(sdf, k=3)
    rows = kmeans_assign(sdf, model).collect()
    assert len(rows) == 15
    assert all(isinstance(r["vec_id"], str) for r in rows)
    assert {r["cluster_id"] for r in rows} == {0, 1, 2}
    with pytest.raises(ValueError, match="exceeds the corpus"):
        kmeans_fit(df, k=1000)
