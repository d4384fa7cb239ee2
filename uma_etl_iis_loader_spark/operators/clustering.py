"""Public k-means clustering over embedding columns — the standalone
face of the centroid machinery the ANN family already runs on
(``similarity._ivf_centroids`` / ``_assign_centroid``). Users cluster
corpora directly (SemDeDup-style semantic grouping, per-cluster
canonical selection, mixture analysis) without building an ANN index.

Spherical k-means (cosine assignment over L2-normalized vectors) — the
standard for embedding spaces, and exactly what the IVF/SemDeDup paths
use, so a corpus clustered here partitions identically to the cells an
IVF index would build with the same k.

Determinism contract (inherited from ``_ivf_centroids``): hash-ordered
sample init, driver-side Lloyd refinement over a capped deterministic
sample, ties toward the lowest centroid id — reruns and persisted
artifacts agree bit-for-bit; no randomness anywhere.

Scale shape: FIT collects only the capped sample (≤16,384 rows) to the
driver — the documented bounded-collect pattern of the centroid family;
ASSIGN is one ``mapInPandas`` batch matmul with the (k × d) matrix in
the task closure — zero shuffles, no join. k is driver-sized by
construction (a centroid TABLE at 100 TB would still be k rows).

Cite: reference has no clustering surface (`iis_etl/` is relational
ETL); extension surface per SURVEY.md §6. Public recipe: spherical
k-means / Lloyd (textbook), SemDeDup (Abbas et al. 2023) for the
cluster-then-dedup consumer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _assign_centroid, _ivf_centroids


def kmeans_fit(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 3,
) -> dict:
    """Fit k spherical-k-means centroids. Returns
    {"matrix": (k × d) L2-normalized numpy matrix, "k": k} — the same
    model shape the IVF builders embed in their indexes. Raises
    ``ValueError`` when the corpus holds fewer than k vectors (a
    silently-short matrix would desync every consumer that trusts
    model["k"])."""
    c = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<float>").alias("cvec"),
    )
    n = c.limit(k).count()
    if n < k:
        raise ValueError(
            f"kmeans_fit: k={k} exceeds the corpus size ({n} vectors)"
        )
    return {"matrix": _ivf_centroids(c, k, refine_iters), "k": k}


def kmeans_assign(
    df: DataFrame,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every row to its nearest centroid (max cosine, ties to
    the lowest centroid id — the family's stable-argsort rule).
    Returns (id, cluster_id). One mapInPandas matmul, zero shuffles."""
    assigned = _assign_centroid(
        df.select(id_col, F.col(vec_col).cast("array<float>").alias(vec_col)),
        model["matrix"],
        key=id_col,
        vec=vec_col,
        n=1,
    )
    return assigned.select(
        id_col, F.col("centroid_id").alias("cluster_id")
    )


def kmeans_centroids_df(model: dict, spark) -> DataFrame:
    """The fitted centroids as a (cluster_id, centroid) DataFrame — k
    rows, broadcastable by construction; the join-shaped face for
    consumers that need centroid vectors in-plan (e.g. distance-to-
    centroid quality gates)."""
    rows = [
        (int(i), [float(x) for x in v])
        for i, v in enumerate(model["matrix"])
    ]
    return spark.createDataFrame(
        rows, "cluster_id int, centroid array<float>"
    )


def kmeans_cluster_sizes(assigned: DataFrame) -> DataFrame:
    """(cluster_id, n) — the balance telemetry consumers gate on (the
    IVF cell-balance precedent): one map-side-partial count agg."""
    return assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n")
    )
