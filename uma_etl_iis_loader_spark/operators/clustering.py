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
    refine_distributed: bool = False,
) -> dict:
    """Fit k spherical-k-means centroids. Returns
    {"matrix": (k × d) L2-normalized numpy matrix, "k": k} — the same
    model shape the IVF builders embed in their indexes. Raises
    ``ValueError`` when the corpus holds fewer than k vectors (a
    silently-short matrix would desync every consumer that trusts
    model["k"]).

    ``refine_distributed=True`` follows the sample-init fit with
    ``refine_iters`` full-corpus Lloyd iterations (assign kernel +
    per-dimension mean — see :func:`_lloyd_distributed`): use it when
    per-cluster BUDGETS hinge on centroid quality and the 16,384-row
    sample's drift from the true corpus distribution matters. The
    default stays sample-only — the FAISS-style fast path."""
    c = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<float>").alias("cvec"),
    )
    n = c.limit(k).count()
    if n < k:
        raise ValueError(
            f"kmeans_fit: k={k} exceeds the corpus size ({n} vectors)"
        )
    mat = _ivf_centroids(c, k, refine_iters)
    if refine_distributed:
        mat = _lloyd_distributed(c, mat, refine_iters)
    return {"matrix": mat, "k": k}


def _lloyd_iteration_stats(c: DataFrame, cent_mat) -> DataFrame:
    """The per-iteration update statistic of :func:`_lloyd_distributed`:
    (centroid_id, idx, s, n) — exact-decimal per-dimension sums of the
    L2-NORMALIZED member vectors plus member counts. ONE shuffle (the
    map-side-partial groupBy; assignment is a shuffle-free mapInPandas
    matmul, the explode is narrow) — plan-asserted in tests."""
    assigned = _assign_centroid(c, cent_mat, "neighbor_id", "cvec", 1)
    # materialize the norm through its own projection so the divide
    # lambda references a computed COLUMN, not a re-evaluated aggregate
    # (the per-element HOF re-evaluation trap)
    with_norm = assigned.select(
        "centroid_id",
        "cvec",
        F.sqrt(
            F.aggregate(
                F.transform(
                    "cvec", lambda x: x.cast("double") * x.cast("double")
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        ).alias("__n"),
    )
    unit = with_norm.select(
        "centroid_id",
        F.posexplode(
            F.transform(
                "cvec",
                lambda x: x.cast("double")
                / F.when(F.col("__n") == 0.0, F.lit(1.0)).otherwise(
                    F.col("__n")
                ),
            )
        ).alias("idx", "v"),
    )
    # decimal(27,12) quantized sums: order-insensitive exact arithmetic
    # (double sums vary with partitioning — the family's determinism
    # contract is bit-stable reruns)
    return unit.groupBy("centroid_id", "idx").agg(
        F.sum(F.col("v").cast("decimal(27,12)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )


def _lloyd_distributed(c: DataFrame, cent_mat, iters: int):
    """Full-corpus spherical Lloyd refinement: per iteration, assign
    every vector with the zero-shuffle batch-matmul kernel, then update
    each centroid to the re-normalized per-dimension MEAN of its
    members' unit vectors — computed as one groupBy over (centroid,
    dimension) with exact-decimal sums, collected as k×d scalars (the
    bounded driver artifact of the centroid family; k and d are
    driver-sized by construction). Emptied clusters keep their previous
    centroid and assignment ties break to the lowest centroid id — the
    exact rules of the driver-sample refinement, so both paths converge
    to the same fixed points. Cost: one shuffle per iteration over
    corpus×d rows; deterministic under any partitioning."""
    import numpy as np

    mat = np.array(cent_mat, dtype=np.float64, copy=True)
    k, d = mat.shape
    for _ in range(max(0, iters)):
        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for r in _lloyd_iteration_stats(c, mat).collect():
            sums[r["centroid_id"], r["idx"]] = float(r["s"])
            counts[r["centroid_id"]] = r["n"]
        nxt = mat.copy()  # empty cluster -> keep previous centroid
        occupied = counts > 0
        means = sums[occupied] / counts[occupied, None]
        norms = np.linalg.norm(means, axis=1)
        norms = np.where(norms == 0, 1.0, norms)
        nxt[occupied] = means / norms[:, None]
        mat = nxt
    return mat


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
