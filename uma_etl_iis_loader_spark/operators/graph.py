"""Iterative link analysis over edge DataFrames: PageRank.

Why it belongs in a training-data pipeline: link authority is one of
the strongest document-quality priors a web corpus has (the reference's
domain carries no link graph — this is a scale extension alongside
`dedup.connected_components`, which covers the other iterative-graph
shape). The implementation is the power-iteration recurrence expressed
as two narrow-keyed aggregations per round — no GraphX, no RDDs, no
driver-side adjacency.

Per-round shuffle structure (the 100 TB shape):
- contribs: edges ⋈ ranks on src (ranks are (node, rank) pairs ONLY —
  edge payloads shuffle once at the start, never again), then a
  sum-by-dst with map-side partial aggregation. Hot dst nodes
  (celebrity pages) reduce through partial sums, not a single reducer
  row; hot src fan-out is a map-side explode of one joined row.
- dangling mass: one tiny agg over ranks anti-joined to out-degrees,
  reduced to a one-row frame and broadcast-crossJoined into the round's
  plan — it evaluates inside the round's single job, never as its own
  driver action.
- Lineage is truncated every round with ``localCheckpoint(eager=True)``
  (iterative self-joins otherwise stack plans geometrically). Each round
  runs ONE bounded driver action — the eager checkpoint of the new
  ranks — plus, only when ``tol > 0``, the L1-delta scalar (aggregating
  already-materialized (node, rank) frames: one pass over rank pairs,
  never the edge set; ``tol=0`` = fixed-round mode skips it entirely).
  Superseded checkpoint blocks are released by Spark's context cleaner
  as the loop drops their references.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 40,
) -> DataFrame:
    """(node, rank) for every node appearing in ``edges`` (either side),
    under the standard random-surfer model:

        rank(v) = (1-d)/N + d * (Σ_{u→v} rank(u)/outdeg(u) + dangling/N)

    where ``dangling`` is the total rank mass sitting on nodes with no
    out-edges (redistributed uniformly — ranks sum to exactly 1 every
    round, pinned in tests). Duplicate edges are collapsed (an edge
    either exists or it doesn't — multi-edge weighting is a different
    operator). Iteration stops when the L1 delta drops below ``tol`` or
    at ``max_iter``, whichever is first.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("deg")
    ).localCheckpoint(eager=True)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # mass on dangling nodes (no out-edges), redistributed uniformly.
        # A left-ANTI join against the (small) outdeg table, reduced to a
        # ONE-ROW frame and broadcast-crossJoined into the round's plan —
        # no separate driver action (the scalar evaluates inside the
        # round's single checkpoint job; both it and contribs read the
        # MATERIALIZED previous ranks, so nothing re-executes). NOT a
        # reusable ranks⋈outdeg left join, which (evaluated once here and
        # once under contribs) would run twice per round: Spark plans are
        # trees, shared subframes re-execute unless materialized.
        dangling_df = (
            ranks.join(outdeg.select("node"), "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dangling"))
        )
        contribs = (
            e.join(
                ranks.join(outdeg, "node").select(
                    F.col("node").alias("src"),
                    (F.col("rank") / F.col("deg")).alias("share"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("contrib"))
        )
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling_df))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("__dangling") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        # tol<=0 means "run exactly max_iter rounds" — skip the L1-delta
        # action entirely (one fewer job per round; at small scale the
        # per-round cost is job overhead, not data)
        if tol > 0:
            delta = (
                new_ranks.alias("a")
                .join(ranks.alias("b"), "node")
                .agg(F.sum(F.abs(F.col("a.rank") - F.col("b.rank"))))
                .collect()[0][0]
            )
            ranks = new_ranks
            if delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks
