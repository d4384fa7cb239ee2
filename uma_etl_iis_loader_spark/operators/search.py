"""Full-text search ranking over tokenized documents.

The reference's search surface is tsvector MATCHING only
(`iis_etl/logic.py:394-404` builds the vector; queries test overlap).
This module adds the ranking a real search endpoint needs: Okapi BM25
scoring, expressed as one declarative plan.

Scale design: the per-doc token explode filters to QUERY terms
immediately (only matching rows survive the narrow stage — a handful per
doc), so the shuffled term-frequency aggregation is proportional to
matches, not corpus tokens. Corpus statistics (N, avgdl, per-term df)
are computed in-plan and broadcast — no driver collect anywhere; the
query terms themselves are the only driver-side input (they ARE the
query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_scores(
    docs: DataFrame,
    query_tokens: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    stable: bool = False,
) -> DataFrame:
    """(doc_id, score) for every document matching ≥1 query token —
    UNORDERED (a trailing global sort would cost a range exchange in
    every plan that composes this frame, e.g. the RRF fusion; rank or
    sort at the consumer: ``rrf_fuse`` windows by (score DESC, id),
    top-k via orderBy+limit compiles to TakeOrderedAndProject).

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))  [Robertson-Sparck Jones,
    the +1 form that keeps idf positive];
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl)).

    ``stable=True`` makes the score bit-reproducible across partitionings
    and engines: avgdl is computed as exact-integer sum ÷ count (one
    double division — plain double ``avg`` accumulates order-sensitively)
    and per-term contributions are quantized to decimal(20,8) before the
    per-doc sum (an exact-rational sum, insensitive to partition order and
    to last-bit libm ``log`` differences). Costs one decimal aggregation;
    the default double path keeps full precision for in-engine ranking.
    """
    if not query_tokens:
        raise ValueError("query_tokens must be non-empty")
    terms = [t.lower() for t in query_tokens]

    words = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"[^\p{L}\p{N}]+"),
        lambda x: x != "",
    )
    # doc length is a NARROW per-row expression (full length, before the
    # query filter — BM25 normalizes by it) carried through the matched
    # rows, so no corpus-wide per-doc aggregate and no dl join exist
    base = docs.select(
        F.col(id_col).alias("id"), F.size(words).alias("dl"), words.alias("ws")
    )
    # corpus stats: scalar aggregate over the narrow dl projection
    avgdl_expr = (
        (F.sum("dl").cast("double") / F.count(F.lit(1)))
        if stable
        else F.avg("dl")
    )
    stats = base.select("dl").agg(
        F.count(F.lit(1)).alias("n_docs"), avgdl_expr.alias("avgdl")
    )
    matched = base.select("id", "dl", F.explode("ws").alias("tok")).filter(
        F.col("tok").isin(terms)
    )
    tf = matched.groupBy("id", "tok").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    df_t = (
        matched.select("id", "tok")
        .distinct()
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    # df_t (≤|query| rows) and stats (1 row) broadcast
    contrib = (
        tf.join(F.broadcast(df_t), "tok")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "w",
            idf
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    score = (
        F.sum(F.col("w").cast("decimal(20,8)")).cast("double")
        if stable
        else F.sum("w")
    )
    return (
        contrib.groupBy("id")
        .agg(score.alias("score"))
        .select(F.col("id").alias(id_col), "score")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    score_col: str = "score",
    query_col: str | None = None,
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009 — the standard
    hybrid-retrieval combiner, e.g. BM25 ⊕ vector ⊕ prior):
    rrf(d) = Σ_lists 1/(k + rank_list(d)), documents absent from a
    list contribute 0 — as do NULL/NaN-scored rows (same
    missing-signal contract as :func:`rrf_fuse_signals`). Ranks are dense positions by (score DESC, id)
    — deterministic under any partitioning and engine-replayable (the
    per-term 1/(k+r) values and their fixed-order sum are identical
    IEEE doubles on every engine, so the fused score is
    hash-adjudicable after integer scaling). Returns
    ([query], id, rrf).

    Scale shape: ranking inputs are per-query CANDIDATE lists (top-k
    serving output, bounded by construction), so the rank window costs
    one pass per list; pass ``query_col`` to partition the windows by
    query — without it the window is global, which is only the right
    shape for single-query/rerank-stage inputs. The join fan-in is
    |lists| frames on the (query, id) key."""
    from pyspark.sql import Window

    if not rankings:
        raise ValueError("rankings must be non-empty")
    keys = ([query_col] if query_col else []) + [id_col]
    fused = None
    terms = []
    for i, r in enumerate(rankings):
        part = (
            Window.partitionBy(query_col)
            if query_col
            else Window.partitionBy(F.lit(1))
        )
        # NaN -> NULL before ranking (same guard as rrf_fuse_signals):
        # Spark sorts NaN ABOVE every double under desc, so an unguarded
        # NaN score would steal rank 1; normalized, invalid scores sort
        # nulls-last and contribute a zero term like a missing signal
        sc = F.when(
            ~F.isnan(F.col(score_col).cast("double")), F.col(score_col)
        )
        w = part.orderBy(sc.desc(), F.col(id_col))
        ranked = r.select(
            *keys,
            F.when(
                sc.isNotNull(), F.row_number().over(w)
            ).alias(f"__r{i}"),
        )
        fused = (
            ranked
            if fused is None
            else fused.join(ranked, keys, "full_outer")
        )
        terms.append(
            F.when(
                F.col(f"__r{i}").isNotNull(),
                1.0 / (F.lit(float(k)) + F.col(f"__r{i}")),
            ).otherwise(F.lit(0.0))
        )
    rrf = terms[0]
    for t in terms[1:]:
        rrf = rrf + t
    return fused.select(*keys, rrf.alias("rrf"))


def rrf_fuse_signals(
    df: DataFrame,
    score_cols: list[str],
    id_col: str = "doc_id",
    query_col: str | None = None,
    k: int = 60,
) -> DataFrame:
    """RRF over multiple signal COLUMNS of one candidate frame — the
    rerank-stage shape (every signal already materialized per row, the
    common case after a retrieval join): same 1/(k + rank) formula as
    :func:`rrf_fuse`, but each ranking is a window over the SAME rows,
    so the plan is chained Window operators over one exchange — no
    per-list joins, no re-evaluation of the candidate subtree. Appends
    an ``rrf`` column. Term order follows ``score_cols`` (fixed-order
    IEEE-double sum — engine-replayable, hash-adjudicable after
    integer scaling).

    Missing-signal contract matches list mode: a NULL or NaN score in
    a column contributes a ZERO term for that row (after an outer
    retrieval join, a doc absent from one retriever has NULL there —
    and Spark would otherwise sort NaN as the BEST descending rank).
    Valid rows rank among themselves; invalid rows sort after them."""
    from pyspark.sql import Window

    if not score_cols:
        raise ValueError("score_cols must be non-empty")
    part = (
        Window.partitionBy(query_col)
        if query_col
        else Window.partitionBy(F.lit(1))
    )
    rrf = None
    for c in score_cols:
        # NaN -> NULL so desc's nulls-last ordering pushes missing
        # signals below every valid score (NaN sorts ABOVE all doubles)
        sc = F.when(
            ~F.isnan(F.col(c).cast("double")), F.col(c)
        )
        w = part.orderBy(sc.desc(), F.col(id_col))
        term = F.when(
            sc.isNotNull(),
            1.0 / (F.lit(float(k)) + F.row_number().over(w)),
        ).otherwise(F.lit(0.0))
        rrf = term if rrf is None else rrf + term
    return df.select(*df.columns, rrf.alias("rrf"))
