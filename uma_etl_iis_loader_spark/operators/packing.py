"""Sequence packing: lay documents end-to-end into fixed token-budget
training sequences (the concat-then-chunk packing used by LLM pretraining
loaders), computed as a declarative plan.

Within each pack group (``group_col``, e.g. the source/domain — the unit a
training mixture shards by), documents are concatenated in a deterministic
order (``order_col``) and the token stream is cut into sequences of
``budget`` tokens; a document may straddle a cut (chunked packing). The
output assigns every document its token interval: which sequence it starts
in, which it ends in, and its offset inside the starting sequence —
exactly what a loader needs to materialize training rows.

Scale design: ONE window aggregation partitioned by the group key — the
cumulative sum runs in parallel across groups, never through a global
single-partition sort (the classic packing-on-Spark mistake: a windowless
``orderBy`` cumsum serializes 100 TB through one task). Groups are
independent, so skewed group sizes are bounded by the largest single
domain; for a pathologically dominant domain, pre-split it with a salted
subgroup key and re-bias the budget bookkeeping downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    docs: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    group_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign each document its packed-token interval.

    Returns the input keys plus:
    (seq_start, seq_end, offset_in_seq, n_tokens) where
    ``seq_start = floor(cum_before / budget)``,
    ``seq_end = floor((cum_before + n_tokens - 1) / budget)`` (inclusive;
    equals seq_start when the doc fits in one sequence), and
    ``offset_in_seq = cum_before % budget``. Zero-token docs occupy no
    interval and are dropped. Sequence ids are per-group.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n = F.col(token_col).cast("long")
    cum_before = F.coalesce(F.sum(n).over(w), F.lit(0))
    return (
        docs.filter(n > 0)
        .select(
            group_col,
            order_col,
            n.alias("n_tokens"),
            cum_before.alias("__cb"),
        )
        .select(
            group_col,
            order_col,
            "n_tokens",
            F.floor(F.col("__cb") / budget).alias("seq_start"),
            F.floor((F.col("__cb") + F.col("n_tokens") - 1) / budget).alias(
                "seq_end"
            ),
            (F.col("__cb") % budget).alias("offset_in_seq"),
        )
    )


def cap_per_group(
    df: DataFrame,
    cap: int,
    group_col: str = "source",
    order_cols: list | None = None,
) -> DataFrame:
    """Mixture control: keep at most ``cap`` rows per group, preferring
    rows earliest in ``order_cols`` (e.g. quality descending with an id
    tiebreak — the per-domain cap step of a corpus mixture, which stops a
    single crawl domain from dominating the training distribution).

    One window row_number per group — the same single-shuffle shape as
    the packing cumsum; no global sort, no driver-side group inventory.
    """
    if cap <= 0:
        raise ValueError("cap must be positive")
    order_cols = order_cols or [df.columns[0]]
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )
