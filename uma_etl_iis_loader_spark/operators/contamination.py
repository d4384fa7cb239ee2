"""Train/eval n-gram contamination detection (decontamination).

The standard LLM-pipeline integrity check (the n-gram-overlap family used
since GPT-3's 13-gram dedup of eval sets, Brown et al. 2020 App. C): for
every EVAL document, count how many of its distinct word n-grams occur
anywhere in the TRAIN corpus. Downstream policy (drop the doc, strike the
overlapping spans, or just report) consumes the per-doc counts; this
operator computes the counts exactly.

Pairs with ``operators.sampling.deterministic_split``: because split
assignment is append-stable there, contamination found here can only come
from genuine content overlap, never from split churn between runs.

Scale design (100 TB):

- Train grams are ``distinct``-ed then reduced to 64-bit ``xxhash64``
  longs BEFORE the join — the shuffle ships 8-byte keys, never gram
  strings (at n=8+ a gram is ~50-100 bytes; hashing cuts the dominant
  shuffle ~10x). String equality is replaced by hash equality: a false
  hit needs an xxhash64 collision between a train gram and an eval gram
  (~|grams|²/2⁶⁴ expected — negligible below ~10¹⁸ grams; use the
  verbatim-gram variant if exactness at that scale is required).
- The join key is a uniform hash → no skew by construction; hot NATURAL
  grams (stopword runs) collapse in the train-side ``distinct`` to one
  row each, so posting-list blowup cannot occur.
- Output is one row per eval doc: counts aggregate with map-side
  partial aggregation on the eval id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_ngrams


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per eval document: (doc_id, n_ngrams, n_contaminated).

    ``n_ngrams`` counts the doc's DISTINCT word n-grams (lowercased,
    whitespace-tokenized — same canonicalization as the dedup family);
    ``n_contaminated`` counts how many of those occur in any train doc.
    Docs with fewer than ``n`` words emit (0, 0) — present in the output,
    trivially uncontaminated.
    """
    t_grams = (
        train.select(F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
        .select(F.xxhash64("gram").alias("gh"))
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    e_grams = eval_df.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(word_ngrams(F.col(text_col), n)).alias("gram"),
    ).select(
        "doc_id",
        # NULL (never-matching) key for the no-grams placeholder row, so
        # short docs survive the left join without a spurious hash hit
        F.when(F.col("gram").isNotNull(), F.xxhash64("gram")).alias("gh"),
    )
    return (
        e_grams.join(t_grams, "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("gh").isNotNull(), 1).otherwise(0)).alias(
                "n_ngrams"
            ),
            F.sum(F.when(F.col("__hit"), 1).otherwise(0)).alias(
                "n_contaminated"
            ),
        )
    )
