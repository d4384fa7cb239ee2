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

from ..functions.text import word_ngrams, word_window_array


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


def strike_contaminated_spans(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    margin: int = 0,
) -> DataFrame:
    """Decontamination REMOVAL pass — the policy half of
    :func:`ngram_contamination` (the GPT-3 recipe, Brown et al. 2020
    App. C: don't just count eval overlap in train docs, STRIKE it):
    delete from every train document each word window that matches an
    eval n-gram, plus ``margin`` words on each side, and rebuild the
    document from the surviving words.

    Canonicalization contract: BOTH sides tokenize identically — words
    are whitespace tokens of the original text (empty tokens filtered),
    matched CASE-INSENSITIVELY via per-token lowercasing — and the
    surviving text keeps original casing. Rebuilt text joins words with
    single spaces (whitespace runs do not survive — the same convention
    as ``dedup.dedup_sentence_spans``).

    Returns one row per train doc with non-NULL text: (id, text,
    n_words, n_words_struck, n_hits) — ``text`` is the cleaned document
    ('' when every word was struck), ``n_hits`` the number of matching
    gram windows. NULL-text docs are EXCLUDED from the output (the
    family contract — dsir/lm/dedup_sentence_spans all filter
    ``text IS NOT NULL``), never coerced to empty-string documents.

    Scale shape: grams reduce to 8-byte ``xxhash64`` keys before the
    hit join (the ``ngram_contamination`` recipe — the shuffle never
    ships gram strings); each hit expands to exactly n + 2·margin word
    indexes (a bounded explode — no range join); the struck-index set
    anti-joins the word rows; rebuild is one partial-agg'able
    sort-struct collect per doc. No driver participation."""
    words_arr = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: w != ""
    )

    def tokenized(df):
        # projection barrier: the split+filter chain materializes once
        # per row; downstream branches reference the __wds/__lw column
        # attributes, never the chain (re-inlining it inside per-element
        # lambdas is the measured 5-10x gram-explode trap — see
        # operators/dsir._gram_rows)
        return df.where(F.col(text_col).isNotNull()).select(
            F.col(id_col).alias("__id"), words_arr.alias("__wds")
        ).select(
            "__id",
            "__wds",
            F.transform("__wds", F.lower).alias("__lw"),
        )

    def gram_array(lw):
        # shared window builder (zipped top-level slices), then an
        # 8-byte hash per window — the hash lambda only touches its
        # own element, so no loop-invariant work re-evaluates
        return F.transform(
            word_window_array(lw, n), lambda g: F.xxhash64(g)
        )

    t_tok = tokenized(train)
    # train words with positions (original case preserved for rebuild)
    t_words = t_tok.select(
        "__id", F.posexplode_outer("__wds").alias("i", "w")
    )
    # train gram starts: posexplode ordinal IS the 0-based start index
    t_grams = t_tok.select(
        "__id",
        F.posexplode(gram_array(F.col("__lw"))).alias("s", "gh"),
    )
    e_keys = (
        tokenized(eval_df)
        .select(F.explode(gram_array(F.col("__lw"))).alias("gh"))
        .distinct()
    )
    hits = t_grams.join(e_keys, "gh", "left_semi")
    struck = hits.select(
        "__id",
        F.explode(
            F.sequence(
                F.greatest(F.col("s") - margin, F.lit(0)),
                F.col("s") + (n - 1) + margin,
            )
        ).alias("i"),
    ).distinct()
    kept = t_words.join(struck, ["__id", "i"], "left_anti")
    n_hits = hits.groupBy("__id").agg(F.count(F.lit(1)).alias("n_hits"))
    rebuilt = kept.groupBy("__id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("i").isNotNull(),
                            F.struct("i", "w"),
                        )
                    )
                ),
                lambda x: x.w,
            ),
        ).alias(text_col),
        F.sum(F.when(F.col("i").isNotNull(), 1).otherwise(0)).alias(
            "n_kept"
        ),
    )
    # anchor on the train-id universe: a fully-struck doc has NO kept
    # rows and would otherwise vanish instead of coming back as ''
    return (
        t_tok.select(
            "__id", F.size("__wds").cast("long").alias("n_words")
        )
        .join(rebuilt, "__id", "left")
        .join(n_hits, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
            "n_words",
            (
                F.col("n_words") - F.coalesce(F.col("n_kept"), F.lit(0))
            ).alias("n_words_struck"),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias(
                "n_hits"
            ),
        )
    )
