"""ngram_contamination: exact per-eval-doc overlap counts."""

from pyspark.sql import functions as F

from uma_etl_iis_loader_spark.operators.contamination import ngram_contamination


def test_contamination_counts_exact(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [
            # 6 words -> 4 trigrams, 3 of which appear in train doc 1
            (10, "quick brown fox jumps over me"),
            # no overlap at all
            (11, "completely novel held out material here"),
            # verbatim copy of train doc 2 (8 words -> 6 trigrams, all hit)
            (12, "pack my box with five dozen liquor jugs"),
            # shorter than n -> (0, 0), still present in the output
            (13, "two words"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_ngrams"], r["n_contaminated"])
        for r in ngram_contamination(train, eval_df, n=3).collect()
    }
    assert out == {10: (4, 3), 11: (4, 0), 12: (6, 6), 13: (0, 0)}


def test_contamination_case_and_repeat_insensitive(spark):
    """Canonicalization matches the dedup family: lowercased, distinct
    grams (a gram repeated inside one doc counts once)."""
    train = spark.createDataFrame([(1, "A B C d e")], "doc_id long, text string")
    eval_df = spark.createDataFrame(
        [(20, "a b c a b c")], "doc_id long, text string"
    )
    out = ngram_contamination(train, eval_df, n=3).collect()[0]
    # distinct trigrams of 'a b c a b c': {a b c, b c a, c a b} -> 3;
    # only 'a b c' appears in train
    assert (out["n_ngrams"], out["n_contaminated"]) == (3, 1)
