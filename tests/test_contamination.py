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


def _strike_fixture(spark):
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.contamination import (
        strike_contaminated_spans,
    )

    secret = "the quick brown fox jumps over the lazy"  # 8 words
    train = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    f"intro words here {secret} outro words here",
                    "totally unrelated prose with enough words to pass",
                    secret.upper(),  # case-insensitive hit, whole doc
                ],
            }
        )
    )
    eval_df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": [f"context {secret} tail"]})
    )
    return strike_contaminated_spans, train, eval_df, secret


def test_strike_removes_matching_window_case_insensitive(spark):
    strike, train, eval_df, secret = _strike_fixture(spark)
    rows = {r["doc_id"]: r for r in strike(train, eval_df, n=8).collect()}
    # doc 1: the 8 secret words struck, surroundings survive in order
    assert rows[1]["text"] == "intro words here outro words here"
    assert rows[1]["n_words"] == 14
    assert rows[1]["n_words_struck"] == 8
    assert rows[1]["n_hits"] == 1
    # doc 2: untouched (whitespace-normalized contract)
    assert rows[2]["text"] == "totally unrelated prose with enough words to pass"
    assert rows[2]["n_words_struck"] == 0 and rows[2]["n_hits"] == 0
    # doc 3: uppercase variant fully struck -> empty text
    assert rows[3]["text"] == "" and rows[3]["n_words_struck"] == 8


def test_strike_overlapping_hits_strike_union(spark):
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.contamination import (
        strike_contaminated_spans,
    )

    # eval has 'a b c d' and 'c d e f': train 'x a b c d e f y' hits at
    # s=1 and s=3 -> union strikes words 1..6, keeping 'x y'
    train = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["x a b c d e f y"]})
    )
    eval_df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [9, 10], "text": ["a b c d", "c d e f"]})
    )
    r = strike_contaminated_spans(train, eval_df, n=4).collect()[0]
    assert r["text"] == "x y"
    assert r["n_words_struck"] == 6 and r["n_hits"] == 2


def test_strike_margin_extends_and_clamps(spark):
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.contamination import (
        strike_contaminated_spans,
    )

    train = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["a b c d e f g"]})
    )
    eval_df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [9], "text": ["b c d"]})
    )
    # hit at s=1 (words b c d); margin=1 strikes a..e, keeps 'f g';
    # left clamp at 0 must not error
    r = strike_contaminated_spans(train, eval_df, n=3, margin=1).collect()[0]
    assert r["text"] == "f g"
    assert r["n_words_struck"] == 5


def test_strike_empty_and_short_docs_pass_through(spark):
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.contamination import (
        strike_contaminated_spans,
    )

    train = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["", "tiny doc"]})
    )
    eval_df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [9], "text": ["a b c d e f g h"]})
    )
    rows = {r["doc_id"]: r for r in strike_contaminated_spans(
        train, eval_df, n=8
    ).collect()}
    assert rows[1]["text"] == "" and rows[1]["n_words"] == 0
    assert rows[2]["text"] == "tiny doc" and rows[2]["n_hits"] == 0


def test_strike_laws_random_corpus(spark):
    """Seeded random corpus laws: (1) every matching window's words are
    absent from the rebuilt text at their positions (n_words_struck
    covers at least the union of hit windows); (2) no-hit docs rebuild
    to the space-joined original; (3) struck counts never exceed doc
    length."""
    import numpy as np
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.contamination import (
        strike_contaminated_spans,
    )

    rng = np.random.default_rng(7)
    vocab = [f"t{i}" for i in range(12)]  # small vocab -> real overlaps
    n = 4
    train_texts = [
        " ".join(rng.choice(vocab, size=rng.integers(n, 25)))
        for _ in range(30)
    ]
    eval_texts = [
        " ".join(rng.choice(vocab, size=rng.integers(n, 15)))
        for _ in range(5)
    ]
    train = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(30), "text": train_texts})
    )
    eval_df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(100, 105), "text": eval_texts})
    )
    rows = {
        r["doc_id"]: r
        for r in strike_contaminated_spans(train, eval_df, n=n).collect()
    }
    # reference model in plain python
    eval_grams = set()
    for t in eval_texts:
        ws = t.split()
        for s in range(len(ws) - n + 1):
            eval_grams.add(tuple(ws[s:s + n]))
    assert len(rows) == 30
    hit_total = 0
    for i, t in enumerate(train_texts):
        ws = t.split()
        struck = set()
        hits = 0
        for s in range(len(ws) - n + 1):
            if tuple(ws[s:s + n]) in eval_grams:
                struck.update(range(s, s + n))
                hits += 1
        kept = [w for j, w in enumerate(ws) if j not in struck]
        r = rows[i]
        assert r["text"] == " ".join(kept)
        assert r["n_words"] == len(ws)
        assert r["n_words_struck"] == len(struck)
        assert r["n_hits"] == hits
        hit_total += hits
    assert hit_total > 0  # the fixture genuinely exercises strikes
