"""Trainable document-quality classifier (the fastText-style quality
filter of web-corpus pipelines, e.g. the CCNet/GPT-3 "quality vs
reference corpus" recipe) on pyspark.ml.

The heuristic signals in ``functions/text.py`` (length saturation,
alpha ratio, repetition, stopword density) are good FEATURES but a bad
final FILTER — real pipelines learn the decision boundary from labeled
examples (reference corpus = positive, crawl sample = negative). This
module keeps everything distributed: featurization is the same JVM
expressions used elsewhere, training is Spark ML's L-BFGS logistic
regression (driver holds only the coefficient vector), scoring is a
single narrow transform.

Scale shape: features are pure codegen expressions (no Python);
``LogisticRegression.fit`` aggregates gradients tree-wise per
iteration (O(#features) driver state, ~10 doubles here); scoring adds
two narrow projections — no shuffle anywhere in the scoring path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    bpe_token_count,
    distinct_word_count,
    quality_score,
    token_count,
    top_ngram_count,
)

__all__ = ["QUALITY_FEATURES", "featurize_docs", "train_quality_model", "score_quality"]

# feature name -> JVM expression builder over the text column name.
# Ratios are normalized by token/char counts so the model sees
# length-invariant signals plus one explicit length feature.
QUALITY_FEATURES = [
    "f_len_sat",
    "f_alpha_ratio",
    "f_mean_wlen",
    "f_ttr",
    "f_top_bigram_cov",
    "f_digit_ratio",
    "f_upper_ratio",
    "f_bpe_per_word",
    "f_heuristic",
]


def featurize_docs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the QUALITY_FEATURES columns (all JVM expressions, no
    Python, no shuffle). NULL text featurizes as zeros — scoreable, not
    a crash."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    length = F.length(c).cast("double")
    words = token_count(c).cast("double")
    nz_len = F.greatest(length, F.lit(1.0))
    nz_words = F.greatest(words, F.lit(1.0))
    return (
        df.withColumn("f_len_sat", F.least(length / F.lit(2000.0), F.lit(1.0)))
        .withColumn(
            "f_alpha_ratio",
            F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double") / nz_len,
        )
        .withColumn("f_mean_wlen", F.least(length / nz_words / F.lit(15.0), F.lit(1.0)))
        .withColumn("f_ttr", distinct_word_count(c).cast("double") / nz_words)
        .withColumn(
            "f_top_bigram_cov",
            F.lit(2.0) * top_ngram_count(c, 2).cast("double") / nz_words,
        )
        .withColumn(
            "f_digit_ratio",
            F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("double") / nz_len,
        )
        .withColumn(
            "f_upper_ratio",
            F.length(F.regexp_replace(c, r"[^A-Z]", "")).cast("double") / nz_len,
        )
        .withColumn(
            "f_bpe_per_word",
            F.least(bpe_token_count(c).cast("double") / nz_words / F.lit(4.0), F.lit(1.0)),
        )
        .withColumn("f_heuristic", quality_score(c))
    )


def train_quality_model(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    max_iter: int = 50,
    reg_param: float = 0.01,
):
    """Fit a logistic quality classifier on (text, label 0/1) rows;
    returns the fitted PipelineModel (assembler + LR). Training state on
    the driver is one coefficient vector per L-BFGS iteration; the data
    never leaves the executors. Deterministic: L-BFGS from a zero
    initial vector on a fixed dataset has no RNG."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = featurize_docs(labeled, text_col)
    assembler = VectorAssembler(inputCols=QUALITY_FEATURES, outputCol="__fv")
    lr = LogisticRegression(
        featuresCol="__fv",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
        standardization=True,
    )
    return Pipeline(stages=[assembler, lr]).fit(feats)


def score_quality(
    df: DataFrame, model, text_col: str = "text", out_col: str = "quality_prob"
) -> DataFrame:
    """P(quality=1) per document as ``out_col`` — two narrow projections
    (featurize + model transform), no shuffle; ready to use as
    ``.filter(F.col('quality_prob') >= t)`` in a curation chain."""
    from pyspark.ml.functions import vector_to_array

    feats = featurize_docs(df, text_col)
    scored = model.transform(feats)
    prob = F.element_at(vector_to_array(F.col("probability")), 2)
    return scored.withColumn(out_col, prob).drop(
        "__fv", "rawPrediction", "probability", "prediction", *QUALITY_FEATURES
    )
