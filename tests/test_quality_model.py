"""Trainable quality classifier: learns a clean-vs-junk boundary the
heuristic alone doesn't encode, scores without shuffles, handles nulls."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from uma_etl_iis_loader_spark.operators.quality_model import (
    QUALITY_FEATURES,
    featurize_docs,
    score_quality,
    train_quality_model,
)

_CLEAN = [
    "The quick brown fox jumps over the lazy dog near the river bank.",
    "Researchers published a detailed study of alpine watershed ecology this spring.",
    "She walked to the market and bought fresh bread, cheese, and olives.",
    "A well written paragraph carries one idea through varied, natural sentences.",
    "The committee reviewed the proposal and suggested several careful revisions.",
]

_JUNK = [
    "click here click here click here click here click here click here",
    "aj3$k9 zzzz 0x7f 0x7f 0x7f ###### $$$$ 1234567890 1234567890",
    "BUY NOW BUY NOW BUY NOW FREE FREE FREE WIN WIN WIN 100% 100%",
    "qqqqqqqq wwwwwwww eeeeeeee rrrrrrrr tttttttt yyyyyyyy",
    "0 1 2 3 4 5 6 7 8 9 0 1 2 3 4 5 6 7 8 9 0 1 2 3 4 5 6 7 8 9",
]


def _corpus(spark, per_class=40):
    rows = []
    for i in range(per_class):
        base = _CLEAN[i % len(_CLEAN)]
        rows.append((f"{base} Variation number {i} adds context.", 1.0))
        junk = _JUNK[i % len(_JUNK)]
        rows.append((f"{junk} {i}", 0.0))
    return spark.createDataFrame(rows, "text string, label double")


def test_quality_model_separates_clean_from_junk(spark):
    df = _corpus(spark)
    train, test = df.randomSplit([0.75, 0.25], seed=11)
    model = train_quality_model(train)
    scored = score_quality(test, model)
    rows = scored.collect()
    assert len(rows) > 10
    acc = sum(
        1 for r in rows if (r.quality_prob >= 0.5) == (r.label == 1.0)
    ) / len(rows)
    assert acc >= 0.9, acc
    # scoring path dropped all intermediates
    assert set(scored.columns) == {"text", "label", "quality_prob"}


def test_featurize_is_narrow_and_null_safe(spark):
    df = spark.createDataFrame([("hello world",), (None,), ("",)], "text string")
    out = featurize_docs(df)
    rows = out.collect()
    assert len(rows) == 3
    for r in rows:
        for f in QUALITY_FEATURES:
            assert r[f] is not None and 0.0 <= r[f] <= 1.0, (r.text, f, r[f])
    # no exchange in the featurization plan (pure narrow projections)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan


def test_quality_model_deterministic(spark):
    df = _corpus(spark, per_class=20)
    m1 = train_quality_model(df)
    m2 = train_quality_model(df)
    c1 = m1.stages[-1].coefficients.toArray().tolist()
    c2 = m2.stages[-1].coefficients.toArray().tolist()
    assert c1 == pytest.approx(c2, abs=1e-10)
