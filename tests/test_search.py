"""BM25 ranking: golden scores on a hand-computed corpus + ordering laws."""

import math

import pytest

from uma_etl_iis_loader_spark.operators.search import bm25_scores


def _bm25_ref(docs, query, k1=1.2, b=0.75):
    """Driver-side reference implementation (plain Python)."""
    toks = {i: [w for w in t.lower().split() if w] for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for term in query:
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, v in toks.items():
            tf = v.count(term)
            if tf:
                w = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
                scores[i] = scores.get(i, 0.0) + w
    return scores


def test_bm25_matches_reference(spark):
    docs = {
        1: "spark shuffles data across the cluster",
        2: "spark spark spark tuning guide",
        3: "an unrelated document about gardens",
        4: "data locality and shuffle avoidance in spark",
    }
    query = ["spark", "shuffle"]
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {r.doc_id: r.score for r in bm25_scores(df, query).collect()}
    exp = _bm25_ref(docs, query)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], rel=1e-12)
    # repetition saturates (k1): doc 2 outranks doc 1 on 'spark' but not 3x
    assert got[2] > got[1]
    # no-match doc absent
    assert 3 not in got


def test_bm25_rare_term_dominates(spark):
    """idf law: a doc matching only the rare term outranks a doc matching
    only the common one (equal tf, equal length)."""
    rows = [(i, "common filler words here") for i in range(1, 9)]
    rows += [(9, "common alpha beta gamma"), (10, "rareterm alpha beta gamma")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.score for r in bm25_scores(df, ["common", "rareterm"]).collect()}
    assert got[10] > got[9]


def test_bm25_empty_query_rejected(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_scores(df, [])


def test_bm25_stable_mode_matches_default(spark):
    """stable=True (exact-sum avgdl + decimal-quantized contribution sum)
    agrees with the full-precision double path to quantization error, and
    is invariant to input partitioning — the property the cross-engine
    adjudication relies on."""
    docs = {
        1: "spark shuffles data across the cluster",
        2: "spark spark spark tuning guide",
        3: "an unrelated document about gardens",
        4: "data locality and shuffle avoidance in spark",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {r.doc_id: r.score for r in bm25_scores(df, ["spark"]).collect()}
    for parts in (1, 7):
        stable = {
            r.doc_id: r.score
            for r in bm25_scores(
                df.repartition(parts), ["spark"], stable=True
            ).collect()
        }
        assert set(stable) == set(got)
        for k in got:
            assert stable[k] == pytest.approx(got[k], abs=1e-7)


def test_rrf_fuse_basics_and_missing_docs(spark):
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.search import rrf_fuse

    a = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "score": [3.0, 2.0, 1.0]})
    )
    b = spark.createDataFrame(
        pd.DataFrame({"doc_id": [2, 3, 4], "score": [9.0, 8.0, 7.0]})
    )
    got = {r["doc_id"]: r["rrf"] for r in rrf_fuse([a, b], k=60).collect()}
    # ranks: a -> 1:1, 2:2, 3:3 ; b -> 2:1, 3:2, 4:3
    assert got[2] == pytest.approx(1 / 62 + 1 / 61)
    assert got[3] == pytest.approx(1 / 63 + 1 / 62)
    assert got[1] == pytest.approx(1 / 61)      # absent from b: 0 term
    assert got[4] == pytest.approx(1 / 63)
    # doc 2 wins the fusion (high in both lists)
    assert max(got, key=got.get) == 2


def test_rrf_fuse_nan_score_contributes_zero(spark):
    # a NaN score must not steal rank 1 (Spark sorts NaN above every
    # double under desc) — it contributes a ZERO term, same contract
    # as rrf_fuse_signals
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.search import rrf_fuse

    a = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3], "score": [float("nan"), 5.0, 4.0]}
        )
    )
    got = {r["doc_id"]: r["rrf"] for r in rrf_fuse([a], k=60).collect()}
    assert got[2] == pytest.approx(1 / 61)  # valid rows rank 1, 2
    assert got[3] == pytest.approx(1 / 62)
    assert got[1] == 0.0                    # NaN: zero contribution


def test_rrf_fuse_per_query_partitioning(spark):
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.search import rrf_fuse

    a = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": [10, 10, 20, 20],
                "doc_id": [1, 2, 1, 2],
                "score": [2.0, 1.0, 1.0, 2.0],
            }
        )
    )
    b = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": [10, 10, 20, 20],
                "doc_id": [1, 2, 1, 2],
                "score": [2.0, 1.0, 2.0, 1.0],
            }
        )
    )
    got = {
        (r["query_id"], r["doc_id"]): r["rrf"]
        for r in rrf_fuse([a, b], query_col="query_id", k=60).collect()
    }
    # query 10: doc 1 is rank 1 in both; query 20: split ranks
    assert got[(10, 1)] == pytest.approx(2 / 61)
    assert got[(10, 2)] == pytest.approx(2 / 62)
    assert got[(20, 1)] == pytest.approx(1 / 62 + 1 / 61)
    assert got[(20, 2)] == pytest.approx(1 / 61 + 1 / 62)
    # determinism under repartitioning
    again = {
        (r["query_id"], r["doc_id"]): r["rrf"]
        for r in rrf_fuse(
            [a.repartition(5), b.repartition(3)],
            query_col="query_id",
            k=60,
        ).collect()
    }
    assert got == again


def test_rrf_fuse_signals_missing_signal_contributes_zero(spark):
    import pandas as pd
    import numpy as np

    from uma_etl_iis_loader_spark.operators.search import (
        rrf_fuse,
        rrf_fuse_signals,
    )

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "s1": [3.0, 2.0, 1.0],
                "s2": [9.0, np.nan, 7.0],  # doc 2 missing from signal 2
            }
        )
    )
    got = {
        r["doc_id"]: r["rrf"]
        for r in rrf_fuse_signals(df, ["s1", "s2"]).collect()
    }
    # doc 2: only the s1 term (rank 2); NaN must NOT rank first
    assert got[2] == pytest.approx(1 / 62)
    # docs 1, 3 rank among the VALID s2 rows: 1 -> rank 1, 3 -> rank 2
    assert got[1] == pytest.approx(1 / 61 + 1 / 61)
    assert got[3] == pytest.approx(1 / 63 + 1 / 62)
    # empty inputs fail loudly, matching the module precedent
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse_signals(df, [])
