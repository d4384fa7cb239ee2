"""Document chunking: coverage, overlap, and boundary laws."""

from __future__ import annotations

import pytest

from uma_etl_iis_loader_spark.operators.chunking import chunk_documents


def _chunks(spark, texts, chunk, overlap):
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    out = {}
    for r in chunk_documents(df, chunk, overlap).collect():
        out.setdefault(r.doc_id, []).append(r)
    for v in out.values():
        v.sort(key=lambda r: r.chunk_idx)
    return out


def test_chunk_hand_computed(spark):
    words = " ".join(f"w{i}" for i in range(100))
    got = _chunks(spark, {1: words}, chunk=40, overlap=10)[1]
    # starts every 30 words: 0, 30, 60 -> ceil(max(100-10,1)/30) = 3 chunks
    assert [(r.start_word, r.end_word) for r in got] == [(0, 40), (30, 70), (60, 100)]
    assert got[0].chunk_text.split()[:2] == ["w0", "w1"]
    assert got[1].chunk_text.split()[0] == "w30"
    assert got[2].chunk_text.split()[-1] == "w99"


def test_chunk_coverage_and_overlap_laws(spark):
    """Every word covered; consecutive chunks share exactly `overlap`
    words (except possibly the shorter tail); no fully-redundant tail."""
    for n_words, chunk, overlap in [(1, 5, 2), (5, 5, 2), (6, 5, 2), (17, 5, 0), (40, 7, 3)]:
        words = [f"t{i}" for i in range(n_words)]
        got = _chunks(spark, {1: " ".join(words)}, chunk, overlap)[1]
        stride = chunk - overlap
        covered = set()
        for r in got:
            assert r.end_word - r.start_word <= chunk
            assert r.chunk_text.split() == words[r.start_word : r.end_word]
            covered.update(range(r.start_word, r.end_word))
        assert covered == set(range(n_words)), (n_words, chunk, overlap)
        for a, b in zip(got, got[1:]):
            assert b.start_word - a.start_word == stride
            # the next chunk always adds at least one new word
            assert b.end_word > a.end_word


def test_chunk_empty_doc_yields_nothing(spark):
    got = _chunks(spark, {1: "   ", 2: "one two"}, chunk=5, overlap=1)
    assert 1 not in got and len(got[2]) == 1


def test_chunk_rejects_bad_params(spark):
    df = None
    with pytest.raises(ValueError):
        chunk_documents(df, 0)
    with pytest.raises(ValueError):
        chunk_documents(df, 5, 5)
