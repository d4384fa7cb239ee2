"""Sequence packing + per-domain cap: interval laws and cap laws."""

import pytest
from pyspark.sql import functions as F

from uma_etl_iis_loader_spark.operators.packing import (
    cap_per_group,
    pack_sequences,
)

ROWS = [
    # (source, doc_id, n_tokens)
    ("a", 1, 100),
    ("a", 2, 500),   # straddles the 512 cut at offset 100
    ("a", 3, 12),
    ("a", 4, 0),     # zero-token doc: dropped
    ("a", 5, 1030),  # spans 3 sequences on its own
    ("b", 1, 512),   # exactly one full sequence
    ("b", 2, 1),
]


@pytest.fixture(scope="module")
def packed(spark):
    df = spark.createDataFrame(ROWS, "source string, doc_id long, n_tokens long")
    return {
        (r.source, r.doc_id): r
        for r in pack_sequences(df, budget=512).collect()
    }


def test_pack_hand_computed(packed):
    # group a: cum_before = 0, 100, 600, (zero dropped), 612
    a1, a2, a3, a5 = (packed[("a", i)] for i in (1, 2, 3, 5))
    assert (a1.seq_start, a1.seq_end, a1.offset_in_seq) == (0, 0, 0)
    # doc 2: tokens 100..599 -> sequences 0 and 1
    assert (a2.seq_start, a2.seq_end, a2.offset_in_seq) == (0, 1, 100)
    assert (a3.seq_start, a3.seq_end, a3.offset_in_seq) == (1, 1, 88)
    # doc 5: tokens 612..1641 -> sequences 1..3
    assert (a5.seq_start, a5.seq_end, a5.offset_in_seq) == (1, 3, 100)
    assert ("a", 4) not in packed  # zero-token doc dropped


def test_pack_exact_boundary(packed):
    # a doc of exactly `budget` tokens at offset 0 ends in its own sequence
    b1, b2 = packed[("b", 1)], packed[("b", 2)]
    assert (b1.seq_start, b1.seq_end, b1.offset_in_seq) == (0, 0, 0)
    assert (b2.seq_start, b2.seq_end, b2.offset_in_seq) == (1, 1, 0)


def test_pack_stream_is_gapless(spark):
    """Documents tile the token stream: each doc starts exactly where the
    previous one ended (per group), so a loader reconstructing sequences
    loses no tokens."""
    df = spark.createDataFrame(ROWS, "source string, doc_id long, n_tokens long")
    out = pack_sequences(df, budget=512).orderBy("source", "doc_id").collect()
    pos = {}
    for r in out:
        expect = pos.get(r.source, 0)
        assert r.seq_start * 512 + r.offset_in_seq == expect
        pos[r.source] = expect + r.n_tokens


def test_pack_rejects_bad_budget(spark):
    df = spark.createDataFrame(ROWS, "source string, doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        pack_sequences(df, budget=0)


def test_cap_per_group_laws(spark):
    rows = [("s%d" % (i % 3), i, i * 7 % 50) for i in range(60)]
    df = spark.createDataFrame(rows, "source string, doc_id long, score long")
    out = cap_per_group(
        df, 5, "source", [F.col("score").desc(), F.col("doc_id")]
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for src, kept in by_src.items():
        assert len(kept) == 5
        # kept rows are exactly the top-5 by (score desc, doc_id)
        allrows = sorted(
            (r for r in rows if r[0] == src), key=lambda t: (-t[2], t[1])
        )[:5]
        assert sorted((r.doc_id) for r in kept) == sorted(t[1] for t in allrows)


def test_cap_below_group_size_keeps_all(spark):
    rows = [("x", i, i) for i in range(3)]
    df = spark.createDataFrame(rows, "source string, doc_id long, score long")
    assert cap_per_group(df, 10, "source", ["doc_id"]).count() == 3


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=2000),
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=700),
)
def test_pack_tiling_laws_hypothesis(spark, rows, budget):
    """For ARBITRARY (group, token-count) inputs and budgets: packed
    intervals tile each group's token stream gaplessly in order, offsets
    stay inside the budget, and interval arithmetic is self-consistent."""
    data = [(g, i, n) for i, (g, n) in enumerate(rows)]
    df = spark.createDataFrame(data, "source string, doc_id long, n_tokens long")
    out = pack_sequences(df, budget=budget).orderBy("source", "doc_id").collect()
    pos = {}
    for r in out:
        assert r.n_tokens > 0  # zero-token docs never emitted
        assert 0 <= r.offset_in_seq < budget
        start_tok = r.seq_start * budget + r.offset_in_seq
        assert start_tok == pos.get(r.source, 0)  # gapless tiling
        end_tok = start_tok + r.n_tokens - 1
        assert r.seq_end == end_tok // budget  # interval arithmetic
        assert r.seq_end >= r.seq_start
        pos[r.source] = start_tok + r.n_tokens
    # total coverage: emitted tokens == sum of positive inputs per group
    expect = {}
    for g, _i, n in data:
        if n > 0:
            expect[g] = expect.get(g, 0) + n
    assert pos == expect
