"""Document chunking: split each document into fixed-size overlapping
word windows — the embedding / RAG / long-context prep stage that sits
between curation and encoding in a training-data pipeline.

Scale design: pure narrow row-local work — tokenize once per document,
then explode a per-doc index sequence and slice the cached word array
per chunk. Zero shuffles, stays in whole-stage codegen (no Python); the
fan-out factor is ~n_words/stride per document, bounded like any
explode by `maxPartitionBytes`-sized input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_words: int,
    overlap_words: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per chunk: (id, chunk_idx, start_word, end_word,
    chunk_text), where chunks start every ``stride = chunk_words -
    overlap_words`` words and the last chunk may be shorter. Documents
    with no words yield no chunks; every word of a non-empty document is
    covered by ≥1 chunk and consecutive chunks share exactly
    ``overlap_words`` words (until the tail).

    ``n_chunks = ceil(max(n_words - overlap, 1) / stride)`` — the count
    that covers the stream without emitting a fully-redundant tail
    chunk (a final window that adds no new words never appears).
    """
    if chunk_words <= 0:
        raise ValueError("chunk_words must be positive")
    if not 0 <= overlap_words < chunk_words:
        raise ValueError("overlap_words must be in [0, chunk_words)")
    stride = chunk_words - overlap_words

    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != ""
    )
    base = docs.select(
        F.col(id_col), words.alias("__ws"), F.size(words).alias("__n")
    ).filter(F.col("__n") > 0)
    n_chunks = F.ceil(
        F.greatest(F.col("__n") - overlap_words, F.lit(1)) / stride
    )
    start = F.col("chunk_idx") * stride
    end = F.least(start + chunk_words, F.col("__n").cast("long"))
    return (
        base.select(
            id_col,
            "__ws",
            "__n",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            id_col,
            "chunk_idx",
            start.alias("start_word"),
            end.alias("end_word"),
            F.array_join(
                F.slice(F.col("__ws"), start + 1, F.lit(chunk_words)), " "
            ).alias("chunk_text"),
        )
    )
