"""End-to-end web-corpus curation: the README recipe executed literally
on a synthetic crawl — HTML strip → unicode fix → learned quality gate →
PII scrub → near-dup dedup → deterministic split — with the corpus-level
properties each stage promises asserted on the final output."""

from __future__ import annotations

from pyspark.sql import functions as F

from uma_etl_iis_loader_spark.functions.text import (
    normalize_unicode_udf,
    quality_score,
    redact_pii,
    strip_html,
)
from uma_etl_iis_loader_spark.operators.dedup import (
    deduplicate_corpus,
    minhash_lsh_pairs,
)
from uma_etl_iis_loader_spark.operators.quality_model import (
    score_quality,
    train_quality_model,
)
from uma_etl_iis_loader_spark.operators.sampling import deterministic_split

def _body(i: int) -> str:
    """Mostly article-unique prose (cross-article 3-gram Jaccard stays far
    below the dedup threshold; a mirror of the SAME article is ~1.0)."""
    words = " ".join(
        f"finding{(i * 31 + k) % 9973} about region{(i * 57 + k * k) % 997}"
        for k in range(25)
    )
    return (
        f"<p>Survey {i} reports that {words} during the spring campaign.</p>"
    )


_PAGE = (
    "<html><head><style>.x{{}}</style><script>track();</script></head>"
    "<body><h1>Article {i}</h1>"
    "{body}"
    "<p>Contact the author at person{i}@example.org for details.</p>"
    "</body></html>"
)

_JUNK = "<body>{i} BUY NOW $$$ 1234567 BUY NOW $$$ 0x7f ###### {i}</body>"


def _crawl(spark, n_articles=30, n_junk=20):
    rows = []
    for i in range(n_articles):
        rows.append((i, _PAGE.format(i=i, body=_body(i))))
        # near-duplicate mirror of every 3rd article (different doc id,
        # whitespace/markup noise only)
        if i % 3 == 0:
            rows.append((1000 + i, _PAGE.format(i=i, body=_body(i)).replace("<p>", "<p >")))
    for j in range(n_junk):
        rows.append((2000 + j, _JUNK.format(i=j)))
    # one mojibake page: utf-8 bytes read as cp1252
    moji = _PAGE.format(i=999, body=_body(999)).replace("Article", "Café résumé Article")
    rows.append((3000, moji.encode("utf-8").decode("cp1252")))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_web_corpus_curation_end_to_end(spark):
    docs = _crawl(spark)

    # 1. clean: markup out, encoding fixed
    docs = docs.withColumn("text", strip_html("text"))
    docs = docs.withColumn("text", normalize_unicode_udf()(F.col("text")))
    cleaned = {r.doc_id: r.text for r in docs.collect()}
    assert "<p>" not in cleaned[0] and "track()" not in cleaned[0]
    assert "Café résumé" in cleaned[3000]

    # 2. learned quality gate: weak-label from the heuristic, refit, score
    labeled = docs.select(
        "text", (quality_score("text") >= 0.5).cast("double").alias("label")
    )
    model = train_quality_model(labeled, max_iter=20)
    docs = score_quality(docs, model).filter(F.col("quality_prob") >= 0.5)
    kept_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert all(j not in kept_ids for j in range(2000, 2020)), "junk survived"
    assert 0 in kept_ids and 3000 in kept_ids

    # 3. PII scrub: the contact emails are gone
    docs = docs.withColumn("text", redact_pii("text"))
    assert docs.filter(F.col("text").contains("@example.org")).count() == 0
    assert docs.filter(F.col("text").contains("<EMAIL>")).count() > 0

    # 4. near-dup dedup: mirrors collapse onto their originals (min id
    # survives), distinct articles all survive
    pairs = minhash_lsh_pairs(
        docs.select(F.col("doc_id").alias("doc_id"), "text"),
        num_hashes=64,
        bands=16,
        n=3,
        threshold=0.7,
    )
    docs = deduplicate_corpus(docs, pairs)
    ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert not any(i >= 1000 and i < 2000 for i in ids), "mirror survived"
    assert all(i in ids for i in range(30)), "an original was lost"

    # 5. deterministic split: stable across recomputation, all rows kept
    split1 = deterministic_split(docs, "doc_id")
    split2 = deterministic_split(docs, "doc_id")
    s1 = {(r.doc_id, r.split) for r in split1.collect()}
    s2 = {(r.doc_id, r.split) for r in split2.collect()}
    assert s1 == s2
    assert {s for _, s in s1} <= {"train", "val", "test"}
    assert len(s1) == len(ids)

    # 6. landing layout: the README's final step runs as written —
    # z-order on (quality_prob, doc_id) is a pure permutation
    from uma_etl_iis_loader_spark.operators.layout import zorder_layout

    landed = zorder_layout(
        split1, ["quality_prob", "doc_id"], out_partitions=4, sample_fraction=1.0
    )
    assert landed.count() == len(ids)
