

def test_winnow_fingerprints_guarantee_and_robustness(spark):
    """Winnowing guarantee: documents sharing a substring of length ≥
    k+window-1 share at least one fingerprint; whitespace/case noise is
    canonicalized away; disjoint texts share (practically) nothing."""
    from uma_etl_iis_loader_spark.functions.text import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, f"PREFIX AAA {shared} suffix one"),
        (2, f"other beginning {shared} ZZ end"),
        (3, f"  The   Quick Brown fox jumps over the lazy DOG tonight  "),
        (4, "completely different content about shuffle partitions"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = winnow_fingerprints(k=5, window=4)
    got = {
        r.doc_id: set(r.fps)
        for r in df.select("doc_id", fp("text").alias("fps")).collect()
    }
    assert got[1] & got[2]  # shared substring → shared fingerprint
    assert got[3] & got[1]  # case/whitespace-insensitive
    assert not (got[1] & got[4])  # unrelated docs don't collide
    # determinism
    got2 = {
        r.doc_id: set(r.fps)
        for r in df.select("doc_id", fp("text").alias("fps")).collect()
    }
    assert got == got2


def test_ru_light_stem_golden_pairs(spark):
    """Inflection pairs collapse to one lexeme (the tsvector-like
    behavior the raw-token path lacks); non-Cyrillic tokens and short
    stems pass through unchanged."""
    from uma_etl_iis_loader_spark.functions.text import ru_light_stem

    from pyspark.sql import functions as F

    pairs = [
        ("лекции", "лекция"),
        ("студентов", "студенты"),
        ("кафедрой", "кафедра"),
        ("расписанию", "расписание"),
        ("занятие", "занятия"),
        ("аудитория", "аудитории"),
        ("математика", "математики"),
        ("информатике", "информатика"),
        ("корпуса", "корпус"),
        ("тёмный", "темный"),  # ё→е normalization
    ]
    rows = [(a, b) for a, b in pairs]
    df = spark.createDataFrame(rows, "a string, b string").select(
        ru_light_stem("a").alias("sa"), ru_light_stem("b").alias("sb")
    )
    for r in df.collect():
        assert r.sa == r.sb, f"{r.sa} != {r.sb}"

    passthrough = ["дом", "мир", "и", "по", "emp-7", "123", "prio", "gpu"]
    df2 = spark.createDataFrame([(w,) for w in passthrough], "w string")
    got = [r[0] for r in df2.select(ru_light_stem("w")).collect()]
    assert got == passthrough


def test_tokenize_stemmed_dedups_lexemes(spark):
    """Distinct inflections of one lemma yield ONE token after stemming."""
    from uma_etl_iis_loader_spark.functions.text import tokenize_stemmed

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("Лекции по лекция: аудитория аудитории!",)], "text string"
    )
    toks = df.select(tokenize_stemmed("text").alias("t")).collect()[0].t
    assert toks.count("лекц") == 1
    assert toks.count("аудитор") == 1
    assert "по" in toks  # short word untouched


def test_repetition_signals(spark):
    """distinct_word_count / top_ngram_count: the Gopher-style repetition
    inputs (type-token ratio, top-bigram occurrence)."""
    from uma_etl_iis_loader_spark.functions.text import (
        distinct_word_count,
        top_ngram_count,
    )

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),        # 2 distinct words; 'a b' occurs 3x
            (2, "all words differ here"),  # no repeated bigram
            (3, "Spam SPAM spam"),     # case-folds to 1 distinct word
            (4, "one"),                # shorter than bigram -> 0
            (5, ""),                   # empty -> (0, 0)
        ],
        "id long, text string",
    )
    out = {
        r["id"]: (r["d"], r["t"])
        for r in df.select(
            "id",
            distinct_word_count("text").alias("d"),
            top_ngram_count("text", 2).alias("t"),
        ).collect()
    }
    assert out == {1: (2, 3), 2: (4, 1), 3: (1, 2), 4: (1, 0), 5: (0, 0)}


def test_pii_redaction_and_counts(spark):
    from uma_etl_iis_loader_spark.functions.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@example.co.uk or visit https://a.b/c?d=1"),
            (2, "server 10.0.255.1 answered; call +1 (555) 123-4567 now"),
            (3, "www.example.org mirrors 192.168.0.1"),
            (4, "no pii here at all"),
        ],
        "id long, text string",
    )
    out = {
        r["id"]: (r["red"], r["c"].asDict())
        for r in df.select(
            "id",
            redact_pii("text").alias("red"),
            pii_counts("text").alias("c"),
        ).collect()
    }
    assert out[1][0] == "mail me at <EMAIL> or visit <URL>"
    assert out[1][1] == {"email": 1, "url": 1, "ip": 0, "phone": 0}
    assert out[2][0] == "server <IP> answered; call <PHONE> now"
    assert out[2][1] == {"email": 0, "url": 0, "ip": 1, "phone": 1}
    # url wins over the dotted-quad inside it; the bare ip is tagged
    assert out[3][0] == "<URL> mirrors <IP>"
    assert out[4][0] == "no pii here at all"
    assert out[4][1] == {"email": 0, "url": 0, "ip": 0, "phone": 0}
