

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
