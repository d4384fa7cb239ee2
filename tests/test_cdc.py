"""CDC stream: two snapshot micro-batches through the SCD2 maintainer
must produce the same dim as applying scd2_apply twice in batch."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from uma_etl_iis_loader_spark.streaming.cdc import Scd2StreamMaintainer

SCHEMA = (
    "id long, name string, course int, "
    "valid_from timestamp, valid_to timestamp"
)
INC_SCHEMA = "id long, name string, course int"


def _run_batch(spark, maintainer, rows):
    inc = spark.createDataFrame(rows, INC_SCHEMA)
    d = tempfile.mkdtemp(prefix="cdc_in_")
    inc.coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(INC_SCHEMA).parquet(d)
    ckpt = tempfile.mkdtemp(prefix="cdc_ckpt_")
    q = maintainer.attach(stream, ckpt).start()
    q.awaitTermination(120)


def test_scd2_stream_maintainer(spark):
    state = tempfile.mkdtemp(prefix="cdc_state_") + "/dim"
    m = Scd2StreamMaintainer(
        spark,
        state,
        natural_key="id",
        type2_cols=["name", "course"],
        type1_cols=[],
        dim_schema=SCHEMA,
    )
    # batch 0: initial snapshot
    _run_batch(spark, m, [(1, "G1", 1), (2, "G2", 2)])
    # batch 0 (second stream): rename G1, drop G2, add G3
    _run_batch(spark, m, [(1, "G1-renamed", 1), (3, "G3", 3)])

    rows = {
        (r.id, r.name, r.valid_to is None) for r in m.current().collect()
    }
    assert rows == {
        (1, "G1", False),  # closed old version
        (1, "G1-renamed", True),  # new current version
        (2, "G2", False),  # closed (missing from snapshot 2)
        (3, "G3", True),  # inserted
    }


def test_batch_timestamp_monotonic_past_sixty(spark):
    """Batch timestamps derive from the FULL batch_id: batch 61 must get a
    later valid_from than batch 1 (a modulo-60 clock recycled timestamps
    after one wrap, inverting valid_from/valid_to ordering and colliding
    hash surrogates keyed on (id, valid_from))."""
    state = tempfile.mkdtemp(prefix="cdc_state_") + "/dim"
    m = Scd2StreamMaintainer(
        spark,
        state,
        natural_key="id",
        type2_cols=["name", "course"],
        type1_cols=[],
        dim_schema=SCHEMA,
    )
    inc1 = spark.createDataFrame([(1, "G1", 1)], INC_SCHEMA)
    m.apply_batch(inc1, batch_id=1)
    inc2 = spark.createDataFrame([(1, "G1-renamed", 1)], INC_SCHEMA)
    m.apply_batch(inc2, batch_id=61)

    rows = sorted(m.current().collect(), key=lambda r: str(r.valid_from))
    assert len(rows) == 2
    closed, current = rows
    assert closed.valid_to == current.valid_from  # ordering intact
    assert closed.valid_from < current.valid_from  # strictly monotonic


def test_replayed_batch_is_idempotent(spark):
    """Exactly-once on recovery: foreachBatch can re-deliver a micro-batch
    whose state swap committed but whose checkpoint offset didn't. Because
    the batch timestamp derives from batch_id (not wall clock) and SCD2 of
    an already-applied snapshot produces no transitions, re-applying the
    SAME (incoming, batch_id) must leave the dim byte-identical."""
    state = tempfile.mkdtemp(prefix="cdc_state_rp_") + "/dim"
    m = Scd2StreamMaintainer(
        spark,
        state,
        natural_key="id",
        type2_cols=["name", "course"],
        type1_cols=[],
        dim_schema=SCHEMA,
    )
    b0 = spark.createDataFrame([(1, "G1", 1), (2, "G2", 2)], INC_SCHEMA)
    b1 = spark.createDataFrame([(1, "G1x", 1), (3, "G3", 3)], INC_SCHEMA)
    m.apply_batch(b0, 0)
    m.apply_batch(b1, 1)
    before = sorted(map(tuple, m.current().collect()))
    # crash-recovery replay of the last batch
    m.apply_batch(b1, 1)
    after = sorted(map(tuple, m.current().collect()))
    assert after == before
    # and a replay of an OLDER batch (out-of-order redelivery) is also
    # harmless: every transition it would make already happened
    m.apply_batch(b1, 1)
    m.apply_batch(b1, 1)
    assert sorted(map(tuple, m.current().collect())) == before


def test_dedup_ingest_stream(spark, sf_dir):
    """Streaming corpus curation: two landed shards flow through the
    LSH-index dedup; the final corpus equals the incremental batch
    result, and a replayed shard appends nothing (exactly-once)."""
    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.io import read_fixture
    from uma_etl_iis_loader_spark.operators.dedup import build_minhash_index
    from uma_etl_iis_loader_spark.streaming.cdc import DedupIngestMaintainer

    docs = read_fixture(spark, sf_dir, "documents").select("doc_id", "text")
    seed = docs.filter(F.col("doc_id") < 100)
    s1 = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 300))
    s2 = docs.filter(F.col("doc_id") >= 300)

    base = tempfile.mkdtemp(prefix="dedup_ingest_")
    idx, corpus = base + "/idx", base + "/corpus"
    kw = dict(num_hashes=64, bands=16, n=3, char_level=False)
    build_minhash_index(seed, idx, **kw)
    seed.write.mode("overwrite").parquet(corpus)

    m = DedupIngestMaintainer(corpus, idx, threshold=0.35, **kw)
    m.apply_batch(s1, 0)
    m.apply_batch(s2, 1)
    n_after = m.read_corpus(spark).count()
    # replay of shard 2: the commit marker short-circuits it
    m.apply_batch(s2, 1)
    assert m.read_corpus(spark).count() == n_after
    # replay with the marker REMOVED (crash window between the index
    # append and the marker write): every doc matches its own indexed
    # copy → zero recomputed survivors — the batch directory's content
    # must be preserved, not overwritten with the empty result
    import os

    os.remove(corpus + "/_commits/batch-1.done")
    m.apply_batch(s2, 1)
    assert m.read_corpus(spark).count() == n_after
    assert os.path.exists(corpus + "/_commits/batch-1.done")

    # corpus docs are pairwise "new" survivors: re-incrementing the whole
    # non-seed corpus against a fresh seed-only index reproduces it
    ids = {r.doc_id for r in m.read_corpus(spark).collect()}
    from uma_etl_iis_loader_spark.operators.dedup import dedup_increment

    idx2 = base + "/idx2"
    build_minhash_index(seed, idx2, **kw)
    s1_out = dedup_increment(s1, idx2, threshold=0.35, **kw)
    s2_out = dedup_increment(s2, idx2, threshold=0.35, **kw)
    expect = (
        {r.doc_id for r in seed.collect()}
        | {r.doc_id for r in s1_out["survivors"].collect()}
        | {r.doc_id for r in s2_out["survivors"].collect()}
    )
    assert ids == expect


def test_dedup_ingest_crash_between_corpus_and_index(spark, sf_dir):
    """Crash window: the batch directory committed but the index append
    did not (no marker either). The replay must recompute the SAME
    survivors (the index doesn't know the batch yet), rewrite the same
    corpus content, and complete the index append — no loss, no dups."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.io import read_fixture
    from uma_etl_iis_loader_spark.operators.dedup import (
        build_minhash_index,
        dedup_increment,
    )
    from uma_etl_iis_loader_spark.streaming.cdc import DedupIngestMaintainer

    docs = read_fixture(spark, sf_dir, "documents").select("doc_id", "text")
    seed = docs.filter(F.col("doc_id") < 100)
    s1 = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 300))

    base = tempfile.mkdtemp(prefix="dedup_crash_")
    idx, corpus = base + "/idx", base + "/corpus"
    kw = dict(num_hashes=64, bands=16, n=3, char_level=False)
    build_minhash_index(seed, idx, **kw)
    seed.write.mode("overwrite").parquet(corpus)

    # simulate the first delivery dying right after the corpus write:
    # batch dir exists, index NOT appended, marker missing
    out = dedup_increment(s1, idx, threshold=0.35, update_index=False, **kw)
    surv = out["survivors"].localCheckpoint(eager=True)
    n_surv = surv.count()
    surv.write.mode("overwrite").parquet(corpus + "/batch-0")

    m = DedupIngestMaintainer(corpus, idx, threshold=0.35, **kw)
    m.apply_batch(s1, 0)  # recovery replay
    assert m.read_corpus(spark).count() == 100 + n_surv
    assert os.path.exists(corpus + "/_commits/batch-0.done")
    # index now knows the survivors: a fresh shard replay dedups to zero
    os.remove(corpus + "/_commits/batch-0.done")
    m.apply_batch(s1, 0)
    assert m.read_corpus(spark).count() == 100 + n_surv


def test_dedup_ingest_zero_gram_docs_idempotent(spark):
    """Zero-gram documents (empty/whitespace text, or text shorter than
    n) share the sentinel MinHash signature, so they bucket-collide with
    their own indexed copies; the both-empty verify compares canonical
    fingerprints, so IDENTICAL short docs dedup among themselves, a
    replayed batch appends nothing (previously 0/0 = NULL dropped the
    pair and every replay re-appended them), and DISTINCT sub-n docs
    ("xy") are NOT collapsed into unrelated empties."""
    import tempfile

    from uma_etl_iis_loader_spark.operators.dedup import build_minhash_index
    from uma_etl_iis_loader_spark.streaming.cdc import DedupIngestMaintainer

    base = tempfile.mkdtemp(prefix="dedup_zerogram_")
    idx, corpus = base + "/idx", base + "/corpus"
    kw = dict(num_hashes=16, bands=4, n=3, char_level=False)
    seed = spark.createDataFrame(
        [(1, "a seeded document with plenty of words to gram")],
        "doc_id long, text string",
    )
    build_minhash_index(seed, idx, **kw)
    seed.write.mode("overwrite").parquet(corpus)

    m = DedupIngestMaintainer(corpus, idx, threshold=0.35, **kw)
    shard = spark.createDataFrame(
        [(10, ""), (11, "   "), (12, "xy")], "doc_id long, text string"
    )
    m.apply_batch(shard, 0)
    # "" and "   " canonicalize identically → min-id 10 survives for the
    # pair; "xy" is DISTINCT content and must survive on its own
    ids = {r.doc_id for r in m.read_corpus(spark).collect()}
    assert ids == {1, 10, 12}
    # crash-window replay (marker removed): docs 10 and 12 match their
    # own indexed copies (fingerprint-equal) — nothing re-appended or
    # lost
    import os

    os.remove(corpus + "/_commits/batch-0.done")
    m.apply_batch(shard, 0)
    assert {r.doc_id for r in m.read_corpus(spark).collect()} == {1, 10, 12}


def test_dedup_ingest_candidate_budget_guard(spark):
    """A boilerplate-heavy shard at a recall-tuned banding must fail
    fast (with the measured candidate mass in the error) BEFORE the
    verify join — not stall the stream — and must leave no partial
    state: no batch directory, no marker, no index append. Guarded
    batches within budget record per-batch telemetry."""
    import os
    import tempfile

    import pytest

    from uma_etl_iis_loader_spark.operators.dedup import build_minhash_index
    from uma_etl_iis_loader_spark.streaming.cdc import DedupIngestMaintainer

    kw = dict(num_hashes=16, bands=4, n=3, char_level=False)
    seed = spark.createDataFrame(
        [(1, "a seed document with a good number of distinct words inside")],
        "doc_id long, text string",
    )
    boiler = "shared boilerplate header repeated across every page footer"
    heavy = spark.createDataFrame(
        [(100 + i, f"{boiler} variant {i}") for i in range(40)],
        "doc_id long, text string",
    )
    light = spark.createDataFrame(
        [(500, "one genuinely novel document about columnar encodings")],
        "doc_id long, text string",
    )

    base = tempfile.mkdtemp(prefix="dedup_guard_")
    idx, corpus = base + "/idx", base + "/corpus"
    build_minhash_index(seed, idx, **kw)
    seed.write.mode("overwrite").parquet(corpus)

    m = DedupIngestMaintainer(
        corpus, idx, threshold=0.35, max_candidate_pairs=50, **kw
    )
    with pytest.raises(RuntimeError, match="ingest candidate budget"):
        m.apply_batch(heavy, 0)
    # nothing landed: no batch dir, no marker, corpus unchanged
    assert not os.path.exists(os.path.join(corpus, "batch-0"))
    assert not os.path.exists(
        os.path.join(corpus, "_commits", "batch-0.done")
    )
    assert m.read_corpus(spark).count() == 1
    assert 0 not in m.batch_telemetry

    # a within-budget batch proceeds and records its telemetry
    m.apply_batch(light, 1)
    assert m.read_corpus(spark).count() == 2
    assert m.batch_telemetry[1]["candidate_mass"] <= 50
    assert set(m.batch_telemetry[1]) == {
        "candidate_mass", "n_buckets", "max_new", "max_old",
    }


def test_compact_minhash_index_dedupes_replay_residue(spark):
    """Replay residue (duplicate index rows) must compact away without
    changing increment results."""
    import tempfile

    from uma_etl_iis_loader_spark.operators.dedup import (
        append_minhash_index,
        build_minhash_index,
        compact_minhash_index,
        dedup_increment,
    )

    kw = dict(num_hashes=16, bands=4, n=3, char_level=False)
    seed = spark.createDataFrame(
        [(1, "a seed document with a good number of distinct words inside")],
        "doc_id long, text string",
    )
    shard = spark.createDataFrame(
        [(10, "a fresh shard document sharing nothing with the seed text")],
        "doc_id long, text string",
    )
    idx = tempfile.mkdtemp(prefix="lsh_cmp_") + "/idx"
    build_minhash_index(seed, idx, **kw)
    append_minhash_index(shard, idx, **kw)
    append_minhash_index(shard, idx, **kw)  # simulated replay residue
    grams = spark.read.parquet(idx + "/grams")
    assert grams.count() > grams.distinct().count()  # residue exists
    from uma_etl_iis_loader_spark.operators.index_pointer import (
        resolve_table,
    )

    compact_minhash_index(spark, idx)
    grams2 = spark.read.parquet(resolve_table(idx, "grams"))
    assert grams2.count() == grams2.distinct().count()
    # the shard now matches its own indexed copy: zero survivors
    out = dedup_increment(shard, idx, threshold=0.35, update_index=False, **kw)
    assert out["survivors"].count() == 0


def test_passages_ingest_maintainer(spark):
    """Streaming passage detection: batch outputs land once, markers
    short-circuit full replays, the marker-less replay window only
    rewrites the batch directory AND never double-appends the index
    (nd totals stay constant), and a later shard genuinely sees repeats
    learned from an earlier shard."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.operators.passages import (
        build_shingle_index,
    )
    from uma_etl_iis_loader_spark.streaming.cdc import (
        PassagesIngestMaintainer,
    )

    def index_nd_total(idx):
        return (
            spark.read.parquet(idx + "/keys")
            .agg(F.sum("nd"))
            .collect()[0][0]
        )

    phrase = " ".join(f"s{i}" for i in range(10))
    s1_tail = " ".join(f"t{i}" for i in range(8))  # 8 tokens: one window
    seed = spark.createDataFrame(
        [(1, phrase + " plus seed only words here")],
        "doc_id long, text string",
    )
    base = tempfile.mkdtemp(prefix="passages_stream_")
    idx, outp = base + "/idx", base + "/out"
    build_shingle_index(seed, idx, k=8)

    m = PassagesIngestMaintainer(outp, idx, k=8)
    s1 = spark.createDataFrame(
        [(10, phrase + " " + s1_tail)], "doc_id long, text string"
    )
    m.apply_batch(s1, 0)
    spans = [tuple(r) for r in m.read_output(spark, "spans").collect()]
    assert spans == [(10, 0, 9)]  # the shared 10-word phrase
    n_stats = m.read_output(spark, "stats").count()
    nd_after_b0 = index_nd_total(idx)

    # marker short-circuit: nothing recomputed, nothing re-appended
    m.apply_batch(s1, 0)
    assert m.read_output(spark, "stats").count() == n_stats
    assert index_nd_total(idx) == nd_after_b0
    # marker-less replay after the index learned the batch: directory is
    # rewritten (self-match makes MORE windows repeated, never fewer)
    # and the index append is IDEMPOTENT — nd totals must not inflate
    os.remove(outp + "/_commits/batch-0.done")
    m.apply_batch(s1, 0)
    assert m.read_output(spark, "stats").count() == n_stats
    assert m.read_output(spark, "spans").count() >= 1
    assert os.path.exists(outp + "/_commits/batch-0.done")
    assert index_nd_total(idx) == nd_after_b0  # no double-append

    # a second shard whose text contains s1's exact 8-token tail window:
    # the repeat is only detectable if the index actually learned s1
    s2 = spark.createDataFrame(
        [(20, s1_tail + " plus brand new trailing words")],
        "doc_id long, text string",
    )
    m.apply_batch(s2, 1)
    b1_spans = [
        tuple(r)
        for r in spark.read.parquet(outp + "/spans/batch-1").collect()
    ]
    assert b1_spans == [(20, 0, 7)]  # s1's tail window found via the index
    assert m.read_output(spark, "stats").count() == n_stats + 1


def test_funnel_compaction_late_exact(spark):
    """The stream-then-compact law: land out-of-order micro-batches whose
    arrival pattern makes the live streaming funnel diverge (a late event
    that should have lowered an already-set anchor), then compact — the
    exact table must equal the batch funnel over the same events, and
    replayed ingest batches / repeated compactions must be no-ops."""
    import os
    from datetime import datetime, timezone

    from uma_etl_iis_loader_spark.operators.funnel import funnel_steps
    from uma_etl_iis_loader_spark.streaming.cdc import (
        FunnelCompactionMaintainer,
    )

    def ts(s):
        return datetime(2024, 1, 1, 0, 0, s, tzinfo=timezone.utc).replace(
            tzinfo=None
        )

    schema = "user_id long, event_type string, ts timestamp"
    steps = ["view", "click", "buy"]
    base = tempfile.mkdtemp(prefix="funnel_compact_")
    m = FunnelCompactionMaintainer(base, steps)

    # batch 0: user 1's click lands BEFORE its view; user 2 completes
    # in order; a non-step event must be filtered out
    b0 = [(1, "click", ts(10)), (2, "view", ts(1)), (2, "click", ts(2)),
          (2, "buy", ts(3)), (1, "scroll", ts(4))]
    # batch 1: user 1's view arrives LATE with an EARLIER ts — the
    # streaming funnel would anchor view=t5 but never revisit the click
    b1 = [(1, "view", ts(5)), (3, "view", ts(20))]
    for bid, rows in ((0, b0), (1, b1)):
        m.apply_batch(spark.createDataFrame(rows, schema), bid)

    all_events = spark.createDataFrame(b0 + b1, schema)
    m.compact(spark)
    want = {
        tuple(r) for r in funnel_steps(all_events, steps).collect()
    }
    got = {tuple(r) for r in m.read_exact(spark).collect()}
    assert got == want
    # the law's teeth: user 1 must be depth 2 here (view t5 → click t10)
    # — the live stream's no-retroactive-anchor trade would say depth 1
    assert any(r[0] == 1 and r[-1] == 2 for r in got)

    # replayed ingest batch: marker short-circuits, events unchanged
    n_before = m.read_events(spark).count()
    m.apply_batch(spark.createDataFrame(b0, schema), 0)
    assert m.read_events(spark).count() == n_before

    # repeated compaction: identical result, no residue dirs
    m.compact(spark)
    assert {tuple(r) for r in m.read_exact(spark).collect()} == want
    assert not os.path.isdir(base + "/exact.next")
    assert not os.path.isdir(base + "/exact.old")

    # horizon: compacting behind t20 drops user 3 entirely
    m.compact(spark, horizon=ts(15))
    got_h = {tuple(r) for r in m.read_exact(spark).collect()}
    want_h = {
        tuple(r)
        for r in funnel_steps(
            all_events.filter(F.col("ts") <= ts(15)), steps
        ).collect()
    }
    assert got_h == want_h and not any(r[0] == 3 for r in got_h)


def test_funnel_compaction_via_stream_attach(spark):
    """Same law through the real writeStream path (availableNow trigger),
    plus crash-residue self-heal: a leftover exact.next/.old from a
    crashed compaction is cleaned and the swap still lands."""
    import os
    import shutil

    from uma_etl_iis_loader_spark.operators.funnel import funnel_steps
    from uma_etl_iis_loader_spark.streaming.cdc import (
        FunnelCompactionMaintainer,
    )

    schema = "user_id long, event_type string, ts timestamp"
    steps = ["view", "click"]
    from datetime import datetime

    def ts(s):
        return datetime(2024, 1, 1, 0, 0, s)

    rows = [(1, "click", ts(9)), (1, "view", ts(4)), (2, "view", ts(1))]
    base = tempfile.mkdtemp(prefix="funnel_stream_")
    m = FunnelCompactionMaintainer(base, steps)
    src = tempfile.mkdtemp(prefix="funnel_src_")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = m.attach(stream, tempfile.mkdtemp(prefix="funnel_ckpt_")).start()
    q.awaitTermination(120)

    m.compact(spark)
    want = {
        tuple(r)
        for r in funnel_steps(
            spark.createDataFrame(rows, schema), steps
        ).collect()
    }
    assert {tuple(r) for r in m.read_exact(spark).collect()} == want

    # crash residue of the RETIRED rename-away protocol: stale
    # .next/.old dirs self-heal away and the swap still lands (the live
    # table is now a pointer-resolved generation dir)
    from uma_etl_iis_loader_spark.operators.index_pointer import (
        resolve_table,
    )

    live = resolve_table(base, "exact")
    shutil.copytree(live, base + "/exact.next")
    shutil.copytree(live, base + "/exact.old")
    # an in-flight reader bound to the pre-compaction generation must
    # survive the swap (the pointer-protocol contract)
    inflight = spark.read.parquet(live)
    n_before = inflight.count()
    m.compact(spark)
    assert inflight.count() == n_before
    assert {tuple(r) for r in m.read_exact(spark).collect()} == want
    assert not os.path.isdir(base + "/exact.next")
    assert not os.path.isdir(base + "/exact.old")


def test_ann_ingest_maintainer_exactly_once(spark):
    """Streaming ANN ingest: appended vectors are served through the
    persisted IVF+PQ index, and the stage-then-move publish protocol is
    idempotent — a replay WITHOUT the commit marker (the crash window a
    naive append+marker scheme turns into duplicated rows, which would
    double-count a neighbor in the top-k window) must leave the index
    row set and every query result bit-identical."""
    import os

    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_topk,
    )
    from uma_etl_iis_loader_spark.streaming.cdc import AnnIngestMaintainer

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    extra = emb.filter(F.col("vec_id") % 2 == 1)
    path = tempfile.mkdtemp(prefix="ann_ingest_") + "/idx"
    build_ivfpq_index(seed, path, nlist=8, m=8, ksub=256)

    m = AnnIngestMaintainer(path)
    src = tempfile.mkdtemp(prefix="ann_src_")
    extra.coalesce(2).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(extra.schema).parquet(src)
    q = m.attach(stream, tempfile.mkdtemp(prefix="ann_ckpt_")).start()
    q.awaitTermination(120)

    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    served = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivfpq_topk(spark, path, queries, k=5, nprobe=8).collect()
    }
    assert any(n % 2 == 1 for _, n, _ in served)  # streamed rows visible

    def row_count():
        return spark.read.parquet(path + "/vectors").count()

    n0 = row_count()
    # marker present → full replay is a no-op
    m.apply_batch(extra, 0)
    assert row_count() == n0

    # crash window: publish completed but marker lost → replay must
    # converge to the SAME file/row set, never duplicate
    os.remove(os.path.join(path, "_commits", "batch-0.done"))
    m.apply_batch(extra, 0)
    assert row_count() == n0
    replayed = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivfpq_topk(spark, path, queries, k=5, nprobe=8).collect()
    }
    assert replayed == served

    # crashed prior attempt residue: a stale ingest file for this batch
    # in some cell is swept by the next replay, not accumulated
    os.remove(os.path.join(path, "_commits", "batch-0.done"))
    vec_root = os.path.join(path, "vectors")
    cell = next(d for d in sorted(os.listdir(vec_root))
                if d.startswith("centroid_id="))
    stale = os.path.join(vec_root, cell, "ingest-batch0-999.parquet")
    existing = next(
        f for f in os.listdir(os.path.join(vec_root, cell))
        if f.startswith("ingest-batch0-")
    )
    import shutil as _sh

    _sh.copyfile(os.path.join(vec_root, cell, existing), stale)
    m.apply_batch(extra, 0)
    assert row_count() == n0
    assert not os.path.exists(stale)


def test_funnel_compact_behind_watermark(spark):
    """The watermark-derived horizon (max landed ts − delay) compacts
    exactly the batch funnel over that slice; an empty log is a no-op."""
    from datetime import datetime, timedelta

    from uma_etl_iis_loader_spark.operators.funnel import funnel_steps
    from uma_etl_iis_loader_spark.streaming.cdc import (
        FunnelCompactionMaintainer,
    )

    def ts(s):
        return datetime(2024, 1, 1, 0, 0, s)

    schema = "user_id long, event_type string, ts timestamp"
    steps = ["view", "click"]
    base = tempfile.mkdtemp(prefix="funnel_wm_")
    m = FunnelCompactionMaintainer(base, steps)
    m.compact_behind_watermark(spark, 10)  # nothing landed: no-op
    import os

    assert not os.path.isdir(base + "/exact")

    rows = [(1, "view", ts(1)), (1, "click", ts(5)), (2, "view", ts(30))]
    m.apply_batch(spark.createDataFrame(rows, schema), 0)
    m.compact_behind_watermark(spark, 10)  # horizon = t30 - 10s = t20
    want = {
        tuple(r)
        for r in funnel_steps(
            spark.createDataFrame(rows, schema).filter(
                F.col("ts") <= ts(30) - timedelta(seconds=10)
            ),
            steps,
        ).collect()
    }
    got = {tuple(r) for r in m.read_exact(spark).collect()}
    assert got == want and not any(r[0] == 2 for r in got)
