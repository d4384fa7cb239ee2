"""Generation-pointer protocol: concurrent readers survive compaction.

The round-7 compactors' rename-away swap had a window where the live
table directory didn't exist — a concurrent reader crashed. These tests
pin the replacement contract (operators/index_pointer): readers that
resolved (and even file-listed) BEFORE a compaction still read a
complete table afterwards, new readers see the compacted generation,
and crash residue of either protocol self-heals.
"""

from __future__ import annotations

import os

from uma_etl_iis_loader_spark.operators.index_pointer import (
    heal_legacy,
    resolve_table,
    swap_table,
)

# ---------------------------------------------------------------------------
# pure filesystem laws (no Spark)
# ---------------------------------------------------------------------------


def _mk_gen(d, payload):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "data.txt"), "w") as f:
        f.write(payload)


def _read_gen(d):
    with open(os.path.join(d, "data.txt")) as f:
        return f.read()


def test_resolve_legacy_layout(tmp_path):
    p = str(tmp_path)
    _mk_gen(os.path.join(p, "vectors"), "g0")
    assert resolve_table(p, "vectors") == os.path.join(p, "vectors")


def test_swap_keeps_previous_generation_deletes_older(tmp_path):
    p = str(tmp_path)
    _mk_gen(os.path.join(p, "vectors"), "g0")
    live1 = swap_table(p, "vectors", lambda d: _mk_gen(d, "g1"))
    assert resolve_table(p, "vectors") == live1
    assert _read_gen(live1) == "g1"
    # the replaced generation (g0) survives for in-flight readers
    assert os.path.isdir(os.path.join(p, "vectors"))

    live2 = swap_table(p, "vectors", lambda d: _mk_gen(d, "g2"))
    assert _read_gen(resolve_table(p, "vectors")) == "g2"
    # g1 (just replaced) survives; g0 (older) is gone
    assert os.path.isdir(live1)
    assert not os.path.isdir(os.path.join(p, "vectors"))
    assert live2 != live1


def test_swap_crash_before_flip_is_invisible(tmp_path):
    """A half-written next generation (crash before the pointer flip)
    never becomes visible and is overwritten by the next run."""
    p = str(tmp_path)
    _mk_gen(os.path.join(p, "vectors"), "g0")
    _mk_gen(os.path.join(p, "vectors-g000001"), "HALF-WRITTEN")
    assert _read_gen(resolve_table(p, "vectors")) == "g0"
    swap_table(p, "vectors", lambda d: _mk_gen(d, "g1-complete"))
    assert _read_gen(resolve_table(p, "vectors")) == "g1-complete"


def test_heal_legacy_restores_crashed_rename_away(tmp_path):
    p = str(tmp_path)
    # crashed between the two legacy renames: only .old holds the data
    _mk_gen(os.path.join(p, "vectors.old"), "the-data")
    _mk_gen(os.path.join(p, "vectors.next"), "incomplete")
    heal_legacy(p, "vectors")
    assert _read_gen(resolve_table(p, "vectors")) == "the-data"
    assert not os.path.isdir(os.path.join(p, "vectors.old"))
    assert not os.path.isdir(os.path.join(p, "vectors.next"))


def test_heal_legacy_ignores_pointer_era_layout(tmp_path):
    """Once a pointer exists the legacy dirs can only be junk — heal
    must not resurrect them over the live generation."""
    p = str(tmp_path)
    _mk_gen(os.path.join(p, "vectors-g000003"), "live")
    with open(os.path.join(p, "vectors.CURRENT"), "w") as f:
        f.write("vectors-g000003")
    _mk_gen(os.path.join(p, "vectors.old"), "stale")
    heal_legacy(p, "vectors")
    assert _read_gen(resolve_table(p, "vectors")) == "live"
    assert not os.path.isdir(os.path.join(p, "vectors.old"))


def test_append_commit_check_catches_race_with_compaction(tmp_path):
    """writer_guard is check-then-write: a compaction that posts its
    sentinel AFTER the guard passes, during the append's long Spark
    write, still flips the pointer — append_commit_check (called after
    the write with the dir actually written) closes that window. Three
    states: clean append passes; pointer flipped mid-write raises
    'lost a race'; sentinel appeared mid-write (compaction in flight,
    snapshot may omit the rows) raises 'raced a compaction'."""
    import pytest

    from uma_etl_iis_loader_spark.operators.index_pointer import (
        append_commit_check,
        writer_guard,
    )

    p = str(tmp_path)
    _mk_gen(os.path.join(p, "vectors"), "g0")

    # clean append: guard → write → commit-check, nothing raced
    writer_guard(p, "vectors")
    written = resolve_table(p, "vectors")
    append_commit_check(p, "vectors", written)  # passes silently

    # race 1: a compaction ran to completion during the write — the
    # pointer now names a different generation; the appended rows are
    # in a dead dir
    writer_guard(p, "vectors")
    written = resolve_table(p, "vectors")
    swap_table(p, "vectors", lambda d: _mk_gen(d, "g1"))  # the racer
    with pytest.raises(RuntimeError, match="lost a race"):
        append_commit_check(p, "vectors", written)

    # race 2: a compaction is in flight at commit time (sentinel up,
    # pointer not yet flipped) — its snapshot may omit the append
    writer_guard(p, "vectors")
    written = resolve_table(p, "vectors")

    def racer_checks_midflight(d):
        _mk_gen(d, "g2")
        with pytest.raises(RuntimeError, match="raced a compaction"):
            append_commit_check(p, "vectors", written)

    swap_table(p, "vectors", racer_checks_midflight)


# ---------------------------------------------------------------------------
# concurrent read during real index compaction
# ---------------------------------------------------------------------------


def test_writer_guard_blocks_appends_during_compaction(tmp_path):
    """Appends into a table being compacted would silently vanish after
    the pointer flip — writer_guard turns that into a loud error; the
    sentinel is owned (and cleaned, even on failure) by swap_table."""
    import pytest

    from uma_etl_iis_loader_spark.operators.index_pointer import (
        writer_guard,
    )

    p = str(tmp_path)
    _mk_gen(os.path.join(p, "vectors"), "g0")
    writer_guard(p, "vectors")  # no compaction in flight: fine

    def write_and_check(d):
        _mk_gen(d, "g1")
        with pytest.raises(RuntimeError, match="being compacted"):
            writer_guard(p, "vectors")

    swap_table(p, "vectors", write_and_check)
    writer_guard(p, "vectors")  # sentinel cleaned after the swap

    # a FAILED compaction also cleans its sentinel (nothing visible
    # changed, appends are safe to resume)
    with pytest.raises(ValueError, match="boom"):
        swap_table(p, "vectors", lambda d: (_ for _ in ()).throw(
            ValueError("boom")
        ))
    writer_guard(p, "vectors")


def test_concurrent_read_survives_ivf_compaction(spark, sf_dir, tmp_path):
    """A reader that file-listed the vectors table BEFORE compaction
    (spark.read.parquet binds the file list eagerly) must still count
    and return correct rows AFTER compaction — under the retired
    rename-away protocol its files were deleted mid-scan."""
    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.io import read_fixture
    from uma_etl_iis_loader_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
        compact_ivf_index,
        ivf_index_topk,
    )

    emb = read_fixture(spark, sf_dir, "embeddings", split=False)
    path = str(tmp_path / "idx")
    build_ivf_index(emb.filter(F.col("vec_id") < 200), path, nlist=8)
    append_ivf_index(
        emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 300)), path
    )

    # in-flight reader: resolves + lists files pre-compaction
    inflight = spark.read.parquet(resolve_table(path, "vectors"))
    n_before = inflight.count()
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    want = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_index_topk(spark, path, queries, k=5, nprobe=8).collect()
    }

    compact_ivf_index(spark, path)

    # the in-flight frame re-reads its ORIGINAL generation: complete
    assert inflight.count() == n_before
    # fresh readers resolve to the compacted generation, same answers
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_index_topk(spark, path, queries, k=5, nprobe=8).collect()
    }
    assert got == want and len(got) > 0


def test_concurrent_read_survives_minhash_compaction(spark, tmp_path):
    from uma_etl_iis_loader_spark.operators.dedup import (
        append_minhash_index,
        build_minhash_index,
        compact_minhash_index,
        dedup_increment,
    )

    kw = dict(num_hashes=16, bands=4, n=3, char_level=False)
    seed = spark.createDataFrame(
        [(1, "a seed document with plenty of distinct words in it today")],
        "doc_id long, text string",
    )
    shard = spark.createDataFrame(
        [(10, "a fresh shard document sharing nothing with the seed text")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "lsh")
    build_minhash_index(seed, idx, **kw)
    append_minhash_index(shard, idx, **kw)

    inflight_grams = spark.read.parquet(resolve_table(idx, "grams"))
    inflight_bands = spark.read.parquet(resolve_table(idx, "bands"))
    g0, b0 = inflight_grams.count(), inflight_bands.count()

    compact_minhash_index(spark, idx)

    assert inflight_grams.count() == g0
    assert inflight_bands.count() == b0
    # post-compaction increments still resolve and match
    out = dedup_increment(shard, idx, threshold=0.35, update_index=False, **kw)
    assert out["survivors"].count() == 0
