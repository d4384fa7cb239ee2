"""Write-path semantics: snapshot overwrite (S6/U2) and dynamic partition
overwrite (U1 delete-by-key + reinsert)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from uma_etl_iis_loader_spark.io import overwrite_partitions, write_snapshot


def test_write_snapshot_overwrites_atomically(spark):
    d = tempfile.mkdtemp(prefix="snap_")
    write_snapshot(spark.createDataFrame([(1, "a")], "id long, v string"), d)
    write_snapshot(spark.createDataFrame([(2, "b")], "id long, v string"), d)
    got = [(r.id, r.v) for r in spark.read.parquet(d).collect()]
    assert got == [(2, "b")]  # truncate-and-reload semantics


def test_overwrite_partitions_replaces_only_touched_keys(spark):
    d = tempfile.mkdtemp(prefix="dynpart_")
    base = spark.createDataFrame(
        [("group", "g1", 1), ("group", "g2", 2), ("employee", "e1", 3)],
        "entity_type string, entity_name string, v int",
    )
    write_snapshot(base, d, partition_by=["entity_type"])

    # re-ingest ONLY the group partition (the reference's DELETE WHERE
    # entity_type=... + bulk reinsert, iis_etl/logic.py:387-392)
    update = spark.createDataFrame(
        [("group", "g1", 10)], "entity_type string, entity_name string, v int"
    )
    overwrite_partitions(update, d, ["entity_type"])

    got = {(r.entity_type, r.entity_name, r.v) for r in spark.read.parquet(d).collect()}
    assert got == {("group", "g1", 10), ("employee", "e1", 3)}


def test_compact_snapshot(spark, tmp_path):
    import os

    from uma_etl_iis_loader_spark.io import compact_snapshot

    p = str(tmp_path / "frag")
    # fragment: 64 tiny files
    spark.range(10_000).select(
        "id", F.concat(F.lit("v"), "id").alias("s")
    ).repartition(64).write.parquet(p)
    before = sum(
        1 for _, _, fs in os.walk(p) for f in fs if f.endswith(".parquet")
    )
    assert before == 64
    n = compact_snapshot(spark, p, target_file_bytes=1 << 30)
    assert n == 1
    after = spark.read.parquet(p)
    assert after.count() == 10_000
    assert after.select(F.sum("id")).first()[0] == 10_000 * 9_999 // 2

    # keyed variant: multiple target files, hash-partitioned
    p2 = str(tmp_path / "frag2")
    spark.range(10_000).select("id").repartition(32).write.parquet(p2)
    n2 = compact_snapshot(spark, p2, target_file_bytes=16 * 1024, key="id")
    assert n2 > 1
    assert spark.read.parquet(p2).count() == 10_000
