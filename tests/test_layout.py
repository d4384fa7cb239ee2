"""Z-order layout: content identity + real parquet-footer evidence that
multi-column min-max skipping works (the point of the operator)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from uma_etl_iis_loader_spark.operators.layout import zorder_key, zorder_layout


def _overlap_fraction(path: str, col_bounds: dict[str, tuple[float, float]]) -> float:
    """Fraction of row groups across all part files whose [min, max]
    footer stats overlap EVERY (lo, hi) in col_bounds — the row groups a
    stats-pruning scan must read for that conjunctive box predicate."""
    total = 0
    overlapping = 0
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        for rg in range(md.num_row_groups):
            total += 1
            g = md.row_group(rg)
            hit = True
            for col, (lo, hi) in col_bounds.items():
                st = g.column(names.index(col)).statistics
                if st.max < lo or st.min > hi:
                    hit = False
                    break
            if hit:
                overlapping += 1
    assert total > 0
    return overlapping / total


def test_zorder_layout_is_a_permutation(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 71).alias("x"),
        (F.col("id") * 37 % 113).alias("y"),
        F.col("id").alias("payload"),
    )
    out = zorder_layout(df, ["x", "y"], out_partitions=8, sample_fraction=1.0)
    assert sorted(r.payload for r in out.collect()) == list(range(5000))


def test_zorder_skips_on_both_dimensions(spark, tmp_path):
    """Footer-stats pruning test: under linear sort by x, a y-slab
    predicate overlaps EVERY row group; under z-order(x, y) both a
    y-slab and an x-slab overlap a strict minority, and a 10% box
    predicate touches a small fraction."""
    n = 120_000
    df = spark.range(0, n).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(1000)).alias("x"),
        F.pmod(F.xxhash64(F.col("id") + 1_000_000), F.lit(1000)).alias("y"),
        F.col("id").alias("payload"),
    )
    linear_path = str(tmp_path / "linear")
    z_path = str(tmp_path / "zorder")
    (
        df.repartitionByRange(64, "x")
        .sortWithinPartitions("x")
        .write.parquet(linear_path)
    )
    zorder_layout(df, ["x", "y"], out_partitions=64, sample_fraction=1.0).write.parquet(
        z_path
    )

    y_slab = {"y": (450.0, 550.0)}
    x_slab = {"x": (450.0, 550.0)}
    box = {"x": (450.0, 550.0), "y": (450.0, 550.0)}

    # linear-by-x: y stats are full-range everywhere → no y pruning at all
    assert _overlap_fraction(linear_path, y_slab) == 1.0
    # z-order prunes on BOTH dimensions — the claim linear sort can't make
    assert _overlap_fraction(z_path, y_slab) <= 0.5
    assert _overlap_fraction(z_path, x_slab) <= 0.5
    # …and the 10% box touches a small fraction of row groups. (A
    # box-vs-linear strict comparison is NOT asserted: at 64 files a 10%
    # x-slab already prunes linear to ~8/64, the same granularity z-order
    # reaches — ties and one-row-group flips either way are noise. The
    # z-order claim is the dimension linear CANNOT prune: y, above.)
    assert _overlap_fraction(z_path, box) <= 0.3


def test_zorder_key_handles_nulls_and_skew(spark):
    """NULLs land in bucket 0 (no crash, deterministic) and heavy skew
    (90% one value) still yields a usable multi-bucket key for the
    non-skewed column."""
    df = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("x"),
        F.when(F.col("id") % 17 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("id") % 251)
        .alias("y"),
        F.col("id").alias("payload"),
    )
    keyed = df.withColumn("z", zorder_key(df, ["x", "y"], sample_fraction=1.0))
    rows = keyed.collect()
    assert len(rows) == 2000
    assert all(r.z is not None and r.z >= 0 for r in rows)
    # the non-skewed column still spreads the curve
    assert keyed.select("z").distinct().count() > 50


def test_file_stats_pruned_read_roundtrip(spark, tmp_path):
    """Manifest pruning: the stats table skips files a box predicate
    cannot match, and the pruned read returns EXACTLY the full-scan
    filter result."""
    from uma_etl_iis_loader_spark.operators.layout import (
        collect_file_stats,
        prune_files,
        pruned_read,
    )

    n = 60_000
    df = spark.range(0, n).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(1000)).alias("x"),
        F.pmod(F.xxhash64(F.col("id") + 99), F.lit(1000)).alias("y"),
        F.col("id").alias("payload"),
    )
    path = str(tmp_path / "zt")
    zorder_layout(df, ["x", "y"], out_partitions=32, sample_fraction=1.0).write.parquet(
        path
    )

    stats = collect_file_stats(spark, path, ["x", "y"]).cache()
    n_files = stats.select("file").distinct().count()
    assert n_files >= 30  # one per output partition (± empty splits)
    # stats rows: one per (file, col); num_rows totals the dataset
    assert stats.count() == 2 * n_files
    total_rows = (
        stats.filter(F.col("col") == "x").agg(F.sum("num_rows")).collect()[0][0]
    )
    assert total_rows == n

    box = {"x": (100.0, 200.0), "y": (700.0, 800.0)}
    kept = prune_files(stats, box)
    assert 0 < len(kept) < n_files / 2  # real skipping, not a no-op

    got = pruned_read(spark, path, stats, box)
    want = df.filter(
        F.col("x").between(100, 200) & F.col("y").between(700, 800)
    )
    assert sorted(r.payload for r in got.collect()) == sorted(
        r.payload for r in want.collect()
    )
    assert want.count() > 0

    # a box outside the data domain prunes everything and returns empty
    empty = pruned_read(spark, path, stats, {"x": (5000.0, 6000.0)})
    assert empty.count() == 0
    assert empty.schema == got.schema
    stats.unpersist()


def test_zorder_key_supports_date_columns(spark):
    """DATE columns rank-bucket via unix_date (a straight double cast is
    a Spark type error) — mixed date+numeric clustering works."""
    df = spark.range(0, 1000).select(
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 365).cast("int")).alias("d"),
        (F.col("id") % 97).alias("x"),
        F.col("id").alias("payload"),
    )
    out = zorder_layout(df, ["d", "x"], out_partitions=4, sample_fraction=1.0)
    assert sorted(r.payload for r in out.collect()) == list(range(1000))
    keyed = df.withColumn("z", zorder_key(df, ["d", "x"], sample_fraction=1.0))
    assert keyed.select("z").distinct().count() > 100


def test_file_stats_date_column_pruning(spark, tmp_path):
    """DATE columns: footer stats convert to days-since-epoch (pyarrow
    returns datetime.date objects — a bare float() would crash), and
    pruned_read filters them consistently with the recorded scale."""
    from uma_etl_iis_loader_spark.operators.layout import (
        collect_file_stats,
        prune_files,
        pruned_read,
    )

    df = spark.range(0, 20_000).select(
        F.date_add(
            F.lit("2024-01-01").cast("date"), (F.col("id") % 300).cast("int")
        ).alias("d"),
        (F.col("id") % 500).alias("x"),
        F.col("id").alias("payload"),
    )
    path = str(tmp_path / "dated")
    df.repartitionByRange(16, "d").sortWithinPartitions("d").write.parquet(path)

    stats = collect_file_stats(spark, path, ["d", "x"])
    # days since epoch for 2024-02-01 .. 2024-03-01
    lo = (19724 + 31)  # 2024-01-01 is day 19723; +1+31 window start
    box = {"d": (float(lo), float(lo + 29))}
    kept = prune_files(stats, box)
    n_files = stats.select("file").distinct().count()
    assert 0 < len(kept) < n_files  # date stats actually prune

    got = pruned_read(spark, path, stats, box)
    want = df.filter(
        F.unix_date(F.col("d")).between(lo, lo + 29)
    )
    assert sorted(r.payload for r in got.collect()) == sorted(
        r.payload for r in want.collect()
    )
    assert want.count() > 0


def test_file_stats_incremental_refresh_law(spark, tmp_path):
    """Footer stats are per-file and immutable, so the incremental
    refresh is a pure union: stats(all files) == stats(before append) ∪
    stats(new files only) — no rebuild over the old files."""
    from uma_etl_iis_loader_spark.operators.layout import collect_file_stats

    path = str(tmp_path / "inc")
    spark.range(0, 5000).selectExpr("id as x", "id % 97 as y").repartition(
        4
    ).write.parquet(path)
    before = collect_file_stats(spark, path, ["x", "y"])
    old_files = {r.file for r in before.select("file").distinct().collect()}

    spark.range(5000, 9000).selectExpr("id as x", "id % 97 as y").repartition(
        3
    ).write.mode("append").parquet(path)
    full = collect_file_stats(spark, path, ["x", "y"])
    new_files = {
        r.file for r in full.select("file").distinct().collect()
    } - old_files
    assert new_files  # the append added files

    # stats over ONLY the new files (what an incremental refresh reads)
    import pandas as pd

    full_pd = full.toPandas().sort_values(["file", "col"]).reset_index(drop=True)
    union_pd = (
        pd.concat(
            [
                before.toPandas(),
                full.toPandas()[lambda d: d["file"].isin(new_files)],
            ]
        )
        .sort_values(["file", "col"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(full_pd, union_pd)


def test_file_stats_tolerates_missing_column(spark, tmp_path):
    """Schema drift across the file set: a file missing a tracked column
    yields NULL stats for that column (conservatively unprunable)
    instead of failing the executor task (ADVICE r5)."""
    from uma_etl_iis_loader_spark.operators.layout import (
        collect_file_stats,
        prune_files,
    )

    path = str(tmp_path / "drift")
    spark.range(0, 100).select(
        F.col("id").alias("x"), (F.col("id") * 2).alias("y")
    ).coalesce(1).write.parquet(path)
    # a second file WITHOUT column y (mergeSchema read still works)
    spark.range(100, 200).select(F.col("id").alias("x")).coalesce(1).write.mode(
        "append"
    ).parquet(path)

    stats = collect_file_stats(spark, path, ["x", "y"]).cache()
    # every file reports both tracked columns; y is NULL where absent
    per_file = {
        (r.file, r.col): (r.min_val, r.max_val) for r in stats.collect()
    }
    files = {f for f, _ in per_file}
    assert len(files) == 2
    y_stats = [per_file[(f, "y")] for f in files]
    assert any(mn is None and mx is None for mn, mx in y_stats)
    assert any(mn is not None for mn, mx in y_stats)
    # NULL-stats file is unprunable on y: a y-box keeps it
    kept = prune_files(stats, {"y": (1e9, 2e9)})
    assert any(per_file[(f, "y")] == (None, None) for f in kept)
