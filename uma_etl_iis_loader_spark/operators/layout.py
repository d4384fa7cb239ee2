"""Data-layout clustering: Z-order (Morton-curve) sort for multi-column
file skipping.

At 100 TB the scan is the dominant cost, and the only scan work a query
engine can skip WITHOUT an index is whole row groups / files whose
min-max column statistics exclude the predicate (parquet footer stats +
Spark's pushed filters). A linear ``sortWithinPartitions(a)`` makes
stats razor-sharp for ``a`` but useless for ``b``; interleaving the bits
of rank-bucketed ``a`` and ``b`` along a Morton curve makes BOTH
columns' min-max ranges narrow per file — a box predicate then touches
O(perimeter) of the curve instead of every file. This is the same
mechanism Delta's OPTIMIZE ZORDER BY and Iceberg's sort-order rewrite
use; here it is a plain DataFrame transform + parquet write, no table
format required.

Scale shape: one ``approxQuantile`` pass over a sample for per-column
rank boundaries (the driver holds 255 doubles per column, never data),
one narrow projection computing the interleaved key (a binary-search
``when`` tree + shiftleft/bitwise-OR interleave — pure JVM, O(log
buckets) comparisons per row, whole-stage-codegen friendly), one range
repartition on the key (the single shuffle — the same cost as any
global sort), then a sorted write. The curve value is dropped before
landing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "collect_file_stats",
    "prune_files",
    "pruned_read",
    "zorder_key",
    "zorder_layout",
]

# 8 bits per column: 256 rank buckets per dimension saturate min-max
# skipping long before real file counts reach that granularity (a 256 x
# 256 grid over 2 columns ≫ any practical file count), and 4 columns
# interleave into 32 bits — comfortably a bigint.
_BITS = 8


def _rank_tree(c: Column, uniq: list[float], lo: int, hi: int) -> Column:
    """Binary-search ``when`` tree: number of ``uniq[lo:hi]`` boundaries
    <= c, offset by ``lo``. One root-to-leaf path evaluates per row
    (when/otherwise short-circuit), so cost is O(log n) compares. A NULL
    comparison is never true, so NULLs fall through every otherwise to
    bucket 0 — null-heavy rows cluster together, keeping the non-null
    columns' file stats narrow."""
    if lo >= hi:
        return F.lit(lo)
    mid = (lo + hi) // 2
    return F.when(
        c >= F.lit(float(uniq[mid])), _rank_tree(c, uniq, mid + 1, hi)
    ).otherwise(_rank_tree(c, uniq, lo, mid))


def _as_double(df: DataFrame, col: str) -> Column:
    """Rank-comparable double view of a column: DATE goes through
    unix_date and TIMESTAMP_NTZ through a TIMESTAMP cast (both direct
    double casts are type errors; the session tz is pinned UTC, so ntz
    values read as UTC instants), everything else casts directly."""
    dtype = dict(df.dtypes)[col]
    c = F.col(col)
    if dtype == "date":
        return F.unix_date(c).cast("double")
    if dtype.startswith("timestamp"):
        return c.cast("timestamp").cast("double")
    return c.cast("double")


def _bucket_expr(df: DataFrame, col: str, boundaries: list[float]) -> Column:
    """Rank bucket of ``col`` against sampled quantile ``boundaries``:
    a bigint in [0, 2**_BITS). Quantile samples repeat on skewed data,
    so boundaries are deduped (equal-valued rows are one min-max point —
    collapsing them is exactly right for skipping) and the deduped rank
    is rescaled onto the full bucket range so interleaving weights every
    column equally."""
    uniq = sorted(set(boundaries))
    if not uniq:
        return F.lit(0).cast("bigint")
    rank = _rank_tree(_as_double(df, col), uniq, 0, len(uniq))
    scale = (2**_BITS - 1) / len(uniq)
    return F.least(
        F.floor(rank.cast("bigint") * F.lit(scale)).cast("bigint"),
        F.lit(2**_BITS - 1),
    )


def zorder_key(
    df: DataFrame, cols: Sequence[str], sample_fraction: float = 0.05
) -> Column:
    """Morton-interleaved bigint key over ``cols`` (2-4 columns, numeric
    or date/timestamp — anything castable to double for RANK bucketing;
    the data itself is never modified).

    Bit i of each column's 8-bit rank bucket lands at position
    ``i * len(cols) + col_index`` — the classic Morton interleave, built
    from shiftleft/bitwise-OR terms that stay inside whole-stage codegen.
    """
    if not 2 <= len(cols) <= 4:
        raise ValueError(f"zorder_key wants 2-4 columns, got {len(cols)}")
    n = len(cols)
    probs = [i / 2**_BITS for i in range(1, 2**_BITS)]
    sampled = (
        df.sample(fraction=sample_fraction, seed=7)
        if sample_fraction < 1.0
        else df
    )
    casted = sampled.select(*[_as_double(df, c).alias(c) for c in cols])
    bounds = casted.approxQuantile(list(cols), probs, 0.001)
    key = F.lit(0).cast("bigint")
    for ci, c in enumerate(cols):
        bucket = _bucket_expr(df, c, bounds[ci])
        for bit in range(_BITS):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, bit).bitwiseAND(F.lit(1)),
                    bit * n + ci,
                )
            )
    return key


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    out_partitions: int = 32,
    sample_fraction: float = 0.05,
) -> DataFrame:
    """Cluster ``df`` along the Z-order curve over ``cols``: range-
    repartition on the Morton key into ``out_partitions`` (one shuffle —
    the same cost as any global sort) and sort within each partition, so
    every output file covers a compact curve segment and its parquet
    min-max stats are narrow in EVERY clustered column.

    Returns the permuted DataFrame (content-identical to the input) ready
    for ``write.parquet``; pair with ``io.compact_snapshot`` for sizing.
    Verified in tests/test_layout.py by reading back real parquet footer
    stats: a box predicate overlaps a small fraction of z-ordered row
    groups vs ~all of them under a single-column linear sort.
    """
    key = zorder_key(df, cols, sample_fraction=sample_fraction)
    return (
        df.withColumn("__z", key)
        .repartitionByRange(out_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


# ---------------------------------------------------------------------------
# Manifest-level pruning: a persisted min-max file-stats table
# ---------------------------------------------------------------------------
#
# Footer-stats skipping (above) still LISTS and OPENS every file to read
# its footer; at 10^5-10^6 files that metadata round-trip dominates
# selective queries. Table formats fix it with a manifest (Iceberg) /
# transaction-log stats (Delta); the bare-directory equivalent is a tiny
# persisted stats table — one row per (file, column) with min/max/nulls —
# consulted BEFORE the scan, so the reader passes Spark an explicit,
# already-pruned file list.


def _stat_to_double(v):
    """Parquet footer min/max → the same double scale Spark-side rank /
    predicate expressions use: dates as days since epoch (unix_date),
    naive timestamps as UTC epoch seconds, numerics as-is. Returns None
    for types with no meaningful double order (strings/binary) — the
    pruner keeps those files conservatively."""
    import datetime
    import decimal

    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, datetime.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=datetime.timezone.utc)
        return v.timestamp()
    if isinstance(v, datetime.date):
        return float((v - datetime.date(1970, 1, 1)).days)
    if isinstance(v, (int, float, decimal.Decimal)):
        return float(v)
    return None


def collect_file_stats(
    spark, path: str, cols: Sequence[str], open_file=None
) -> DataFrame:
    """(file, col, min_val, max_val, null_count, num_rows) per data file
    under ``path``, extracted from parquet footers — computed on the
    EXECUTORS (one footer read per file via mapInPandas + pyarrow), so
    stats collection for a million-file table parallelizes instead of
    serializing through the driver. min/max land as doubles on the same
    scale the pruning predicates use (numerics as-is, DATE as days since
    epoch, naive timestamps as UTC epoch seconds); string/binary columns
    yield NULL stats (conservatively unprunable). Persist the result
    next to the data and refresh it per landed batch (new files only —
    footer stats are immutable).

    Default file access handles local ``file:`` URIs only; for object
    stores pass ``open_file(uri) -> file-like`` (e.g. an fsspec /
    pyarrow-filesystem ``open``) — it is invoked per file on the
    executors, so it must be a serializable top-level callable.
    """
    files = spark.read.parquet(path).inputFiles()

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for uri in pdf["file"]:
                src = open_file(uri) if open_file else uri.removeprefix("file:")
                md = pq.ParquetFile(src).metadata
                names = [md.schema.column(i).name for i in range(md.num_columns)]
                agg = {
                    c: [None, None, 0]  # min, max, nulls
                    for c in cols
                }
                rows = 0
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    rows += g.num_rows
                    for c in cols:
                        # a file missing a tracked column (schema drift
                        # across the file set) keeps NULL stats for it —
                        # prune_files treats NULL min/max as unprunable,
                        # so the read stays conservative instead of the
                        # task dying on names.index()
                        if c not in names:
                            continue
                        st = g.column(names.index(c)).statistics
                        if st is None:
                            continue
                        mn, mx, nc = agg[c]
                        if st.has_min_max:
                            smin = _stat_to_double(st.min)
                            smax = _stat_to_double(st.max)
                            if smin is not None:
                                mn = smin if mn is None else min(mn, smin)
                            if smax is not None:
                                mx = smax if mx is None else max(mx, smax)
                        agg[c] = [mn, mx, nc + (st.null_count or 0)]
                for c in cols:
                    mn, mx, nc = agg[c]
                    out.append((uri, c, mn, mx, nc, rows))
            yield pd.DataFrame(
                out,
                columns=[
                    "file", "col", "min_val", "max_val", "null_count", "num_rows"
                ],
            )

    schema = (
        "file string, col string, min_val double, max_val double, "
        "null_count long, num_rows long"
    )
    return (
        spark.createDataFrame([(f,) for f in files], "file string")
        .repartition(max(len(files) // 64, 1))
        .mapInPandas(read_footers, schema)
    )


def prune_files(
    stats: DataFrame, predicates: dict[str, tuple[float, float]]
) -> list[str]:
    """Files whose [min, max] stats overlap EVERY (lo, hi) range in
    ``predicates`` — the only files a conjunctive box query can match.
    Files with no stats for a predicate column are conservatively KEPT.
    The stats table is tiny (rows = files × tracked columns); the
    collect ships file paths only, never data."""
    pred = None
    for col, (lo, hi) in predicates.items():
        drop = (
            (F.col("col") == col)
            & F.col("min_val").isNotNull()
            & ((F.col("max_val") < F.lit(float(lo))) | (F.col("min_val") > F.lit(float(hi))))
        )
        pred = drop if pred is None else (pred | drop)
    if pred is None:  # no predicates → nothing can be excluded
        return [r.file for r in stats.select("file").distinct().collect()]
    excluded = stats.filter(pred).select("file").distinct()
    kept = stats.select("file").distinct().join(excluded, "file", "left_anti")
    return [r.file for r in kept.collect()]


def pruned_read(
    spark,
    path: str,
    stats: DataFrame,
    predicates: dict[str, tuple[float, float]],
) -> DataFrame:
    """Read only the files that can match the box ``predicates`` (per the
    stats table), with the predicate re-applied exactly — pruning is a
    superset optimization, never a semantic change. Predicates are (lo,
    hi) DOUBLES on the stats scale (see ``_stat_to_double``: dates in
    days since epoch, timestamps in UTC epoch seconds) and are re-applied
    through the same coercion, so date/timestamp columns filter
    consistently with how their footer stats were recorded. An empty
    prune result returns an empty frame with the table's schema."""
    kept = prune_files(stats, predicates)
    base = spark.read.parquet(path)
    if not kept:
        return base.filter(F.lit(False))
    out = spark.read.schema(base.schema).parquet(*kept)
    dtypes = dict(out.dtypes)
    cond = F.lit(True)
    for col, (lo, hi) in predicates.items():
        if dtypes.get(col) == "date" or dtypes.get(col, "").startswith("timestamp"):
            # temporal: compare on the stats scale (cast blocks scan
            # pushdown, but the file-level prune already did that job)
            cond = cond & _as_double(out, col).between(
                F.lit(float(lo)), F.lit(float(hi))
            )
        else:
            # numeric: direct comparison stays pushdown-able to the scan
            cond = cond & F.col(col).between(F.lit(lo), F.lit(hi))
    return out.filter(cond)
