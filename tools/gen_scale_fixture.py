"""Generate a scaled-up fixture directory by tiling an existing SF dir
K times (default 10 → one TPC-H-ish scale step) with consistent key
offsets and content perturbation, for the SCALE-STEP bench
(tools/bench_scale.py): correctness is adjudicated at the driver SFs;
this exists to show near-linear wall-time across a 10× data step, the
evidence SCALE.md's plan analyses predict.

Tiling rules (tile 0 is the original data, so every smaller-SF result
is a subset):
- every foreign/primary key is offset by tile * (DOMAIN max + 1) on
  BOTH sides of each relationship (orders↔lineitem↔supplier/part,
  customer↔orders↔events.user_id — the offset is shared across every
  column of a key domain, so differently-ranged sides stay aligned),
  and join fan-outs scale linearly, not quadratically;
- `documents.text` gets a tile-specific marker token spliced in every
  5th word (tile > 0), so cross-tile near-dup similarity drops below
  the dedup thresholds — a 10× corpus must not degenerate into 10-way
  duplicate cliques that inflate pair counts quadratically;
- `embeddings.embedding` is rotated by tile positions — unit-norm is
  preserved, cross-tile cosine decorrelates;
- `events` timestamps shift by tile days so windows/watermarks see a
  longer, denser timeline; region/nation stay as-is (fixed dims).

Usage: python tools/gen_scale_fixture.py <src_sf_dir> <dst_dir> [tiles]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

# column -> key DOMAIN. The offset for a key column must be the maximum
# over its whole domain — every table sharing it — not the column's own
# max: events.user_id (max 1500 at sf0.1) joins orders.o_custkey (max
# 15000) in asof_join_order_state, and a per-column offset would shear
# the two apart so tiles > 0 never match (found in review: the first
# version destroyed every cross-table relationship whose two sides have
# different key ranges).
KEY_COLS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_suppkey": "suppkey",
        "l_partkey": "partkey",
    },
    "events": {"event_id": "event_id", "user_id": "custkey"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
COPY_TABLES = ["region", "nation"]


def _domain_offsets(spark: SparkSession, src: str) -> dict[str, int]:
    """max+1 per key DOMAIN (max over every column mapped to it)."""
    maxes: dict[str, int] = {}
    for table, cols in KEY_COLS.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        row = df.agg(*[F.max(c).alias(c) for c in cols]).collect()[0]
        for c, dom in cols.items():
            maxes[dom] = max(maxes.get(dom, 0), int(row[c]))
    return {dom: mx + 1 for dom, mx in maxes.items()}


def _tile(
    df: DataFrame, tiles: int, key_cols: dict[str, str], offsets: dict[str, int]
) -> DataFrame:
    """Cross-join with the tile index and offset every key column by
    tile * its DOMAIN offset — one pass, no driver loop over tiles."""
    tiled = df.crossJoin(
        F.broadcast(
            df.sparkSession.range(tiles).withColumnRenamed("id", "__tile")
        )
    )
    for c, dom in key_cols.items():
        tiled = tiled.withColumn(
            c, F.col(c) + F.col("__tile") * F.lit(offsets[dom])
        )
    return tiled


def scale_fixture(
    spark: SparkSession, src: str, dst: str, tiles: int = 10
) -> None:
    os.makedirs(dst, exist_ok=True)
    for name in COPY_TABLES:
        spark.read.parquet(f"{src}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{name}.parquet")

    offsets = _domain_offsets(spark, src)
    for name, keys in KEY_COLS.items():
        df = spark.read.parquet(f"{src}/{name}.parquet")
        out = _tile(df, tiles, keys, offsets)
        if name in ("supplier", "customer"):
            # natural-key columns must stay UNIQUE across tiles: the
            # schedule fixture joins rooms by s_name and groups by
            # c_name, so duplicated names would fan every name-join out
            # by the tile count — a 100x blowup that has nothing to do
            # with real 10x growth (found the hard way: the first tiling
            # attempt made flagship 27x slower instead of ~10x)
            col = "s_name" if name == "supplier" else "c_name"
            out = out.withColumn(
                col,
                F.when(F.col("__tile") == 0, F.col(col)).otherwise(
                    F.concat(
                        F.col(col), F.lit("~t"),
                        F.col("__tile").cast("string"),
                    )
                ),
            )
        if name == "documents":
            marker = F.concat(
                F.lit("zz"),
                F.col("__tile").cast("string"),
                F.lit("q"),
                (F.col("doc_id") % 97).cast("string"),
            )
            ws = F.split(F.col("text"), " ")
            perturbed = F.array_join(
                F.transform(
                    ws,
                    lambda w, i: F.when(
                        (i % 5 == 0) & (F.col("__tile") > 0),
                        F.concat(marker, F.lit(" "), w),
                    ).otherwise(w),
                ),
                " ",
            )
            out = out.withColumn("text", perturbed).withColumn(
                "n_chars", F.length("text")
            )
        elif name == "embeddings":
            d = 64
            rot = F.col("__tile") % d
            arr = F.col("embedding")
            out = out.withColumn(
                "embedding",
                F.when(rot == 0, arr).otherwise(
                    F.concat(
                        F.slice(arr, rot + 1, d - rot), F.slice(arr, 1, rot)
                    )
                ),
            )
        elif name == "events":
            out = out.withColumn(
                "ts",
                F.timestamp_micros(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    + F.col("__tile") * F.lit(86_400_000_000)
                ),
            )  # +tile days, written as micros timestamps
        out.drop("__tile").repartition(32).write.mode("overwrite").parquet(
            f"{dst}/{name}.parquet"
        )
    print(f"scaled {tiles}x fixture written to {dst}")


if __name__ == "__main__":
    from uma_etl_iis_loader_spark.session import build_session

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"
    tiles = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = build_session("gen_scale_fixture")
    spark.sparkContext.setLogLevel("ERROR")
    scale_fixture(spark, src, dst, tiles)
