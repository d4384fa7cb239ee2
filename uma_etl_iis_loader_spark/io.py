"""Parquet IO helpers + fixture-table access.

At cluster scale every write is either an atomic snapshot overwrite (the
reference's truncate-and-reload sinks, ``iis_etl/logic.py:449``) or a
dynamic-partition overwrite keyed by ``entity_type`` (its delete-by-key +
reinsert pattern, ``iis_etl/logic.py:387-392``) — both avoid read-modify
races and keep the table scannable with partition pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_fixture(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver fixture table (schema comes from parquet footer).

    ``events.ts`` is TIMESTAMP(NANOS) in the parquet footer, which Spark
    reads as a nanos long (``spark.sql.legacy.parquet.nanosAsLong``); we
    convert to a micros timestamp here — same truncation DuckDB applies.
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # The fixture files are single-row-group parquet: the scan cannot split,
    # so without this every map stage runs on ONE core. Round-robin to the
    # cluster's parallelism when the input has fewer splits — on a real
    # multi-row-group/multi-file dataset (the 100 TB case) this is a no-op.
    parallelism = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(parallelism, 8):
        df = df.repartition(parallelism)
    return df


def load_fixtures(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: read_fixture(spark, sf_dir, name) for name in FIXTURE_TABLES}


def write_snapshot(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Atomic snapshot overwrite (replaces the reference's TRUNCATE+INSERT)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def overwrite_partitions(df: DataFrame, path: str, partition_by: list[str]) -> None:
    """Dynamic partition overwrite: replaces only the partitions present in
    ``df`` (the reference's DELETE WHERE entity=... + bulk reinsert,
    ``iis_etl/logic.py:387-392``, without touching sibling partitions)."""
    (
        df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    )
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
