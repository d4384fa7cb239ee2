"""File-landing sources: JSONL / CSV with corrupt-record quarantine.

The REST client (sources/rest.py) is the reference's live path
(`iis_etl/client.py:25-63`); at scale the robust pattern is land-then-load
— raw payloads dropped into a bucket, read with an EXPLICIT schema in
PERMISSIVE mode, malformed rows quarantined instead of failing the batch
(the same per-entity error-isolation guarantee as the reference's
savepoint rollback, `iis_etl/logic.py:416-424`, without transactions).

Scale notes: explicit schemas skip the sampling inference pass (one full
extra scan on a 100 TB landing zone); JSONL and CSV both split by line,
so the scan parallelizes without help.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def _split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    ok = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return ok, quarantine


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines with an explicit schema → (ok, quarantine).

    PERMISSIVE mode parks the raw line of any malformed row in
    ``_corrupt_record``; Spark requires the parsed frame to be cached
    before the corrupt column is observable (SPARK-21610) — at scale,
    write ok/quarantine in one pass instead of caching.
    """
    parsed = (
        spark.read.schema(f"{schema}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .cache()
    )
    return _split_quarantine(parsed)


def read_csv_quarantine(
    spark: SparkSession, path: str, schema: str, header: bool = True
) -> tuple[DataFrame, DataFrame]:
    """CSV with an explicit schema → (ok, quarantine): rows whose fields
    fail to cast land in quarantine with the raw line preserved."""
    parsed = (
        spark.read.schema(f"{schema}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .csv(path)
        .cache()
    )
    return _split_quarantine(parsed)
