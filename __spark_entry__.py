"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship occupancy query (the reference's one
real query, `iis_etl/logic.py:447-476`) on sf0.001. ``queries()`` /
``oracle_sql()`` expose the full operator registry
(uma_etl_iis_loader_spark.plans.registry) for the DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from uma_etl_iis_loader_spark.plans.registry import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_occupancy"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted only for
    genuinely non-SQL-expressible ops → driver does a rows-only check)."""
    return dict(ORACLES)
