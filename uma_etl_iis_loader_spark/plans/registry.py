"""Query registry: every implemented operator from SURVEY.md §2 (plus the
training-data-pipeline extensions) exposed as a named (spark, sf_dir) →
DataFrame callable with, where ANSI-SQL-expressible, a DuckDB oracle query
over the same parquet tables.

This is the single source of truth behind ``__spark_entry__.queries()`` /
``oracle_sql()``. Column names are aliased identically on both sides — the
driver sorts columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle) to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Importing the query modules populates the registry.
def _load_all() -> None:
    from . import queries_reference  # noqa: F401
    from . import queries_extensions  # noqa: F401


_load_all()
