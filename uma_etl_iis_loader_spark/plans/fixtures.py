"""Adaptors that express the driver's TPC-H-ish fixture tables
(`/root/testdata/sf*/`) in the reference's domain shapes, so every
reference operator can run — and be oracle-checked — on driver data.

The mapping is deterministic arithmetic only (no randomness), so the DuckDB
oracle can reproduce it exactly:

- order  → "schedule document" (one per o_orderkey)
- customer name → entity_name ("student group")
- supplier → auditory (room) dim; suppliers of the order's lineitems → the
  lesson's room list
- day_of_week = days-since-Monday-epoch mod 7 + 1 (pure datediff arithmetic
  — NOT dayofweek(), whose numbering differs between Spark and DuckDB)
- week_numbers = [1 .. (o_orderkey % 4) + 1]
- start/end seconds = deterministic function of o_orderkey
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_fixture

# Monday anchor for engine-neutral day-of-week arithmetic
_MONDAY_EPOCH = "1970-01-05"


def day_of_week_expr(date_col):
    """1=Monday .. 7=Sunday, identical in Spark and DuckDB."""
    return (
        F.datediff(F.to_date(date_col), F.to_date(F.lit(_MONDAY_EPOCH))) % 7 + 1
    ).cast("int")


# Opt-in materialization memo (bench-only): a long-lived deployment reads
# schedule_events as a TABLE, not by re-deriving it per query — the bench
# times that derivation ONCE as setup so per-query numbers measure the
# query plan, not fixture synthesis. Correctness paths never populate
# this (the driver's own session stays fully lazy).
_MATERIALIZED: dict[tuple[int, str], DataFrame] = {}


def materialize_schedule_fixture(spark: SparkSession, sf_dir: str) -> None:
    """Eagerly compute + pin the synthesized schedule_events input for
    ``sf_dir`` in this session; subsequent fixture_schedule_events calls
    reuse it."""
    key = (id(spark), sf_dir)
    if key not in _MATERIALIZED:
        df = fixture_schedule_events(spark, sf_dir)
        _MATERIALIZED[key] = df.localCheckpoint(eager=True)


def fixture_schedule_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders ⋈ customer ⋈ supplier → SCHEDULE_EVENTS-shaped rows
    (one per order, rooms = that order's suppliers)."""
    pinned = _MATERIALIZED.get((id(spark), sf_dir))
    if pinned is not None:
        return pinned
    li = read_fixture(spark, sf_dir, "lineitem")
    # orders is only ever the build side of a broadcast join here — a
    # pre-broadcast repartition would be pure wasted shuffle
    orders = read_fixture(spark, sf_dir, "orders", split=False)
    customer = read_fixture(spark, sf_dir, "customer")
    supplier = read_fixture(spark, sf_dir, "supplier")

    # Aggregation pushed BELOW the order/customer joins: the set-agg runs
    # on the raw lineitem scan, and the joins then probe 150k aggregated
    # rows instead of 600k line items (c_name/o_orderdate are functionally
    # dependent on the order key, so the result is identical — an algebraic
    # rewrite Catalyst does not perform on its own).
    auds = (
        li.join(F.broadcast(supplier), li["l_suppkey"] == supplier["s_suppkey"])
        .groupBy("l_orderkey")
        .agg(F.collect_set("s_name").alias("auditories"))
    )
    docs = (
        auds.join(orders, auds["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .select("o_orderkey", "c_name", "o_orderdate", "auditories")
    )
    start = (F.lit(28800) + (F.col("o_orderkey") % 6) * 3600).cast("int")
    return docs.select(
        F.col("c_name").alias("entity_name"),
        F.lit("group").alias("entity_type"),
        day_of_week_expr(F.col("o_orderdate")).alias("day_of_week"),
        start.alias("start_time"),
        (start + 4500).cast("int").alias("end_time"),
        F.sequence(
            F.lit(1), (F.col("o_orderkey") % 4).cast("int") + 1
        ).alias("week_numbers"),
        "auditories",
    )


def fixture_auditories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → auditories dim (id, name)."""
    return read_fixture(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"), F.col("s_name").alias("name")
    )
