"""Bucketed tables: equi-joins on the bucket key must plan WITHOUT a
shuffle exchange — the co-located join contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from uma_etl_iis_loader_spark.io import read_fixture, write_bucketed


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    orders = read_fixture(spark, sf_dir, "orders")
    li = read_fixture(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b",
        ["o_orderkey"], 8,
    )
    a = spark.table("orders_b")
    b = spark.table("lineitem_b")
    joined = a.join(b, "o_orderkey").groupBy("o_orderstatus").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # no shuffle before the join: bucketing provides the partitioning
    join_part = plan.split("HashAggregate")[-1]
    assert "Exchange hashpartitioning(o_orderkey" not in join_part
    assert joined.count() > 0
