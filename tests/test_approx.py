"""Sketch accuracy: HLL++ distinct estimate within its rsd bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from uma_etl_iis_loader_spark.io import read_fixture


def test_approx_count_distinct_within_bound(spark, sf_dir):
    events = read_fixture(spark, sf_dir, "events")
    got = (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
            F.count_distinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert len(got) > 0
    for r in got:
        assert abs(r.approx - r.exact) / r.exact <= 0.06  # 3x rsd margin
