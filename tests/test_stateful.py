"""Custom stateful operator: streaming (applyInPandasWithState) result
must match the batch aggregation on the same data."""

from __future__ import annotations

import tempfile

import pytest

from uma_etl_iis_loader_spark.io import read_fixture
from uma_etl_iis_loader_spark.streaming.pipeline import read_events_stream
from uma_etl_iis_loader_spark.streaming.stateful import running_user_stats


@pytest.fixture(scope="module")
def events_split_dir(spark, sf_dir):
    events = read_fixture(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="events_state_")
    events.repartition(4).write.mode("overwrite").parquet(d)
    return d


def test_stateful_stream_matches_batch(spark, sf_dir, events_split_dir):
    stream = read_events_stream(spark, events_split_dir)
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode can emit a key several times across micro-batches; the
    # LAST emission per key is the running total
    got_df = spark.sql(
        "SELECT user_id, n_events, total_value FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn"
        "  FROM user_stats) WHERE rn = 1"
    )
    got = {r.user_id: (r.n_events, r.total_value) for r in got_df.collect()}
    batch = {
        r.user_id: (r.n_events, r.total_value)
        for r in running_user_stats(read_fixture(spark, sf_dir, "events")).collect()
    }
    assert got == batch
