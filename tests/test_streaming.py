"""Streaming pipelines: incremental (file stream, availableNow) results
must equal the batch run of the same plan on the same data."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from uma_etl_iis_loader_spark.io import read_fixture
from uma_etl_iis_loader_spark.streaming.pipeline import (
    read_events_stream,
    sessionized_activity,
    streaming_kv_latest,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir):
    events = read_fixture(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="events_stream_")
    # several files → several input splits for the stream
    events.repartition(4).write.mode("overwrite").parquet(d)
    return d


def _run_stream(spark, df, query_name):
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {query_name}")


def test_windowed_counts_stream_equals_batch(spark, sf_dir, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = _run_stream(
        spark, windowed_event_counts(stream), "win_counts"
    ).collect()
    batch = windowed_event_counts(read_fixture(spark, sf_dir, "events")).collect()
    key = lambda r: (r.window_start, r.event_type)  # noqa: E731
    assert {key(r): (r.n_events, r.total_value) for r in got} == {
        key(r): (r.n_events, r.total_value) for r in batch
    }
    assert len(got) > 0


def test_sessionization_stream_runs(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = _run_stream(spark, sessionized_activity(stream), "sessions")
    rows = got.collect()
    assert len(rows) > 0
    assert all(r.session_end > r.session_start for r in rows[:50])


def test_kv_latest_stream_equals_batch_query(spark, sf_dir, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = {
        r.user_id: (r.ts, r.value)
        for r in _run_stream(spark, streaming_kv_latest(stream), "kv").collect()
    }
    batch = {
        r.user_id: (r.ts, r.value)
        for r in streaming_kv_latest(read_fixture(spark, sf_dir, "events")).collect()
    }
    assert got == batch


def test_shred_pipeline_runs_on_a_stream(spark):
    """The schedule shredder is stateless (explode/filter only), so the
    same code path serves continuous ingestion: raw-doc stream in, flat
    event rows out."""
    import json
    import tempfile

    from uma_etl_iis_loader_spark.operators.shred import (
        parse_schedule_json,
        shred_schedule_docs,
    )

    doc = json.dumps(
        {
            "schedules": {
                "Вторник": [
                    {
                        "subject": "Матан",
                        "startLessonTime": "8:00",
                        "endLessonTime": "9:20",
                        "weekNumber": [1],
                        "auditories": [{"id": 1, "name": "501-2"}],
                        "employees": [],
                        "studentGroups": [],
                    }
                ]
            },
            "exams": [],
        },
        ensure_ascii=False,
    )
    raw = spark.createDataFrame(
        [("g1", "group", doc), ("bad", "group", "{nope")],
        "entity_name string, entity_type string, payload string",
    )
    d = tempfile.mkdtemp(prefix="sched_stream_")
    raw.coalesce(1).write.mode("overwrite").parquet(d)

    stream = spark.readStream.schema(
        "entity_name string, entity_type string, payload string"
    ).parquet(d)
    docs, _ = parse_schedule_json(stream)
    events = shred_schedule_docs(docs)
    q = (
        events.writeStream.format("memory")
        .queryName("shredded")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM shredded").collect()
    assert len(rows) == 1
    assert rows[0].subject == "Матан" and rows[0].day_of_week == 2
