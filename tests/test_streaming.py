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


def test_watermark_drops_late_rows(spark):
    """Append-mode watermark semantics across restarts of a checkpointed
    file stream: once a window is finalized past the watermark, a late row
    for it must be DROPPED — never re-emitted, never double-counted."""
    from datetime import datetime

    src = tempfile.mkdtemp(prefix="late_src_")
    ckpt = tempfile.mkdtemp(prefix="late_ckpt_")
    sink = tempfile.mkdtemp(prefix="late_sink_")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )

    def land(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        # parquet sink: append-only and checkpoint-recoverable (the memory
        # sink cannot resume from a checkpoint)
        agg = windowed_event_counts(
            read_events_stream(spark, src), window="1 hour", watermark="1 hour"
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    t = lambda h, m: datetime(2026, 1, 1, h, m)  # noqa: E731
    land([(1, t(10, 15), 1, "click", 1.0, None), (2, t(13, 30), 1, "click", 1.0, None)])
    run()
    # late row for the finalized 10:00 window + a fresh row advancing time
    land([(3, t(10, 20), 1, "click", 1.0, None), (4, t(15, 30), 1, "click", 1.0, None)])
    run()
    # one more advance so 13:00/15:00 can finalize too
    land([(5, t(18, 0), 1, "click", 1.0, None)])
    run()

    by_window = {}
    for r in spark.read.parquet(sink).collect():
        by_window.setdefault(r.window_start, []).append(r.n_events)
    # the 10:00 window was emitted exactly once, WITHOUT the late event 3
    assert by_window[t(10, 0)] == [1]
    # sanity: later windows did finalize through the checkpointed restarts
    assert by_window[t(13, 0)] == [1] and by_window[t(15, 0)] == [1]


def test_interval_join_stream_equals_batch(spark, sf_dir, events_dir):
    """Stream-stream interval join (append mode — per-row join output)
    must equal the batch face of the same plan: clicks enriched with the
    same user's events from the preceding 10 minutes."""
    from uma_etl_iis_loader_spark.streaming.pipeline import (
        interval_enrich_join,
    )

    def faces(mk):
        left = mk().filter(F.col("event_type") == "click").select(
            "event_id", "ts", "user_id"
        )
        right = mk().select("event_id", "ts", "user_id")
        return interval_enrich_join(
            left,
            right,
            max_delay="10 minutes",
            right_cols=["event_id"],
        )

    streamed = faces(lambda: read_events_stream(spark, events_dir))
    q = (
        streamed.writeStream.format("memory")
        .queryName("ij")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.event_id, r.r_event_id)
        for r in spark.sql("SELECT * FROM ij").collect()
    }
    batch = {
        (r.event_id, r.r_event_id)
        for r in faces(
            lambda: read_fixture(spark, sf_dir, "events")
        ).collect()
    }
    assert len(batch) > 0
    assert got == batch


def test_interval_join_left_outer_batch_face(spark, sf_dir):
    """leftOuter face: clicks with no same-user event in the window come
    through NULL-padded; matched rows equal the inner face."""
    from uma_etl_iis_loader_spark.streaming.pipeline import (
        interval_enrich_join,
    )

    events = read_fixture(spark, sf_dir, "events")
    left = events.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    right = events.select("event_id", "ts", "user_id")
    inner = interval_enrich_join(
        left, right, max_delay="10 minutes", right_cols=["event_id"]
    )
    outer = interval_enrich_join(
        left,
        right,
        max_delay="10 minutes",
        right_cols=["event_id"],
        how="leftOuter",
    )
    n_left = left.count()
    matched_left = inner.select("event_id").distinct().count()
    null_rows = outer.filter(F.col("r_event_id").isNull()).count()
    assert null_rows == n_left - matched_left
    assert (
        outer.filter(F.col("r_event_id").isNotNull()).count() == inner.count()
    )


def test_occupancy_stream_equals_batch(spark):
    """E3's streaming face: rebuild_occupancy is one filter → explode² →
    broadcast-dim join → collect_set aggregation, every step of which
    Structured Streaming supports in update/complete mode — so the SAME
    function maintains the occupancy index continuously from an event
    stream. State is calendar-bounded (day × week × slot × room), not
    stream-length-bounded. Pinned: streaming complete-mode output equals
    the batch rebuild on identical data."""
    from uma_etl_iis_loader_spark.operators.occupancy import rebuild_occupancy
    from uma_etl_iis_loader_spark.schemas import SCHEDULE_EVENTS

    def ev(name, day, start, rooms, weeks, etype="group"):
        return (
            name, etype, "s", None, rooms, day, start, start + 4800,
            weeks, None, None, None, None, None, None,
        )

    rows = [
        ev("g1", 1, 28800, ["501-2"], [1, 2]),
        ev("g2", 1, 28800, ["501-2", "502-2"], [1]),
        ev("g1", 2, 32400, ["502-2"], [3]),
        ev("emp", 1, 28800, ["501-2"], [1], etype="employee"),  # filtered
        ev("g3", None, 28800, ["501-2"], [1]),  # exam row: filtered
        ev("g4", 3, 28800, ["no-such-room"], [1]),  # dim miss: dropped
    ]
    events = spark.createDataFrame(rows, SCHEDULE_EVENTS)
    dim = spark.createDataFrame(
        [(10, "501-2"), (20, "502-2")], "id long, name string"
    )

    d = tempfile.mkdtemp(prefix="occ_stream_")
    events.coalesce(2).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(SCHEDULE_EVENTS).parquet(d)

    got = _run_stream(spark, rebuild_occupancy(stream, dim), "occ").collect()
    batch = rebuild_occupancy(events, dim).collect()
    key = lambda r: (  # noqa: E731
        r.day_of_week, r.week_number, r.start_time, r.end_time, r.auditory_id
    )
    assert len(batch) > 0
    assert {key(r): r.groups for r in got} == {key(r): r.groups for r in batch}
    # spot-check semantics: Monday week-1 room 501-2 holds both groups
    monday = {key(r): r.groups for r in batch}
    assert monday[("Понедельник", 1, 28800, 33600, 10)] == ["g1", "g2"]


def test_c4_gopher_kits_stream_equals_batch(spark, sf_dir):
    """The C4/Gopher cleaning kits are stateless narrow projections —
    they must run UNCHANGED on a stream and emit exactly the batch
    result (append mode, no watermark needed)."""
    import tempfile as _tf

    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.functions.text import (
        c4_kept_lines,
        c4_page_keep,
        gopher_keep,
        gopher_metrics,
    )

    docs = read_fixture(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    # line-structure the corpus the same way the llm_prep_ops rows do
    src = docs.select(
        "doc_id", F.regexp_replace("text", " value ", ".\n").alias("text")
    )
    d = _tf.mkdtemp(prefix="docs_stream_")
    src.repartition(3).write.mode("overwrite").parquet(d)

    def kit(df):
        return df.select(
            "doc_id",
            F.size(c4_kept_lines("text")).alias("n_kept"),
            c4_page_keep(
                "text", F.array_join(c4_kept_lines("text"), "\n")
            ).alias("c4_keep"),
            gopher_metrics("text").alias("m"),
        ).select(
            "doc_id", "n_kept", "c4_keep",
            F.col("m.n_words").alias("n_words"),
            gopher_keep(F.col("m")).alias("g_keep"),
        )

    stream = spark.readStream.schema(src.schema).parquet(d)
    q = (
        kit(stream)
        .writeStream.format("memory")
        .queryName("c4_gopher_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["n_kept"], r["c4_keep"], r["n_words"], r["g_keep"])
        for r in spark.sql("SELECT * FROM c4_gopher_stream").collect()
    }
    batch = {
        r["doc_id"]: (r["n_kept"], r["c4_keep"], r["n_words"], r["g_keep"])
        for r in kit(src).collect()
    }
    assert got == batch and len(got) > 0
