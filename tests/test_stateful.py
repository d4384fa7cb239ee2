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


def _doc_tokens(spark, sf_dir):
    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.functions.text import token_count

    return (
        read_fixture(spark, sf_dir, "documents")
        .select(
            "source", "doc_id", token_count("text").cast("long").alias("n_tokens")
        )
    )


def test_pack_stream_matches_batch(spark, sf_dir):
    """Single-shard landing: the stateful streaming packer must emit
    exactly the batch window-cumsum assignment."""
    from uma_etl_iis_loader_spark.streaming.stateful import pack_sequences_stream

    docs = _doc_tokens(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="pack_src_")
    docs.coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(
        "source string, doc_id long, n_tokens long"
    ).parquet(d)
    q = (
        pack_sequences_stream(stream, budget=512)
        .writeStream.format("memory")
        .queryName("packed_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.source, r.doc_id): (r.seq_start, r.seq_end, r.offset_in_seq)
        for r in spark.sql("SELECT * FROM packed_stream").collect()
    }
    batch = {
        (r.source, r.doc_id): (r.seq_start, r.seq_end, r.offset_in_seq)
        for r in pack_sequences_stream(docs, budget=512).collect()
    }
    assert got == batch and len(got) > 0


def test_pack_stream_position_survives_checkpointed_restart(spark, sf_dir):
    """Shard-by-shard landing across a RESTART: the cumulative token
    position must persist in the checkpointed state, so shard 2's
    sequences continue exactly where shard 1 ended — the packed corpus is
    identical to batch-packing everything at once."""
    from uma_etl_iis_loader_spark.streaming.stateful import pack_sequences_stream

    docs = _doc_tokens(spark, sf_dir).orderBy("doc_id").collect()
    half = len(docs) // 2
    # shard split respects the ordering contract: shard 1 = low doc_ids
    schema = "source string, doc_id long, n_tokens long"
    src = tempfile.mkdtemp(prefix="pack_src2_")
    ckpt = tempfile.mkdtemp(prefix="pack_ckpt_")
    sink = tempfile.mkdtemp(prefix="pack_sink_")

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            pack_sequences_stream(stream, budget=512)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame([tuple(r) for r in docs[:half]], schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    run()
    spark.createDataFrame([tuple(r) for r in docs[half:]], schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    run()

    got = {
        (r.source, r.doc_id): (r.seq_start, r.seq_end, r.offset_in_seq)
        for r in spark.read.parquet(sink).collect()
    }
    from uma_etl_iis_loader_spark.operators.packing import pack_sequences

    full = _doc_tokens(spark, sf_dir)
    batch = {
        (r.source, r.doc_id): (r.seq_start, r.seq_end, r.offset_in_seq)
        for r in pack_sequences(full, budget=512).collect()
    }
    assert got == batch and len(got) > 0


def test_funnel_stream_matches_batch_across_restarts(spark, sf_dir):
    """Streaming funnel == batch funnel when shards land in event-time
    order: early half streamed (one availableNow run), late half added,
    second run resumes from the checkpoint — final per-key chains equal
    funnel_steps over the full fixture."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.operators.funnel import funnel_steps
    from uma_etl_iis_loader_spark.streaming.stateful import funnel_stream

    steps = ["view", "click", "purchase"]
    events = read_fixture(spark, sf_dir, "events").filter(
        F.col("event_type").isin(steps)
    )
    cut = events.select(
        F.expr("CAST(percentile(CAST(CAST(ts AS TIMESTAMP) AS DOUBLE), 0.5) AS TIMESTAMP)")
    ).collect()[0][0]

    src = tempfile.mkdtemp(prefix="funnel_src_")
    ckpt = tempfile.mkdtemp(prefix="funnel_ckpt_")
    try:
        events.filter(F.col("ts") <= F.lit(cut)).coalesce(2).write.mode(
            "overwrite"
        ).parquet(src)

        def run(name):
            # foreachBatch (memory sinks cannot recover from a
            # checkpoint); each availableNow run appends its emissions
            emitted = []

            def sink(batch_df, _batch_id):
                emitted.extend(batch_df.collect())

            stream = spark.readStream.schema(events.schema).parquet(src)
            q = (
                funnel_stream(stream, steps)
                .writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            out = {}
            for r in emitted:  # later emissions (deeper chains) win
                cur = out.get(r.user_id)
                if cur is None or r.depth >= cur[0]:
                    out[r.user_id] = (r.depth, r.t_1, r.t_2, r.t_3)
            return out

        first = run("funnel_run1")
        # late shard lands (strictly after the cut — in-order delivery)
        late_dir = tempfile.mkdtemp(prefix="funnel_late_")
        events.filter(F.col("ts") > F.lit(cut)).coalesce(2).write.mode(
            "overwrite"
        ).parquet(late_dir)
        for f in os.listdir(late_dir):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(late_dir, f), os.path.join(src, "late_" + f))
        second = run("funnel_run2")
        assert second  # the late shard really extended/emitted chains

        merged = {**first, **second}
        want = {
            r.user_id: (r.depth, r.t_1, r.t_2, r.t_3)
            for r in funnel_steps(events, steps).collect()
        }
        assert merged == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_funnel_stream_string_key(spark):
    """The streaming funnel derives the key column's output type from the
    input schema — string user ids work end-to-end (ADVICE r5: the type
    was hardcoded `long`)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.operators.funnel import funnel_steps
    from uma_etl_iis_loader_spark.streaming.stateful import funnel_stream

    steps = ["view", "click"]
    rows = [
        ("alice", "view", "2024-01-01 10:00:00"),
        ("alice", "click", "2024-01-01 10:05:00"),
        ("bob", "view", "2024-01-01 11:00:00"),
    ]
    batch_df = spark.createDataFrame(
        rows, "user_id string, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    src = tempfile.mkdtemp(prefix="funnel_str_src_")
    ckpt = tempfile.mkdtemp(prefix="funnel_str_ckpt_")
    try:
        batch_df.coalesce(1).write.mode("overwrite").parquet(src)
        emitted = []

        def sink(bdf, _bid):
            emitted.extend(bdf.collect())

        stream = spark.readStream.schema(batch_df.schema).parquet(src)
        q = (
            funnel_stream(stream, steps)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {}
        for r in emitted:
            cur = got.get(r.user_id)
            if cur is None or r.depth >= cur[0]:
                got[r.user_id] = (r.depth, r.t_1, r.t_2)
        want = {
            r.user_id: (r.depth, r.t_1, r.t_2)
            for r in funnel_steps(batch_df, steps).collect()
        }
        assert got == want and got["alice"][0] == 2 and got["bob"][0] == 1
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_funnel_stream_inclusive_policy(spark):
    """same_ts_policy forwards through the streaming face: a
    co-timestamped view+click chain converts under 'inclusive' and the
    result equals the batch operator under the same policy."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.operators.funnel import funnel_steps
    from uma_etl_iis_loader_spark.streaming.stateful import funnel_stream

    steps = ["view", "click"]
    rows = [
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:00:00"),  # same second (coarse logger)
        (2, "view", "2024-01-01 11:00:00"),
        (2, "click", "2024-01-01 11:00:05"),
    ]
    batch_df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    src = tempfile.mkdtemp(prefix="funnel_incl_src_")
    ckpt = tempfile.mkdtemp(prefix="funnel_incl_ckpt_")
    try:
        batch_df.coalesce(1).write.mode("overwrite").parquet(src)
        emitted = []

        def sink(bdf, _bid):
            emitted.extend(bdf.collect())

        stream = spark.readStream.schema(batch_df.schema).parquet(src)
        q = (
            funnel_stream(stream, steps, same_ts_policy="inclusive")
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {}
        for r in emitted:
            cur = got.get(r.user_id)
            if cur is None or r.depth >= cur[0]:
                got[r.user_id] = (r.depth, r.t_1, r.t_2)
        want = {
            r.user_id: (r.depth, r.t_1, r.t_2)
            for r in funnel_steps(
                batch_df, steps, same_ts_policy="inclusive"
            ).collect()
        }
        assert got == want and got[1][0] == 2 and got[2][0] == 2
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_funnel_stream_inclusive_tie_order_independent(spark):
    """Review regression: under 'inclusive', a later-step event that
    lands BEFORE its co-timestamped prerequisite in arrival order must
    still convert — the updater processes equal-timestamp groups to a
    fixpoint, so shuffle-dependent arrival order can't change results.
    Also pins inclusive event-reuse: a repeated-step funnel converts
    from one event, matching the batch operator."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.operators.funnel import funnel_steps
    from uma_etl_iis_loader_spark.streaming.stateful import funnel_stream

    def run_stream(batch_df, steps):
        src = tempfile.mkdtemp(prefix="funnel_tie_src_")
        ckpt = tempfile.mkdtemp(prefix="funnel_tie_ckpt_")
        try:
            batch_df.coalesce(1).write.mode("overwrite").parquet(src)
            emitted = []
            stream = spark.readStream.schema(batch_df.schema).parquet(src)
            q = (
                funnel_stream(stream, steps, same_ts_policy="inclusive")
                .writeStream.foreachBatch(lambda b, _i: emitted.extend(b.collect()))
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            out = {}
            for r in emitted:
                cur = out.get(r.user_id)
                if cur is None or r.depth >= cur[0]:
                    out[r.user_id] = (r.depth,)
            return out
        finally:
            shutil.rmtree(src, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)

    # click listed BEFORE its co-timestamped view (adverse arrival order)
    rows = [
        (1, "click", "2024-01-01 10:00:00"),
        (1, "view", "2024-01-01 10:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = run_stream(df, ["view", "click"])
    want = {
        r.user_id: (r.depth,)
        for r in funnel_steps(
            df, ["view", "click"], same_ts_policy="inclusive"
        ).collect()
    }
    assert got == want and got[1] == (2,)

    # repeated-step funnel: one view event satisfies both slots under
    # inclusive (batch min-with-reuse semantics) on both faces
    one = spark.createDataFrame(
        [(7, "view", "2024-01-01 09:00:00")],
        "user_id long, event_type string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got2 = run_stream(one, ["view", "view"])
    want2 = {
        r.user_id: (r.depth,)
        for r in funnel_steps(
            one, ["view", "view"], same_ts_policy="inclusive"
        ).collect()
    }
    assert got2 == want2 and got2[7] == (2,)


def test_funnel_stream_max_gap_and_window_from(spark):
    """max_gap_s / window_from forward through the streaming face and
    match the batch operator: short hops convert under per-hop gaps but
    fall out of a from-entry conversion window."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.operators.funnel import funnel_steps
    from uma_etl_iis_loader_spark.streaming.stateful import funnel_stream

    steps = ["view", "click", "purchase"]
    rows = [
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:04:00"),
        (1, "purchase", "2024-01-01 10:08:00"),  # 8 min from entry
        (2, "view", "2024-01-01 11:00:00"),
        (2, "click", "2024-01-01 11:02:00"),
        (2, "purchase", "2024-01-01 11:04:00"),  # inside 5 min of entry
    ]
    batch_df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    def run_stream(**kw):
        src = tempfile.mkdtemp(prefix="funnel_gap_src_")
        ckpt = tempfile.mkdtemp(prefix="funnel_gap_ckpt_")
        try:
            batch_df.coalesce(1).write.mode("overwrite").parquet(src)
            emitted = []
            stream = spark.readStream.schema(batch_df.schema).parquet(src)
            q = (
                funnel_stream(stream, steps, **kw)
                .writeStream.foreachBatch(lambda b, _i: emitted.extend(b.collect()))
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            out = {}
            for r in emitted:
                cur = out.get(r.user_id)
                if cur is None or r.depth >= cur[0]:
                    out[r.user_id] = (r.depth,)
            return out
        finally:
            shutil.rmtree(src, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)

    for kw in (
        {"max_gap_s": 300},
        {"max_gap_s": 300, "window_from": "first"},
    ):
        got = run_stream(**kw)
        want = {
            r.user_id: (r.depth,)
            for r in funnel_steps(batch_df, steps, **kw).collect()
        }
        assert got == want, kw
    assert run_stream(max_gap_s=300)[1] == (3,)  # per-hop: each 4 min
    assert run_stream(max_gap_s=300, window_from="first")[1] == (2,)


def test_funnel_stream_evicts_idle_keys(spark):
    """Bounded-state mode: a key idle past watermark + evict_idle_s has
    its chain dropped — a later lone click for it produces NO emission
    (not in the cohort anymore), while without eviction the same replay
    re-states the old chain. Emissions already made are unaffected."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    schema = "user_id long, event_type string, ts string"

    def mk(rows):
        return spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )

    early = mk([
        (1, "view", "2024-01-01 00:00:00"),
        (1, "click", "2024-01-01 00:10:00"),
    ])
    # far ahead in event time: advances the watermark way past user 1's
    # idle horizon before user 1's late click lands
    advance = mk([(2, "view", "2024-03-01 00:00:00")])
    late = mk([
        (1, "click", "2024-03-01 00:05:00"),
        (2, "click", "2024-03-01 00:06:00"),
    ])

    from uma_etl_iis_loader_spark.streaming.stateful import funnel_stream

    def run(evict):
        src = tempfile.mkdtemp(prefix="funnel_ev_src_")
        ckpt = tempfile.mkdtemp(prefix="funnel_ev_ckpt_")
        try:
            kw = (
                {"watermark": "1 minute", "evict_idle_s": 3600}
                if evict
                else {}
            )
            per_run = []
            for i, shard in enumerate([early, advance, late]):
                shard.coalesce(1).write.mode("overwrite").parquet(
                    os.path.join(src, f"s{i}")
                )
                emitted = []
                stream = spark.readStream.schema(early.schema).option(
                    "pathGlobFilter", "*.parquet"
                ).parquet(src + "/*")
                q = (
                    funnel_stream(stream, ["view", "click"], **kw)
                    .writeStream.foreachBatch(
                        lambda b, _i: emitted.extend(b.collect())
                    )
                    .outputMode("update")
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination(120)
                per_run.append(emitted)
            return per_run
        finally:
            shutil.rmtree(src, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)

    runs_evict = run(True)
    # run 1 emitted user 1's full chain before any eviction
    assert any(r.user_id == 1 and r.depth == 2 for r in runs_evict[0])
    # run 3: user 1 was evicted during run 2's watermark advance; the
    # lone click can't restart a cohort -> no user-1 emission
    assert not any(r.user_id == 1 for r in runs_evict[2])
    assert any(r.user_id == 2 and r.depth == 2 for r in runs_evict[2])

    runs_keep = run(False)
    # without eviction the same late click re-states user 1's old chain
    assert any(r.user_id == 1 and r.depth == 2 for r in runs_keep[2])
