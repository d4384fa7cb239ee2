"""Structured Streaming pipelines (streaming-shaped extension surface —
the reference itself is a scheduled batch job, SURVEY.md §2.10; these
operators extend the engine to continuous ingestion of the same shapes).

Patterns covered, all with event-time watermarks for bounded state:

- ``windowed_event_counts`` — tumbling/sliding window aggregation
- ``sessionized_activity``  — session windows per user (gap-based)
- ``streaming_dedup``       — watermarked exact dedup on a key
- ``streaming_kv_latest``   — the M1 KV upsert as a streaming
  latest-per-key (update-mode aggregation)

Each takes a streaming OR batch DataFrame (same code path — Spark's
unified API), so the oracle/batch tests exercise identical plans; file
streams with ``trigger(availableNow=True)`` cover the incremental path.

Scale: state size is bounded by (watermark horizon × key cardinality);
shuffles partition on the aggregation key exactly as the batch plans do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_events_stream(spark, path: str, schema: str | None = None) -> DataFrame:
    """File-based stream of events-shaped parquet (one file per micro-batch
    in tests; a real deployment points this at a landing bucket or swaps
    in Kafka via the same schema)."""
    schema = schema or (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    return spark.readStream.schema(schema).parquet(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data bound."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionized_activity(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity (`session_window` keeps state per open session only)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked exact dedup: keeps the first arrival per key within the
    watermark horizon (the streaming face of dedup_exact)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.dropDuplicates([*key_cols, "ts"] if events.isStreaming else key_cols)


def streaming_kv_latest(
    events: DataFrame,
    watermark: str = "2 hours",
) -> DataFrame:
    """M1 as a stream: latest (ts, value) per user via max_by — in update
    output mode each micro-batch emits the keys it changed."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy("user_id").agg(
        F.max("ts").alias("ts"),
        F.max_by("event_type", F.struct("ts", "event_id")).alias("event_type"),
        F.max_by("value", F.struct("ts", "event_id")).alias("value"),
    )


def interval_enrich_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "15 minutes",
    watermark: str = "2 hours",
    right_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream INNER interval join: each left event matched to the
    right events for the same ``key`` whose timestamp falls in
    ``[left_ts - max_delay, left_ts]`` — the enrichment shape (click ←
    preceding impressions, order ← preceding state changes).

    Streaming semantics: BOTH sides carry event-time watermarks and the
    join condition time-bounds ``right_ts`` against ``left_ts`` — exactly
    what Structured Streaming requires to evict join state (a right row
    older than ``left-side watermark - max_delay`` can never match again
    and is dropped; state per key is bounded by rows inside the interval,
    not by stream length). The same plan runs unchanged on batch inputs,
    where Catalyst executes it as an ordinary range-predicate join — the
    batch face is the oracle for the streaming face.

    Output: all left columns plus each requested right column (default:
    ``right_ts``) prefixed ``r_``.

    ``how="leftOuter"`` also emits left rows with NO match in the
    interval (r_* NULL) — in streaming, Spark holds such rows until the
    watermark proves no matching right row can still arrive, then emits
    exactly one NULL-padded row; on batch it is an ordinary left join.
    """
    l_src = (
        left.withWatermark(left_ts, watermark) if left.isStreaming else left
    )
    r_src = (
        right.withWatermark(right_ts, watermark) if right.isStreaming else right
    )
    right_cols = right_cols if right_cols is not None else [right_ts]
    lw, rw = l_src.alias("l"), r_src.alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {max_delay}")
        )
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    )
    out = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}").alias(f"r_{c}") for c in right_cols
    ]
    return lw.join(rw, cond, how).select(*out)
