"""Custom stateful streaming operator via ``applyInPandasWithState``.

``running_user_stats`` keeps an arbitrary per-key state (event count,
value sum, last timestamp) across micro-batches — the pattern for
operators Spark's built-in windowed aggregations can't express (custom
eviction, conditional resets, cross-batch sequences). State is bounded by
the event-time timeout: keys idle past the watermark are evicted and
their final row emitted.

Works identically for the batch face via a groupBy fallback, so oracle
tests can cover the semantics while streaming tests cover incrementality.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n bigint, total double, last_ts timestamp"


def _update_user_stats(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
):
    if state.hasTimedOut:
        n, total, last_ts = state.get
        state.remove()
        yield pd.DataFrame(
            [{"user_id": key[0], "n_events": n, "total_value": total, "last_ts": last_ts}]
        )
        return
    n, total, last_ts = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, round(total, 2), last_ts))
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 2 * 3600 * 1000)
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "total_value": round(total, 2), "last_ts": last_ts}]
    )


def running_user_stats(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Running per-user (count, sum, last event time).

    Streaming: applyInPandasWithState with event-time timeout eviction.
    Batch: the same result via one aggregation (used by the oracle)."""
    if events.isStreaming:
        return (
            events.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _update_user_stats,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.max("ts").alias("last_ts"),
    )
