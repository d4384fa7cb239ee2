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


# ---------------------------------------------------------------------------
# incremental sequence packing — the streaming face of
# operators/packing.pack_sequences
# ---------------------------------------------------------------------------

PACK_OUTPUT_SCHEMA = (
    "source string, doc_id long, n_tokens long, "
    "seq_start long, seq_end long, offset_in_seq long"
)
PACK_STATE_SCHEMA = "cum bigint"


def _make_pack_updater(budget: int):
    def _update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        import numpy as np

        if state.hasTimedOut:  # pragma: no cover - NoTimeout in practice
            state.remove()
            return
        cum = state.get[0] if state.exists else 0
        parts = list(pdfs)
        pdf = pd.concat(parts) if len(parts) > 1 else parts[0]
        pdf = pdf[pdf["n_tokens"] > 0].sort_values("doc_id")
        n = pdf["n_tokens"].to_numpy(dtype="int64")
        state.update((int(cum + n.sum()),))
        if len(n):
            cb = cum + np.concatenate(([0], np.cumsum(n[:-1])))
            yield pd.DataFrame(
                {
                    "source": key[0],
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_tokens": n,
                    "seq_start": cb // budget,
                    "seq_end": (cb + n - 1) // budget,
                    "offset_in_seq": cb % budget,
                }
            )

    return _update


def pack_sequences_stream(docs: DataFrame, budget: int = 512) -> DataFrame:
    """Incremental concat-then-chunk packing of an arriving document
    stream (columns: source, doc_id, n_tokens): each group's cumulative
    token position persists across micro-batches, so newly landed
    documents continue exactly where the previous batch's sequences ended
    — the loader-manifest use case, where a corpus lands shard by shard
    and training sequences must stay stable for the shards already
    packed.

    Ordering contract: within a micro-batch a group packs in ascending
    doc_id; across batches, arrival order IS pack order (land shards in
    manifest order). State is ONE bigint per group — O(#domains) total,
    no timeout needed; batch face delegates to the window-cumsum plan
    (`operators/packing.pack_sequences`), equivalence pytest-pinned
    including a checkpointed restart mid-corpus.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if not docs.isStreaming:
        from ..operators.packing import pack_sequences

        return pack_sequences(docs, budget)
    return docs.groupBy("source").applyInPandasWithState(
        _make_pack_updater(budget),
        outputStructType=PACK_OUTPUT_SCHEMA,
        stateStructType=PACK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# streaming funnel — ordered per-key chain state
# ---------------------------------------------------------------------------


def _make_funnel_updater(
    steps, key_col, event_col, ts_col, strict=True,
    max_gap_s=None, window_from="prev", evict_idle_s=None,
):
    import datetime as _dt

    n = len(steps)
    gap = _dt.timedelta(seconds=max_gap_s) if max_gap_s is not None else None

    def _update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            # idle past the horizon: drop the chain silently — every
            # change was already emitted in update mode, so nothing is
            # lost downstream; a later event restarts the key's funnel
            state.remove()
            return
        chain = list(state.get) if state.exists else [None] * n
        parts = list(pdfs)
        pdf = pd.concat(parts) if len(parts) > 1 else parts[0]
        # event-time order within the batch. Under the strict policy
        # equal-timestamp order is irrelevant (t > chain[j-1] blocks
        # same-ts progression), but under 'inclusive' it decides the
        # outcome — so co-timestamped GROUPS are processed together to a
        # fixpoint below, making arrival order (which is shuffle-
        # dependent) immaterial and the result equal to the batch
        # operator's per-slot min-aggregation, including its event-reuse
        # semantics (one event may satisfy several slots at one ts).
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        for t, grp in pdf.groupby(ts_col, sort=True):
            evs = list(grp[event_col])
            changed = True
            while changed:  # ≤ n rounds: each fills ≥1 slot
                changed = False
                for ev in evs:
                    for j in range(n):
                        if steps[j] != ev or chain[j] is not None:
                            continue
                        if j == 0:
                            chain[0] = t
                            changed = True
                            continue
                        if chain[j - 1] is None or not (
                            t > chain[j - 1]
                            or (not strict and t >= chain[j - 1])
                        ):
                            continue
                        if gap is not None:
                            anchor = chain[0] if window_from == "first" else chain[j - 1]
                            if t > anchor + gap:
                                continue
                        chain[j] = t
                        changed = True
        if chain[0] is None:
            return  # not in the cohort yet — keep no state
        state.update(tuple(chain))
        if evict_idle_s is not None:
            # horizon = the key's LAST KNOWN event + idle
            # (sessionization-gap semantics). Two wrong anchors guarded
            # against: the current watermark (an event-time jump between
            # batches would evict a just-active key) and the current
            # BATCH's max alone (Spark clears the timeout every
            # invocation, so a late out-of-order event would SHORTEN the
            # horizon below the key's true last event — include the
            # chain's accepted anchors in the max). Spark requires the
            # timeout to sit above the watermark — clamp.
            last = pdf[ts_col].max()
            for v in chain:
                if v is not None and v > last:
                    last = v
            last_ms = int(pd.Timestamp(last).value // 1_000_000)
            state.setTimeoutTimestamp(
                max(
                    last_ms + evict_idle_s * 1000,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
        row = {key_col: key[0]}
        for j in range(n):
            row[f"t_{j + 1}"] = chain[j]
        row["depth"] = sum(1 for v in chain if v is not None)
        yield pd.DataFrame([row])

    return _update


def funnel_stream(
    events: DataFrame,
    steps,
    key: str = "user_id",
    event_col: str = "event_type",
    ts_col: str = "ts",
    same_ts_policy: str = "strict",
    max_gap_s: int | None = None,
    window_from: str = "prev",
    watermark: str | None = None,
    evict_idle_s: int | None = None,
) -> DataFrame:
    """Streaming face of ``operators.funnel.funnel_steps``: the per-key
    chain (t_1..t_n, depth) maintained incrementally as events land —
    update-mode emissions re-state a key's current chain whenever one of
    its step events arrives.

    Exactness contract: equal to the batch funnel when delivery is
    event-time ordered ACROSS micro-batches (within a batch, events are
    sorted before applying). A chain anchor already set is never
    revisited, so a late out-of-order event that would have LOWERED an
    anchor (an earlier view arriving after a click was accepted) is not
    applied retroactively — the documented trade for O(steps) state per
    key; exact late-tolerant funnels re-run the batch operator over
    landed data behind the watermark. State: n nullable timestamps per
    key — UNBOUNDED key spaces should pass ``watermark`` (an event-time
    delay string for ``withWatermark``) plus ``evict_idle_s``: a key
    whose chain sees no step event for that long past the watermark has
    its state dropped (silently — every chain change was already
    emitted in update mode), and a later event restarts its funnel from
    scratch. That bounds state at O(active keys) for the cost of
    re-counting a user who returns after the horizon — the standard
    sessionization trade.

    All batch policy flags forward: ``same_ts_policy``
    (strict/inclusive — co-timestamped groups iterate to a fixpoint so
    arrival order can't change the result), ``max_gap_s``, and
    ``window_from`` (per-hop vs from-entry conversion window) — see
    ``funnel_steps`` for their semantics; stream==batch equivalence is
    pytest-pinned per flag.

    Batch inputs delegate to the batch operator (same output schema
    modulo column order).
    """
    steps = list(steps)
    if same_ts_policy not in ("strict", "inclusive"):
        raise ValueError(
            f"same_ts_policy must be strict|inclusive, got {same_ts_policy}"
        )
    if window_from not in ("prev", "first"):
        raise ValueError(f"window_from must be prev|first, got {window_from}")
    if (evict_idle_s is None) != (watermark is None):
        raise ValueError(
            "evict_idle_s and watermark must be passed together (the "
            "timeout clock is the event-time watermark)"
        )
    if not events.isStreaming:
        from ..operators.funnel import funnel_steps

        return funnel_steps(
            events, steps, key=key, event_col=event_col, ts_col=ts_col,
            max_gap_s=max_gap_s, same_ts_policy=same_ts_policy,
            window_from=window_from,
        )
    # the key column keeps the input's type (string user ids are as
    # common as longs); hardcoding `long` here crashed non-long keys
    key_ddl = events.schema[key].dataType.simpleString()
    out_schema = (
        f"{key} {key_ddl}, "
        + ", ".join(f"t_{j + 1} timestamp" for j in range(len(steps)))
        + ", depth int"
    )
    state_schema = ", ".join(f"t_{j + 1} timestamp" for j in range(len(steps)))
    src = events
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.filter(
            F.col(event_col).isin(steps) & F.col(ts_col).isNotNull()
        )
        .groupBy(key)
        .applyInPandasWithState(
            _make_funnel_updater(
                steps, key, event_col, ts_col,
                strict=same_ts_policy == "strict",
                max_gap_s=max_gap_s, window_from=window_from,
                evict_idle_s=evict_idle_s,
            ),
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.EventTimeTimeout
                if evict_idle_s is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
