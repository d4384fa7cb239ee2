"""CDC-style continuous dimension maintenance: SCD2 over a stream of
snapshot micro-batches via ``foreachBatch``.

Each micro-batch is one incoming snapshot; the batch hook reads the
current dim state, applies the same ``scd2_apply`` transform the batch
job uses (one code path → identical semantics), and atomically swaps the
snapshot (write new → move). This is the vanilla-Parquet stand-in for
MERGE INTO on a transactional table format; at 100 TB the swap becomes a
metastore pointer flip.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.scd2 import scd2_apply


class Scd2StreamMaintainer:
    """Owns the dim snapshot path and the foreachBatch hook."""

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        natural_key: str,
        type2_cols: Sequence[str],
        type1_cols: Sequence[str],
        dim_schema: str,
        surrogate_col: str | None = None,
    ):
        self.spark = spark
        self.state_path = state_path
        self.natural_key = natural_key
        self.type2_cols = list(type2_cols)
        self.type1_cols = list(type1_cols)
        self.dim_schema = dim_schema
        self.surrogate_col = surrogate_col

    def current(self) -> DataFrame:
        if os.path.exists(self.state_path):
            return self.spark.read.parquet(self.state_path)
        return self.spark.createDataFrame([], self.dim_schema)

    def apply_batch(self, incoming: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: snapshot-in, next-dim-snapshot-out.

        The batch timestamp derives from batch_id so replays are
        deterministic (a wall-clock now would break exactly-once on
        recovery). Monotonic in the FULL batch_id — a modulo here would
        recycle timestamps after one wrap, inverting valid_from/valid_to
        ordering and colliding xxhash64(key, valid_from) surrogates."""
        from datetime import datetime, timedelta

        now = (
            datetime(2026, 1, 1) + timedelta(seconds=int(batch_id))
        ).strftime("%Y-%m-%d %H:%M:%S")
        nxt = scd2_apply(
            self.current(),
            incoming,
            natural_key=self.natural_key,
            type2_cols=self.type2_cols,
            type1_cols=self.type1_cols,
            now_ts=now,
            surrogate_col=self.surrogate_col,
        )
        tmp = self.state_path + ".next"
        nxt.write.mode("overwrite").parquet(tmp)
        # atomic-enough swap for local parquet; table formats make this a
        # metadata commit
        if os.path.exists(self.state_path):
            shutil.rmtree(self.state_path)
        os.rename(tmp, self.state_path)

    def attach(self, stream: DataFrame, checkpoint: str):
        """Wire the maintainer onto a streaming DataFrame of snapshots."""
        return (
            stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
        )


class DedupIngestMaintainer:
    """Continuous corpus curation: each arriving micro-batch of documents
    is deduped against the persisted MinHash-LSH index (plus itself) and
    only the survivors land in the corpus — the streaming face of
    ``operators/dedup.dedup_increment``, wired the same way as the SCD2
    maintainer (foreachBatch owns a corpus path + the index path).

    Crash-safe write protocol (exactly-once for every crash point, not
    just whole-batch replay). Per batch, in this order:

      1. survivors → ``<corpus>/batch-<id>`` as an OVERWRITE of that
         batch-scoped directory (idempotent: a replay rewrites the same
         content). Never overwritten with an empty result when the
         directory already exists — see below.
      2. survivors' LSH state appended to the index
         (``operators/dedup.append_minhash_index``; grams before bands,
         so a crash between the two table writes degrades to "append
         never happened").
      3. a commit marker ``<corpus>/_commits/batch-<id>.done``.

    The corpus write MUST precede the index append: the reverse order
    (index first) has a crash window after which a replay sees every doc
    match its own indexed copy, computes zero survivors, and the batch's
    documents are silently lost from the corpus forever. With this
    order, the only ambiguous crash window is between 2 and 3 (index
    committed, marker missing): there a replay also computes zero
    survivors — which is why step 1 skips the overwrite when the batch
    directory already exists and the recomputed survivor set is empty
    (either the batch was legitimately all-duplicates, in which case the
    directory is already empty, or steps 1-2 committed, in which case
    its content must be preserved).

    A marker present at entry short-circuits the whole batch (cheap
    full-replay no-op). Read the corpus via :meth:`read_corpus` — the
    batch-scoped subdirectories need a recursive file listing.

    ``max_candidate_pairs`` (inherited from
    ``operators/dedup.dedup_increment``): per-batch fail-fast candidate
    budget — one boilerplate-heavy shard at a recall-tuned banding puts
    m²-grade pairs through the verify join and stalls the whole stream;
    with the budget set, that batch raises BEFORE verify work (the
    stream stops loudly with the measured mass and the banding recipe
    in the error — re-band, pre-clean the shard, or raise the budget,
    then restart; the batch replays). Each guarded batch's measured
    telemetry (candidate_mass, n_buckets, max_new, max_old) is recorded
    in :attr:`batch_telemetry` keyed by batch id — the stream-side
    ``lsh_bucket_balance`` face.
    """

    def __init__(
        self,
        corpus_path: str,
        index_path: str,
        threshold: float = 0.5,
        max_candidate_pairs: int | None = None,
        **lsh_kwargs,
    ):
        self.corpus_path = corpus_path
        self.index_path = index_path
        self.threshold = threshold
        self.max_candidate_pairs = max_candidate_pairs
        self.lsh_kwargs = lsh_kwargs
        self.batch_telemetry: dict[int, dict] = {}

    def read_corpus(self, spark: SparkSession) -> DataFrame:
        """The deduplicated corpus: seed files at the root plus every
        committed batch's ``batch-<id>`` subdirectory (``_commits`` is
        underscore-prefixed, hence invisible to Spark's file listing)."""
        return (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(self.corpus_path)
        )

    def apply_batch(self, incoming: DataFrame, batch_id: int) -> None:
        from ..operators.dedup import append_minhash_index, dedup_increment

        marker = os.path.join(
            self.corpus_path, "_commits", f"batch-{batch_id}.done"
        )
        if os.path.exists(marker):
            return  # batch fully committed by an earlier delivery

        out = dedup_increment(
            incoming,
            self.index_path,
            threshold=self.threshold,
            update_index=False,
            max_candidate_pairs=self.max_candidate_pairs,
            **self.lsh_kwargs,
        )
        if out["telemetry"] is not None:
            self.batch_telemetry[batch_id] = out["telemetry"]
        batch_dir = os.path.join(self.corpus_path, f"batch-{batch_id}")
        # pin the survivor set NOW: it must be computed against the index
        # state BEFORE this batch's append (lazy re-evaluation after the
        # append would see the docs match their own entries)
        survivors = out["survivors"].localCheckpoint(eager=True)
        no_survivors = survivors.isEmpty()
        if no_survivors and os.path.exists(batch_dir):
            # replay after the index append committed (or a legitimately
            # all-duplicate batch, whose directory is already empty):
            # preserve the directory's content, skip straight to the
            # marker
            pass
        else:
            survivors.write.mode("overwrite").parquet(batch_dir)
            # only AFTER the corpus commit may the index learn about the
            # survivors (re-read from the committed directory, so the
            # index reflects exactly what the corpus durably holds)
            if not no_survivors:
                append_minhash_index(
                    incoming.sparkSession.read.parquet(batch_dir),
                    self.index_path,
                    **self.lsh_kwargs,
                )
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        with open(marker, "w"):
            pass

    def attach(self, stream: DataFrame, checkpoint: str):
        return (
            stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
        )


class PassagesIngestMaintainer:
    """Streaming face of ``operators/passages.passages_increment``: each
    arriving micro-batch of documents gets its cross-corpus repeated
    passages computed against the persisted shingle index, outputs land
    in batch-scoped directories, and only then does the index learn the
    batch — the same write protocol as :class:`DedupIngestMaintainer`
    (outputs-before-index ordering, commit markers, overwrite-idempotent
    batch directories), with one difference: a replay in the marker-less
    window after the index append recomputes with the batch's own
    shingles counted, which can only flag MORE windows repeated
    (conservative direction — flagged spans are reviewed/cut downstream,
    never silently lost), so the batch directory is simply rewritten.

    The index append itself is IDEMPOTENT: the batch's (key, nd) rows
    are written aside as ONE part file and os.replace()d into the keys
    directory under a deterministic batch-derived name — a replay at any
    crash point rewrites the same file with the same content instead of
    appending a second copy (a plain append would double the batch's nd
    counts on replay, inflating distinct-doc totals and breaking
    batch-parity for min_docs thresholds above 2).

    Outputs under ``<out_path>/stats/batch-<id>`` and
    ``<out_path>/spans/batch-<id>``; read with
    ``spark.read.option("recursiveFileLookup", "true")``.
    """

    def __init__(
        self,
        out_path: str,
        index_path: str,
        k: int = 8,
        min_docs: int = 2,
    ):
        self.out_path = out_path
        self.index_path = index_path
        self.k = k
        self.min_docs = min_docs

    def read_output(self, spark: SparkSession, which: str) -> DataFrame:
        return (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(os.path.join(self.out_path, which))
        )

    def apply_batch(self, incoming: DataFrame, batch_id: int) -> None:
        from ..operators.passages import passages_increment

        marker = os.path.join(
            self.out_path, "_commits", f"batch-{batch_id}.done"
        )
        if os.path.exists(marker):
            return
        out = passages_increment(
            incoming,
            self.index_path,
            k=self.k,
            min_docs=self.min_docs,
            update_index=False,
        )
        for which in ("stats", "spans"):
            out[which].write.mode("overwrite").parquet(
                os.path.join(self.out_path, which, f"batch-{batch_id}")
            )
        # outputs committed — now the index learns the batch, via an
        # idempotent single-file replace (out["nd"] reuses the increment's
        # own persisted shingle table — the shard is tokenized ONCE)
        import glob
        import shutil

        from ..operators.index_pointer import resolve_table, writer_guard

        writer_guard(self.index_path, "keys")
        tmp = os.path.join(self.index_path, f"keys.batch-{batch_id}.tmp")
        out["nd"].coalesce(1).write.mode("overwrite").parquet(tmp)
        parts = glob.glob(os.path.join(tmp, "part-*.parquet"))
        assert len(parts) == 1, parts
        os.replace(
            parts[0],
            os.path.join(
                resolve_table(self.index_path, "keys"),
                f"batch-{batch_id}.parquet",
            ),
        )
        shutil.rmtree(tmp)
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        with open(marker, "w"):
            pass

    def attach(self, stream: DataFrame, checkpoint: str):
        return (
            stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
        )


class FunnelCompactionMaintainer:
    """Late-exact funnel serving: the scheduled compaction job
    ``streaming/stateful.funnel_stream``'s docstring promises ("exact
    late-tolerant funnels re-run the batch operator over landed data
    behind the watermark").

    The streaming funnel is exact only for event-time-ordered delivery
    ACROSS micro-batches — a late out-of-order event that should have
    LOWERED an already-set chain anchor is not applied retroactively
    (the O(steps)-state trade). This maintainer closes that gap the
    lakehouse way:

    - **ingest face** (``attach``): every micro-batch's step events land
      append-only under ``<base>/events/batch-<id>`` with the same
      idempotent batch-dir + commit-marker protocol as
      ``DedupIngestMaintainer`` — replays rewrite the same directory,
      so the landed log is exactly-once for any crash point. Run it
      alongside (or instead of) the live ``funnel_stream`` query; the
      stream's update-mode emissions are the PROVISIONAL answer.
    - **compaction face** (``compact(spark, horizon)``): re-runs the
      batch ``operators/funnel.funnel_steps`` — the SAME code path as
      the batch operator, so semantics cannot drift — over all landed
      events with ``ts <= horizon``, and atomically swaps the result
      into ``<base>/exact`` (generation-pointer swap via
      ``operators/index_pointer``, the compact_ivf_index protocol —
      concurrent readers survive the swap; single compaction owner). ``horizon`` is the caller's lateness bound — typically
      ``max landed ts - watermark delay``, or ``None`` for everything
      landed. Scheduled like any maintenance job (after each ingest
      run, hourly, etc.).
    - **read face**: ``read_exact`` = the compacted, late-exact chains
      (authoritative up to the stored horizon, readable from
      ``<base>/exact/_HORIZON``); ``read_events`` = the raw landed log.

    Law (pytest-pinned): land ANY out-of-order arrival pattern, compact
    at a horizon past the data → ``read_exact`` equals the batch funnel
    over the same events, exactly — including the arrival patterns
    where the streaming funnel's no-retroactive-anchor trade diverges.
    Replayed ingest batches and repeated compactions are no-ops.

    At 100 TB: the landed log is the bronze events table partitioned by
    arrival batch; compaction is one batch funnel job (a single shuffle
    on ``key`` — see funnel_steps) over the horizon slice, and the swap
    becomes a table-format pointer flip."""

    def __init__(
        self,
        base_path: str,
        steps: Sequence[str],
        key: str = "user_id",
        event_col: str = "event_type",
        ts_col: str = "ts",
        **funnel_kwargs,
    ):
        self.base_path = base_path
        self.steps = list(steps)
        self.key = key
        self.event_col = event_col
        self.ts_col = ts_col
        self.funnel_kwargs = funnel_kwargs

    # ---- ingest face ----
    def apply_batch(self, incoming: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        marker = os.path.join(
            self.base_path, "events", "_commits", f"batch-{batch_id}.done"
        )
        if os.path.exists(marker):
            return
        batch_dir = os.path.join(self.base_path, "events", f"batch-{batch_id}")
        (
            incoming.filter(
                F.col(self.event_col).isin(self.steps)
                & F.col(self.ts_col).isNotNull()
            )
            .select(self.key, self.event_col, self.ts_col)
            .write.mode("overwrite")
            .parquet(batch_dir)
        )
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        with open(marker, "w"):
            pass

    def attach(self, stream: DataFrame, checkpoint: str):
        return (
            stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
        )

    def read_events(self, spark: SparkSession) -> DataFrame:
        return (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(os.path.join(self.base_path, "events"))
        )

    # ---- compaction face ----
    def compact(self, spark: SparkSession, horizon=None) -> None:
        """Re-run the batch funnel over landed events with ``ts <=
        horizon`` (``None`` → all landed) and atomically replace
        ``<base>/exact`` via the generation-pointer swap (concurrent
        readers keep a complete table; one compaction owner at a
        time — same contract as every compactor in this package)."""
        from pyspark.sql import functions as F

        from ..operators.funnel import funnel_steps

        events = self.read_events(spark)
        if horizon is not None:
            events = events.filter(F.col(self.ts_col) <= F.lit(horizon))
        exact = funnel_steps(
            events,
            self.steps,
            key=self.key,
            event_col=self.event_col,
            ts_col=self.ts_col,
            **self.funnel_kwargs,
        )
        from ..operators.index_pointer import heal_legacy, swap_table

        def write_next(dst: str) -> None:
            exact.write.mode("overwrite").parquet(dst)
            with open(os.path.join(dst, "_HORIZON"), "w") as fh:
                fh.write("" if horizon is None else str(horizon))

        heal_legacy(self.base_path, "exact")
        swap_table(self.base_path, "exact", write_next)

    def compact_behind_watermark(
        self, spark: SparkSession, delay_s: int
    ) -> None:
        """Convenience horizon: ``max landed event time − delay_s`` —
        the same lateness bound a ``withWatermark(ts, '<delay>')``
        stream enforces, so everything the compaction covers is data
        the stream would no longer revise. No landed events → no-op."""
        from pyspark.sql import functions as F

        if not os.path.isdir(os.path.join(self.base_path, "events")):
            return  # nothing landed yet
        hi = self.read_events(spark).agg(F.max(self.ts_col)).collect()[0][0]
        if hi is None:
            return
        from datetime import timedelta

        self.compact(spark, horizon=hi - timedelta(seconds=delay_s))

    def read_exact(self, spark: SparkSession) -> DataFrame:
        from ..operators.index_pointer import resolve_table

        return spark.read.parquet(resolve_table(self.base_path, "exact"))


class AnnIngestMaintainer:
    """Continuous ANN serving-index ingest: each arriving micro-batch of
    (id, embedding) rows lands in the persisted IVF or IVF+PQ index —
    assigned to the frozen centroids (and, for IVF+PQ, residual-encoded
    with the frozen codebooks/rotation via the SAME kernels the batch
    appends use) so queries see new vectors through the same
    partition-pruned reads. The streaming face of
    ``similarity.append_ivf_index`` / ``append_ivfpq_index``.

    EXACTLY-ONCE under replay — and why a marker alone isn't enough: a
    naive ``mode("append")`` + commit marker leaves a crash window
    (append committed, marker missing) whose replay would DUPLICATE the
    batch's rows, and duplicated index rows are NOT benign — the top-k
    window ranks per row, so a duplicated neighbor consumes two of k
    slots and changes results. Instead each batch publishes through an
    idempotent stage-then-move protocol:

      1. the assigned/encoded frame is written (overwrite — replays
         rewrite the same content) to ``<index>/staging/batch-<id>``,
         partitioned by ``centroid_id``;
      2. per cell, any ``ingest-batch<id>-*`` files from a crashed
         prior attempt are swept, then the staged part files move into
         ``vectors/centroid_id=K/`` under DETERMINISTIC names
         (``ingest-batch<id>-<n>.parquet``) with ``os.replace``;
      3. the commit marker lands under ``<index>/_commits``.

    Every crash point replays to the exact same final file set: the
    sweep removes any stale partial attempt, the moves fully determine
    the batch's on-disk identity, and a marker present at entry
    short-circuits the whole batch. Mid-publish readers can briefly see
    a partial batch (same visibility as any multi-file append; an
    object-store deployment swaps step 2 for a manifest commit).
    Quantizer drift: frozen centroids degrade as the distribution
    moves — re-run the build in a maintenance window
    (``ivf_cell_balance`` is the drift signal)."""

    def __init__(self, index_path: str, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        self.index_path = index_path
        self.id_col = id_col
        self.vec_col = vec_col

    def apply_batch(self, incoming: DataFrame, batch_id: int) -> None:
        from ..operators.similarity import (
            ivf_append_frame,
            ivfpq_append_frame,
        )

        marker = os.path.join(
            self.index_path, "_commits", f"batch-{batch_id}.done"
        )
        if os.path.exists(marker):
            return
        is_pq = os.path.isdir(os.path.join(self.index_path, "codebooks"))
        frame_of = ivfpq_append_frame if is_pq else ivf_append_frame
        frame = frame_of(
            incoming.select(self.id_col, self.vec_col),
            self.index_path,
            id_col=self.id_col,
            vec_col=self.vec_col,
        )
        staging = os.path.join(self.index_path, "staging", f"batch-{batch_id}")
        frame.write.mode("overwrite").partitionBy("centroid_id").parquet(
            staging
        )
        vectors = os.path.join(self.index_path, "vectors")
        prefix = f"ingest-batch{batch_id}-"
        for entry in sorted(os.listdir(staging)):
            if not entry.startswith("centroid_id="):
                continue
            tgt_dir = os.path.join(vectors, entry)
            os.makedirs(tgt_dir, exist_ok=True)
            for f in os.listdir(tgt_dir):  # sweep a crashed prior attempt
                if f.startswith(prefix):
                    os.remove(os.path.join(tgt_dir, f))
            parts = sorted(
                f
                for f in os.listdir(os.path.join(staging, entry))
                if f.endswith(".parquet")
            )
            for i, f in enumerate(parts):
                os.replace(
                    os.path.join(staging, entry, f),
                    os.path.join(tgt_dir, f"{prefix}{i}.parquet"),
                )
        shutil.rmtree(os.path.join(self.index_path, "staging"),
                      ignore_errors=True)
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        with open(marker, "w"):
            pass

    def attach(self, stream: DataFrame, checkpoint: str):
        return (
            stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
        )


class DsirScoreMaintainer:
    """Continuous DSIR scoring: each arriving micro-batch of documents
    is scored against a FROZEN persisted importance-ratio model
    (``dsir.save_dsir_model``) through the SAME ``dsir_log_weights``
    plan the batch scorer runs — stream == batch by construction, one
    code path. The streaming face of data selection: score at ingest,
    select later (Gumbel keys are per-doc integer hashes, so selection
    over accumulated scores is replay-stable regardless of when it
    runs).

    EXACTLY-ONCE under replay by construction: each batch overwrites
    its OWN output partition (``<out>/batch_id=<id>``) — a replayed
    batch rewrites identical content, so no marker protocol is needed
    (the simple end of the maintainer family; the index maintainers
    need stage-then-move because they append INTO shared cell
    directories). Model drift: frozen ratios age as the raw
    distribution moves — fold new shards with ``update_dsir`` and
    re-``save`` in a maintenance window, like the ANN quantizer."""

    def __init__(
        self,
        model_path: str,
        out_path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        self.model_path = model_path
        self.out_path = out_path
        self.id_col = id_col
        self.text_col = text_col
        self._model: dict | None = None

    def apply_batch(self, incoming: DataFrame, batch_id: int) -> None:
        from ..operators.dsir import dsir_log_weights, load_dsir_model

        # the model is frozen by contract between maintenance windows:
        # load once, not per micro-batch (meta.json + 3 parquet plans)
        if self._model is None:
            self._model = load_dsir_model(
                incoming.sparkSession, self.model_path
            )
        model = self._model
        scores = dsir_log_weights(
            incoming.select(self.id_col, self.text_col),
            model,
            text_col=self.text_col,
            id_col=self.id_col,
        )
        scores.write.mode("overwrite").parquet(
            os.path.join(self.out_path, f"batch_id={batch_id}")
        )

    def attach(self, stream: DataFrame, checkpoint: str):
        return (
            stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
        )
