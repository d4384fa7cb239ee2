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
    maintainer (foreachBatch owns a snapshot path + the index path).

    Exactly-once shape: the corpus write is an append of survivors and
    the index append is derived from the same survivors; a replayed
    micro-batch re-dedups against the index its first delivery already
    updated, so every replayed doc now matches its own indexed copy and
    ZERO survivors append (idempotence law pytest-pinned — same property
    the batch operator guarantees)."""

    def __init__(
        self,
        corpus_path: str,
        index_path: str,
        threshold: float = 0.5,
        **lsh_kwargs,
    ):
        self.corpus_path = corpus_path
        self.index_path = index_path
        self.threshold = threshold
        self.lsh_kwargs = lsh_kwargs

    def apply_batch(self, incoming: DataFrame, batch_id: int) -> None:
        from ..operators.dedup import dedup_increment

        out = dedup_increment(
            incoming,
            self.index_path,
            threshold=self.threshold,
            update_index=True,
            **self.lsh_kwargs,
        )
        out["survivors"].write.mode("append").parquet(self.corpus_path)

    def attach(self, stream: DataFrame, checkpoint: str):
        return (
            stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
        )
