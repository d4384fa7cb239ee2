"""Time-series regularization: per-key resampling onto a fixed grid
with forward fill — the feature-engineering step that turns irregular
event streams into the aligned matrices ML training expects.

Scale shape: one aggregation for per-key bounds, a narrow
``sequence()`` explode for the grid (rows = span/step per key — the
caller controls the blow-up via ``step_s``), one keyed join of
bucketed observations (latest-in-bucket via ``max_by``), and ONE
window pass per key for the fill. The window serializes per key — for
keys whose series exceed a single task, pre-split by coarse time range
and ffill the boundary rows in a second tiny pass (the standard
bucketed rung; not needed at per-entity cardinalities).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["resample_ffill"]


def resample_ffill(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_cols: Sequence[str],
    step_s: int,
) -> DataFrame:
    """(key, grid_ts, *value_cols) on a regular ``step_s``-second grid
    per key, spanning that key's own [floor(min ts), max ts]:

    - grid point value = the LAST observation at-or-before the point
      (forward fill; within one grid bucket the latest observation
      wins — struct-max on (raw timestamp, values), so equal-timestamp
      ties resolve deterministically and all value columns come from
      the same winning row);
    - points before a key's first observation cannot occur (the grid
      starts at the floored first observation);
    - no extrapolation beyond the last observation — the grid ends at
      ``max ts``, it does not run to "now" (stream-agnostic; pass a
      clipped ``df`` to extend).

    Grid arithmetic is integer epoch seconds (exact, engine-portable);
    ``grid_ts`` is returned as a timestamp.
    """
    # fractional epoch (cast to double keeps microseconds) —
    # unix_timestamp would TRUNCATE to whole seconds, making two
    # sub-second observations tie and the struct-max pick by value
    # instead of recency. TIMESTAMP_NTZ has no direct double cast: route
    # through TIMESTAMP (session tz is pinned UTC, so ntz values read as
    # UTC instants; a no-op for ltz inputs).
    epoch = F.col(ts_col).cast("timestamp").cast("double")
    bucket = (F.floor(epoch / step_s) * step_s).cast("long")

    obs = df.select(
        F.col(key),
        bucket.alias("__b"),
        epoch.alias("__e"),
        *[F.col(c) for c in value_cols],
    )
    # latest observation per (key, bucket) — struct-max picks ONE row
    # deterministically even when two observations share a timestamp
    # (ties break on the values themselves, and every value column comes
    # from the same winning row)
    per_bucket = obs.groupBy(key, "__b").agg(
        F.max(F.struct("__e", *[F.col(c) for c in value_cols])).alias("__w")
    ).select(
        key, "__b", *[F.col(f"__w.{c}").alias(c) for c in value_cols]
    )
    bounds = obs.groupBy(key).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    grid = bounds.select(
        key,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(int(step_s)))
        ).alias("__b"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = grid.join(per_bucket, [key, "__b"], "left").select(
        F.col(key),
        F.col("__b").cast("timestamp").alias("grid_ts"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled
