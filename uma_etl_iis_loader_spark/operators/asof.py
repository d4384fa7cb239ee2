"""As-of (point-in-time) join — Spark has no native one; this is the
union-and-window formulation, the shuffle-minimal distributed strategy:

1. Tag left (probe) and right (state-change) rows, union them on the key
   and time axis.
2. One window per key ordered by (ts, tag): ``last_value(ignorenulls)``
   carries the most recent right-side values forward.
3. Keep probe rows; each now holds the latest right row with
   right.ts <= probe.ts.

Cost: ONE shuffle on the join key (the window), regardless of how many
right-side versions exist — versus a naive inequality join's quadratic
blowup. Skewed keys behave like any window (AQE handles residue).

Alternative strategies (bucketize the time range + equi-join, or
``pd.merge_asof`` per key group via applyInPandas) trade shuffle shape
for memory; this formulation needs no per-group materialization.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tolerance_expr=None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` on the same key (strictly backward as-of).

    Ties (right_ts == left_ts) match, mirroring ASOF JOIN's ``>=``.
    ``tolerance_expr`` optionally bounds staleness (a Column over the
    output, e.g. ``F.col("left_ts") - F.col("matched_ts") <= ...``).
    """
    lt = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # probe sorts AFTER state at equal ts
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in value_cols]).alias("s"))
            .schema["s"].dataType.simpleString()
        ).alias("__r"),
    )
    rt = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s"))
            .schema["s"].dataType.simpleString()
        ).alias("__l"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__r"),
    )
    unioned = lt.unionByName(rt)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__state", F.last("__r", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__state.{c}").alias(f"asof_{c}") for c in value_cols],
    )
    if tolerance_expr is not None:
        out = out.filter(tolerance_expr)
    return out
