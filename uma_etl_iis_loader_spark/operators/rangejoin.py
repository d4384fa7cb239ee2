"""Range (interval) join — point-in-interval matching WITHOUT an equi key.

Spark plans a bare inequality join as BroadcastNestedLoopJoin (fine only
while one side broadcasts) or a cartesian. The scale path bucketizes the
time axis: each interval explodes into the buckets it overlaps, each
point maps to its bucket, and the join becomes an equi-join on bucket +
a residual range filter. Cost ∝ points + intervals × avg_buckets — no
quadratic blowup, shuffle partitioned by bucket.

Pick ``bucket_seconds`` near the MEDIAN interval length: too small
multiplies the interval fan-out, too large degrades toward all-pairs
within a bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 86400,
    how: str = "inner",
) -> DataFrame:
    """Rows of ``points`` matched to every interval containing their
    timestamp (half-open: start <= ts < end).

    Column names must be disjoint between the two inputs (the output
    carries both sides).
    """

    def bucket(col: Column) -> Column:
        return (F.unix_timestamp(col) / bucket_seconds).cast("long")

    p = points.withColumn("__bucket", bucket(F.col(point_ts)))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(bucket(F.col(start_ts)), bucket(F.col(end_ts)))
        ),
    )
    joined = p.join(iv, "__bucket", how).filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    )
    return joined.drop("__bucket")
