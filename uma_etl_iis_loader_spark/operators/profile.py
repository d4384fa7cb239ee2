"""Table profiling: per-column data-quality statistics in ONE pass.

The pre-training sanity sweep over a corpus table (null rates, distinct
cardinalities, value ranges) — and the statistics a planner-adjacent
layer (partition sizing, dictionary-encoding decisions, skew detection)
wants cheaply at 100 TB.

Scale design: every column's aggregates are computed in a SINGLE
aggregation over one scan — no per-column jobs, no self-joins. Exact
distincts shuffle one count-distinct state per column; for very wide /
very high-cardinality tables pass ``approx=True`` to switch every
distinct to HLL++ (``approx_count_distinct``), which turns the plan into
a single partial-aggregatable pass with bounded state (relative error
~2.3% default). Min/max are rendered to strings so one output schema
serves any column mix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """One row per profiled column:
    (column, n_rows, n_nulls, n_distinct, min_value, max_value) — min/max
    as strings (NULL for all-null columns); complex-typed columns profile
    null/distinct only (min/max NULL)."""
    cols = cols or df.columns
    # internal aliases are POSITIONAL (i), never derived from the column
    # name: a column literally named "meta.lang" would otherwise produce
    # aliases F.col can never resolve (dot parses as struct access), and
    # duplicate names in `cols` would collide. Source access backtick-
    # quotes the name (df[c] and bare F.col both dot-parse).
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    simple: list[bool] = []
    for i, c in enumerate(cols):
        dt = df.schema[c].dataType.typeName()
        simple.append(dt not in ("array", "map", "struct", "binary"))
        src = F.col("`" + c.replace("`", "``") + "`")
        aggs.append(
            F.sum(F.when(src.isNull(), 1).otherwise(0)).alias(f"__nul_{i}")
        )
        aggs.append(
            (
                F.approx_count_distinct(src)
                if approx
                else F.countDistinct(src)
            ).alias(f"__dis_{i}")
        )
        if simple[i]:
            aggs.append(F.min(src).cast("string").alias(f"__min_{i}"))
            aggs.append(F.max(src).cast("string").alias(f"__max_{i}"))
    wide = df.agg(*aggs)
    null_s = F.lit(None).cast("string")
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nul_{i}").alias("n_nulls"),
            F.col(f"__dis_{i}").alias("n_distinct"),
            (F.col(f"__min_{i}") if simple[i] else null_s).alias("min_value"),
            (F.col(f"__max_{i}") if simple[i] else null_s).alias("max_value"),
        )
        for i, c in enumerate(cols)
    ]
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
