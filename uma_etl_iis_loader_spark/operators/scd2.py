"""SCD Type 2 dimension maintenance — the reference's most intricate
operator (`sync_groups`, `iis_etl/logic.py:125-171`; SURVEY.md §2.3 C1-C7).

Transition matrix, preserved exactly:

- C3 new natural key        → insert current row (valid_from=now, valid_to=NULL)
- C4 type-2 attribute diff  → close old (valid_to=now) AND insert new version
- C5 only type-1 cols diff  → overwrite type-1 cols in place (same version,
                              valid_from/surrogate unchanged)
- C6 key missing from snapshot → close (valid_to=now)
- unchanged                 → pass through
- C7 already-closed history → pass through untouched

Deviations (documented): the reference mixes client ``datetime.now()`` and
server ``func.now()`` — we take a single ``now_ts`` parameter for
determinism. Surrogate ids are ``xxhash64(natural_key, valid_from)``
instead of a sequence: deterministic, collision-safe at warehouse scale,
and needs no driver-side counter (an autoincrement would serialize the
whole write through one node at 100 TB).

Scale: one full-outer shuffle join current-vs-incoming on the natural key;
history passes through with zero shuffle. Change detection is null-safe
column comparison (no UDF).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _any_diff(cols: Sequence[str]) -> Column:
    """NULL-safe 'any of these columns differ' over prefix-renamed sides."""
    expr = F.lit(False)
    for c in cols:
        expr = expr | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    return expr


def scd2_apply(
    dim: DataFrame,
    incoming: DataFrame,
    natural_key: str,
    type2_cols: Sequence[str],
    type1_cols: Sequence[str],
    now_ts,
    surrogate_col: str | None = "surrogate_id",
) -> DataFrame:
    """Produce the full next dim snapshot.

    ``dim`` carries ``valid_from``/``valid_to`` (+ optional surrogate);
    ``incoming`` carries the natural key + attribute columns (no validity).
    ``now_ts`` is a Column or literal timestamp used for every close/open.
    """
    now = F.lit(now_ts).cast("timestamp") if not isinstance(now_ts, Column) else now_ts
    attr_cols = [c for c in incoming.columns if c != natural_key]
    dim_cols = list(dim.columns)

    history = dim.filter(F.col("valid_to").isNotNull())
    current = dim.filter(F.col("valid_to").isNull())

    # Prefix-rename both sides: immune to self-join lineage ambiguity.
    o = current.select(
        *[F.col(c).alias(f"__o_{c}") for c in dim_cols], F.lit(True).alias("__o")
    )
    n = incoming.select(
        *[F.col(c).alias(f"__n_{c}") for c in incoming.columns],
        F.lit(True).alias("__n"),
    )
    j = o.join(
        n,
        F.col(f"__o_{natural_key}").eqNullSafe(F.col(f"__n_{natural_key}")),
        "full_outer",
    )

    matched = F.col("__o").isNotNull() & F.col("__n").isNotNull()
    is_new = F.col("__o").isNull()  # the final `otherwise` = missing (C6)
    t2_diff = _any_diff(type2_cols)
    t1_diff = _any_diff(type1_cols)

    def oc(c: str) -> Column:
        return F.col(f"__o_{c}")

    def nc(c: str) -> Column:
        return F.col(f"__n_{c}")

    old_attrs = {c: oc(c) for c in attr_cols}
    new_attrs = {c: nc(c) for c in attr_cols}
    t1_patched = {c: (nc(c) if c in type1_cols else oc(c)) for c in attr_cols}
    keep_sur = (
        oc(surrogate_col) if surrogate_col and surrogate_col in dim_cols else None
    )
    null_ts = F.lit(None).cast("timestamp")

    def row_struct(
        key: Column,
        attrs: dict[str, Column],
        vfrom: Column,
        vto: Column,
        keep_surrogate: Column | None = None,
    ) -> Column:
        cols = []
        for c in dim_cols:
            if c == natural_key:
                cols.append(key.alias(c))
            elif c == "valid_from":
                cols.append(vfrom.alias(c))
            elif c == "valid_to":
                cols.append(vto.alias(c))
            elif surrogate_col and c == surrogate_col:
                sur = (
                    keep_surrogate
                    if keep_surrogate is not None
                    # deterministic, driver-free surrogate
                    else F.xxhash64(key, vfrom)
                )
                cols.append(sur.alias(c))
            else:
                cols.append(attrs[c].alias(c))
        return F.struct(*cols)

    # Single pass over the join: each row emits 0-2 output-row structs
    # (a union of per-branch filters would re-evaluate the full-outer join
    # once per branch — 6x the shuffle for the same result).
    branch = (
        F.when(
            is_new,
            F.array(row_struct(nc(natural_key), new_attrs, now, null_ts)),
        )
        .when(
            matched & t2_diff,
            F.array(
                # C4: close the old version...
                row_struct(
                    oc(natural_key), old_attrs, oc("valid_from"), now, keep_sur
                ),
                # ...and open the new one (takes ALL incoming attrs)
                row_struct(nc(natural_key), new_attrs, now, null_ts),
            ),
        )
        .when(
            matched & ~t2_diff & t1_diff,
            F.array(
                # C5: in-place type-1 patch, version identity kept
                row_struct(
                    oc(natural_key), t1_patched, oc("valid_from"), null_ts, keep_sur
                )
            ),
        )
        .when(
            matched & ~t2_diff & ~t1_diff,
            F.array(
                row_struct(
                    oc(natural_key), old_attrs, oc("valid_from"), null_ts, keep_sur
                )
            ),
        )
        .otherwise(
            # C6: vanished from snapshot → close
            F.array(
                row_struct(
                    oc(natural_key), old_attrs, oc("valid_from"), now, keep_sur
                )
            ),
        )
    )
    out = (
        j.select(F.explode(branch).alias("__row"))
        .select(*[F.col(f"__row.{c}").alias(c) for c in dim_cols])
    )
    # C7: untouched history rides along
    return out.unionByName(history.select(*dim_cols))
