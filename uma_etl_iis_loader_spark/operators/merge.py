"""Keyed merge (upsert) operators — the reference's workhorse write pattern
(SURVEY.md §2.2, M1-M8): Postgres ``INSERT ... ON CONFLICT DO UPDATE /
DO NOTHING`` re-expressed as set-oriented join-merges.

Semantics preserved exactly:

- **update-column sets differ per table** (M3/M5/M6): on match only the
  listed ``update_cols`` take the incoming value — including incoming NULLs
  (Postgres ``set_=excluded.col`` overwrites with NULL too); all other
  columns keep the existing value. On miss the whole incoming row inserts.
- ``insert_if_absent`` = ``ON CONFLICT DO NOTHING`` (M7/M8).

Scale: one full-outer shuffle join on the key. For dimension tables the
incoming side is small → AQE broadcasts it; for 100 TB fact merges both
sides hash-partition on the key, so the merge is a single co-partitioned
shuffle with no driver involvement.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Next snapshot of ``old`` after upserting ``new`` on ``keys``.

    ``update_cols`` defaults to every non-key column. Columns outside
    ``update_cols`` are insert-only: set on new rows, never overwritten on
    matched rows (M3 ``url_id``, M5 names/photo, `iis_etl/logic.py:90-96,
    186-195`).
    """
    cols = old.columns
    if set(new.columns) != set(cols):
        raise ValueError(f"schema mismatch: {sorted(cols)} vs {sorted(new.columns)}")
    update = set(update_cols) if update_cols is not None else set(cols) - set(keys)
    bad = update & set(keys)
    if bad:
        raise ValueError(f"keys cannot be update columns: {sorted(bad)}")

    # Prefix-rename each side: immune to self-join lineage ambiguity
    # (old and new frequently derive from the same scan).
    o = old.select(
        *[F.col(c).alias(f"__o_{c}") for c in cols], F.lit(True).alias("__o")
    )
    n = new.select(
        *[F.col(c).alias(f"__n_{c}") for c in cols], F.lit(True).alias("__n")
    )
    cond = [F.col(f"__o_{k}").eqNullSafe(F.col(f"__n_{k}")) for k in keys]
    joined = o.join(n, cond, "full_outer")

    out = []
    for c in cols:
        oc, nc = F.col(f"__o_{c}"), F.col(f"__n_{c}")
        if c in keys:
            expr = F.coalesce(oc, nc)
        elif c in update:
            # incoming wins whenever an incoming row exists (even if NULL)
            expr = F.when(F.col("__n").isNotNull(), nc).otherwise(oc)
        else:
            # existing wins whenever an existing row exists
            expr = F.when(F.col("__o").isNotNull(), oc).otherwise(nc)
        out.append(expr.alias(c))
    return joined.select(*out)


def insert_if_absent(
    old: DataFrame, new: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """``ON CONFLICT DO NOTHING`` (M7 discovered departments, M8 bridge,
    `iis_etl/logic.py:213-214,246-249`): keep every existing row, add
    incoming rows whose key is unseen. Incoming is deduped on the key first
    (the reference's in-batch ``set()`` dedup, `iis_etl/logic.py:199-210`).
    """
    additions = new.dropDuplicates(list(keys)).join(
        old.select(*keys), list(keys), "left_anti"
    )
    return old.unionByName(additions.select(*old.columns))
