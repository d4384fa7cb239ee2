"""Raw schedule-JSON blob versioning (SURVEY.md §2 — the
``schedule_json_storage`` landing zone; reference ``_process_schedule_json``,
`iis_etl/logic.py:271-297`, table at `iis_etl/models.py:97-106`).

The reference SCD2-versions every fetched schedule payload: close the
entity's current blob row (``valid_to = now()``) then insert the fresh
payload (``valid_from = now()``, ``valid_to = NULL``) — **unconditionally,
with no change detection** (a re-fetch of byte-identical JSON still opens a
new version), and **absence never closes** (an entity that stops being
fetched keeps its open row — unlike the SCD2 dims' C6 deletion-close).

Version key (`iis_etl/logic.py:274-280`):

- ``entity_type='group'``    → ``group_name``
- ``entity_type='employee'`` → ``employee_id`` (a NULL employee_id is
  skipped entirely — the reference logs and returns, logic.py:277-279)

Skip guards live in :func:`schedule_blob_incoming` (they differ per entity
type, `iis_etl/logic.py:413,432`):

- group:    ``if not data: continue`` — an empty/unparseable document is
  skipped, but a parseable doc **without** schedules/exams IS stored
  (``{"startDate": ...}`` is a truthy dict).
- employee: skipped unless ``schedules`` or ``exams`` is non-empty, and
  skipped when the url_id doesn't resolve to an employee row.

Scale: the close is one join of current rows against the incoming key set
(broadcast — keys are entity names, KBs even for millions of entities at
fetch-batch granularity); closed history passes through with zero shuffle;
blob payloads are never shuffled beyond the final union. Surrogate ids are
``xxhash64(key, valid_from)`` — deterministic and driver-free (the
reference's autoincrement would serialize every insert through one node).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STORAGE_COLS = [
    "id",
    "entity_type",
    "group_name",
    "employee_id",
    "data",
    "valid_from",
    "valid_to",
]


def schedule_blob_incoming(raw: DataFrame, employees: DataFrame) -> DataFrame:
    """(entity_name, entity_type, payload) rows → storable blob rows.

    Applies the reference's per-type skip guards (module docstring) and
    resolves ``employee_id`` from the employees dimension by ``url_id``
    (the reference iterates employee rows directly, `iis_etl/logic.py:430`;
    an unresolved url_id reproduces its employee_id-is-None skip).
    """
    from .shred import _DOC_BODY

    # explode(array(...)) = the same optimizer barrier parse_schedule_json
    # uses: without it the has_content filter's four __doc field
    # references each became their own schema-pruned from_json re-parse
    parsed = raw.withColumn(
        "__doc", F.explode(F.array(F.from_json(F.col("payload"), _DOC_BODY)))
    )
    has_content = (
        F.col("__doc.schedules").isNotNull() & (F.size("__doc.schedules") > 0)
    ) | (F.col("__doc.exams").isNotNull() & (F.size("__doc.exams") > 0))
    is_group = F.col("entity_type") == "group"

    # group `not data`: malformed JSON (the reference client yields None)
    # or a falsy document. from_json can't signal malformed input (it
    # returns an all-NULL struct, same as '{"other": 1}'), so validity
    # comes from try_parse_json and emptiness from the raw text.
    falsy_doc = F.regexp_replace(F.col("payload"), r"\s", "").isin(
        "{}", "null", "[]", ""
    )
    groups = parsed.filter(
        is_group & F.try_parse_json("payload").isNotNull() & ~falsy_doc
    ).select(
        "entity_type",
        F.col("entity_name").alias("group_name"),
        F.lit(None).cast("long").alias("employee_id"),
        F.col("payload").alias("data"),
    )

    emp_keys = (
        employees.filter(F.col("url_id").isNotNull())
        # one row per url_id even if the dim ever carried a duplicate
        .groupBy(F.col("url_id").alias("entity_name"))
        .agg(F.min("id").alias("employee_id"))
    )
    emps = (
        parsed.filter(~is_group & has_content)
        # inner join = the employee_id-is-None skip (logic.py:277-279)
        .join(F.broadcast(emp_keys), "entity_name", "inner")
        .select(
            "entity_type",
            F.lit(None).cast("string").alias("group_name"),
            "employee_id",
            F.col("payload").alias("data"),
        )
    )
    return groups.unionByName(emps)


def version_blobs(storage: DataFrame, incoming: DataFrame, now_ts) -> DataFrame:
    """Next ``schedule_json_storage`` snapshot: close-then-insert.

    ``incoming`` carries (entity_type, group_name, employee_id, data) —
    one row per fetched entity (the reference processes each entity once
    per sync; duplicate keys within one batch are undefined there too).
    Every incoming key closes its current row (if any) and opens a fresh
    version; current rows whose key is absent pass through open.
    """
    now: Column = (
        now_ts if isinstance(now_ts, Column) else F.lit(now_ts).cast("timestamp")
    )
    # composite version key — entity_type plus the per-type natural key
    def key(prefix: str) -> list[Column]:
        return [
            F.col(f"{prefix}entity_type"),
            F.col(f"{prefix}group_name"),
            F.col(f"{prefix}employee_id"),
        ]

    history = storage.filter(F.col("valid_to").isNotNull())
    current = storage.filter(F.col("valid_to").isNull())

    keys = (
        incoming.select(
            *[F.col(c).alias(f"__k_{c}") for c in ("entity_type", "group_name", "employee_id")]
        )
        .dropDuplicates()
        .withColumn("__hit", F.lit(True))
    )
    cond = [
        a.eqNullSafe(b) for a, b in zip(key(""), key("__k_"), strict=True)
    ]
    closed_or_kept = (
        current.join(F.broadcast(keys), cond, "left")
        .withColumn(
            "valid_to", F.when(F.col("__hit"), now).otherwise(F.col("valid_to"))
        )
        .select(*_STORAGE_COLS)
    )
    fresh = incoming.select(
        F.xxhash64("entity_type", "group_name", "employee_id", now).alias("id"),
        "entity_type",
        "group_name",
        "employee_id",
        "data",
        now.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    return (
        history.select(*_STORAGE_COLS)
        .unionByName(closed_or_kept)
        .unionByName(fresh)
    )
