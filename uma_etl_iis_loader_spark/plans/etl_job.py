"""End-to-end ETL job plan — the Spark re-expression of the reference's
``main.py`` orchestration (E1, `main.py:32-64`):

Phase 1 (dimensions, ordered for FK integrity): system_state → faculties →
departments → specialities → student_groups (SCD2) → employees (+ bridge)
→ auditories.  Phase 2 (facts): schedule docs → quarantine/shred →
schedule_events.  Phase 3 (derived): occupancy index.

The API is injected as plain payload lists (``api`` dict), so the job runs
hermetically in tests; production wires ``sources.rest.RestSource`` /
``fetch_manifest`` into the same entry points. Every write is a snapshot
DataFrame returned to the caller (persist via io.write_snapshot).

Scale: dims are KB-to-MB (driver-created, broadcast in joins); the only
data-proportional stages are the schedule shred (narrow) and the two
occupancy shuffles — the same profile as the flagship query.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.normalize import py_or_str
from ..operators.joins import (
    fk_repair_placeholders,
    normalized_lookup,
    semi_fk_filter,
)
from ..operators.json_storage import schedule_blob_incoming, version_blobs
from ..operators.merge import insert_if_absent, merge_upsert
from ..operators.occupancy import rebuild_occupancy
from ..operators.scd2 import scd2_apply
from ..operators.shred import (
    backfill_student_counts,
    parse_schedule_json,
    shred_schedule_docs,
)
from ..schemas import (
    AUDITORIES,
    DEPARTMENTS,
    DEPARTMENTS_EMPLOYEES,
    EMPLOYEES,
    FACULTIES,
    SCHEDULE_JSON_STORAGE,
    SPECIALITIES,
    STUDENT_GROUPS,
    SYSTEM_STATE,
)


def _empty(spark: SparkSession, schema) -> DataFrame:
    return spark.createDataFrame([], schema)


def _local_df(spark: SparkSession, rows: list[tuple], schema) -> DataFrame:
    """Driver-payload list → DataFrame via pandas + Arrow.

    ``createDataFrame(list_of_tuples, schema)`` walks the pickled-row
    path: per-row type verification on the driver and per-action row
    pickling into the JVM. Transposing into object-dtype pandas columns
    routes through Arrow instead (guide §6: Arrow for driver transfers)
    — measured at the 15k-row student_groups payload: create 0.19 s →
    0.14 s and, because the local relation then ships as Arrow batches,
    each downstream action 0.7-1.0 s → 0.4 s. Column mapping is
    positional (same contract as the tuple path); object dtype keeps
    ints exact and None → NULL, bit-identical output (parity-tested
    incl. array<string> columns)."""
    if not rows:
        return spark.createDataFrame([], schema)
    pdf = pd.DataFrame(
        {i: pd.Series(c, dtype=object) for i, c in enumerate(zip(*rows))}
    )
    return spark.createDataFrame(pdf, schema=schema)


class _LazyOutputs(dict):
    """``run_etl``'s output map; a value may be a zero-arg thunk that
    CONSTRUCTS the (lazy) DataFrame on first access. Phase-2/3 plans
    (shred explode chain, occupancy rebuild, blob versioning) are
    expensive to *build* (~1 s of driver/py4j time each per sync) — a
    consumer that only reads dimension outputs (e.g. the E1 adjudication
    query, which consumes ``student_groups`` and re-seeds the next sync
    from the dims) should not pay plan construction for branches it
    never touches. Resolution is cached; all read paths resolve."""

    def __getitem__(self, k):
        v = super().__getitem__(k)
        if callable(v):
            v = v()
            super().__setitem__(k, v)
        return v

    def get(self, k, default=None):
        # only the MISSING-KEY KeyError maps to the default; a KeyError
        # raised inside a thunk (e.g. a bad payload field during
        # deferred plan construction) must propagate, not be swallowed
        if k not in self:
            return default
        return self[k]

    def values(self):  # noqa: D102 - dict API, resolved
        return [self[k] for k in self]

    def items(self):  # noqa: D102 - dict API, resolved
        return [(k, self[k]) for k in self]


def sync_system_state(
    spark: SparkSession, state: DataFrame, key: str, value: str, now_ts
) -> DataFrame:
    """M1 (`iis_etl/logic.py:63-68`): single-key upsert into the KV table."""
    incoming = _local_df(
        spark, [(key, str(value)[:255])], "key string, value string"
    ).withColumn("updated_at", F.lit(now_ts).cast("timestamp"))
    return merge_upsert(state, incoming, ["key"], update_cols=["value", "updated_at"])


def sync_faculties(spark: SparkSession, dim: DataFrame, payload: list[dict]) -> DataFrame:
    """M2 (`iis_etl/logic.py:71-82`)."""
    rows = [
        (int(p["id"]), p.get("name"), p.get("abbrev")) for p in payload
    ]
    incoming = _local_df(spark, rows, FACULTIES)
    return merge_upsert(dim, incoming, ["id"], update_cols=["name", "abbr"])


def sync_departments(spark: SparkSession, dim: DataFrame, payload: list[dict]) -> DataFrame:
    """M3 (`iis_etl/logic.py:85-96`): name falls back to nameAbbrev; abbr
    falls back to name[:50] (a PROVIDED abbrev is kept untruncated,
    logic.py:91); url_id = str(id) on insert, NOT updated."""
    rows = []
    for p in payload:
        name = p.get("name") or p.get("nameAbbrev")
        abbr = p.get("abbrev") or (name[:50] if name else None)
        rows.append((int(p["id"]), name, abbr, str(p.get("id"))))
    incoming = _local_df(spark, rows, DEPARTMENTS)
    return merge_upsert(dim, incoming, ["id"], update_cols=["name", "abbr"])


def sync_specialities(
    spark: SparkSession,
    dim: DataFrame,
    faculties: DataFrame,
    payload: list[dict],
) -> tuple[DataFrame, DataFrame]:
    """M4 + J1 (`iis_etl/logic.py:99-122`): repair dangling faculty FKs
    with 'Unknown Faculty {id}' placeholders first, then merge. Returns
    (specialities, repaired_faculties). education_form falls back
    name → str(id) → 'Unknown' with Python-or semantics
    (`iis_etl/logic.py:112-113`)."""
    rows = []
    for p in payload:
        ef = p.get("educationForm") or {}
        rows.append(
            (
                int(p["id"]),
                p.get("name"),
                p.get("abbrev"),
                p.get("code"),
                ef.get("name") or (str(ef["id"]) if ef.get("id") else None),
                p.get("facultyId"),
            )
        )
    incoming = _local_df(spark, rows, SPECIALITIES).withColumn(
        "education_form", py_or_str(F.col("education_form"), F.lit("Unknown"))
    )
    repaired = fk_repair_placeholders(
        incoming,
        faculties,
        "faculty_id",
        "id",
        {
            "name": F.concat(F.lit("Unknown Faculty "), F.col("id").cast("string")),
            # NOT NULL/unique column in the reference → f'UNK-{id}'
            # (iis_etl/logic.py:108)
            "abbr": F.concat(F.lit("UNK-"), F.col("id").cast("string")),
        },
    )
    merged = merge_upsert(
        dim,
        incoming,
        ["id"],
        update_cols=["name", "abbr", "code", "faculty_id"],  # NOT education_form (M4)
    )
    return merged, repaired


def sync_student_groups(
    spark: SparkSession,
    dim: DataFrame,
    specialities: DataFrame,
    payload: list[dict],
    now_ts,
) -> DataFrame:
    """C1-C7 (`iis_etl/logic.py:125-171`): semi-join FK validity filter,
    then the SCD2 transition. An EMPTY payload short-circuits to the
    unchanged dim (logic.py:127-128 returns early) — without the guard a
    failed upstream fetch would read as "every group deleted" and close
    the whole dimension (C6)."""
    if not payload:
        return dim
    rows = [
        (
            int(p["id"]),
            p.get("name"),
            p.get("course"),
            p.get("specialityDepartmentEducationFormId"),
            p.get("calendarId"),
            p.get("educationDegree", 1),  # default 1, iis_etl/logic.py:144
            p.get("numberOfStudents"),  # NO default — missing stays NULL
        )
        for p in payload
    ]
    incoming = _local_df(
        spark,
        rows,
        "id long, name string, course int, speciality_id long, "
        "calendar_id string, education_degree int, number_of_students int",
    )
    incoming = semi_fk_filter(incoming, specialities, "speciality_id")
    return scd2_apply(
        dim,
        incoming,
        natural_key="id",
        type2_cols=["name", "course", "speciality_id"],  # iis_etl/logic.py:152-160
        type1_cols=["number_of_students"],  # iis_etl/logic.py:161-163
        now_ts=now_ts,
    )


def sync_employees(
    spark: SparkSession,
    dim: DataFrame,
    bridge: DataFrame,
    departments: DataFrame,
    payload: list[dict],
) -> tuple[DataFrame, DataFrame]:
    """M5 + J3 + M8 (`iis_etl/logic.py:174-214`): employees with NULL
    urlId skipped; update set is only rank/degree/url_id; the
    departments_employees bridge resolves the employee's academicDepartment
    entries (strings, or dicts via name-else-abbrev, logic.py:202-206)
    against dept name OR abbr (lower+trim). Links are delete+reinsert per
    batch employee (logic.py:197): an employee's stale links are dropped,
    employees outside the batch keep theirs."""

    def _dept_ref(d):
        if isinstance(d, str):
            return d
        if isinstance(d, dict):
            return d.get("name") or d.get("abbrev")
        return None

    rows = [
        (
            int(p["id"]),
            p.get("firstName"),
            p.get("lastName"),
            p.get("middleName"),
            p.get("degree"),
            p.get("rank"),
            p.get("photoLink"),
            p.get("calendarId"),
            p.get("urlId"),
            [r for r in map(_dept_ref, p.get("academicDepartment") or []) if r],
        )
        for p in payload
    ]
    incoming_all = _local_df(
        spark,
        rows,
        "id long, first_name string, last_name string, middle_name string, "
        "degree string, rank string, photo_link string, calendar_id string, "
        "url_id string, academic_department array<string>",
    ).filter(
        # F2, iis_etl/logic.py:184 — `if not item.get('urlId')` is Python
        # truthiness: '' is skipped exactly like None
        F.col("url_id").isNotNull() & (F.col("url_id") != "")
    )

    incoming = incoming_all.drop("academic_department")
    merged = merge_upsert(
        dim, incoming, ["id"], update_cols=["rank", "degree", "url_id"]
    )

    links = (
        incoming_all.select(
            F.col("id").alias("employee_id"),
            F.explode("academic_department").alias("dept_ref"),
        )
        .transform(
            lambda df: normalized_lookup(
                df, departments, "dept_ref", "id", ["name", "abbr"],
                out_col="department_id",
            )
        )
        .filter(F.col("department_id").isNotNull())
        .select("department_id", "employee_id")
        .dropDuplicates()  # A4, iis_etl/logic.py:199-210
    )
    # delete+reinsert per batch employee (iis_etl/logic.py:197): anti-join
    # out every batch employee's old links, then add the fresh set
    batch_ids = incoming_all.select(F.col("id").alias("employee_id"))
    bridge_next = bridge.join(
        F.broadcast(batch_ids), "employee_id", "left_anti"
    ).unionByName(links.select(*bridge.columns))
    return merged, bridge_next


def sync_auditories(
    spark: SparkSession,
    dim: DataFrame,
    departments: DataFrame,
    payload: list[dict],
) -> tuple[DataFrame, DataFrame]:
    """M6 + M7 + J4 (`iis_etl/logic.py:217-268`): building suffix appended
    when absent, departments discovered from the embedded payload are
    insert-if-absent'ed FIRST (name/abbr fall back to 'Dept {id}'/'D-{id}',
    url_id = str(id), logic.py:243-246), unknown department FKs nulled,
    update set is only name/capacity. Returns (auditories, departments).

    FK resolution is row-order-sensitive in the reference (its
    existing_dept_ids set mutates through the loop, logic.py:221-252):
    the embedded idDepartment overrides departmentId ONLY on the row that
    first discovers it; later rows fall back to their own departmentId,
    and a departmentId is nulled unless the department existed before the
    batch or was discovered by a row at or before this one. Reproduced
    with a payload-index window instead of driver-side mutable state.
    """
    from pyspark.sql.window import Window

    aud_rows = []
    for idx, p in enumerate(payload):
        raw_name = p.get("name") or ""
        build = (p.get("buildingNumber") or {}).get("name") or (
            f"{p['buildingNumberId']} к." if p.get("buildingNumberId") else ""
        )
        # iis_etl/logic.py:230-236: append the building suffix (incl. its
        # " к." marker) unless the raw name already embeds it verbatim —
        # the reference compares the FULL build string, so "100-5" with
        # building 5 still gets "-5 к." appended
        name = (
            f"{raw_name}-{build}"
            if build and build not in raw_name
            else raw_name
        )
        dept = p.get("department") or {}
        d_id = dept.get("idDepartment") if isinstance(dept, dict) else None
        aud_rows.append(
            (
                idx,
                int(p["id"]),
                name,
                str(build)[:10] if build else None,  # iis_etl/logic.py:259
                p.get("note"),  # untruncated (String(255), models.py:80)
                p.get("capacity"),
                (p.get("auditoryType") or {}).get("name"),
                int(d_id) if d_id else None,
                dept.get("name") if d_id else None,
                dept.get("abbrev") if d_id else None,
                p.get("departmentId"),
            )
        )
    raw = _local_df(
        spark,
        aud_rows,
        "idx long, id long, name string, building_number string, "
        "note string, capacity int, auditory_type string, "
        "emb_dept_id long, emb_dept_name string, emb_dept_abbr string, "
        "payload_dept_id long",
    )
    pre_known = departments.select(
        F.col("id").alias("emb_dept_id"), F.lit(True).alias("__pre")
    )
    w = Window.partitionBy("emb_dept_id").orderBy("idx")
    flagged = raw.join(F.broadcast(pre_known), "emb_dept_id", "left").withColumn(
        "__discovers",
        F.col("emb_dept_id").isNotNull()
        & F.col("__pre").isNull()
        & (F.row_number().over(w) == 1),
    )
    discovered = flagged.filter(F.col("__discovers")).select(
        F.col("emb_dept_id").alias("id"),
        py_or_str(
            F.col("emb_dept_name"),
            F.concat(F.lit("Dept "), F.col("emb_dept_id").cast("string")),
        ).alias("name"),
        py_or_str(
            F.col("emb_dept_abbr"),
            F.concat(F.lit("D-"), F.col("emb_dept_id").cast("string")),
        ).alias("abbr"),
        F.col("emb_dept_id").cast("string").alias("url_id"),
    )
    departments_next = insert_if_absent(departments, discovered, ["id"])  # M7

    # dept_id = embedded id only on the discovering row (logic.py:252),
    # else the payload's own departmentId
    resolved = flagged.withColumn(
        "department_id",
        F.when(F.col("__discovers"), F.col("emb_dept_id")).otherwise(
            F.col("payload_dept_id")
        ),
    )
    # J4: null the FK unless known pre-batch or discovered at idx' <= idx
    first_discovery = flagged.filter(F.col("__discovers")).select(
        F.col("emb_dept_id").alias("department_id"),
        F.col("idx").alias("__disc_idx"),
    )
    incoming = (
        resolved.join(
            F.broadcast(
                departments.select(
                    F.col("id").alias("department_id"),
                    F.lit(True).alias("__known_pre"),
                )
            ),
            "department_id",
            "left",
        )
        .join(F.broadcast(first_discovery), "department_id", "left")
        .withColumn(
            "department_id",
            F.when(
                F.col("__known_pre").isNotNull()
                | (F.col("__disc_idx") <= F.col("idx")),
                F.col("department_id"),
            ),
        )
        .select(*[f.name for f in AUDITORIES.fields])
    )
    merged = merge_upsert(dim, incoming, ["id"], update_cols=["name", "capacity"])
    return merged, departments_next


def run_etl(
    spark: SparkSession,
    api: dict,
    now_ts: str = "2026-02-13 00:00:00",
    initial: dict[str, DataFrame] | None = None,
) -> dict[str, DataFrame]:
    """Full job DAG (`main.py:32-64`). ``api`` maps endpoint name →
    payload (lists of dicts; ``schedules`` → list of (entity_name,
    entity_type, raw_json)). ``initial`` seeds the dimension state from a
    previous run's outputs (the incremental re-sync path — the reference
    always starts from the live database the same way)."""
    initial = initial or {}

    def _seed(key: str, schema) -> DataFrame:
        return initial.get(key, _empty(spark, schema))

    state = _seed("system_state", SYSTEM_STATE)
    faculties = _seed("faculties", FACULTIES)
    departments = _seed("departments", DEPARTMENTS)
    specialities = _seed("specialities", SPECIALITIES)
    groups = _seed("student_groups", STUDENT_GROUPS)
    employees = _seed("employees", EMPLOYEES)
    bridge = _seed("departments_employees", DEPARTMENTS_EMPLOYEES)
    auditories = _seed("auditories", AUDITORIES)
    storage = _seed("schedule_json_storage", SCHEDULE_JSON_STORAGE)

    # Phase 1 — dimensions, strictly ordered (main.py:40-47)
    # iis_etl/logic.py:62-63: the KV upsert happens only when the fetched
    # week is truthy — a failed/empty fetch leaves system_state untouched
    # Empty payloads are no-ops in the reference (its sync loops iterate
    # the list and never touch the table), so each sync below is guarded:
    # skipping it is semantically identical and keeps a partial-fetch
    # run's plan tree (and the chained re-sync plans built on top of it)
    # proportional to what was actually fetched.
    week = api.get("current_week")
    if week:
        state = sync_system_state(spark, state, "current_week", str(week), now_ts)
    if api.get("faculties"):
        faculties = sync_faculties(spark, faculties, api["faculties"])
    if api.get("departments"):
        departments = sync_departments(spark, departments, api["departments"])
    if api.get("specialities"):
        specialities, faculties = sync_specialities(
            spark, specialities, faculties, api["specialities"]
        )
    groups = sync_student_groups(
        spark, groups, specialities, api.get("student_groups", []), now_ts
    )
    if api.get("employees"):
        employees, bridge = sync_employees(
            spark, employees, bridge, departments, api["employees"]
        )
    if api.get("auditories"):
        auditories, departments = sync_auditories(
            spark, auditories, departments, api["auditories"]
        )

    # Phase 2 — facts (main.py:51-52). Plan CONSTRUCTION is deferred
    # behind _LazyOutputs thunks: a consumer that never reads the fact/
    # derived outputs (the E1 adjudication query reads student_groups +
    # the dim seeds, twice per run) skips the shred/occupancy/versioning
    # plan building entirely — the returned plans are identical when
    # accessed. The `schedules`-present path still builds docs eagerly
    # for the J7 backfill below.
    raw_schema = "entity_name string, entity_type string, payload string"

    def _once(fn):
        memo = []

        def wrapped():
            if not memo:
                memo.append(fn())
            return memo[0]

        return wrapped

    _raw = _once(
        lambda: _local_df(spark, api.get("schedules", []), raw_schema)
    )
    _docs_quarantine = _once(lambda: parse_schedule_json(_raw()))

    if api.get("schedules"):
        docs, quarantine = _docs_quarantine()
        # raw-blob versioning happens on the UNFILTERED raw rows: the
        # group path stores docs the shredder quarantines (no
        # schedules/exams) — guard asymmetry lives in
        # schedule_blob_incoming (`iis_etl/logic.py:282-297,413,432`)
        storage_prev, employees_f = storage, employees
        storage = lambda: version_blobs(  # noqa: E731
            storage_prev, schedule_blob_incoming(_raw(), employees_f), now_ts
        )
        events = _once(lambda: shred_schedule_docs(docs))
        quarantine_out = quarantine
        # J7: backfill number_of_students into current group rows
        counts = backfill_student_counts(docs)
        groups = (
            groups.join(
                F.broadcast(
                    counts.select(
                        F.col("entity_name").alias("name"),
                        F.col("number_of_students").alias("__bf"),
                    )
                ),
                "name",
                "left",
            )
            .withColumn(
                "number_of_students",
                F.when(
                    F.col("valid_to").isNull() & F.col("__bf").isNotNull(),
                    F.col("__bf"),
                ).otherwise(F.col("number_of_students")),
            )
            .drop("__bf")
        )
    else:
        events = _once(lambda: shred_schedule_docs(_docs_quarantine()[0]))
        quarantine_out = lambda: _docs_quarantine()[1]  # noqa: E731

    # Phase 3 — derived occupancy index (main.py:55)
    auditories_f = auditories
    events_f = events

    def _occupancy() -> DataFrame:
        e = events_f() if callable(events_f) else events_f
        return rebuild_occupancy(e, auditories_f)

    return _LazyOutputs(
        {
            "system_state": state,
            "faculties": faculties,
            "departments": departments,
            "specialities": specialities,
            "student_groups": groups,
            "employees": employees,
            "departments_employees": bridge,
            "auditories": auditories,
            "schedule_json_storage": storage,
            "schedule_events": events,
            "schedule_quarantine": quarantine_out,
            "occupancy_index": _occupancy,
        }
    )
