"""End-to-end run of the full ETL DAG (E1) on a synthetic API payload
covering the reference's edge cases: dangling FKs, invalid group FK,
NULL urlId employees, discovered departments, bad schedule JSON."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from uma_etl_iis_loader_spark.plans.etl_job import run_etl

API = {
    "current_week": 3,
    "faculties": [
        {"id": 1, "name": "ФКСиС", "abbrev": "FKSiS"},
        {"id": 2, "name": "ФИТУ", "abbrev": "FITU"},
    ],
    "departments": [
        {"id": 10, "name": "Информатика", "abbrev": "Inf", "urlId": "inf"},
    ],
    "specialities": [
        {"id": 100, "name": "ПОИТ", "abbrev": "POIT", "code": "1-40",
         "educationForm": {"id": 1, "name": "Дневная"}, "facultyId": 1},
        # dangling facultyId 9 → placeholder faculty
        {"id": 101, "name": "ИСиТ", "abbrev": "IST", "code": "1-53",
         "educationForm": None, "facultyId": 9},
    ],
    "student_groups": [
        {"id": 1000, "name": "253501", "course": 2,
         "specialityDepartmentEducationFormId": 100, "numberOfStudents": 0},
        # invalid speciality FK → dropped (C2)
        {"id": 1001, "name": "999999", "course": 1,
         "specialityDepartmentEducationFormId": 999},
    ],
    "employees": [
        {"id": 7, "firstName": "Иван", "lastName": "Петров", "urlId": "ip",
         "rank": "доцент", "academicDepartment": ["inf", " ИНФОРМАТИКА "]},
        # NULL urlId → skipped (F2)
        {"id": 8, "firstName": "Анна", "lastName": "Сидорова", "urlId": None},
    ],
    "auditories": [
        {"id": 501, "name": "311", "buildingNumber": {"name": "4 к."},
         "note": "длинное примечание без обрезки",  # note is NOT truncated
         "capacity": 30, "auditoryType": {"name": "Лекционная"},
         "department": {"idDepartment": 20, "name": "Новая кафедра",
                        "abbrev": "NK"}},
        {"id": 502, "name": "100-5", "buildingNumberId": 5, "capacity": 60,
         "departmentId": 999},  # unknown dept → FK nulled (J4)
        # discovered dept with NO name/abbrev → 'Dept 21'/'D-21' fallbacks
        {"id": 503, "name": "201", "department": {"idDepartment": 21}},
        # embedded dept 10 already exists → departmentId (20, discovered
        # by auditory 501 earlier in the batch) wins over idDepartment
        {"id": 504, "name": "202",
         "department": {"idDepartment": 10, "name": "ignored"},
         "departmentId": 20},
    ],
    "schedules": [
        ("253501", "group", json.dumps({
            "schedules": {"Понедельник": [{
                "subject": "ООП",
                "startLessonTime": "9:00", "endLessonTime": "10:20",
                "weekNumber": [1, 3], "numSubgroup": 0,
                "auditories": [{"id": 501, "name": "311-4 к."}],
                "employees": [{"firstName": "Иван", "lastName": "Петров",
                               "middleName": None, "urlId": "ip"}],
                "studentGroups": [{"name": "253501", "numberOfStudents": 27}],
            }]},
            "exams": [],
        }, ensure_ascii=False)),
        ("broken", "group", "{definitely not json"),
    ],
}


def test_run_etl_end_to_end(spark):
    out = run_etl(spark, API, now_ts="2026-02-13 00:00:00")

    # KV state
    state = {r.key: r.value for r in out["system_state"].collect()}
    assert state["current_week"] == "3"

    # J1: dangling faculty 9 repaired with a placeholder
    fac = {r.id: r.name for r in out["faculties"].collect()}
    assert fac[9] == "Unknown Faculty 9"
    assert fac[1] == "ФКСиС"

    # C2: invalid-FK group dropped; SCD2 opened one current version
    groups = out["student_groups"].collect()
    assert {g.id for g in groups} == {1000}
    # J7: student count backfilled from the schedule doc (27)
    assert groups[0].number_of_students == 27

    # F2 + M5: employee 8 skipped; bridge resolved via name AND abbr → 1 row
    assert {e.id for e in out["employees"].collect()} == {7}
    bridge = {(b.department_id, b.employee_id) for b in out["departments_employees"].collect()}
    assert bridge == {(10, 7)}

    # M7: discovered departments inserted with reference fallbacks
    # (logic.py:243-246): name 'Dept {id}', abbr 'D-{id}', url_id str(id)
    depts = {d.id: d for d in out["departments"].collect()}
    assert set(depts) == {10, 20, 21}
    assert depts[20].name == "Новая кафедра" and depts[20].url_id == "20"
    assert depts[21].name == "Dept 21" and depts[21].abbr == "D-21"
    assert depts[21].url_id == "21"
    auds = {a.id: a for a in out["auditories"].collect()}
    assert auds[501].name == "311-4 к."
    assert auds[501].department_id == 20
    assert auds[502].department_id is None
    # reference semantics: containment checks the FULL "5 к." string, so
    # the bare "-5" tail does NOT suppress the suffix (logic.py:233-236)
    assert auds[502].name == "100-5-5 к."
    # building_number is the truncated column (String(10)); note is NOT
    # truncated (String(255)) — logic.py:259-260
    assert auds[501].building_number == "4 к."
    assert auds[502].building_number == "5 к."
    assert auds[501].note == "длинное примечание без обрезки"
    # embedded dept that already exists does NOT override departmentId
    # (logic.py:252 only sets dept_id in the newly-discovered branch)
    assert auds[504].department_id == 20
    assert auds[503].department_id == 21

    # shred + quarantine
    assert [r.entity_name for r in out["schedule_quarantine"].collect()] == ["broken"]
    events = out["schedule_events"].collect()
    assert len(events) == 1 and events[0].subject == "ООП"

    # E3 flagship on the job's own outputs
    occ = out["occupancy_index"].collect()
    assert len(occ) == 2  # weeks [1,3] × one auditory
    assert all(o.groups == ["253501"] for o in occ)
    assert {o.week_number for o in occ} == {1, 3}
    assert all(o.auditory_id == 501 for o in occ)
    assert all(o.day_of_week == "Понедельник" for o in occ)


def test_employee_links_delete_then_reinsert(spark):
    """iis_etl/logic.py:197: an employee appearing in the batch gets their
    OLD bridge links dropped before the fresh set is inserted; employees
    outside the batch keep theirs."""
    from uma_etl_iis_loader_spark.plans.etl_job import sync_employees
    from uma_etl_iis_loader_spark.schemas import (
        DEPARTMENTS,
        DEPARTMENTS_EMPLOYEES,
        EMPLOYEES,
    )

    dim = spark.createDataFrame([], EMPLOYEES)
    departments = spark.createDataFrame(
        [(10, "Информатика", "inf", "10"), (11, "Физика", "phy", "11")],
        DEPARTMENTS,
    )
    bridge = spark.createDataFrame(
        [(11, 7), (10, 99)], DEPARTMENTS_EMPLOYEES  # 7: stale; 99: untouched
    )
    payload = [
        {"id": 7, "firstName": "Иван", "lastName": "Петров", "urlId": "ip",
         # dict-shaped entry resolves via name-else-abbrev (logic.py:202-206)
         "academicDepartment": [{"name": None, "abbrev": "inf"}]},
    ]
    _, bridge_next = sync_employees(spark, dim, bridge, departments, payload)
    got = {(b.department_id, b.employee_id) for b in bridge_next.collect()}
    assert got == {(10, 7), (10, 99)}  # (11,7) deleted, (10,99) kept


def test_resync_same_payload_is_idempotent(spark):
    """Running the job twice on the SAME API snapshot must be a no-op:
    merges update to identical values, SCD2 opens no new versions and
    closes nothing, the bridge is rebuilt identically."""
    out1 = run_etl(spark, API, now_ts="2026-02-13 00:00:00")
    seed = {
        k: out1[k]
        for k in (
            "system_state", "faculties", "departments", "specialities",
            "student_groups", "employees", "departments_employees",
            "auditories",
        )
    }
    out2 = run_etl(
        spark, API, now_ts="2026-02-14 00:00:00", initial=seed
    )

    def rows(df, drop=()):
        return sorted(
            (
                tuple(v for c, v in sorted(r.asDict().items()) if c not in drop)
                for r in df.collect()
            ),
            key=repr,  # rows may contain NULLs — not orderable vs str
        )

    for table in ("faculties", "departments", "specialities", "employees",
                  "departments_employees", "auditories"):
        assert rows(out1[table]) == rows(out2[table]), table
    # KV state: same value, refreshed timestamp only
    assert rows(out1["system_state"], drop=("updated_at",)) == rows(
        out2["system_state"], drop=("updated_at",)
    )
    # SCD2: still exactly one current version per natural id, SAME valid_from
    g1 = rows(out1["student_groups"])
    g2 = rows(out2["student_groups"])
    assert g1 == g2


def test_resync_with_changes_transitions_scd2(spark):
    """Second sync with a changed snapshot: a type-2 attribute change
    closes the old group version and opens a new one; a dimension rename
    merges in place (no versioning)."""
    import copy

    t1, t2 = "2026-02-13 00:00:00", "2026-02-20 00:00:00"
    out1 = run_etl(spark, API, now_ts=t1)
    seed = {
        k: out1[k]
        for k in (
            "system_state", "faculties", "departments", "specialities",
            "student_groups", "employees", "departments_employees",
            "auditories",
        )
    }
    api2 = copy.deepcopy(API)
    api2["student_groups"][0]["course"] = 3  # type-2 change
    api2["faculties"][0]["name"] = "ФКСиС (переименован)"  # type-1 merge
    out2 = run_etl(spark, api2, now_ts=t2, initial=seed)

    versions = sorted(
        out2["student_groups"].filter("id = 1000").collect(),
        key=lambda r: (r.valid_to is None, str(r.valid_from)),
    )
    assert len(versions) == 2
    closed, current = versions
    assert str(closed.valid_to).startswith("2026-02-20") and closed.course == 2
    assert current.valid_to is None and current.course == 3
    assert str(current.valid_from).startswith("2026-02-20")

    fac = {r.id: r.name for r in out2["faculties"].collect()}
    assert fac[1] == "ФКСиС (переименован)"  # updated in place
    assert len(out2["faculties"].filter("id = 1").collect()) == 1


def test_empty_groups_payload_leaves_dim_untouched(spark):
    """logic.py:127-128: an empty/missing student_groups payload returns
    early — it must NOT read as 'all groups deleted' and close every
    current SCD2 row (a failed API fetch would otherwise wipe the dim)."""
    import copy

    out1 = run_etl(spark, API, now_ts="2026-02-13 00:00:00")
    seed = {
        k: out1[k]
        for k in (
            "system_state", "faculties", "departments", "specialities",
            "student_groups", "employees", "departments_employees",
            "auditories",
        )
    }
    api2 = copy.deepcopy(API)
    api2["student_groups"] = []
    out2 = run_etl(spark, api2, now_ts="2026-03-01 00:00:00", initial=seed)
    g1 = sorted(
        (r.id, str(r.valid_from), r.valid_to and str(r.valid_to))
        for r in out1["student_groups"].collect()
    )
    g2 = sorted(
        (r.id, str(r.valid_from), r.valid_to and str(r.valid_to))
        for r in out2["student_groups"].collect()
    )
    assert g1 == g2  # nothing closed, nothing opened


def test_lazy_outputs_get_propagates_thunk_keyerror():
    """r13 (advice): _LazyOutputs.get must return the default only for a
    MISSING top-level key; a KeyError raised inside a thunk (bad payload
    field during deferred construction) must propagate."""
    import pytest

    from uma_etl_iis_loader_spark.plans.etl_job import _LazyOutputs

    out = _LazyOutputs()
    out["good"] = lambda: "built"
    def boom():
        raise KeyError("payload field missing")
    out["bad"] = boom
    assert out.get("good") == "built"
    assert out.get("absent", 42) == 42
    with pytest.raises(KeyError):
        out.get("bad")
