"""Explicit StructType registry.

Two groups:

1. Reference-domain tables — Spark equivalents of the reference's
   SQLAlchemy models (``/root/reference/iis_etl/models.py:7-125``), with the
   type mapping from SURVEY.md §1.2 (TIME → seconds-since-midnight int,
   TSVECTOR → token array + raw search_text, JSON → typed structs).
2. Driver fixture tables (``/root/testdata/sf*/``) used by the oracle
   correctness gate.

Schemas are declared eagerly (the reference creates DDL at startup,
``main.py:26-29``); a fixed schema lets every parquet scan prune columns and
push filters without inference cost.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# reference-domain schemas (models.py equivalents)
# --------------------------------------------------------------------------

SYSTEM_STATE = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

FACULTIES = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("abbr", T.StringType(), True),
    ]
)

DEPARTMENTS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("abbr", T.StringType(), True),
        T.StructField("url_id", T.StringType(), True),
    ]
)

EMPLOYEES = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("first_name", T.StringType(), True),
        T.StructField("last_name", T.StringType(), True),
        T.StructField("middle_name", T.StringType(), True),
        T.StructField("degree", T.StringType(), True),
        T.StructField("rank", T.StringType(), True),
        T.StructField("photo_link", T.StringType(), True),
        T.StructField("calendar_id", T.StringType(), True),
        T.StructField("url_id", T.StringType(), True),
    ]
)

DEPARTMENTS_EMPLOYEES = T.StructType(
    [
        T.StructField("department_id", T.LongType(), False),
        T.StructField("employee_id", T.LongType(), False),
    ]
)

SPECIALITIES = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("abbr", T.StringType(), True),
        T.StructField("code", T.StringType(), True),
        T.StructField("education_form", T.StringType(), True),
        T.StructField("faculty_id", T.LongType(), True),
    ]
)

# SCD2 dim: natural `id` intentionally NOT unique (models.py:64)
STUDENT_GROUPS = T.StructType(
    [
        T.StructField("surrogate_id", T.LongType(), False),
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("course", T.IntegerType(), True),
        T.StructField("speciality_id", T.LongType(), True),
        T.StructField("calendar_id", T.StringType(), True),
        T.StructField("education_degree", T.IntegerType(), True),
        T.StructField("number_of_students", T.IntegerType(), True),
        T.StructField("valid_from", T.TimestampType(), True),
        T.StructField("valid_to", T.TimestampType(), True),
    ]
)

AUDITORIES = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        # String(10) in the reference (`iis_etl/models.py:79`) — the
        # truncation applies HERE, not to note (String(255), untruncated)
        T.StructField("building_number", T.StringType(), True),
        T.StructField("note", T.StringType(), True),
        T.StructField("capacity", T.IntegerType(), True),
        T.StructField("auditory_type", T.StringType(), True),
        T.StructField("department_id", T.LongType(), True),
    ]
)

OCCUPANCY_INDEX = T.StructType(
    [
        T.StructField("day_of_week", T.StringType(), True),
        T.StructField("week_number", T.IntegerType(), True),
        T.StructField("start_time", T.IntegerType(), True),  # seconds-since-midnight
        T.StructField("end_time", T.IntegerType(), True),
        T.StructField("auditory_id", T.LongType(), True),
        T.StructField("groups", T.ArrayType(T.StringType()), True),
    ]
)

RELATED_GROUP = T.StructType(
    [
        T.StructField("name", T.StringType(), True),
        T.StructField("numberOfStudents", T.IntegerType(), True),
    ]
)

RELATED_EMPLOYEE = T.StructType(
    [
        T.StructField("firstName", T.StringType(), True),
        T.StructField("lastName", T.StringType(), True),
        T.StructField("middleName", T.StringType(), True),
        T.StructField("urlId", T.StringType(), True),
    ]
)

SCHEDULE_EVENTS = T.StructType(
    [
        T.StructField("entity_name", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), False),  # 'group' | 'employee'
        T.StructField("subject", T.StringType(), True),
        T.StructField("subject_full", T.StringType(), True),
        T.StructField("auditories", T.ArrayType(T.StringType()), True),
        T.StructField("day_of_week", T.IntegerType(), True),  # 1-7, null for exams
        T.StructField("start_time", T.IntegerType(), True),  # seconds-since-midnight
        T.StructField("end_time", T.IntegerType(), True),
        T.StructField("week_numbers", T.ArrayType(T.IntegerType()), True),
        T.StructField("exact_date", T.DateType(), True),
        T.StructField("related_groups", T.ArrayType(RELATED_GROUP), True),
        T.StructField("related_employees", T.ArrayType(RELATED_EMPLOYEE), True),
        T.StructField("subgroup", T.IntegerType(), True),
        T.StructField("search_text", T.StringType(), True),
        T.StructField("search_tokens", T.ArrayType(T.StringType()), True),
    ]
)

# Raw schedule JSON landing zone (models.py:97-106), SCD2-style versioned
SCHEDULE_JSON_STORAGE = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("entity_type", T.StringType(), False),
        T.StructField("group_name", T.StringType(), True),
        T.StructField("employee_id", T.LongType(), True),
        T.StructField("data", T.StringType(), True),  # opaque JSON passthrough
        T.StructField("valid_from", T.TimestampType(), True),
        T.StructField("valid_to", T.TimestampType(), True),
    ]
)

# The nested lesson shape consumed by the shredder (FIXTURES.md A6)
LESSON = T.StructType(
    [
        T.StructField("subject", T.StringType(), True),
        T.StructField("subjectFullName", T.StringType(), True),
        T.StructField("startLessonTime", T.StringType(), True),
        T.StructField("endLessonTime", T.StringType(), True),
        T.StructField("weekNumber", T.ArrayType(T.IntegerType()), True),
        T.StructField("numSubgroup", T.IntegerType(), True),
        # heterogeneous in the source (dict|str|int) — normalized to this
        # struct at parse time; see functions.normalize.auditory_names
        T.StructField(
            "auditories",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.LongType(), True),
                        T.StructField("name", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("employees", T.ArrayType(RELATED_EMPLOYEE), True),
        T.StructField("studentGroups", T.ArrayType(RELATED_GROUP), True),
        T.StructField("dateLesson", T.StringType(), True),  # exams only, dd.MM.yyyy
    ]
)

SCHEDULE_DOC = T.StructType(
    [
        T.StructField("entity_name", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), False),
        T.StructField("schedules", T.MapType(T.StringType(), T.ArrayType(LESSON)), True),
        T.StructField("exams", T.ArrayType(LESSON), True),
    ]
)

# --------------------------------------------------------------------------
# driver fixture tables (/root/testdata/sf*/)
# --------------------------------------------------------------------------

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

REFERENCE_TABLES: dict[str, T.StructType] = {
    "system_state": SYSTEM_STATE,
    "faculties": FACULTIES,
    "departments": DEPARTMENTS,
    "employees": EMPLOYEES,
    "departments_employees": DEPARTMENTS_EMPLOYEES,
    "specialities": SPECIALITIES,
    "student_groups": STUDENT_GROUPS,
    "auditories": AUDITORIES,
    "occupancy_index": OCCUPANCY_INDEX,
    "schedule_json_storage": SCHEDULE_JSON_STORAGE,
    "schedule_events": SCHEDULE_EVENTS,
}
