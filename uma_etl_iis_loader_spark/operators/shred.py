"""Schedule-document shredder (E2 / SURVEY.md §2.7, X1-X10): nested
schedule JSON → flat `schedule_events` rows.

Reference: ``_process_schedule_json`` (`iis_etl/logic.py:271-404`) — a
per-document Python loop with per-entity savepoint rollback. Here it is one
declarative plan over ALL documents at once:

- X1  map explode day→lessons (Russian day name → 1-7, unknown days dropped)
- X2  lesson array explode
- X3  exam explode (exact_date, NULL day_of_week, [] weeks) unioned in
- X4  week default [] / [0] → [1,2,3,4]
- X5  heterogeneous auditory entries → name strings
- X6  "Last First" fio assembly
- X7  time parse — ASYMMETRIC: invalid lesson time drops the row
      (`iis_etl/logic.py:331-333`), invalid exam time defaults to 00:00
      (`iis_etl/logic.py:366-370`)
- X8  dd.MM.yyyy exam date parse, unparseable exam dropped
- X9  Python-`or` default chains (`''` counts as missing)
- X10 search_text assembly + tokenization (replaces TSVECTOR)

Error isolation: the reference rolls back one entity per bad document
(savepoints). In Spark malformed raw JSON is quarantined at parse time
(``parse_schedule_json``: permissive ``from_json``, NULL rows split off)
— same guarantee, no transaction machinery.

Scale: zero shuffles in the shredder itself (narrow transforms only);
explodes fan out row-locally. At 100 TB the only shuffles are in the
downstream aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import (
    auditory_names,
    day_int_expr,
    default_weeks,
    py_or_str,
)
from ..functions.text import search_text, tokenize
from ..functions.timeparse import hhmm_to_seconds, parse_ddmmyyyy
from pyspark.sql import types as T

from ..schemas import LESSON

# payload shape: the doc body without the entity columns (those ride along
# as real columns on the raw frame)
_DOC_BODY = T.StructType(
    [
        T.StructField("schedules", T.MapType(T.StringType(), T.ArrayType(LESSON)), True),
        T.StructField("exams", T.ArrayType(LESSON), True),
    ]
)


def parse_schedule_json(raw: DataFrame, json_col: str = "payload") -> tuple[DataFrame, DataFrame]:
    """Raw (entity_name, entity_type, payload-json) rows → (docs, quarantine).

    Permissive parse: a document that fails to parse lands in quarantine
    instead of poisoning the batch (replaces the reference's per-entity
    savepoint rollback, `iis_etl/logic.py:416-424,436-445`).
    """
    # The explode(array(...)) wrapper is a deliberate optimizer barrier:
    # Catalyst rewrites each GetStructField(JsonToStructs(...)) into its
    # OWN schema-pruned from_json, so the usable filter plus the
    # schedules/exams projections (and, after project-collapse, every
    # downstream expression referencing them) each re-parsed the payload
    # — four+ full JSON parses per row in the E2 plan. Materializing the
    # struct through a Generate makes __doc an attribute the extractors
    # can't be pushed into: exactly ONE from_json per row (plan-checked),
    # measured 4.3 s → 1.2 s on the sf0.1 shred query. explode of a
    # 1-element array literal keeps row count and NULL semantics
    # identical (the array is never null; a malformed doc stays a NULL
    # element row).
    parsed = raw.withColumn(
        "__doc", F.explode(F.array(F.from_json(F.col(json_col), _DOC_BODY)))
    )
    # from_json yields an all-NULL struct for malformed input; a doc with
    # neither schedules nor exams is also skipped by the reference (F4,
    # `iis_etl/logic.py:434`) — both land in quarantine here.
    usable = (
        F.col("__doc").isNotNull()
        & (F.col("__doc.schedules").isNotNull() | F.col("__doc.exams").isNotNull())
    )
    ok = parsed.filter(usable).select(
        "entity_name",
        "entity_type",
        F.col("__doc.schedules").alias("schedules"),
        F.col("__doc.exams").alias("exams"),
    )
    quarantine = parsed.filter(~usable).drop("__doc")
    return ok, quarantine


def _common_columns(df: DataFrame, default_subject) -> DataFrame:
    """Shared lesson/exam scalar derivations (X5, X6, X9).
    ``default_subject``: str or Column (per-row default for the fused
    lesson∪exam pass)."""
    if isinstance(default_subject, str):
        default_subject = F.lit(default_subject)
    subject = py_or_str(F.col("lesson.subject"), default_subject)
    return (
        df.withColumn("subject", subject)
        .withColumn(
            "subject_full", py_or_str(F.col("lesson.subjectFullName"), F.col("subject"))
        )
        .withColumn("auditories", auditory_names(F.col("lesson.auditories")))
        # reference stores [] when the key is missing (`.get(x, [])`,
        # iis_etl/logic.py:357-358); from_json gives NULL → normalize
        .withColumn(
            "related_groups",
            F.coalesce(F.col("lesson.studentGroups"), F.array()),
        )
        .withColumn(
            "related_employees",
            F.coalesce(F.col("lesson.employees"), F.array()),
        )
        # `.get('numSubgroup', 0)`: missing → 0. (An EXPLICIT null stays
        # NULL in the reference; from_json can't distinguish the two, so
        # both map to 0 here — documented deviation.)
        .withColumn("subgroup", F.coalesce(F.col("lesson.numSubgroup"), F.lit(0)))
    )


def _with_search(df: DataFrame) -> DataFrame:
    """X10: search_text = subject + full name + entity + rooms — exactly
    the columns the reference's stored search_vector uses
    (`iis_etl/logic.py:394-404`). NB the reference also builds a
    `search_parts` list with employee/group names (logic.py:344-348) but
    never stores it — dead code; we match the PERSISTED behavior."""
    txt = search_text(
        F.col("subject"),
        F.col("subject_full"),
        F.col("entity_name"),
        F.array_join(F.col("auditories"), " "),
    )
    return df.withColumn("search_text", txt).withColumn(
        "search_tokens", tokenize(F.col("search_text"))
    )


def shred_schedule_docs(docs: DataFrame) -> DataFrame:
    """SCHEDULE_DOC rows → SCHEDULE_EVENTS rows (lessons ∪ exams).

    SINGLE-PASS fan-out: lessons (from the day→lessons map) and exams are
    flattened into ONE item array and exploded once, with the per-branch
    semantics (X1/X7/X8 filters, exam time defaults, subject defaults)
    expressed as conditional columns on the fused rows. The obvious
    two-branch ``lessons UNION ALL exams`` plan reads the doc source twice
    — Spark plans are trees, so a union re-evaluates the whole upstream
    subtree per branch, and when the docs come from ``from_json`` (the E2
    pipeline) that doubles the dominant JSON-parse cost. At 100 TB that is
    two full passes over the corpus instead of one; exchange reuse cannot
    rescue it because ``unionByName``'s expr-id dedup re-aliases one
    branch and breaks canonical plan equality. Measured at sf0.1: ~2x on
    the end-to-end shred. Zero shuffles, as before.
    """
    arr_lesson = T.ArrayType(LESSON)
    # lesson items: map day→lessons, each lesson tagged with its day name;
    # exam items: day NULL. NULL-safe at every level (a NULL map / NULL
    # per-day array / NULL exams array contributes no rows, like explode).
    day_items = F.flatten(
        F.transform(
            F.map_entries(
                F.coalesce(
                    F.col("schedules"),
                    F.create_map().cast(T.MapType(T.StringType(), arr_lesson)),
                )
            ),
            lambda e: F.transform(
                F.coalesce(e["value"], F.array().cast(arr_lesson)),
                lambda l: F.struct(
                    e["key"].alias("day_name"),
                    l.alias("lesson"),
                    F.lit(False).alias("is_exam"),
                ),
            ),
        )
    )
    exam_items = F.transform(
        F.coalesce(F.col("exams"), F.array().cast(arr_lesson)),
        lambda l: F.struct(
            F.lit(None).cast("string").alias("day_name"),
            l.alias("lesson"),
            F.lit(True).alias("is_exam"),
        ),
    )
    items = F.concat(day_items, exam_items)

    ex = docs.select(
        "entity_name", "entity_type", F.explode(items).alias("it")
    ).select(
        "entity_name",
        "entity_type",
        F.col("it.day_name").alias("day_name"),
        F.col("it.lesson").alias("lesson"),
        F.col("it.is_exam").alias("is_exam"),
    )

    is_exam = F.col("is_exam")
    s = hhmm_to_seconds(F.col("lesson.startLessonTime"))
    e = hhmm_to_seconds(F.col("lesson.endLessonTime"))
    t_ok = s.isNotNull() & e.isNotNull()
    day_int = day_int_expr(F.col("day_name"))
    exam_date = parse_ddmmyyyy(F.col("lesson.dateLesson"))

    fused = (
        ex
        # X7 lesson asymmetry: invalid time → row dropped; exam: invalid
        # time → 00:00, PAIRWISE — the reference's except block resets
        # BOTH times when either fails (`iis_etl/logic.py:366-370`), so a
        # valid start with a bad end still becomes 00:00/00:00
        .withColumn(
            "start_time",
            F.when(is_exam, F.when(t_ok, s).otherwise(F.lit(0))).otherwise(s),
        )
        .withColumn(
            "end_time",
            F.when(is_exam, F.when(t_ok, e).otherwise(F.lit(0))).otherwise(e),
        )
        # X1: unknown day key → lesson row dropped; exams have no day
        .withColumn(
            "day_of_week", F.when(is_exam, F.lit(None).cast("int")).otherwise(day_int)
        )
        # X8: unparseable exam date → exam skipped; lessons have no date
        .withColumn(
            "exact_date", F.when(is_exam, exam_date).otherwise(F.lit(None).cast("date"))
        )
        .withColumn(
            "week_numbers",
            F.when(is_exam, F.array().cast("array<int>")).otherwise(
                default_weeks(F.col("lesson.weekNumber"))
            ),
        )
        .filter(
            F.when(is_exam, exam_date.isNotNull()).otherwise(
                day_int.isNotNull() & t_ok
            )
        )
    )
    fused = _with_search(
        _common_columns(
            fused,
            F.when(is_exam, F.lit("Экзамен")).otherwise(F.lit("Без названия")),
        )
    )
    return fused.select(
        "entity_name",
        "entity_type",
        "subject",
        "subject_full",
        "auditories",
        "day_of_week",
        "start_time",
        "end_time",
        "week_numbers",
        "exact_date",
        "related_groups",
        "related_employees",
        "subgroup",
        "search_text",
        "search_tokens",
    )


def backfill_student_counts(docs: DataFrame) -> DataFrame:
    """J7: per group document, first positive ``numberOfStudents`` where a
    lesson's studentGroups entry names the document's own entity
    (`iis_etl/logic.py:302-322`). 'First' is defined deterministically as
    the minimum positive count (documented deviation, SURVEY.md §7).

    Returns (entity_name, number_of_students) for group docs that have one.
    """
    lessons = docs.filter(F.col("entity_type") == "group").select(
        "entity_name",
        F.explode(
            F.flatten(F.map_values(F.col("schedules")))
        ).alias("lesson"),
    )
    own = lessons.select(
        "entity_name",
        F.explode("lesson.studentGroups").alias("sg"),
    ).filter(
        (F.col("sg.name") == F.col("entity_name"))
        & (F.col("sg.numberOfStudents") > 0)
    )
    return own.groupBy("entity_name").agg(
        F.min("sg.numberOfStudents").alias("number_of_students")
    )
