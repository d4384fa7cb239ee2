"""Reference-surface queries (SURVEY.md §2) over the driver fixture tables,
each with a DuckDB oracle.

Naming: q_<operator-id>_<slug>. Every computed column is aliased the same
in Spark and SQL (the driver hash-compares after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_fixture
from ..operators.occupancy import rebuild_occupancy
from .fixtures import fixture_auditories, fixture_schedule_events
from .registry import register

_DAY_CASE_SQL = """CASE day_of_week
    WHEN 1 THEN 'Понедельник' WHEN 2 THEN 'Вторник' WHEN 3 THEN 'Среда'
    WHEN 4 THEN 'Четверг' WHEN 5 THEN 'Пятница' WHEN 6 THEN 'Суббота'
    WHEN 7 THEN 'Воскресенье' END"""


# ---------------------------------------------------------------------------
# E3 / J6 / A1 / X1-X2 / S6-U2 — the flagship occupancy rebuild
# ---------------------------------------------------------------------------

_OCCUPANCY_ORACLE = f"""
WITH docs AS (
    SELECT o.o_orderkey, c.c_name, o.o_orderdate,
           list_sort(list_distinct(array_agg(s.s_name))) AS auditories
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1, 2, 3
), ev AS (
    SELECT c_name AS entity_name,
           'group' AS entity_type,
           CAST(datediff('day', DATE '1970-01-05', CAST(o_orderdate AS DATE)) % 7 + 1 AS INT) AS day_of_week,
           CAST(28800 + (o_orderkey % 6) * 3600 AS INT) AS start_time,
           CAST(28800 + (o_orderkey % 6) * 3600 + 4500 AS INT) AS end_time,
           range(1, CAST(o_orderkey % 4 AS INT) + 2) AS week_numbers,
           auditories
    FROM docs
), exploded AS (
    SELECT entity_name, day_of_week, start_time, end_time,
           w.week_number, u.aud_name
    FROM ev,
         unnest(ev.week_numbers) AS w(week_number),
         unnest(ev.auditories) AS u(aud_name)
    WHERE entity_type = 'group' AND day_of_week IS NOT NULL
)
SELECT {_DAY_CASE_SQL} AS day_of_week,
       CAST(week_number AS INT) AS week_number,
       start_time, end_time,
       a.s_suppkey AS auditory_id,
       list_sort(list_distinct(array_agg(entity_name))) AS groups
FROM exploded
JOIN supplier a ON exploded.aud_name = a.s_name
GROUP BY 1, 2, 3, 4, 5
"""


@register("flagship_occupancy", _OCCUPANCY_ORACLE)
def q_flagship_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: double-explode → broadcast dim join → groupBy + collect_set
    (`iis_etl/logic.py:451-468`)."""
    events = fixture_schedule_events(spark, sf_dir)
    auditories = fixture_auditories(spark, sf_dir)
    return rebuild_occupancy(events, auditories)
