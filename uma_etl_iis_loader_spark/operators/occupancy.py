"""Occupancy-index rebuild — the reference's flagship query (E3,
`iis_etl/logic.py:447-476`).

Reference shape: ``TRUNCATE`` + one INSERT-SELECT with ``CROSS JOIN LATERAL
unnest(week_numbers) × unnest(auditories)``, an inner join to the
auditories dim on room name, a groups-only weekday filter, and ``GROUP BY 5
keys + array_agg(DISTINCT entity_name)``.

Spark plan: double ``explode`` → broadcast join to the (small) dim →
``groupBy().agg(collect_set)``. Catalyst pushes the `entity_type`/
`day_of_week` filter below the explodes; partial aggregation runs map-side
before the single shuffle on the 5 group keys. ``collect_set`` is unordered
(like ``array_agg(DISTINCT)``) so we ``array_sort`` for deterministic
output.

Scale notes (100 TB): the only shuffle is the final groupBy; the dim join
is broadcast; explode fan-out happens before the shuffle so partial
aggregation absorbs it. Skew on (day, week, time) keys is bounded by the
calendar domain — AQE skew-join handles residue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import day_name_expr


def rebuild_occupancy(
    schedule_events: DataFrame,
    auditories: DataFrame,
    localized_day_names: bool = True,
) -> DataFrame:
    """schedule_events (SCHEDULE_EVENTS shape) × auditories dim →
    occupancy_index (OCCUPANCY_INDEX shape).

    Mirrors `iis_etl/logic.py:451-468` semantics exactly:
    groups-only, weekday non-null, day int → localized name, DISTINCT
    group aggregation per (day, week, start, end, room).
    """
    # explode auditories FIRST and join the dim before the week explode:
    # the broadcast join then processes |auditories|-fanout rows instead of
    # |auditories|×|weeks| — the two explodes are independent inner
    # explodes, so the reorder is plan-equivalent (same output)
    exploded = (
        schedule_events
        .filter(
            (F.col("entity_type") == "group") & F.col("day_of_week").isNotNull()
        )
        .select(
            "entity_name",
            "day_of_week",
            "start_time",
            "end_time",
            "week_numbers",
            F.explode("auditories").alias("aud_name"),
        )
    )
    day_col = (
        day_name_expr(F.col("day_of_week"))
        if localized_day_names
        else F.col("day_of_week").cast("string")
    )
    return (
        exploded.join(
            F.broadcast(auditories.select(F.col("id").alias("auditory_id"), "name")),
            exploded["aud_name"] == F.col("name"),
            "inner",
        )
        .select(
            "entity_name",
            "day_of_week",
            "start_time",
            "end_time",
            "auditory_id",
            F.explode("week_numbers").alias("week_number"),
        )
        .groupBy(
            day_col.alias("day_of_week"),
            "week_number",
            "start_time",
            "end_time",
            "auditory_id",
        )
        .agg(F.array_sort(F.collect_set("entity_name")).alias("groups"))
    )
