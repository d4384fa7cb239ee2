"""Reference-surface queries (SURVEY.md §2) over the driver fixture tables,
each with a DuckDB oracle.

Naming: q_<operator-id>_<slug>. Every computed column is aliased the same
in Spark and SQL (the driver hash-compares after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_fixture
from ..operators.joins import (
    anti_missing,
    backfill_first_match,
    fk_repair_placeholders,
    fuzzy_lookup,
    normalized_lookup,
    semi_fk_filter,
)
from ..operators.merge import insert_if_absent, merge_upsert
from ..operators.occupancy import rebuild_occupancy
from ..operators.scd2 import scd2_apply
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
       array_to_string(list_sort(list_distinct(array_agg(entity_name))), '|') AS groups
FROM exploded
JOIN supplier a ON exploded.aud_name = a.s_name
GROUP BY 1, 2, 3, 4, 5
"""


@register("flagship_occupancy", _OCCUPANCY_ORACLE)
def q_flagship_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: double-explode → broadcast dim join → groupBy + collect_set
    (`iis_etl/logic.py:451-468`).

    The operator emits `groups` as a sorted array (the reference's
    array_agg(DISTINCT) column); the registered query serializes it to a
    '|'-joined string because the driver's canonicalizer hashes rows via
    pandas sort_values, which cannot hash list cells.
    """
    events = fixture_schedule_events(spark, sf_dir)
    auditories = fixture_auditories(spark, sf_dir)
    return rebuild_occupancy(events, auditories).withColumn(
        "groups", F.array_join("groups", "|")
    )


# ---------------------------------------------------------------------------
# M2-M6 — keyed merge (ON CONFLICT DO UPDATE) with per-column update sets
# ---------------------------------------------------------------------------
# old dim = customers with key % 3 != 0; incoming = key % 2 == 0 with changed
# name/acctbal. update_cols = {c_name, c_acctbal}; c_nationkey/c_mktsegment
# are insert-only (the M3/M5 wrinkle).

_MERGE_ORACLE = """
WITH old AS (
    SELECT * FROM customer WHERE c_custkey % 3 <> 0
), new AS (
    SELECT c_custkey, upper(c_name) AS c_name, c_nationkey,
           round(c_acctbal + 100.0, 2) AS c_acctbal, c_mktsegment
    FROM customer WHERE c_custkey % 2 = 0
)
SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
       CASE WHEN n.c_custkey IS NOT NULL THEN n.c_name ELSE o.c_name END AS c_name,
       CASE WHEN o.c_custkey IS NOT NULL THEN o.c_nationkey ELSE n.c_nationkey END AS c_nationkey,
       CASE WHEN n.c_custkey IS NOT NULL THEN n.c_acctbal ELSE o.c_acctbal END AS c_acctbal,
       CASE WHEN o.c_custkey IS NOT NULL THEN o.c_mktsegment ELSE n.c_mktsegment END AS c_mktsegment
FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
"""


@register("merge_upsert_dim", _MERGE_ORACLE)
def q_merge_upsert_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2-M6: join-based keyed merge (`iis_etl/logic.py:77-96,186-195`)."""
    customer = read_fixture(spark, sf_dir, "customer")
    old = customer.filter(F.col("c_custkey") % 3 != 0)
    new = customer.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        F.upper("c_name").alias("c_name"),
        "c_nationkey",
        F.round(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
        "c_mktsegment",
    )
    return merge_upsert(
        old, new, ["c_custkey"], update_cols=["c_name", "c_acctbal"]
    )


# ---------------------------------------------------------------------------
# M7/M8 — insert-if-absent (ON CONFLICT DO NOTHING)
# ---------------------------------------------------------------------------

_INSERT_ABSENT_ORACLE = """
WITH old AS (
    SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey <= 50
), new AS (
    SELECT s_suppkey, concat('NEW-', s_name) AS s_name FROM supplier
)
SELECT * FROM old
UNION ALL
SELECT n.* FROM new n ANTI JOIN old o ON n.s_suppkey = o.s_suppkey
"""


@register("insert_if_absent", _INSERT_ABSENT_ORACLE)
def q_insert_if_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7/M8: keep existing, add unseen keys (`iis_etl/logic.py:213-214,246-249`)."""
    supplier = read_fixture(spark, sf_dir, "supplier")
    old = supplier.filter(F.col("s_suppkey") <= 50).select("s_suppkey", "s_name")
    new = supplier.select(
        "s_suppkey", F.concat(F.lit("NEW-"), F.col("s_name")).alias("s_name")
    )
    return insert_if_absent(old, new, ["s_suppkey"])


# ---------------------------------------------------------------------------
# C1-C7 — SCD Type 2 snapshot transition
# ---------------------------------------------------------------------------
# dim current = customers % 10 != 1 (valid_from 2024-01-01); history rows for
# % 10 == 3. incoming = customers % 10 != 2, with a type-2 change (% 10 == 4:
# name) and a type-1-only change (% 10 == 5: acctbal). now = 2024-06-01.

_SCD2_ORACLE = """
WITH cur AS (
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
           TIMESTAMP '2024-01-01' AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
    FROM customer WHERE c_custkey % 10 <> 1
), hist AS (
    SELECT c_custkey, concat(c_name, '_old') AS c_name, c_mktsegment, c_acctbal,
           TIMESTAMP '2023-01-01' AS valid_from, TIMESTAMP '2024-01-01' AS valid_to
    FROM customer WHERE c_custkey % 10 = 3
), inc AS (
    SELECT c_custkey,
           CASE WHEN c_custkey % 10 = 4 THEN concat(c_name, '_v2') ELSE c_name END AS c_name,
           c_mktsegment,
           CASE WHEN c_custkey % 10 = 5 THEN round(c_acctbal + 100.0, 2) ELSE c_acctbal END AS c_acctbal
    FROM customer WHERE c_custkey % 10 <> 2
), m AS (
    SELECT o.c_custkey AS o_key, o.c_name AS o_name, o.c_mktsegment AS o_seg,
           o.c_acctbal AS o_bal, o.valid_from AS o_from,
           n.c_custkey AS n_key, n.c_name AS n_name, n.c_mktsegment AS n_seg,
           n.c_acctbal AS n_bal
    FROM cur o FULL OUTER JOIN inc n ON o.c_custkey = n.c_custkey
)
-- new key
SELECT n_key AS c_custkey, n_name AS c_name, n_seg AS c_mktsegment, n_bal AS c_acctbal,
       TIMESTAMP '2024-06-01' AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
FROM m WHERE o_key IS NULL
UNION ALL
-- type-2 change: closed old
SELECT o_key, o_name, o_seg, o_bal, o_from, TIMESTAMP '2024-06-01'
FROM m WHERE o_key IS NOT NULL AND n_key IS NOT NULL
  AND (o_name IS DISTINCT FROM n_name OR o_seg IS DISTINCT FROM n_seg)
UNION ALL
-- type-2 change: new current version
SELECT n_key, n_name, n_seg, n_bal, TIMESTAMP '2024-06-01', NULL
FROM m WHERE o_key IS NOT NULL AND n_key IS NOT NULL
  AND (o_name IS DISTINCT FROM n_name OR o_seg IS DISTINCT FROM n_seg)
UNION ALL
-- type-1 only: patched in place
SELECT o_key, o_name, o_seg, n_bal, o_from, NULL
FROM m WHERE o_key IS NOT NULL AND n_key IS NOT NULL
  AND NOT (o_name IS DISTINCT FROM n_name OR o_seg IS DISTINCT FROM n_seg)
  AND o_bal IS DISTINCT FROM n_bal
UNION ALL
-- unchanged
SELECT o_key, o_name, o_seg, o_bal, o_from, NULL
FROM m WHERE o_key IS NOT NULL AND n_key IS NOT NULL
  AND NOT (o_name IS DISTINCT FROM n_name OR o_seg IS DISTINCT FROM n_seg)
  AND NOT (o_bal IS DISTINCT FROM n_bal)
UNION ALL
-- missing from snapshot: closed
SELECT o_key, o_name, o_seg, o_bal, o_from, TIMESTAMP '2024-06-01'
FROM m WHERE n_key IS NULL
UNION ALL
SELECT * FROM hist
"""


@register("scd2_snapshot", _SCD2_ORACLE)
def q_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1-C7: full SCD2 transition (`iis_etl/logic.py:125-171`)."""
    customer = read_fixture(spark, sf_dir, "customer")
    base = customer.select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    cur = base.filter(F.col("c_custkey") % 10 != 1).select(
        "*",
        F.lit("2024-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    hist = base.filter(F.col("c_custkey") % 10 == 3).select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit("_old")).alias("c_name"),
        "c_mktsegment",
        "c_acctbal",
        F.lit("2023-01-01").cast("timestamp").alias("valid_from"),
        F.lit("2024-01-01").cast("timestamp").alias("valid_to"),
    )
    dim = cur.unionByName(hist)
    inc = base.filter(F.col("c_custkey") % 10 != 2).select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 10 == 4, F.concat(F.col("c_name"), F.lit("_v2"))
        ).otherwise(F.col("c_name")).alias("c_name"),
        "c_mktsegment",
        F.when(
            F.col("c_custkey") % 10 == 5, F.round(F.col("c_acctbal") + 100.0, 2)
        ).otherwise(F.col("c_acctbal")).alias("c_acctbal"),
    )
    return scd2_apply(
        dim,
        inc,
        natural_key="c_custkey",
        type2_cols=["c_name", "c_mktsegment"],
        type1_cols=["c_acctbal"],
        now_ts="2024-06-01",
        surrogate_col=None,
    )


# ---------------------------------------------------------------------------
# J2 — left-semi FK validity filter
# ---------------------------------------------------------------------------

_SEMI_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders WHERE o_custkey IN (
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
)
"""


@register("semi_join_fk_filter", _SEMI_ORACLE)
def q_semi_join_fk_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/C2: drop rows whose FK is invalid (`iis_etl/logic.py:130-131,139-140`)."""
    orders = read_fixture(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dim = read_fixture(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return semi_fk_filter(orders, dim, "o_custkey", "c_custkey")


# ---------------------------------------------------------------------------
# J5/C6 — anti-join deletion detection
# ---------------------------------------------------------------------------

_ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer
ANTI JOIN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') o
ON c_custkey = o_custkey
"""


@register("anti_join_deletion", _ANTI_ORACLE)
def q_anti_join_deletion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/C6: current keys absent from snapshot (`iis_etl/logic.py:165-169`)."""
    customer = read_fixture(spark, sf_dir, "customer").select("c_custkey", "c_name")
    snapshot = (
        read_fixture(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return anti_missing(customer, snapshot, "c_custkey")


# ---------------------------------------------------------------------------
# J1 — FK repair with placeholder parents
# ---------------------------------------------------------------------------

_FK_REPAIR_ORACLE = """
WITH dim AS (
    SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 20
), dangling AS (
    SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
    WHERE c_nationkey IS NOT NULL
      AND c_nationkey NOT IN (SELECT n_nationkey FROM dim)
)
SELECT n_nationkey, n_name FROM dim
UNION ALL
SELECT n_nationkey, concat('Unknown Nation ', CAST(n_nationkey AS VARCHAR))
FROM dangling
"""


@register("fk_repair_placeholder", _FK_REPAIR_ORACLE)
def q_fk_repair_placeholder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: synthesize 'Unknown Faculty {id}' parents (`iis_etl/logic.py:102-110`)."""
    dim = read_fixture(spark, sf_dir, "nation").filter(
        F.col("n_nationkey") < 20
    ).select("n_nationkey", "n_name")
    child = read_fixture(spark, sf_dir, "customer").select(
        F.col("c_nationkey")
    )
    return fk_repair_placeholders(
        child,
        dim,
        "c_nationkey",
        "n_nationkey",
        {
            "n_name": F.concat(
                F.lit("Unknown Nation "), F.col("n_nationkey").cast("string")
            )
        },
    )


# ---------------------------------------------------------------------------
# J3 — normalized-key lookup join (name OR abbr, lower+trim)
# ---------------------------------------------------------------------------

_NORM_LOOKUP_ORACLE = """
WITH dim AS (
    SELECT s_suppkey AS id, upper(s_name) AS name,
           concat('SUP#', CAST(s_suppkey AS VARCHAR)) AS abbr
    FROM supplier
), lookup AS (
    SELECT lower(trim(name)) AS k, min(id) AS resolved_id FROM dim
    WHERE name IS NOT NULL AND trim(name) <> '' GROUP BY 1
    UNION ALL
    SELECT lower(trim(abbr)), min(id) FROM dim
    WHERE abbr IS NOT NULL AND trim(abbr) <> '' GROUP BY lower(trim(abbr))
), lk AS (
    SELECT k, min(resolved_id) AS resolved_id FROM lookup GROUP BY k
), facts AS (
    SELECT s_suppkey,
           CASE WHEN s_suppkey % 2 = 0 THEN concat('  ', s_name, ' ')
                WHEN s_suppkey % 5 = 1 THEN 'no-such-room'
                ELSE concat('sup#', CAST(s_suppkey AS VARCHAR)) END AS room_ref
    FROM supplier
), typo AS (
    SELECT id AS s_suppkey,
           concat(substring(name, 1, p - 1),
                  substring(name, p + 1, length(name))) AS room_ref
    FROM (SELECT id, name, (id % length(name)) + 1 AS p FROM dim)
), best AS (
    SELECT s_suppkey, id AS resolved_id, dist FROM (
        SELECT t.s_suppkey, d.id,
               levenshtein(lower(trim(t.room_ref)), lower(trim(d.name))) AS dist,
               row_number() OVER (
                   PARTITION BY t.s_suppkey
                   ORDER BY levenshtein(lower(trim(t.room_ref)),
                                        lower(trim(d.name))), d.id
               ) AS rn
        FROM typo t CROSS JOIN dim d
        WHERE levenshtein(lower(trim(t.room_ref)), lower(trim(d.name))) <= 1
    ) WHERE rn = 1
)
SELECT 'exact' AS method, f.s_suppkey, f.room_ref, lk.resolved_id,
       CAST(CASE WHEN lk.resolved_id IS NOT NULL THEN 0 END AS INT) AS dist
FROM facts f LEFT JOIN lk ON lower(trim(f.room_ref)) = lk.k
UNION ALL
SELECT 'fuzzy', t.s_suppkey, t.room_ref, b.resolved_id, CAST(b.dist AS INT)
FROM typo t LEFT JOIN best b USING (s_suppkey)
"""


@register("normalized_key_lookup", _NORM_LOOKUP_ORACLE)
def q_normalized_key_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3, method-tagged:

    - 'exact' rows: lookup on lower(trim(name-or-abbr))
      (`iis_etl/logic.py:177-181,201-210`) — the reference's dict
      semantics (dist 0 when resolved, NULL when unknown).
    - 'fuzzy' rows: the dirty-key extension the reference silently lacks
      (typo'd keys fall through its dict lookup): every supplier name
      with one deterministically-positioned character deleted, resolved
      by `joins.fuzzy_lookup` — SymSpell deletion-neighborhood blocking
      + levenshtein ≤ 1 verify, (dist, id)-min tie-break. The oracle
      recomputes the match brute-force (levenshtein over the full cross
      product), so the blocked plan's completeness is driver-adjudicated
      against the unblocked definition.
    """
    supplier = read_fixture(spark, sf_dir, "supplier")
    dim = supplier.select(
        F.col("s_suppkey").alias("id"),
        F.upper("s_name").alias("name"),
        F.concat(F.lit("SUP#"), F.col("s_suppkey").cast("string")).alias("abbr"),
    )
    facts = supplier.select(
        "s_suppkey",
        F.when(
            F.col("s_suppkey") % 2 == 0, F.concat(F.lit("  "), F.col("s_name"), F.lit(" "))
        )
        .when(F.col("s_suppkey") % 5 == 1, F.lit("no-such-room"))
        .otherwise(
            F.concat(F.lit("sup#"), F.col("s_suppkey").cast("string"))
        )
        .alias("room_ref"),
    )
    exact = normalized_lookup(facts, dim, "room_ref", "id", ["name", "abbr"]).select(
        F.lit("exact").alias("method"),
        "s_suppkey",
        "room_ref",
        "resolved_id",
        F.when(F.col("resolved_id").isNotNull(), F.lit(0)).cast("int").alias("dist"),
    )
    p = (F.col("id") % F.length("name")) + F.lit(1)
    typo = dim.select(
        F.col("id").alias("s_suppkey"),
        F.concat(
            F.substring(F.col("name"), F.lit(1), p - F.lit(1)),
            F.substring(F.col("name"), p + F.lit(1), F.length("name")),
        ).alias("room_ref"),
    )
    fuzzy = fuzzy_lookup(
        typo, dim, "room_ref", "id", "name", max_dist=1, dist_col="dist"
    ).select(
        F.lit("fuzzy").alias("method"),
        "s_suppkey",
        "room_ref",
        "resolved_id",
        F.col("dist").cast("int").alias("dist"),
    )
    return exact.unionByName(fuzzy)


# ---------------------------------------------------------------------------
# M1 — KV state latest-per-key (window dedup)
# ---------------------------------------------------------------------------

_KV_LATEST_ORACLE = """
SELECT user_id, ts, event_type, value FROM (
    SELECT user_id, ts, event_type, value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
) WHERE rn = 1
"""


@register("kv_state_latest", _KV_LATEST_ORACLE)
def q_kv_state_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: latest value per state key (`iis_etl/logic.py:63-68`) as a
    window dedup over the events table."""
    from pyspark.sql.window import Window

    events = read_fixture(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# J7/A2 — deterministic first-match backfill
# ---------------------------------------------------------------------------

# (l_linenumber, l_quantity) pairs are not unique per order in the fixture,
# so the order key is a composite to keep 'first' deterministic
_BACKFILL_ORACLE = """
WITH firsts AS (
    SELECT l_orderkey AS o_orderkey,
           arg_min(l_quantity, l_linenumber * 1000 + l_quantity) AS first_qty
    FROM lineitem WHERE l_quantity > 25
    GROUP BY 1
)
SELECT o.o_orderkey, o.o_orderstatus, f.first_qty
FROM orders o LEFT JOIN firsts f ON o.o_orderkey = f.o_orderkey
"""


@register("backfill_first_match", _BACKFILL_ORACLE)
def q_backfill_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7/A2: first qualifying value per key, deterministic min-by
    (`iis_etl/logic.py:302-322`; deviation documented in SURVEY.md §7)."""
    orders = read_fixture(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    src = (
        read_fixture(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 25)
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            (F.col("l_linenumber") * 1000 + F.col("l_quantity")).alias("ord"),
            "l_quantity",
        )
    )
    return backfill_first_match(
        orders, src, "o_orderkey", "ord", "l_quantity", "first_qty"
    )


# ---------------------------------------------------------------------------
# X9 — Python-`or` default chains ('' counts as missing)
# ---------------------------------------------------------------------------

_PY_OR_ORACLE = """
SELECT p_partkey,
       COALESCE(NULLIF(CASE WHEN p_partkey % 5 = 0 THEN ''
                                 WHEN p_partkey % 7 = 0 THEN NULL
                                 ELSE p_name END, ''), 'Без названия') AS subject
FROM part
"""


@register("py_or_defaults", _PY_OR_ORACLE)
def q_py_or_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9: `x or default` with ''-is-missing (`iis_etl/logic.py:89,113,338`)."""
    from ..functions.normalize import py_or_str

    part = read_fixture(spark, sf_dir, "part")
    raw = (
        F.when(F.col("p_partkey") % 5 == 0, F.lit(""))
        .when(F.col("p_partkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("p_name"))
    )
    return part.select(
        "p_partkey", py_or_str(raw, F.lit("Без названия")).alias("subject")
    )


# ---------------------------------------------------------------------------
# X4 — week-number default
# ---------------------------------------------------------------------------

# E1 end-to-end: the oracle derives the FINAL student_groups SCD2 state
# after an initial sync (t1) and a changed re-sync (t2) directly from the
# customer/supplier tables — the Spark side actually runs the full job
# DAG twice (merges, FK repair, semi-join filter, SCD2 transition).
_ETL_JOB_ORACLE = """
WITH src AS (
    SELECT c_custkey AS id, c_name AS name,
           CAST(c_custkey % 5 + 1 AS INT) AS course1,
           CAST(c_custkey % 120 AS BIGINT) AS speciality_id,
           CAST(c_custkey % 40 AS INT) AS students1
    FROM customer
    -- C2: FK-valid groups only (specialities dim = the supplier table)
    WHERE (c_custkey % 120) IN (SELECT s_suppkey FROM supplier)
), marked AS (
    SELECT *,
           (id % 13 = 0) AS gone2,              -- absent from snapshot 2
           (id % 10 = 4) AS t2_change,          -- type-2: course changed
           (id % 10 = 5) AS t1_change           -- type-1: student count
    FROM src
)
-- closed rows: dropped keys and pre-change versions
SELECT id, name, course1 AS course, speciality_id,
       students1 AS number_of_students,
       TIMESTAMP '2026-03-01' AS valid_from,
       TIMESTAMP '2026-03-08' AS valid_to
FROM marked WHERE gone2 OR t2_change
UNION ALL
-- reopened current versions after the type-2 change
SELECT id, name, course1 + 1, speciality_id, students1,
       TIMESTAMP '2026-03-08', NULL
FROM marked WHERE t2_change AND NOT gone2
UNION ALL
-- type-1 patched in place (version identity kept) and unchanged rows
SELECT id, name, course1, speciality_id,
       CASE WHEN t1_change THEN students1 + 5 ELSE students1 END,
       TIMESTAMP '2026-03-01', NULL
FROM marked WHERE NOT gone2 AND NOT t2_change
"""


def etl_api_payloads(sf_dir: str) -> tuple[dict, dict]:
    """Driver-side API payload construction for the E1 job — the role
    the reference's REST client plays (`iis_etl/client.py`): pure
    Python over pyarrow-read fixture tables, no Spark work. Split out
    of :func:`q_etl_job_sync` so the scale harnesses can attribute
    driver-side payload cost (which grows with the customer table and
    is NOT an engine scaling signal) separately from the Spark sync.
    Returns ``(api1, api2)`` — the t1 payload and the changed re-sync
    payload (type-2 course change, type-1 student patch, deletions)."""
    import pyarrow.parquet as pq

    region = pq.read_table(f"{sf_dir}/region.parquet").to_pylist()
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pylist()
    supplier = pq.read_table(f"{sf_dir}/supplier.parquet").to_pylist()
    customer = pq.read_table(f"{sf_dir}/customer.parquet").to_pylist()

    faculties = [
        {"id": r["r_regionkey"], "name": r["r_name"], "abbrev": f"R{r['r_regionkey']}"}
        for r in region
    ]
    departments = [
        {
            "id": n["n_nationkey"],
            "name": n["n_name"],
            "abbrev": None if n["n_nationkey"] % 3 == 0 else f"N{n['n_nationkey']}",
        }
        for n in nation
    ]
    specialities = [
        {
            "id": s["s_suppkey"],
            "name": s["s_name"],
            "abbrev": f"SP{s['s_suppkey']}",
            "code": str(s["s_suppkey"]),
            "educationForm": None
            if s["s_suppkey"] % 4 == 0
            else {"id": s["s_suppkey"] % 3 + 1, "name": f"Form{s['s_suppkey'] % 2}"},
            # s_nationkey % 7 ∈ 0..6 but faculties are 0..4 → 5,6 dangle
            # and get 'Unknown Faculty {id}'/'UNK-{id}' placeholders (J1)
            "facultyId": s["s_nationkey"] % 7,
        }
        for s in supplier
    ]

    def groups_payload(resync: bool) -> list[dict]:
        out = []
        for c in customer:
            k = c["c_custkey"]
            if resync and k % 13 == 0:
                continue  # C6: deletion-close on re-sync
            course = k % 5 + 1
            students = k % 40
            if resync and k % 10 == 4:
                course += 1  # C4: type-2 change
            if resync and k % 10 == 5:
                students += 5  # C5: type-1 patch
            out.append(
                {
                    "id": k,
                    "name": c["c_name"],
                    "course": course,
                    # invalid ids (0, >100) dropped by the C2 semi-join
                    "specialityDepartmentEducationFormId": k % 120,
                    "numberOfStudents": students,
                }
            )
        return out

    api1 = {
        "current_week": 1,
        "faculties": faculties,
        "departments": departments,
        "specialities": specialities,
        "student_groups": groups_payload(resync=False),
    }
    api2 = dict(api1, student_groups=groups_payload(resync=True))
    return api1, api2


@register("etl_job_sync", _ETL_JOB_ORACLE)
def q_etl_job_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: the WHOLE job DAG (`main.py:32-64` → `plans/etl_job.run_etl`)
    driver-adjudicated. Builds API payloads from the fixture tables
    (driver-side, like the reference's REST client — see
    :func:`etl_api_payloads`), runs the full sync at t1, then a changed
    re-sync at t2 seeded from the first run's outputs: a type-2 course
    change (close+reopen), a type-1 student-count patch (in place), and
    dropped keys (deletion-close). Returns the final student_groups
    SCD2 history. Exercises M2-M4 merges, J1 FK repair, C2 semi-join
    filter, and every SCD2 transition (C1-C7) through the real
    orchestration path rather than isolated operators."""
    from .etl_job import run_etl

    api1, api2 = etl_api_payloads(sf_dir)
    out1 = run_etl(spark, api1, now_ts="2026-03-01 00:00:00")
    # the re-sync runs directly on run 1's lazy outputs: measured FASTER
    # than an eager localCheckpoint of the 8 seed tables here (the dims
    # are tiny — materialization overhead exceeds lineage re-execution;
    # production uses io.write_snapshot between syncs instead)
    seed = {
        k: out1[k]
        for k in (
            "system_state",
            "faculties",
            "departments",
            "specialities",
            "student_groups",
            "employees",
            "departments_employees",
            "auditories",
        )
    }
    out2 = run_etl(spark, api2, now_ts="2026-03-08 00:00:00", initial=seed)
    return out2["student_groups"].select(
        "id",
        "name",
        "course",
        "speciality_id",
        "number_of_students",
        "valid_from",
        "valid_to",
    )


# ---------------------------------------------------------------------------
# schedule_json_storage — raw-blob SCD2 versioning across a re-sync
# ---------------------------------------------------------------------------
# The oracle derives the expected blob history from the entity-selection
# arithmetic: groups = customers with k%17=0 (payload '{}' → skipped when
# k%51=0, a strict subset), t2 keeps k%34≠0 and adds k%23=0∧k%17≠0;
# employees = suppliers with k%7=0 (no-content skip k%21=0 ⊂ k%7=0,
# unresolved-url_id skip k%9=0), t2 keeps k%14≠0. Close-then-insert means
# keys present both syncs get (t1→t2 closed) + (t2 open); keys fetched only
# at t1 keep their OPEN row (absence never closes — unlike the dims' C6).
# blob_wk proves the right payload version rides each validity row.

_JSON_STORAGE_ORACLE = """
WITH g AS (
    SELECT c_custkey AS k, c_name AS name FROM customer
    WHERE c_custkey % 17 = 0 AND c_custkey % 51 <> 0
), e AS (
    SELECT s_suppkey AS k FROM supplier
    WHERE s_suppkey % 7 = 0 AND s_suppkey % 9 <> 0 AND s_suppkey % 21 <> 0
)
SELECT 'group' AS entity_type, name AS group_name,
       CAST(NULL AS BIGINT) AS employee_id, 1 AS blob_wk,
       TIMESTAMP '2026-03-01 00:00:00' AS valid_from,
       CASE WHEN k % 34 <> 0 THEN TIMESTAMP '2026-03-08 00:00:00' END AS valid_to
FROM g
UNION ALL
SELECT 'group', name, NULL, 2, TIMESTAMP '2026-03-08 00:00:00', NULL
FROM g WHERE k % 34 <> 0
UNION ALL
SELECT 'group', c_name, NULL, 2, TIMESTAMP '2026-03-08 00:00:00', NULL
FROM customer WHERE c_custkey % 23 = 0 AND c_custkey % 17 <> 0
UNION ALL
SELECT 'employee', NULL, k, 1, TIMESTAMP '2026-03-01 00:00:00',
       CASE WHEN k % 14 <> 0 THEN TIMESTAMP '2026-03-08 00:00:00' END
FROM e
UNION ALL
SELECT 'employee', NULL, k, 2, TIMESTAMP '2026-03-08 00:00:00', NULL
FROM e WHERE k % 14 <> 0
"""


@register("json_storage_history", _JSON_STORAGE_ORACLE)
def q_json_storage_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """schedule_json_storage versioning (`iis_etl/logic.py:271-297`)
    through the REAL job wiring: run_etl twice (t1 then a changed t2
    seeded from t1's outputs) with group+employee schedule payloads, then
    return the final blob history. Pins every guard: group `not data`
    skip on '{}', group storage WITHOUT schedules/exams (asymmetric vs
    the shredder's quarantine), employee no-content skip, employee
    unresolved-url_id skip, close-then-insert across the re-sync, and
    absence-does-NOT-close."""
    import pyarrow.parquet as pq

    from .etl_job import run_etl

    customer = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).to_pylist()
    supplier = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey"]
    ).to_pylist()

    employees = [
        {
            "id": s["s_suppkey"],
            "firstName": f"F{s['s_suppkey']}",
            "lastName": f"L{s['s_suppkey']}",
            # k%9=0 employees are skipped from the dim (F2) → their
            # schedule entities can't resolve → blob skipped
            "urlId": None if s["s_suppkey"] % 9 == 0 else f"emp-{s['s_suppkey']}",
        }
        for s in supplier
    ]

    def schedules_payload(sync: int) -> list[tuple[str, str, str]]:
        out = []
        for c in customer:
            k = c["c_custkey"]
            if k % 17 == 0 and (sync == 1 or k % 34 != 0):
                body = "{}" if k % 51 == 0 else f'{{"wk": {sync}}}'
                out.append((c["c_name"], "group", body))
            if sync == 2 and k % 23 == 0 and k % 17 != 0:
                out.append((c["c_name"], "group", '{"wk": 2}'))
        for s in supplier:
            k = s["s_suppkey"]
            if k % 7 == 0 and (sync == 1 or k % 14 != 0):
                body = (
                    f'{{"wk": {sync}}}'  # no schedules/exams → employee skip
                    if k % 21 == 0
                    else f'{{"wk": {sync}, "schedules": {{"Понедельник": []}}}}'
                )
                out.append((f"emp-{k}", "employee", body))
        return out

    api1 = {"employees": employees, "schedules": schedules_payload(1)}
    out1 = run_etl(spark, api1, now_ts="2026-03-01 00:00:00")
    seed = {
        k: out1[k]
        for k in ("employees", "departments_employees", "schedule_json_storage")
    }
    api2 = {"employees": employees, "schedules": schedules_payload(2)}
    out2 = run_etl(spark, api2, now_ts="2026-03-08 00:00:00", initial=seed)
    return out2["schedule_json_storage"].select(
        "entity_type",
        "group_name",
        "employee_id",
        F.get_json_object("data", "$.wk").cast("int").alias("blob_wk"),
        "valid_from",
        "valid_to",
    )


# ---------------------------------------------------------------------------
# X7 — asymmetric time parsing (lesson drops, exam defaults)
# ---------------------------------------------------------------------------
# time strings synthesized from events: valid 'H:MM' for most rows, garbage
# for event_id % 7 = 0, out-of-range hour for % 11 = 0.

_TIME_STR_SQL = """CASE WHEN event_id % 7 = 0 THEN 'xx:yy'
         WHEN event_id % 11 = 0 THEN '25:61'
         ELSE concat(CAST(event_id % 24 AS VARCHAR), ':',
                     lpad(CAST(event_id % 60 AS VARCHAR), 2, '0')) END"""

# TRY_CAST, not CAST: DuckDB evaluates vectorized expressions across a
# whole chunk before the regexp guard can short-circuit, so a plain CAST
# still sees the non-numeric strings (surfaced only at sf0.1 chunk sizes)
_PARSE_SQL = """CASE WHEN regexp_matches(t, '^\\s*\\d{1,2}:\\d{2}\\s*$')
          AND TRY_CAST(split_part(trim(t), ':', 1) AS INT) < 24
          AND TRY_CAST(split_part(trim(t), ':', 2) AS INT) < 60
     THEN TRY_CAST(split_part(trim(t), ':', 1) AS INT) * 3600
          + TRY_CAST(split_part(trim(t), ':', 2) AS INT) * 60 END"""

# (the standalone time-parse oracle merged into _SCALAR_KIT_ORACLE's
# method='time_parse' branch — one registry slot adjudicates both)

# the end-to-end shred oracle computes the EXPECTED output relation
# directly from the same fixture arithmetic (no JSON in DuckDB — the
# JSON round-trip is the Spark side under test; the oracle independently
# derives what the shredder must produce)
_SHRED_E2E_ORACLE = """
WITH base AS (
    SELECT event_id, concat('G', CAST(user_id AS VARCHAR)) AS entity_name,
           CAST(event_id % 24 AS INT) * 3600 + CAST(event_id % 60 AS INT) * 60 AS s_secs,
           CAST((event_id + 1) % 24 AS INT) * 3600 + CAST(event_id % 60 AS INT) * 60 AS e_secs,
           CASE WHEN event_id % 5 = 0 THEN NULL
                ELSE concat('Subj', CAST(event_id % 7 AS VARCHAR)) END AS subj,
           CAST(event_id % 50 AS VARCHAR) AS aud_id_str
    FROM events
), lessons AS (
    SELECT entity_name,
           coalesce(subj, 'Без названия') AS subject,
           CAST(event_id % 4 + 1 AS INT) AS day_of_week,
           CAST(s_secs AS INT) AS start_time,
           CAST(e_secs AS INT) AS end_time,
           CASE WHEN event_id % 4 IN (0, 1) THEN '1|2|3|4' ELSE '1|1' END AS week_numbers,
           aud_id_str AS auditories,
           CAST(NULL AS DATE) AS exact_date,
           concat(coalesce(subj, 'Без названия'), ' ',
                  coalesce(subj, 'Без названия'), ' ',
                  entity_name, ' ', aud_id_str) AS search_text
    FROM base
    WHERE event_id % 3 = 0        -- lesson-shaped docs
      AND event_id % 4 <> 3       -- X1: unknown day name dropped
      AND event_id % 7 <> 0       -- X7 lesson: invalid start drops the row
      AND event_id % 11 <> 0      -- X7 lesson: invalid END drops it too
), exams AS (
    SELECT entity_name,
           coalesce(subj, 'Экзамен') AS subject,
           CAST(NULL AS INT) AS day_of_week,
           CAST(CASE WHEN event_id % 7 = 0 OR event_id % 11 = 0
                     THEN 0 ELSE s_secs END AS INT) AS start_time,
           CAST(CASE WHEN event_id % 7 = 0 OR event_id % 11 = 0
                     THEN 0 ELSE e_secs END AS INT) AS end_time,
           '' AS week_numbers,
           concat('Room-', aud_id_str) AS auditories,
           make_date(2026, CAST(event_id % 12 + 1 AS INT),
                     CAST(event_id % 28 + 1 AS INT)) AS exact_date,
           concat(coalesce(subj, 'Экзамен'), ' ', coalesce(subj, 'Экзамен'),
                  ' ', entity_name, ' ', concat('Room-', aud_id_str)) AS search_text
    FROM base
    WHERE event_id % 3 <> 0       -- exam-shaped docs
      AND event_id % 13 <> 0      -- X8: unparseable exam date dropped
)
SELECT * FROM lessons UNION ALL SELECT * FROM exams
"""


def _time_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_fixture(spark, sf_dir, "events")
    t = (
        F.when(F.col("event_id") % 7 == 0, F.lit("xx:yy"))
        .when(F.col("event_id") % 11 == 0, F.lit("25:61"))
        .otherwise(
            F.concat(
                (F.col("event_id") % 24).cast("string"),
                F.lit(":"),
                F.lpad((F.col("event_id") % 60).cast("string"), 2, "0"),
            )
        )
    )
    return events.select("event_id", t.alias("t"))


def q_time_parse_lesson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 lesson branch: invalid time → row dropped
    (`iis_etl/logic.py:331-333`). Driver-adjudicated as the
    method='time_parse' rows of `day_case_and_truncate` (merged to free
    a registry slot; this helper keeps the operator individually
    callable and pytest/plan-addressable)."""
    from ..functions.timeparse import hhmm_to_seconds

    src = _time_strings(spark, sf_dir)
    return (
        src.select("event_id", hhmm_to_seconds(F.col("t")).alias("start_time"))
        .filter(F.col("start_time").isNotNull())
    )


@register("shred_end_to_end", _SHRED_E2E_ORACLE)
def q_shred_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 end-to-end: JSON documents → parse → shred → flat events, the
    reference's transform core (`iis_etl/logic.py:271-404`) driven as ONE
    driver-adjudicated plan. Synthesizes real schedule-JSON payloads from
    the events fixture (to_json), round-trips them through
    ``parse_schedule_json`` + ``shred_schedule_docs``, and emits scalar
    columns. Covers in one query: X1 (unknown day key dropped), X2/X3
    lesson+exam explode ∪ union (U3), X4 week defaults, X5 auditory id
    fallback, X7 BOTH asymmetric time branches (lesson drops; exam
    pairwise-zeroes — a bad END time zeroes the valid start too), X8
    bad exam date dropped, X9 ''-as-missing subject defaults
    ('Без названия' / 'Экзамен'), X10 persisted search text."""
    from ..operators.shred import parse_schedule_json, shred_schedule_docs

    ev = read_fixture(spark, sf_dir, "events").select("event_id", "user_id")
    day_name = F.element_at(
        F.array(
            F.lit("Понедельник"), F.lit("Вторник"), F.lit("Среда"), F.lit("НеДень")
        ),
        (F.col("event_id") % 4 + 1).cast("int"),
    )
    t_start = (
        F.when(F.col("event_id") % 7 == 0, F.lit("xx:yy"))
        .otherwise(
            F.concat(
                (F.col("event_id") % 24).cast("string"),
                F.lit(":"),
                F.lpad((F.col("event_id") % 60).cast("string"), 2, "0"),
            )
        )
    )
    t_end = (
        F.when(F.col("event_id") % 11 == 0, F.lit("99:99"))
        .otherwise(
            F.concat(
                ((F.col("event_id") + 1) % 24).cast("string"),
                F.lit(":"),
                F.lpad((F.col("event_id") % 60).cast("string"), 2, "0"),
            )
        )
    )
    subject = F.when(F.col("event_id") % 5 == 0, F.lit("")).otherwise(
        F.concat(F.lit("Subj"), (F.col("event_id") % 7).cast("string"))
    )
    weeks = (
        F.when(F.col("event_id") % 4 == 0, F.array().cast("array<int>"))
        .when(F.col("event_id") % 4 == 1, F.array(F.lit(0)))
        .otherwise(F.array(F.lit(1), (F.col("event_id") % 3 + 1).cast("int")))
    )
    auds = F.array(
        F.struct(
            (F.col("event_id") % 50).cast("long").alias("id"),
            F.when(F.col("event_id") % 3 == 0, F.lit(None).cast("string"))
            .otherwise(
                F.concat(F.lit("Room-"), (F.col("event_id") % 50).cast("string"))
            )
            .alias("name"),
        )
    )
    date_str = F.when(F.col("event_id") % 13 == 0, F.lit("not-a-date")).otherwise(
        F.concat(
            F.lpad((F.col("event_id") % 28 + 1).cast("string"), 2, "0"),
            F.lit("."),
            F.lpad((F.col("event_id") % 12 + 1).cast("string"), 2, "0"),
            F.lit(".2026"),
        )
    )
    lesson_struct = F.struct(
        subject.alias("subject"),
        t_start.alias("startLessonTime"),
        t_end.alias("endLessonTime"),
        weeks.alias("weekNumber"),
        auds.alias("auditories"),
        date_str.alias("dateLesson"),
    )
    # lesson docs for event_id % 3 == 0, exam docs otherwise — the raw
    # payload is REAL JSON text, exercising the permissive parse path
    payload = F.when(
        F.col("event_id") % 3 == 0,
        F.to_json(
            F.struct(
                F.create_map(day_name, F.array(lesson_struct)).alias("schedules")
            )
        ),
    ).otherwise(F.to_json(F.struct(F.array(lesson_struct).alias("exams"))))
    raw = ev.select(
        F.concat(F.lit("G"), F.col("user_id").cast("string")).alias("entity_name"),
        F.lit("group").alias("entity_type"),
        payload.alias("payload"),
    )
    docs, _quarantine = parse_schedule_json(raw)
    out = shred_schedule_docs(docs)
    return out.select(
        "entity_name",
        "subject",
        "day_of_week",
        "start_time",
        "end_time",
        F.array_join(F.col("week_numbers").cast("array<string>"), "|").alias(
            "week_numbers"
        ),
        F.array_join("auditories", "|").alias("auditories"),
        "exact_date",
        "search_text",
    )


# ---------------------------------------------------------------------------
# X5 — heterogeneous auditory entries → names
# ---------------------------------------------------------------------------

_AUD_NAMES_ORACLE = """
WITH docs AS (
    SELECT l_orderkey,
           array_agg(struct_pack(
               id := l_suppkey,
               name := CASE WHEN l_linenumber % 3 = 0 THEN NULL
                            ELSE concat('Room-', CAST(l_suppkey AS VARCHAR)) END
           ) ORDER BY l_linenumber, l_suppkey) AS auds
    FROM lineitem GROUP BY 1
)
SELECT l_orderkey,
       array_to_string(list_sort(list_distinct(list_filter(
           list_transform(auds, a -> COALESCE(nullif(a.name, ''), CAST(a.id AS VARCHAR))),
           x -> x IS NOT NULL AND x <> ''))), '|') AS aud_names
FROM docs
"""


@register("heterogeneous_aud_names", _AUD_NAMES_ORACLE)
def q_heterogeneous_aud_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: dict/str/int auditory entries → names with str(id) fallback
    (`iis_etl/logic.py:23-34`)."""
    from ..functions.normalize import auditory_names

    li = read_fixture(spark, sf_dir, "lineitem")
    docs = (
        li.select(
            "l_orderkey",
            F.struct(
                F.col("l_suppkey").alias("id"),
                F.when(
                    F.col("l_linenumber") % 3 == 0, F.lit(None).cast("string")
                )
                .otherwise(
                    F.concat(F.lit("Room-"), F.col("l_suppkey").cast("string"))
                )
                .alias("name"),
            ).alias("aud"),
        )
        .groupBy("l_orderkey")
        .agg(F.collect_list("aud").alias("auds"))
    )
    return docs.select(
        "l_orderkey",
        F.array_join(
            F.array_sort(F.array_distinct(auditory_names(F.col("auds")))), "|"
        ).alias("aud_names"),
    )


# ---------------------------------------------------------------------------
# §2.9 — day-name CASE both ways + truncation
# ---------------------------------------------------------------------------

_SCALAR_KIT_ORACLE = f"""
WITH src AS (
    SELECT o_orderkey,
           CAST(datediff('day', DATE '1970-01-05', CAST(o_orderdate AS DATE)) % 7 + 1 AS INT) AS day_of_week,
           o_orderpriority
    FROM orders
), tsrc AS (SELECT event_id, {_TIME_STR_SQL} AS t FROM events)
SELECT 'day_case' AS method, o_orderkey AS id,
       {_DAY_CASE_SQL} AS day_name,
       CASE {_DAY_CASE_SQL}
            WHEN 'Понедельник' THEN 1 WHEN 'Вторник' THEN 2 WHEN 'Среда' THEN 3
            WHEN 'Четверг' THEN 4 WHEN 'Пятница' THEN 5 WHEN 'Суббота' THEN 6
            WHEN 'Воскресенье' THEN 7 END AS day_roundtrip,
       substr(o_orderpriority, 1, 3) AS prio_short,
       CAST(NULL AS INT) AS start_time
FROM src
UNION ALL
SELECT 'time_parse', event_id, NULL, NULL, NULL, secs FROM (
    SELECT event_id, {_PARSE_SQL} AS secs FROM tsrc
) WHERE secs IS NOT NULL
"""


@register("day_case_and_truncate", _SCALAR_KIT_ORACLE)
def q_day_case_and_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 scalar kit, method-tagged (merged so both adjudicate in one
    registry slot):

    - 'day_case' rows: int↔Russian day name CASE
      (`iis_etl/logic.py:324-327,454-457`) + `str(x)[:n]` truncation
      (`iis_etl/logic.py:91,259`).
    - 'time_parse' rows: X7 lesson-branch HH:mm parse, invalid time →
      row dropped (`iis_etl/logic.py:331-333`) — `q_time_parse_lesson`.
    """
    from ..functions.normalize import day_int_expr, day_name_expr, truncate
    from .fixtures import day_of_week_expr

    orders = read_fixture(spark, sf_dir, "orders")
    src = orders.select(
        "o_orderkey",
        day_of_week_expr(F.col("o_orderdate")).alias("day_of_week"),
        "o_orderpriority",
    )
    day_case = src.select(
        F.lit("day_case").alias("method"),
        F.col("o_orderkey").alias("id"),
        day_name_expr(F.col("day_of_week")).alias("day_name"),
        day_int_expr(day_name_expr(F.col("day_of_week"))).alias("day_roundtrip"),
        truncate(F.col("o_orderpriority"), 3).alias("prio_short"),
        F.lit(None).cast("int").alias("start_time"),
    )
    time_parse = q_time_parse_lesson(spark, sf_dir).select(
        F.lit("time_parse").alias("method"),
        F.col("event_id").alias("id"),
        F.lit(None).cast("string").alias("day_name"),
        F.lit(None).cast("int").alias("day_roundtrip"),
        F.lit(None).cast("string").alias("prio_short"),
        F.col("start_time").cast("int").alias("start_time"),
    )
    return day_case.unionByName(time_parse)


# ---------------------------------------------------------------------------
# §2.9/X10 — search tokenizer (TSVECTOR replacement)
# ---------------------------------------------------------------------------

# The English (ASCII classes, documents table) and Cyrillic (unicode
# \\p{L}/\\p{N} classes + unicode lower, synthesized Russian schedule
# text) tokenizer paths are merged under one `lang` discriminator — one
# driver row adjudicates both, freeing a slot in the 50-query window.
# Java and RE2 agree on \\p{L}; both engines lowercase Cyrillic correctly.

_RU_SRC_SQL = """
    SELECT o_orderkey,
           concat_ws(' ',
               {day_case},
               'Аудитория', CAST(o_orderkey % 500 AS VARCHAR),
               'корпус-А', o_orderpriority,
               'Занятие по Расписанию') AS text
    FROM orders
""".format(
    day_case=_DAY_CASE_SQL.replace(
        "day_of_week",
        "CAST(datediff('day', DATE '1970-01-05', CAST(o_orderdate AS DATE)) % 7 + 1 AS INT)",
    )
)

def _tokenize_oracle() -> str:
    from ..functions.text import RU_STEM_CHAIN

    stem_expr = "regexp_replace(t, 'ё', 'е', 'g')"
    for pattern, two_groups in RU_STEM_CHAIN:
        repl = r"\1\2" if two_groups else r"\1"
        stem_expr = f"regexp_replace({stem_expr}, '{pattern}', '{repl}')"

    return f"""
WITH src AS ({_RU_SRC_SQL})
SELECT 'en' AS lang, doc_id AS id,
       array_to_string(list_sort(list_distinct(list_filter(
           regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''
       ))), '|') AS tokens
FROM documents
UNION ALL
SELECT 'ru', o_orderkey,
       array_to_string(list_sort(list_distinct(list_filter(
           regexp_split_to_array(lower(text), '[^\\p{{L}}\\p{{N}}]+'),
           x -> x <> ''
       ))), '|')
FROM src
UNION ALL
SELECT 'ru_stem', o_orderkey,
       array_to_string(list_sort(list_distinct(list_transform(
           list_filter(
               regexp_split_to_array(lower(text), '[^\\p{{L}}\\p{{N}}]+'),
               x -> x <> ''
           ),
           t -> {stem_expr}
       ))), '|')
FROM src
"""


def _ru_search_src(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.normalize import day_name_expr
    from .fixtures import day_of_week_expr

    orders = read_fixture(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.concat_ws(
            " ",
            day_name_expr(day_of_week_expr(F.col("o_orderdate"))),
            F.lit("Аудитория"),
            (F.col("o_orderkey") % 500).cast("string"),
            F.lit("корпус-А"),
            F.col("o_orderpriority"),
            F.lit("Занятие по Расписанию"),
        ).alias("text"),
    )


@register("search_tokenize", _tokenize_oracle())
def q_search_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9: tokenizer replacing to_tsvector (`iis_etl/logic.py:394-404`):
    lowercase → split non-word → dedup → sort ('|'-joined for the driver
    hash; tokens contain no '|'). `lang` rows: 'en' = ASCII classes over
    documents; 'ru' = the unicode-aware path over Russian schedule text
    (the reference's actual corpus, raw tokens); 'ru_stem' = the same
    text through the Russian light stemmer (ordered longest-first suffix
    strip, ≥3-char stem guard, ё→е) applied per-token after unicode
    tokenization — the tsvector-like lexeme set for inflection-
    insensitive matching, closing the one semantic deviation from the
    reference's to_tsvector('russian', ...) dictionary stemming. The
    oracle applies the IDENTICAL suffix-strip regex (engine-portable by
    construction — see functions/text.RU_STEM_PATTERN) inside DuckDB, so
    lexeme collapse is hash-adjudicated end-to-end; linguistic adequacy
    (inflection pairs collapsing to one stem) is pinned in
    tests/test_text.py. All three paths are pure JVM-side regex inside
    higher-order transforms: no UDF, zero shuffles, a narrow map at
    100 TB."""
    from ..functions.text import tokenize, tokenize_stemmed

    docs = read_fixture(spark, sf_dir, "documents")
    en = docs.select(
        F.lit("en").alias("lang"),
        F.col("doc_id").alias("id"),
        F.array_join(tokenize("text", ascii_only=True), "|").alias("tokens"),
    )
    ru_src = _ru_search_src(spark, sf_dir)
    ru = ru_src.select(
        F.lit("ru").alias("lang"),
        F.col("o_orderkey").alias("id"),
        F.array_join(tokenize("text", ascii_only=False), "|").alias("tokens"),
    )
    ru_stem = ru_src.select(
        F.lit("ru_stem").alias("lang"),
        F.col("o_orderkey").alias("id"),
        F.array_join(tokenize_stemmed("text"), "|").alias("tokens"),
    )
    return en.unionByName(ru).unionByName(ru_stem)


# ---------------------------------------------------------------------------
# X6 — fio assembly ("Last First", trimmed, empties dropped)
# ---------------------------------------------------------------------------

_FIO_ORACLE = """
WITH docs AS (
    SELECT l_orderkey AS o_orderkey,
           array_agg(struct_pack(
               firstName := CASE WHEN l_linenumber % 4 = 0 THEN NULL
                                 ELSE concat('F', CAST(l_suppkey AS VARCHAR)) END,
               lastName := CASE WHEN l_linenumber % 5 = 0 THEN ''
                                ELSE concat('L', CAST(l_partkey AS VARCHAR)) END
           ) ORDER BY l_linenumber, l_suppkey, l_partkey) AS emps
    FROM lineitem GROUP BY 1
)
SELECT o_orderkey,
       array_to_string(list_sort(list_distinct(list_filter(
           list_transform(emps, e -> trim(concat_ws(' ',
               coalesce(e.lastName, ''), coalesce(e.firstName, '')))),
           x -> x <> ''))), '|') AS names
FROM docs
"""


@register("fio_assembly", _FIO_ORACLE)
def q_fio_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: '"Last First"' from struct arrays, trimmed, empties dropped
    (`iis_etl/logic.py:36-50,341`)."""
    from ..functions.normalize import fio

    li = read_fixture(spark, sf_dir, "lineitem")
    docs = (
        li.select(
            "l_orderkey",
            F.struct(
                F.when(
                    F.col("l_linenumber") % 4 == 0, F.lit(None).cast("string")
                )
                .otherwise(F.concat(F.lit("F"), F.col("l_suppkey").cast("string")))
                .alias("firstName"),
                F.when(F.col("l_linenumber") % 5 == 0, F.lit(""))
                .otherwise(F.concat(F.lit("L"), F.col("l_partkey").cast("string")))
                .alias("lastName"),
            ).alias("emp"),
        )
        .groupBy("l_orderkey")
        .agg(F.collect_list("emp").alias("emps"))
    )
    return docs.select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.array_join(
            F.array_sort(F.array_distinct(fio(F.col("emps")))), "|"
        ).alias("names"),
    )


# ---------------------------------------------------------------------------
# engine breadth: multi-aggregate summary (TPC-H Q1 shape) — the canonical
# "does partial aggregation + pushdown work" probe for the 100 TB plan
# ---------------------------------------------------------------------------

_PRICING_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-09-01'
GROUP BY 1, 2
"""


@register("agg_pricing_summary", _PRICING_ORACLE)
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide aggregation with a pushed-down scan filter (Q1 shape)."""
    li = read_fixture(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# engine breadth: top-k per group (window rank)
# ---------------------------------------------------------------------------

_TOPK_GROUP_ORACLE = """
SELECT c_custkey, o_orderkey, rnk FROM (
    SELECT o_custkey AS c_custkey, o_orderkey,
           CAST(row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rnk
    FROM orders
) WHERE rnk <= 3
"""


@register("topk_orders_per_customer", _TOPK_GROUP_ORACLE)
def q_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (window rank, deterministic
    tie-break)."""
    from pyspark.sql.window import Window

    orders = read_fixture(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey", "rnk")
    )


# ---------------------------------------------------------------------------
# engine breadth: rollup / pivot / set ops (beyond the reference surface —
# completeness of the relational algebra a warehouse engine needs)
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT coalesce(r_name, '<all>') AS region,
       coalesce(n_name, '<all>') AS nation,
       round(sum(c_acctbal), 2) + 0 AS total_bal,
       count(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


@register("rollup_customer_balance", _ROLLUP_ORACLE)
def q_rollup_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (region → nation → grand total) with NULL
    grouping markers normalized to '<all>' on both engines."""
    c = read_fixture(spark, sf_dir, "customer")
    n = read_fixture(spark, sf_dir, "nation")
    r = read_fixture(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]
    ).join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            # + 0 normalizes IEEE -0.0 (a negative-balance group summing to
            # ~0 rounds to -0.0 in one engine and +0.0 in the other)
            (F.round(F.sum("c_acctbal"), 2) + F.lit(0.0)).alias("total_bal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("<all>")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("<all>")).alias("nation"),
            "total_bal",
            "n_customers",
        )
    )


_PIVOT_ORACLE = """
SELECT user_id,
       round(coalesce(sum(value) FILTER (event_type = 'click'), 0), 2) AS click,
       round(coalesce(sum(value) FILTER (event_type = 'view'), 0), 2) AS view,
       round(coalesce(sum(value) FILTER (event_type = 'purchase'), 0), 2) AS purchase,
       round(coalesce(sum(value) FILTER (event_type = 'signup'), 0), 2) AS signup,
       round(coalesce(sum(value) FILTER (event_type = 'error'), 0), 2) AS error
FROM events
GROUP BY user_id
"""


@register("pivot_event_values", _PIVOT_ORACLE)
def q_pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type into value columns (explicit value list keeps the
    plan single-pass — no distinct-scan before the pivot)."""
    events = read_fixture(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    out = (
        events.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 2))
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(k), F.lit(0.0)).alias(k) for k in kinds],
    )


_SETOPS_ORACLE = """
SELECT c_custkey, 'both' AS bucket FROM (
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
)
UNION ALL
SELECT c_custkey, 'f_only' FROM (
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
)
"""


@register("set_ops_order_status", _SETOPS_ORACLE)
def q_set_ops_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT over customer key sets."""
    orders = read_fixture(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    o = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    # intersect/subtract are SET-semantics (like SQL INTERSECT/EXCEPT);
    # exceptAll would be bag-semantics and leave residue for keys with
    # more F-orders than O-orders
    both = f.intersect(o).withColumn("bucket", F.lit("both"))
    f_only = f.subtract(o).withColumn("bucket", F.lit("f_only"))
    return both.unionByName(f_only)


# ---------------------------------------------------------------------------
# engine breadth: window frame functions / cube / grouping sets
# ---------------------------------------------------------------------------

_WINDOW_LAG_ORACLE = """
SELECT o_custkey, o_orderkey,
       round(lag(o_totalprice) OVER w, 2) AS prev_price,
       round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("window_lag_running_total", _WINDOW_LAG_ORACLE)
def q_window_lag_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag + cumulative-sum window frames per customer order history
    (deterministic (date, key) sort — running float sums are
    order-sensitive, so the frame order must be total)."""
    from pyspark.sql.window import Window

    orders = read_fixture(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.sum("o_totalprice").over(run), 2).alias("running_total"),
    )


# CUBE and explicit GROUPING SETS adjudicated under ONE op-tagged query
# (the driver checks at most 50 registered queries). Round 6 folds two
# more operator families into the same slot: PageRank (8 fixed
# power-iteration rounds, unrolled as CTEs below, ranks quantized to
# micro-units — summation-order float drift is ~1e-13 absolute vs a 5e-7
# quantization half-step, so the hash compare is stable) and the bloom
# pre-join runtime filter (adjudicated END-TO-END: bloom-filter → real
# join must equal the plain join — a single false negative changes the
# grouped counts and fails the hash).


def _pagerank_unrolled_ctes(n_iters: int, damping: str = "0.85") -> str:
    """DuckDB CTE chain r1..r{n} replaying operators.graph.pagerank's
    recurrence exactly: rank = (1-d)/N + d*(Σ in-contribs + dangling/N),
    dangling = rank mass on nodes with no out-edges. All arithmetic
    forced to DOUBLE so both engines execute identical IEEE ops."""
    blocks = []
    prev = "r0"
    for k in range(1, n_iters + 1):
        cur = f"r{k}"
        blocks.append(f"""
{cur} AS MATERIALIZED (
    SELECT n.node,
           (CAST(1 AS DOUBLE) - CAST({damping} AS DOUBLE)) / (SELECT n FROM nn)
           + CAST({damping} AS DOUBLE) * (
                coalesce(c.contrib, CAST(0 AS DOUBLE))
                + (SELECT coalesce(sum(r.rank), CAST(0 AS DOUBLE))
                   FROM {prev} r LEFT JOIN deg d ON r.node = d.node
                   WHERE d.node IS NULL) / (SELECT n FROM nn)
             ) AS rank
    FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, sum(r.rank / d.deg) AS contrib
        FROM e JOIN {prev} r ON e.src = r.node JOIN deg d ON e.src = d.node
        GROUP BY e.dst
    ) c ON n.node = c.node
)""")
        prev = cur
    return ",".join(blocks)


_PAGERANK_ITERS = 8

_GROUPING_ANALYTICS_ORACLE = f"""
WITH e AS MATERIALIZED (
    SELECT DISTINCT o_custkey AS src, 10000000 + (o_orderkey % 97) AS dst
    FROM orders
    WHERE o_custkey IS NOT NULL AND o_orderkey IS NOT NULL
), nodes AS MATERIALIZED (
    SELECT src AS node FROM e UNION SELECT dst FROM e
), nn AS MATERIALIZED (
    SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
), deg AS MATERIALIZED (
    SELECT src AS node, count(*) AS deg FROM e GROUP BY 1
), r0 AS MATERIALIZED (
    SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM nodes
),{_pagerank_unrolled_ctes(_PAGERANK_ITERS)}
SELECT 'cube' AS op,
       coalesce(o_orderstatus, '<all>') AS status,
       coalesce(o_orderpriority, '<all>') AS dim2,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
UNION ALL
SELECT 'grouping_sets',
       coalesce(o_orderstatus, '<all>'),
       coalesce(strftime(o_orderdate, '%Y'), '<all>'),
       count(*),
       CAST(NULL AS DOUBLE)
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (strftime(o_orderdate, '%Y')))
UNION ALL
SELECT 'pagerank', CAST(node AS VARCHAR), '<hub97>',
       CAST(round(rank * 1000000) AS BIGINT), CAST(NULL AS DOUBLE)
FROM r{_PAGERANK_ITERS}
UNION ALL
SELECT 'bloom_join', CAST(o_custkey AS VARCHAR), '<all>',
       count(*), round(sum(o_totalprice), 2)
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_nationkey < 3
GROUP BY o_custkey
"""


@register("grouping_analytics", _GROUPING_ANALYTICS_ORACLE)
def q_grouping_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional grouping surface, `op`-tagged:

    - 'cube' rows (dim2 = priority): CUBE over (status, priority) — all
      4 grouping combinations in one pass (Spark expands to an internal
      grouping-id union, one shuffle).
    - 'grouping_sets' rows (dim2 = order year): explicit GROUPING SETS
      (per-status totals ∪ per-year totals in ONE shuffle — the
      hand-rolled alternative is two aggregations plus a union that
      re-scans the input). Native DataFrame groupingSets (Spark 4), no
      temp-view state.
    - 'pagerank' rows (status = node id, n_orders = rank in integer
      micro-units): `operators.graph.pagerank` over the customer→order-
      bucket bipartite graph (dst = 10M + o_orderkey % 97), EXACTLY 8
      power-iteration rounds (tol=0 → no early stop) — adjudicated
      against an unrolled 8-CTE recurrence in the oracle, including the
      dangling-mass redistribution (all 97 hub nodes are sinks).
    - 'bloom_join' rows: the explicit bloom pre-join runtime filter's
      superset guarantee END-TO-END — orders pre-filtered through a
      bloom built on nation<3 customers, then really joined and grouped;
      equals the oracle's plain join, so ONE false negative (a dropped
      matching order) fails the hash. False positives are invisible by
      construction (the real join removes them) — exactly the
      composition contract the operator documents.
    """
    orders = read_fixture(spark, sf_dir, "orders")
    combined = cube_and_grouping_sets(spark, sf_dir)

    from ..operators.graph import pagerank
    from ..operators.joins import bloom_semi_filter, build_bloom

    edges = orders.filter(
        F.col("o_custkey").isNotNull() & F.col("o_orderkey").isNotNull()
    ).select(
        F.col("o_custkey").alias("src"),
        (F.col("o_orderkey") % 97 + F.lit(10_000_000)).alias("dst"),
    )
    pr = pagerank(edges, max_iter=_PAGERANK_ITERS, tol=0.0).select(
        F.lit("pagerank").alias("op"),
        F.col("node").cast("string").alias("status"),
        F.lit("<hub97>").alias("dim2"),
        F.round(F.col("rank") * 1e6).cast("long").alias("n_orders"),
        F.lit(None).cast("double").alias("total_price"),
    )

    customer = read_fixture(spark, sf_dir, "customer")
    build_keys = customer.filter(F.col("c_nationkey") < 3).select(
        F.col("c_custkey").alias("k")
    )
    bloom = build_bloom(build_keys, "k", num_bits=1 << 20, num_hashes=5)
    probe = orders.select(F.col("o_custkey").alias("k"), "o_totalprice")
    bj = (
        bloom_semi_filter(probe, bloom, "k")
        .join(build_keys, "k")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.lit("bloom_join").alias("op"),
            F.col("k").cast("string").alias("status"),
            F.lit("<all>").alias("dim2"),
            "n_orders",
            "total_price",
        )
    )
    return combined.unionByName(pr).unionByName(bj)


def cube_and_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cube + grouping-sets sub-plan of ``grouping_analytics`` —
    separate so tests/test_plan_quality.py can pin its shape (2 Expands,
    2 scans — one aggregation exchange per sub-plan, never one scan per
    grouping combination) without the pagerank/bloom union members'
    plans in the way."""
    orders = read_fixture(spark, sf_dir, "orders")
    cube = (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.lit("cube").alias("op"),
            F.coalesce(F.col("o_orderstatus"), F.lit("<all>")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("<all>")).alias("dim2"),
            "n_orders",
            "total_price",
        )
    )
    src = orders.select(
        "o_orderstatus",
        F.date_format("o_orderdate", "yyyy").alias("order_year"),
    )
    gsets = (
        src.groupingSets(
            [["o_orderstatus"], ["order_year"]], "o_orderstatus", "order_year"
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.lit("grouping_sets").alias("op"),
            F.coalesce(F.col("o_orderstatus"), F.lit("<all>")).alias("status"),
            F.coalesce(F.col("order_year"), F.lit("<all>")).alias("dim2"),
            "n_orders",
            F.lit(None).cast("double").alias("total_price"),
        )
    )
    return cube.unionByName(gsets)
