from __future__ import annotations

from pyspark.sql import functions as F

from uma_etl_iis_loader_spark.operators.joins import (
    anti_missing,
    backfill_first_match,
    fk_repair_placeholders,
    normalized_lookup,
    semi_fk_filter,
)


def test_semi_fk_filter(spark):
    child = spark.createDataFrame([(1, 10), (2, 99)], "id long, fk long")
    dim = spark.createDataFrame([(10,)], "id long")
    out = semi_fk_filter(child, dim, "fk").collect()
    assert [(r.id, r.fk) for r in out] == [(1, 10)]


def test_anti_missing(spark):
    cur = spark.createDataFrame([(1,), (2,)], "id long")
    inc = spark.createDataFrame([(2,), (3,)], "id long")
    assert [r.id for r in anti_missing(cur, inc, "id").collect()] == [1]


def test_fk_repair_placeholders(spark):
    dim = spark.createDataFrame([(1, "F1")], "id long, name string")
    child = spark.createDataFrame([(1,), (7,), (None,)], "faculty_id long")
    out = fk_repair_placeholders(
        child,
        dim,
        "faculty_id",
        "id",
        {"name": F.concat(F.lit("Unknown Faculty "), F.col("id").cast("string"))},
    )
    assert {(r.id, r.name) for r in out.collect()} == {
        (1, "F1"),
        (7, "Unknown Faculty 7"),
    }


def test_normalized_lookup_name_or_abbr(spark):
    dim = spark.createDataFrame(
        [(1, "Computer Science", "CS"), (2, "Maths", "MA")],
        "id long, name string, abbr string",
    )
    facts = spark.createDataFrame(
        [("  computer science ",), ("ma",), ("nope",)], "dept string"
    )
    out = normalized_lookup(facts, dim, "dept", "id", ["name", "abbr"])
    got = {(r.dept.strip(), r.resolved_id) for r in out.collect()}
    assert got == {("computer science", 1), ("ma", 2), ("nope", None)}


def test_backfill_first_match_deterministic(spark):
    target = spark.createDataFrame([("G1",), ("G2",)], "name string")
    src = spark.createDataFrame(
        [("G1", 3, 30), ("G1", 1, 10), ("G1", 2, 20)],
        "name string, ord int, cnt int",
    )
    out = backfill_first_match(target, src, "name", "ord", "cnt", "students")
    got = {(r.name, r.students) for r in out.collect()}
    assert got == {("G1", 10), ("G2", None)}


def test_salted_join_matches_plain_join(spark):
    from uma_etl_iis_loader_spark.operators.joins import salted_join

    # hot key: 90% of left rows share key 1
    left = spark.createDataFrame(
        [(1 if i % 10 else 2, i) for i in range(1000)], "k long, v long"
    )
    right = spark.createDataFrame([(1, "hot"), (2, "cold")], "k long, name string")
    got = {(r.k, r.v, r.name) for r in salted_join(left, right, "k").collect()}
    want = {(r.k, r.v, r.name) for r in left.join(right, "k").collect()}
    assert got == want
    # salt actually spreads the hot key across buckets
    from pyspark.sql import functions as F

    salted = left.withColumn(
        "s", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(16))
    )
    assert salted.filter(F.col("k") == 1).select("s").distinct().count() > 8
