"""profile_table: one-pass per-column data-quality stats."""

from pyspark.sql import functions as F

from uma_etl_iis_loader_spark.operators.profile import profile_table


def test_profile_exact(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 1.5, ["x"]),
            (2, None, 2.5, []),
            (3, "b", None, None),
            (4, "a", 4.0, ["y", "z"]),
        ],
        "id long, s string, v double, arr array<string>",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert set(prof) == {"id", "s", "v", "arr"}
    assert all(r["n_rows"] == 4 for r in prof.values())
    assert (prof["id"]["n_nulls"], prof["id"]["n_distinct"]) == (0, 4)
    assert (prof["id"]["min_value"], prof["id"]["max_value"]) == ("1", "4")
    assert (prof["s"]["n_nulls"], prof["s"]["n_distinct"]) == (1, 2)
    assert (prof["s"]["min_value"], prof["s"]["max_value"]) == ("a", "b")
    assert (prof["v"]["n_nulls"], prof["v"]["n_distinct"]) == (1, 3)
    # complex column: null/distinct profiled, min/max suppressed
    assert (prof["arr"]["n_nulls"], prof["arr"]["n_distinct"]) == (1, 3)
    assert prof["arr"]["min_value"] is None and prof["arr"]["max_value"] is None


def test_profile_single_aggregation_plan(spark):
    """The whole profile must be ONE aggregation over ONE scan — no
    per-column jobs, no unions of scans."""
    df = spark.range(100).select(
        "id", (F.col("id") % 7).alias("k"), F.concat(F.lit("v"), "id").alias("s")
    )
    plan = profile_table(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Range (0, 100") == 1  # single scan of the source
    assert "Union" not in plan


def test_profile_approx_mode(spark):
    df = spark.range(10_000).select("id", (F.col("id") % 97).alias("k"))
    prof = {r["column"]: r for r in profile_table(df, approx=True).collect()}
    # HLL++ default rsd ~2.3%: generous corridor, deterministic per input
    assert abs(prof["id"]["n_distinct"] - 10_000) <= 500
    assert abs(prof["k"]["n_distinct"] - 97) <= 5
    assert (prof["k"]["min_value"], prof["k"]["max_value"]) == ("0", "96")


def test_profile_dotted_and_duplicate_columns(spark):
    """Column names containing dots must profile (internal aliases are
    positional; source access is backtick-quoted), and duplicate requests
    must not collide."""
    df = spark.createDataFrame([(1, "a"), (2, None)], ["id", "meta.lang"])
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["meta.lang"]["n_nulls"] == 1
    assert prof["meta.lang"]["n_distinct"] == 1
    assert [r["column"] for r in profile_table(df, cols=["id", "id"]).collect()] == [
        "id",
        "id",
    ]
