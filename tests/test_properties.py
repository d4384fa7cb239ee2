"""Property-based invariants (hypothesis) for the merge and normalization
kit — randomized inputs catch branch interactions example tests miss."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from uma_etl_iis_loader_spark.functions.normalize import py_or_int, py_or_str
from uma_etl_iis_loader_spark.operators.merge import merge_upsert

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

rows = st.lists(
    st.tuples(
        st.integers(0, 15),
        st.one_of(st.none(), st.text(alphabet="abc ", max_size=4)),
        st.one_of(st.none(), st.integers(-5, 5)),
    ),
    max_size=10,
    unique_by=lambda r: r[0],
)


@given(old=rows, new=rows)
@_slow
def test_merge_upsert_invariants(spark, old, new):
    schema = "id long, name string, v int"
    o = spark.createDataFrame(old, schema)
    n = spark.createDataFrame(new, schema)
    out = {r.id: (r.name, r.v) for r in merge_upsert(o, n, ["id"], ["name"]).collect()}

    old_m = {r[0]: (r[1], r[2]) for r in old}
    new_m = {r[0]: (r[1], r[2]) for r in new}
    # key set = union; matched rows take new name but keep old v;
    # unmatched-new insert wholesale; unmatched-old untouched
    assert set(out) == set(old_m) | set(new_m)
    for k, (name, v) in out.items():
        if k in old_m and k in new_m:
            assert (name, v) == (new_m[k][0], old_m[k][1])
        elif k in new_m:
            assert (name, v) == new_m[k]
        else:
            assert (name, v) == old_m[k]


@given(
    vals=st.lists(
        st.one_of(st.none(), st.text(alphabet="ab ", max_size=3)), min_size=1, max_size=8
    )
)
@_slow
def test_py_or_str_matches_python_or(spark, vals):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, s string")
    out = {
        r.i: r.out
        for r in df.select(
            "i", py_or_str(F.col("s"), F.lit("DFLT")).alias("out")
        ).collect()
    }
    for i, v in enumerate(vals):
        expected = v or "DFLT"
        assert out[i] == expected, (v, out[i])


@given(vals=st.lists(st.one_of(st.none(), st.integers(-3, 3)), min_size=1, max_size=8))
@_slow
def test_py_or_int_matches_python_or(spark, vals):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, n int")
    out = {
        r.i: r.out for r in df.select("i", py_or_int("n", 9).alias("out")).collect()
    }
    for i, v in enumerate(vals):
        assert out[i] == (v or 9)


def test_registry_fits_driver_adjudication_window():
    """The driver's correctness gate checks only the FIRST 50 registered
    queries — every query (and in particular every ORACLES-bearing one)
    must register inside that window, or it silently loses driver
    adjudication. Guard the invariant so a future addition can't evict
    an adjudicated query: consolidate into a method-tagged property
    query (the dedup_lsh_pairs / llm_prep_ops pattern) instead of
    growing past 50."""
    from uma_etl_iis_loader_spark.plans.registry import ORACLES, QUERIES

    names = list(QUERIES)
    assert len(names) <= 50, (
        f"registry holds {len(names)} queries; the driver adjudicates only "
        f"the first 50 — consolidate before registering more"
    )
    window = set(names[:50])
    outside = [n for n in ORACLES if n not in window]
    assert not outside, f"oracled queries outside the driver window: {outside}"
    # every registered query should also carry an oracle (rows-only checks
    # are the weaker gate; current registry is 100% oracled — keep it so)
    missing = [n for n in names if n not in ORACLES]
    assert not missing, f"queries with no DuckDB oracle: {missing}"
