"""Property-based merge invariants (hypothesis): for ANY old/new key sets,
merge_upsert and insert_if_absent must satisfy the ON CONFLICT laws of the
reference (`iis_etl/logic.py:77-96, 246-249`):

- result keys = old ∪ new, exactly once each
- matched keys take new values ONLY for update_cols (others keep old)
- insert_if_absent never modifies an existing row
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from uma_etl_iis_loader_spark.operators.merge import insert_if_absent, merge_upsert

SCHEMA = "id long, a string, b string"

# key → (a, b); values may be NULL (incoming NULL overwrites on update_cols)
table = st.dictionaries(
    st.sampled_from([1, 2, 3, 4]),
    st.tuples(st.sampled_from(["x", "y", None]), st.sampled_from(["p", None])),
    max_size=4,
)


def _df(spark, d):
    return spark.createDataFrame([(k, v[0], v[1]) for k, v in d.items()], SCHEMA)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old=table, new=table)
def test_merge_upsert_on_conflict_laws(spark, old, new):
    out = {
        r.id: (r.a, r.b)
        for r in merge_upsert(
            _df(spark, old), _df(spark, new), ["id"], update_cols=["a"]
        ).collect()
    }
    assert set(out) == set(old) | set(new)
    for k, got in out.items():
        if k in old and k in new:
            assert got == (new[k][0], old[k][1])  # a updated, b kept
        elif k in old:
            assert got == old[k]
        else:
            assert got == new[k]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old=table, new=table)
def test_insert_if_absent_never_touches_existing(spark, old, new):
    out = {
        r.id: (r.a, r.b)
        for r in insert_if_absent(_df(spark, old), _df(spark, new), ["id"]).collect()
    }
    assert set(out) == set(old) | set(new)
    for k, got in out.items():
        assert got == (old[k] if k in old else new[k])
