"""Property-based SCD2 invariants (hypothesis): for ANY sequence of
snapshots applied through scd2_apply, the dimension must satisfy the
type-2 laws the reference's loop guarantees implicitly
(`iis_etl/logic.py:125-171`):

1. at most ONE current (valid_to IS NULL) version per natural key
2. versions of a key never overlap and close exactly at the next open
3. a key present in the latest snapshot is current with exactly its
   snapshot attribute values; an absent key has no current version
4. type-1 updates never open versions; type-2 changes always do
5. replaying the same snapshot is a no-op (idempotence)

One JVM round-trip per generated scenario keeps the suite fast: the
snapshots are tiny (hypothesis explores structure, not volume).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from uma_etl_iis_loader_spark.operators.scd2 import scd2_apply

KEYS = [1, 2, 3]
NAMES = ["a", "b", None]
BALS = [0, 1]

# a snapshot: subset of keys, each with (name: type-2, bal: type-1)
snapshot = st.dictionaries(
    st.sampled_from(KEYS),
    st.tuples(st.sampled_from(NAMES), st.sampled_from(BALS)),
    max_size=3,
)


def _apply(spark, dim, snap, now):
    inc = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in snap.items()],
        "id long, name string, bal int",
    )
    return scd2_apply(
        dim,
        inc,
        natural_key="id",
        type2_cols=["name"],
        type1_cols=["bal"],
        now_ts=now,
        surrogate_col=None,
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(snaps=st.lists(snapshot, min_size=1, max_size=3))
def test_scd2_invariants_hold_for_any_snapshot_sequence(spark, snaps):
    dim = spark.createDataFrame(
        [], "id long, name string, bal int, valid_from timestamp, valid_to timestamp"
    )
    times = [f"2026-01-0{i + 1} 00:00:00" for i in range(len(snaps))]
    for snap, now in zip(snaps, times):
        dim = _apply(spark, dim, snap, now)
    rows = dim.collect()

    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.id, []).append(r)

    last = snaps[-1]
    for k, versions in by_key.items():
        current = [r for r in versions if r.valid_to is None]
        # (1) at most one current version
        assert len(current) <= 1, (k, versions)
        # (2) no overlaps: sorted closed intervals chain, current is last
        closed = sorted(
            (r for r in versions if r.valid_to is not None),
            key=lambda r: str(r.valid_from),
        )
        for r in closed:
            assert str(r.valid_from) <= str(r.valid_to), r
        for a, b in zip(closed, closed[1:]):
            assert str(a.valid_to) <= str(b.valid_from), (a, b)
        if current and closed:
            assert str(closed[-1].valid_to) <= str(current[0].valid_from)
        # (3) last snapshot ⇔ current version with its values
        if k in last:
            assert len(current) == 1, (k, versions)
            assert current[0].name == last[k][0]
            assert current[0].bal == last[k][1]
        else:
            assert not current, (k, versions)

    # (5) idempotence: replaying the final snapshot changes nothing
    replay = _apply(spark, dim, last, "2026-02-01 00:00:00").collect()
    canon = lambda rs: sorted(  # noqa: E731
        ((r.id, r.name, r.bal, str(r.valid_from), str(r.valid_to)) for r in rs),
        key=repr,  # rows may contain NULLs — not orderable vs str
    )
    assert canon(replay) == canon(rows)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    bal0=st.sampled_from(BALS),
    bal1=st.sampled_from(BALS),
    rename=st.booleans(),
)
def test_type1_never_opens_versions_type2_always_does(spark, bal0, bal1, rename):
    dim = spark.createDataFrame(
        [], "id long, name string, bal int, valid_from timestamp, valid_to timestamp"
    )
    dim = _apply(spark, dim, {1: ("a", bal0)}, "2026-01-01 00:00:00")
    name2 = "z" if rename else "a"
    dim = _apply(spark, dim, {1: (name2, bal1)}, "2026-01-02 00:00:00")
    rows = dim.collect()
    if rename:
        # (4) type-2: old closed at t2, new current opened at t2
        assert len(rows) == 2
        closed = next(r for r in rows if r.valid_to is not None)
        current = next(r for r in rows if r.valid_to is None)
        assert closed.name == "a" and current.name == "z"
        # the closed version keeps ITS OWN bal; only current gets type-1
        assert current.bal == bal1
    else:
        # type-1 only (or no change): still ONE version, original open ts
        assert len(rows) == 1
        assert rows[0].valid_to is None
        assert str(rows[0].valid_from).startswith("2026-01-01")
        assert rows[0].bal == bal1
