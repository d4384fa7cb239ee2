"""Blob versioning for schedule_json_storage (`iis_etl/logic.py:271-297`):
close-then-insert with NO change detection, absence never closes, and the
per-entity-type skip guards."""

from __future__ import annotations

from pyspark.sql import functions as F

from uma_etl_iis_loader_spark.operators.json_storage import (
    schedule_blob_incoming,
    version_blobs,
)
from uma_etl_iis_loader_spark.schemas import EMPLOYEES, SCHEDULE_JSON_STORAGE

T1, T2 = "2026-03-01 00:00:00", "2026-03-08 00:00:00"


def _raw(spark, rows):
    return spark.createDataFrame(
        rows, "entity_name string, entity_type string, payload string"
    )


def _employees(spark, rows):
    df = spark.createDataFrame([], EMPLOYEES)
    pad = [(r[0], None, None, None, None, None, None, None, r[1]) for r in rows]
    return df.unionByName(spark.createDataFrame(pad, EMPLOYEES))


def test_incoming_guards(spark):
    emp = _employees(spark, [(7, "ip"), (8, None)])
    raw = _raw(
        spark,
        [
            # group with content → stored
            ("253501", "group", '{"schedules": {"Понедельник": []}}'),
            # group WITHOUT schedules/exams → STILL stored (truthy dict)
            ("253502", "group", '{"startDate": "01.09.2026"}'),
            # group empty object → `not data` skip
            ("253503", "group", "{}"),
            # group malformed → skip (reference client yields None)
            ("253504", "group", "not json"),
            # employee with content → stored, id resolved
            ("ip", "employee", '{"exams": [{"subject": "X"}]}'),
            # employee without schedules/exams → skip
            ("ip2", "employee", '{"startDate": "x"}'),
            # employee whose url_id resolves to nothing → skip
            ("ghost", "employee", '{"schedules": {"Вторник": []}}'),
        ],
    )
    got = schedule_blob_incoming(raw, emp).collect()
    by_key = {(r.entity_type, r.group_name, r.employee_id) for r in got}
    assert by_key == {
        ("group", "253501", None),
        ("group", "253502", None),
        ("employee", None, 7),
    }


def test_close_then_insert_and_absence_keeps_open(spark):
    emp = _employees(spark, [(7, "ip")])
    storage = spark.createDataFrame([], SCHEDULE_JSON_STORAGE)
    raw1 = _raw(
        spark,
        [
            ("253501", "group", '{"v": 1}'),
            ("ip", "employee", '{"v": 1, "schedules": {"Среда": []}}'),
        ],
    )
    s1 = version_blobs(storage, schedule_blob_incoming(raw1, emp), T1)
    # sync 2: group refetched with IDENTICAL payload (still versions);
    # employee absent (keeps its open row)
    raw2 = _raw(spark, [("253501", "group", '{"v": 1}')])
    s2 = version_blobs(s1, schedule_blob_incoming(raw2, emp), T2).cache()

    grp = s2.filter(F.col("entity_type") == "group").collect()
    assert {(str(r.valid_from), str(r.valid_to)) for r in grp} == {
        (f"{T1[:10]} 00:00:00", f"{T2[:10]} 00:00:00"),  # closed v1
        (f"{T2[:10]} 00:00:00", "None"),  # fresh v2 (no change detection)
    }
    empl = s2.filter(F.col("entity_type") == "employee").collect()
    assert len(empl) == 1 and empl[0].valid_to is None  # absence ≠ close
    # surrogate ids unique
    assert s2.select("id").distinct().count() == s2.count()
    s2.unpersist()


# --- property suite: version_blobs over ANY fetch sequence --------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

GROUPS = ["g1", "g2", "g3"]

# one sync = subset of groups fetched, each with a payload version tag
sync = st.dictionaries(
    st.sampled_from(GROUPS), st.integers(min_value=0, max_value=2), max_size=3
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(syncs=st.lists(sync, min_size=1, max_size=3))
def test_version_blobs_invariants_any_sequence(spark, syncs):
    """For ANY fetch sequence the storage table must satisfy the
    reference's implicit laws (`iis_etl/logic.py:282-297`):

    1. rows per key == times fetched (no change detection, absence
       never closes, closed history is immutable)
    2. exactly one OPEN row per ever-fetched key, carrying the LATEST
       payload
    3. validity chains are contiguous: a closed row's valid_to equals
       some later row's valid_from for the same key
    4. surrogate ids are unique
    """
    from uma_etl_iis_loader_spark.schemas import SCHEDULE_JSON_STORAGE

    storage = spark.createDataFrame([], SCHEDULE_JSON_STORAGE)
    times = [f"2026-03-{d:02d} 00:00:00" for d in range(1, len(syncs) + 1)]
    for ts, snap in zip(times, syncs):
        incoming = spark.createDataFrame(
            [("group", g, None, f'{{"v": {v}}}') for g, v in snap.items()],
            "entity_type string, group_name string, employee_id long, data string",
        )
        storage = version_blobs(storage, incoming, ts)
    rows = storage.collect()

    fetch_count: dict[str, int] = {}
    latest: dict[str, int] = {}
    for snap in syncs:
        for g, v in snap.items():
            fetch_count[g] = fetch_count.get(g, 0) + 1
            latest[g] = v

    per_key: dict[str, list] = {}
    for r in rows:
        per_key.setdefault(r.group_name, []).append(r)

    assert set(per_key) == set(fetch_count)
    assert len({r.id for r in rows}) == len(rows)  # unique surrogates
    for g, krows in per_key.items():
        assert len(krows) == fetch_count[g]  # law 1
        open_rows = [r for r in krows if r.valid_to is None]
        assert len(open_rows) == 1  # law 2
        assert open_rows[0].data == f'{{"v": {latest[g]}}}'
        closed = [r for r in krows if r.valid_to is not None]
        starts = {r.valid_from for r in krows}
        for c in closed:  # law 3
            assert c.valid_to in starts
