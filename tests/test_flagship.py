from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert cols == {
        "day_of_week",
        "week_number",
        "start_time",
        "end_time",
        "auditory_id",
        "groups",
    }
    # groups is the '|'-serialized sorted-distinct array (the driver's
    # canonicalizer can't hash list cells); elements stay sorted + distinct
    for r in rows[:50]:
        parts = r.groups.split("|")
        assert parts == sorted(set(parts))


def test_registry_contract():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert "flagship_occupancy" in qs
    # every oracle key must have a matching query
    assert set(oracles) <= set(qs)
