from __future__ import annotations

import pytest

from uma_etl_iis_loader_spark.operators.merge import insert_if_absent, merge_upsert


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_merge_upsert_update_vs_insert_only(spark):
    # mirrors M3 (iis_etl/logic.py:90-96): url_id set on insert, NOT updated
    old = spark.createDataFrame(
        [(1, "old-name", "u1"), (2, "keep", "u2")], "id long, name string, url_id string"
    )
    new = spark.createDataFrame(
        [(1, "new-name", "u1-CHANGED"), (3, "fresh", "u3")],
        "id long, name string, url_id string",
    )
    out = _rows(merge_upsert(old, new, ["id"], update_cols=["name"]))
    assert out == {
        (1, "new-name", "u1"),  # name updated, url_id untouched
        (2, "keep", "u2"),  # unmatched old kept
        (3, "fresh", "u3"),  # inserted with all incoming cols
    }


def test_merge_upsert_incoming_null_overwrites(spark):
    # Postgres set_=excluded.col overwrites with NULL too
    old = spark.createDataFrame([(1, "x")], "id long, name string")
    new = spark.createDataFrame([(1, None)], "id long, name string")
    assert _rows(merge_upsert(old, new, ["id"])) == {(1, None)}


def test_merge_upsert_schema_mismatch_raises(spark):
    old = spark.createDataFrame([(1, "x")], "id long, name string")
    new = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(old, new, ["id"])


def test_insert_if_absent(spark):
    # M7/M8 (iis_etl/logic.py:213-214,246-249)
    old = spark.createDataFrame([(1, 10), (2, 20)], "dept long, emp long")
    new = spark.createDataFrame(
        [(1, 10), (1, 10), (3, 30)], "dept long, emp long"
    )
    out = _rows(insert_if_absent(old, new, ["dept", "emp"]))
    assert out == {(1, 10), (2, 20), (3, 30)}
