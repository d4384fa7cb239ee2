"""SCD2 transition matrix (FIXTURES.md A3): new / type-2 change /
type-1-only / unchanged / missing-from-snapshot / closed history."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from uma_etl_iis_loader_spark.operators.scd2 import scd2_apply

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 6, 1)
OLD = dt.datetime(2023, 1, 1)

DIM_SCHEMA = (
    "surrogate_id long, id long, name string, course int, "
    "number_of_students int, valid_from timestamp, valid_to timestamp"
)


def _dim(spark):
    return spark.createDataFrame(
        [
            # closed history row for id=1 (must pass through untouched)
            (101, 1, "G1-old", 1, 20, OLD, T0),
            # current rows
            (102, 1, "G1", 2, 20, T0, None),  # will get type-2 change
            (103, 2, "G2", 2, 25, T0, None),  # will get type-1-only change
            (104, 3, "G3", 3, 30, T0, None),  # unchanged
            (105, 4, "G4", 1, 15, T0, None),  # missing from snapshot → close
        ],
        DIM_SCHEMA,
    )


def _incoming(spark):
    return spark.createDataFrame(
        [
            (1, "G1-renamed", 2, 20),  # type-2: name changed
            (2, "G2", 2, 99),  # type-1: only number_of_students
            (3, "G3", 3, 30),  # unchanged
            (5, "G5", 1, 40),  # brand new
        ],
        "id long, name string, course int, number_of_students int",
    )


def test_scd2_transition_matrix(spark):
    out = scd2_apply(
        _dim(spark),
        _incoming(spark),
        natural_key="id",
        type2_cols=["name", "course"],
        type1_cols=["number_of_students"],
        now_ts=T1,
    )
    rows = {
        (r.id, r.name, r.course, r.number_of_students, r.valid_from, r.valid_to)
        for r in out.collect()
    }
    assert rows == {
        (1, "G1-old", 1, 20, OLD, T0),  # history untouched
        (1, "G1", 2, 20, T0, T1),  # type-2: old version closed
        (1, "G1-renamed", 2, 20, T1, None),  # type-2: new version opened
        (2, "G2", 2, 99, T0, None),  # type-1 patched in place
        (3, "G3", 3, 30, T0, None),  # unchanged
        (4, "G4", 1, 15, T0, T1),  # closed (missing)
        (5, "G5", 1, 40, T1, None),  # new key inserted
    }
    # exactly one current row per live natural key
    current = out.filter(F.col("valid_to").isNull())
    assert current.count() == 4
    # version identity: type-1 patch keeps surrogate, type-2 new row gets a new one
    sur = {(r.id, r.valid_to is None, r.name): r.surrogate_id for r in out.collect()}
    assert sur[(2, True, "G2")] == 103
    assert sur[(1, True, "G1-renamed")] not in {101, 102, 103, 104, 105}
