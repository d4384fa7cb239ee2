"""resample_ffill: grid construction, forward fill, latest-in-bucket,
per-key bounds, determinism."""

from __future__ import annotations

from datetime import datetime

from uma_etl_iis_loader_spark.operators.timeseries import resample_ffill


def _t(s):
    return datetime(2024, 1, 1, 0, 0, s)


def test_resample_ffill_golden(spark):
    rows = [
        # key 1: obs at 5s, 23s; two obs inside one bucket (31s, 38s)
        (1, _t(5), 10.0),
        (1, _t(23), 20.0),
        (1, _t(31), 30.0),
        (1, _t(38), 40.0),
        # key 2: single observation
        (2, _t(12), 99.0),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    out = resample_ffill(df, "k", "ts", ["v"], step_s=10)
    got = {(r.k, r.grid_ts.second + r.grid_ts.minute * 60): r.v for r in out.collect()}
    assert got == {
        (1, 0): 10.0,   # bucket [0,10) holds the 5s obs
        (1, 10): 10.0,  # gap -> forward filled
        (1, 20): 20.0,
        (1, 30): 40.0,  # latest-in-bucket wins (38s over 31s)
        (2, 10): 99.0,  # key 2's grid spans only its own bucket
    }
    # grid is per-key bounded: key 2 has exactly one point
    assert sum(1 for (k, _) in got if k == 2) == 1


def test_resample_ffill_deterministic_and_complete(spark):
    import random

    rng = random.Random(5)
    rows = [
        (u, _t(rng.randrange(0, 50)), float(rng.randrange(100)))
        for u in range(20)
        for _ in range(8)
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    a = {(r.k, r.grid_ts, r.v) for r in resample_ffill(df, "k", "ts", ["v"], 7).collect()}
    b = {
        (r.k, r.grid_ts, r.v)
        for r in resample_ffill(df.repartition(9), "k", "ts", ["v"], 7).collect()
    }
    assert a == b and a
    # every grid point carries a value (first point is an observation
    # bucket by construction, everything after is filled)
    assert all(v is not None for _, _, v in a)


def test_resample_ffill_subsecond_recency(spark):
    """Two observations inside the same SECOND: the later (by
    microseconds) must win, even when its value is smaller — fractional
    epoch ordering, not unix_timestamp truncation."""
    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 1, 100_000), 5.0),
        (1, datetime(2024, 1, 1, 0, 0, 1, 900_000), 3.0),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    out = resample_ffill(df, "k", "ts", ["v"], step_s=10).collect()
    assert len(out) == 1 and out[0].v == 3.0


def test_resample_ffill_timestamp_ntz(spark):
    """TIMESTAMP_NTZ inputs (what a bare parquet read often yields) work —
    the epoch path routes through a TIMESTAMP cast (NTZ has no direct
    double cast)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:05", 10.0), (1, "2024-01-01 00:00:25", 20.0)],
        "k long, s string, v double",
    ).select("k", F.col("s").cast("timestamp_ntz").alias("ts"), "v")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    out = {r.grid_ts.second: r.v for r in resample_ffill(df, "k", "ts", ["v"], 10).collect()}
    assert out == {0: 10.0, 10: 10.0, 20: 20.0}
