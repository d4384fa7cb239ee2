"""REST ingestion plumbing with a mock fetcher (no network in tests)."""

from __future__ import annotations

import json

import pytest

from uma_etl_iis_loader_spark.sources.rest import (
    RestSource,
    fetch_manifest,
    fetch_with_retry,
)


def test_fetch_with_retry_backs_off_then_succeeds():
    calls, sleeps = [], []

    def flaky(url):
        calls.append(url)
        if len(calls) < 3:
            raise OSError("transient")
        return "ok"

    assert fetch_with_retry("http://x/y", flaky, sleep=sleeps.append) == "ok"
    assert len(calls) == 3
    assert sleeps == [2.0, 4.0]  # exponential from 2s


def test_fetch_with_retry_exhausts():
    def dead(url):
        raise OSError("down")

    with pytest.raises(OSError, match="down"):
        fetch_with_retry("http://x", dead, retries=2, sleep=lambda s: None)


def test_rest_source_load_list(spark):
    payload = json.dumps([{"id": 1, "name": "A"}, {"id": 2, "name": "B"}])
    src = RestSource(spark, "http://api", fetcher=lambda url: payload)
    df = src.load_list("faculties", "id long, name string")
    assert {(r.id, r.name) for r in df.collect()} == {(1, "A"), (2, "B")}


def test_fetch_manifest_isolates_per_row_errors(spark):
    def fetcher(url):
        if "bad" in url:
            raise OSError("boom")
        return f"payload-for-{url}"

    manifest = spark.createDataFrame(
        [("g1", "http://api/ok1"), ("g2", "http://api/bad"), ("g3", "http://api/ok3")],
        "entity string, url string",
    )
    out = {
        r.entity: (r.payload, r.fetch_error)
        for r in fetch_manifest(manifest, fetcher=fetcher, retries=1).collect()
    }
    assert out["g1"] == ("payload-for-http://api/ok1", None)
    assert out["g3"][1] is None
    assert out["g2"][0] is None and "boom" in out["g2"][1]


def test_fetch_manifest_bounds_global_concurrency(spark):
    """The politeness contract: no matter how many executor slots exist
    (local[32] here), at most ``max_concurrency`` fetches are in flight
    cluster-wide. The injected fetcher logs start/end timestamps to a
    shared append-only file from the Python worker processes; the
    maximum interval overlap is the true peak concurrency."""
    import os
    import tempfile
    import time as _t

    log_path = os.path.join(
        tempfile.mkdtemp(prefix="rest_conc_"), "fetches.log"
    )

    def fetcher(url: str) -> str:
        start = _t.monotonic()
        _t.sleep(0.25)  # long enough that unbounded tasks would overlap
        end = _t.monotonic()
        with open(log_path, "a") as fh:  # O_APPEND: atomic small writes
            fh.write(f"{start} {end}\n")
        return "{}"

    manifest = spark.createDataFrame(
        [(f"e{i}", f"http://x/{i}") for i in range(24)], "name string, url string"
    )
    # ONE action: each action re-runs the fetch plan and would double the
    # logged intervals
    rows = fetch_manifest(
        manifest, fetcher=fetcher, max_concurrency=4
    ).collect()
    assert len(rows) == 24
    assert all(r.fetch_error is None for r in rows)

    intervals = []
    with open(log_path) as fh:
        for line in fh:
            s, e = line.split()
            intervals.append((float(s), float(e)))
    assert len(intervals) == 24
    events = sorted(
        [(s, 1) for s, _ in intervals] + [(e, -1) for _, e in intervals]
    )
    peak = cur = 0
    for _, d in events:
        cur += d
        peak = max(peak, cur)
    assert peak <= 4, f"peak in-flight {peak} exceeded max_concurrency=4"
    # sanity: the cap was actually exercised (fetches did run in parallel)
    assert peak >= 2, f"expected parallel fetches, saw peak={peak}"
