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
