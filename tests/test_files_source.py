"""File-landing sources: malformed rows quarantined, good rows typed."""

from __future__ import annotations

import os
import tempfile

from uma_etl_iis_loader_spark.sources.files import (
    read_csv_quarantine,
    read_jsonl_quarantine,
)


def test_jsonl_quarantine(spark):
    d = tempfile.mkdtemp(prefix="jsonl_src_")
    with open(os.path.join(d, "part-0.jsonl"), "w") as f:
        f.write('{"id": 1, "name": "ok"}\n')
        f.write("{definitely not json\n")
        f.write('{"id": 2, "name": "also ok"}\n')
    ok, quarantine = read_jsonl_quarantine(spark, d, "id long, name string")
    assert {(r.id, r.name) for r in ok.collect()} == {(1, "ok"), (2, "also ok")}
    bad = quarantine.collect()
    assert len(bad) == 1 and bad[0].raw.startswith("{definitely")


def test_csv_quarantine(spark):
    d = tempfile.mkdtemp(prefix="csv_src_")
    with open(os.path.join(d, "part-0.csv"), "w") as f:
        f.write("id,qty\n1,10\nnot-a-number,20\n3,30\n")
    ok, quarantine = read_csv_quarantine(spark, d, "id long, qty int")
    assert {(r.id, r.qty) for r in ok.collect()} == {(1, 10), (3, 30)}
    assert [r.raw for r in quarantine.collect()] == ["not-a-number,20"]
