"""WARC ingest rung: real parse path, gzip members, error isolation."""
from __future__ import annotations

import zlib

import pytest

from uma_etl_iis_loader_spark.operators.warc import (
    _synthetic_records,
    encode_warc,
    encode_warc_gz,
    parse_warc,
    synthesize_warc_assets,
    warc_records,
)


def test_warc_round_trip_plain_and_gz():
    recs = [
        ("response", "http://a/1", b"hello world"),
        ("request", "http://a/2", b""),
        ("response", "http://a/3", b"x" * 1000),
    ]
    for enc in (encode_warc, encode_warc_gz):
        got = parse_warc(enc(recs))
        assert [(r["warc_type"], r["target_uri"], r["payload"]) for r in got] == [
            (t, u, p) for t, u, p in recs
        ]
        assert [r["content_length"] for r in got] == [11, 0, 1000]


def test_warc_payload_may_contain_crlf_and_warc_marker():
    # Content-Length framing means the BODY can contain anything,
    # including the record marker itself
    tricky = b"WARC/1.0\r\n\r\nnot a real record\r\n\r\n"
    got = parse_warc(encode_warc([("response", "http://t", tricky)]))
    assert len(got) == 1 and got[0]["payload"] == tricky


def test_warc_malformed_raises():
    with pytest.raises(ValueError, match="marker"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    # truncated body
    good = encode_warc([("response", "http://t", b"abcdef")])
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(good[:-10])
    # corrupt gzip
    gz = encode_warc_gz([("response", "http://t", b"abc")])
    with pytest.raises(Exception):
        parse_warc(gz[:8] + b"\x00\x00\x00\x00" + gz[12:])


def test_gzip_members_concatenate():
    # each record its own member; parse sees them all
    a = encode_warc_gz([("response", "http://a", b"one")])
    b = encode_warc_gz([("response", "http://b", b"two")])
    got = parse_warc(a + b)
    assert [r["payload"] for r in got] == [b"one", b"two"]


def test_warc_records_kernel(spark):
    ids = spark.range(12).withColumnRenamed("id", "asset_id")
    for gz in (False, True):
        rows = warc_records(
            synthesize_warc_assets(ids, gz=gz)
        ).collect()
        ok = [r for r in rows if r["parse_error"] is None]
        assert len(ok) == sum(1 + i % 3 for i in range(12))
        for r in ok:
            i, x = r["asset_id"], r["record_idx"]
            want = _synthetic_records(i)[x]
            assert r["target_uri"] == want[1]
            assert r["content_length"] == len(want[2])
            assert r["text"] == want[2].decode()


def test_warc_records_error_isolation(spark):
    import pandas as pd

    assets = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": [1, 2],
                "payload": [
                    encode_warc([("response", "http://ok", b"fine")]),
                    b"garbage bytes",
                ],
            }
        )
    )
    rows = {r["asset_id"]: r for r in warc_records(assets).collect()}
    assert rows[1]["parse_error"] is None and rows[1]["text"] == "fine"
    assert rows[2]["parse_error"] is not None


def test_warc_plain_stream_prefix_survives_framing_error(spark):
    """Plain (non-gz) streams can't resync past a framing error, but
    records parsed BEFORE it must survive: prefix rows + one error row."""
    import pandas as pd

    good = encode_warc(
        [("response", "http://a", b"one"), ("response", "http://b", b"two")]
    )
    truncated = good + b"WARC/1.0\r\nContent-Length: 99\r\n\r\nshort"
    assets = spark.createDataFrame(
        pd.DataFrame({"asset_id": [1], "payload": [truncated]})
    )
    rows = {r["record_idx"]: r for r in warc_records(assets).collect()}
    assert len(rows) == 3
    assert rows[0]["text"] == "one" and rows[1]["text"] == "two"
    assert rows[2]["parse_error"] is not None


def test_warc_gz_member_isolation(spark):
    """In the .warc.gz layout each record is its own gzip member, so a
    bad member quarantines ONE row and the next member re-syncs; a
    corrupt (non-inflatable) member loses only the archive tail."""
    import zlib

    import pandas as pd

    def gz_member(raw: bytes) -> bytes:
        co = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        return co.compress(raw) + co.flush()

    good0 = encode_warc_gz([("response", "http://a", b"one")])
    bad_header = gz_member(b"HTTP/1.1 200 OK\r\n\r\n")  # not WARC/
    good2 = encode_warc_gz([("response", "http://c", b"three")])
    corrupt = b"\x1f\x8b\x08\x00" + b"\x00" * 8  # inflater can't finish

    assets = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": [1, 2],
                "payload": [
                    good0 + bad_header + good2,
                    good0 + corrupt + good2,
                ],
            }
        )
    )
    rows = {}
    for r in warc_records(assets).collect():
        rows.setdefault(r["asset_id"], []).append(r)
    by_idx = {r["record_idx"]: r for r in rows[1]}
    assert len(by_idx) == 3
    assert by_idx[0]["text"] == "one" and by_idx[0]["parse_error"] is None
    assert by_idx[1]["parse_error"] is not None
    assert by_idx[2]["text"] == "three" and by_idx[2]["parse_error"] is None
    # corrupt member: record 0 survives, one tail error row, no more
    tail = {r["record_idx"]: r for r in rows[2]}
    assert len(tail) == 2
    assert tail[0]["text"] == "one" and tail[0]["parse_error"] is None
    assert tail[1]["parse_error"] is not None


def test_warc_kernel_zero_shuffles(spark):
    ids = spark.range(4).withColumnRenamed("id", "asset_id")
    plan = (
        warc_records(synthesize_warc_assets(ids))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_crawl_to_corpus_pipeline_end_to_end(spark):
    """The whole crawl-ingest story in one Catalyst plan: .warc.gz
    archives → records → HTML strip → C4 line filter + page gates.
    Every stage is individually adjudicated elsewhere; this pins the
    COMPOSITION (schemas line up, filters compose, one plan)."""
    import pandas as pd

    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.functions.text import (
        c4_kept_lines,
        c4_page_keep,
        strip_html,
    )

    good_html = (
        "<html><body>"
        + "".join(
            f"<p>This is sentence number {i} of the good page.</p>"
            for i in range(6)
        )
        + "</body></html>"
    )
    junk_html = "<html><script>var x = {a: 1};</script><p>hi.</p></html>"
    archives = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": [1],
                "payload": [
                    encode_warc_gz(
                        [
                            ("response", "http://good", good_html.encode()),
                            ("response", "http://junk", junk_html.encode()),
                        ]
                    )
                ],
            }
        )
    )
    recs = warc_records(archives).where(F.col("parse_error").isNull())
    cleaned = recs.select(
        "target_uri",
        strip_html("text").alias("plain"),
    ).select(
        "target_uri",
        F.array_join(c4_kept_lines("plain"), "\n").alias("cleaned"),
    ).withColumn(
        "keep", c4_page_keep(F.col("cleaned"), F.col("cleaned"))
    )
    rows = {r["target_uri"]: r for r in cleaned.collect()}
    assert rows["http://good"]["keep"]
    assert "sentence number 0" in rows["http://good"]["cleaned"]
    assert not rows["http://junk"]["keep"]  # <3 sentences after strip
    # single narrow plan: no exchange anywhere in the composition
    plan = cleaned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
