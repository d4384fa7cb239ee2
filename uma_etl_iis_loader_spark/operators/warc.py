"""WARC ingest — the web-archive container CommonCrawl ships
(ISO 28500, the public WARC/1.0 grammar): named headers, an exact
``Content-Length`` block, CRLF framing, and — as CommonCrawl actually
stores it — one gzip MEMBER per record concatenated into a single
``.warc.gz`` stream. Both layers are stdlib (bytes parsing + ``zlib``),
so the REAL ingest path for the dominant web-corpus format runs in a
codec-less container and is oracle-adjudicated from deterministic
synthesis formulas (the WAV/BMP recipe applied to the archive layer).

Scale shape: one ``mapInPandas`` pass, zero shuffles — archive bytes
never leave the task that read them; rows out = Σ records. Per-record
error isolation: a malformed record quarantines that ROW, a malformed
archive quarantines that asset, neither fails the task.

Cite: the reference has no ingest-container surface (`iis_etl/` reads
REST JSON); extension surface per SURVEY.md §6 — the front door a
100 TB crawl pipeline reads through.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_CRLF = b"\r\n"


def encode_warc(records: list[tuple[str, str, bytes]]) -> bytes:
    """Serialize (warc_type, target_uri, payload) triples as a WARC/1.0
    byte stream — spec framing: version line, headers, blank line, the
    exact Content-Length payload block, two CRLFs between records."""
    out = []
    for warc_type, uri, payload in records:
        head = (
            b"WARC/1.0" + _CRLF
            + b"WARC-Type: " + warc_type.encode() + _CRLF
            + b"WARC-Target-URI: " + uri.encode() + _CRLF
            + b"Content-Length: " + str(len(payload)).encode() + _CRLF
            + _CRLF
        )
        out.append(head + payload + _CRLF + _CRLF)
    return b"".join(out)


def encode_warc_gz(records: list[tuple[str, str, bytes]]) -> bytes:
    """CommonCrawl layout: each record is its OWN gzip member; members
    concatenate into one stream (random access by member offset)."""
    out = []
    for rec in records:
        raw = encode_warc([rec])
        co = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        out.append(co.compress(raw) + co.flush())
    return b"".join(out)


def _gunzip_members(payload: bytes) -> bytes:
    """Inflate a concatenated-member gzip stream (the .warc.gz layout);
    plain bytes pass through untouched."""
    if not payload.startswith(b"\x1f\x8b"):
        return payload
    out = []
    rest = payload
    while rest:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.append(d.decompress(rest))
        out.append(d.flush())
        if d.unused_data == rest:  # no progress — corrupt tail
            raise ValueError("corrupt gzip member")
        rest = d.unused_data
    return b"".join(out)


def parse_warc(payload: bytes) -> list[dict]:
    """Parse a (possibly per-record-gzipped) WARC stream into records:
    [{warc_type, target_uri, content_length, payload}]. Framing errors
    raise; per-record header errors surface as that record's ``error``.
    """
    data = _gunzip_members(bytes(payload))
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos:pos + 2] == _CRLF:  # inter-record padding
            pos += 2
            continue
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"bad record marker at offset {pos}")
        head_end = data.index(_CRLF + _CRLF, pos)
        header_block = data[pos:head_end].decode("utf-8", "replace")
        headers = {}
        for line in header_block.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError(f"bad Content-Length at offset {pos}: {exc}")
        body_start = head_end + 4
        body = data[body_start:body_start + length]
        if len(body) != length:
            raise ValueError("truncated record body")
        records.append(
            {
                "warc_type": headers.get("warc-type", ""),
                "target_uri": headers.get("warc-target-uri", ""),
                "content_length": length,
                "payload": body,
            }
        )
        pos = body_start + length
    return records


def _synthetic_records(i: int) -> list[tuple[str, str, bytes]]:
    """Deterministic records for asset ``i``: 1 + i % 3 response records
    with SQL-recomputable URIs and bodies (body r = 'doc-<i>-rec-<r> '
    repeated r+1 times, so content_length = (12 + len(str(i)) +
    len(str(r))) * (r+1) is exact integer arithmetic)."""
    recs = []
    for r in range(1 + i % 3):
        body = (f"doc-{i}-rec-{r} " * (r + 1)).encode()
        recs.append(("response", f"http://example.com/{i}/{r}", body))
    return recs


def synthesize_warc_assets(
    ids: DataFrame, id_col: str = "asset_id", gz: bool = False
) -> DataFrame:
    """Deterministic WARC (or per-record-gzipped .warc.gz) payload per
    id, for oracle adjudication of the REAL parse path."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            enc = encode_warc_gz if gz else encode_warc
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    "payload": [
                        enc(_synthetic_records(int(i))) for i in pdf[id_col]
                    ],
                }
            )

    return ids.select(id_col).mapInPandas(
        synth, f"{id_col} long, payload binary"
    )


def warc_records(assets: DataFrame, text_encoding: str = "utf-8") -> DataFrame:
    """Explode WARC archives into one row per record through the REAL
    parse path (gzip members inflated when present): (asset_id,
    record_idx, warc_type, target_uri, content_length, text,
    parse_error). Zero shuffles; archive bytes stay in-task."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                try:
                    if r["payload"] is None:
                        raise ValueError("NULL payload")
                    for idx, rec in enumerate(parse_warc(bytes(r["payload"]))):
                        out.append(
                            (
                                r["asset_id"],
                                idx,
                                rec["warc_type"],
                                rec["target_uri"],
                                rec["content_length"],
                                rec["payload"].decode(
                                    text_encoding, "replace"
                                ),
                                None,
                            )
                        )
                except Exception as exc:  # noqa: BLE001 — decode boundary
                    out.append(
                        (r["asset_id"], None, None, None, None, None,
                         str(exc)[:200])
                    )
            yield pd.DataFrame(
                out,
                columns=["asset_id", "record_idx", "warc_type",
                         "target_uri", "content_length", "text",
                         "parse_error"],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        parse,
        "asset_id long, record_idx int, warc_type string, "
        "target_uri string, content_length long, text string, "
        "parse_error string",
    )
