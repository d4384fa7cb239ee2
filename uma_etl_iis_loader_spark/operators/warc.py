"""WARC ingest — the web-archive container CommonCrawl ships
(ISO 28500, the public WARC/1.0 grammar): named headers, an exact
``Content-Length`` block, CRLF framing, and — as CommonCrawl actually
stores it — one gzip MEMBER per record concatenated into a single
``.warc.gz`` stream. Both layers are stdlib (bytes parsing + ``zlib``),
so the REAL ingest path for the dominant web-corpus format runs in a
codec-less container and is oracle-adjudicated from deterministic
synthesis formulas (the WAV/BMP recipe applied to the archive layer).

Scale shape: one ``mapInPandas`` pass, zero shuffles — archive bytes
never leave the task that read them; rows out = Σ records. Error
isolation follows what the container can actually promise: in the
``.warc.gz`` layout each record is its own gzip member, so a malformed
MEMBER quarantines that record row and parsing resumes at the next
member boundary; in a plain concatenated stream Content-Length framing
cannot resync, so a framing error quarantines the rest of THAT asset —
records framed BEFORE the error were already yielded incrementally
(``iter_warc_records``) and survive. Neither fails the task.

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


def _iter_gzip_members(payload: bytes) -> Iterator[bytes]:
    """Inflate a concatenated-member gzip stream (the .warc.gz layout)
    one MEMBER at a time — the unit of error isolation: a member that
    fails to inflate raises from ITS ``next()`` call, after every
    earlier member was already yielded intact."""
    rest = payload
    while rest:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        member = d.decompress(rest) + d.flush()
        if d.unused_data == rest:  # no progress — corrupt member
            raise ValueError("corrupt gzip member")
        yield member
        rest = d.unused_data


def _gunzip_members(payload: bytes) -> bytes:
    """Inflate a whole concatenated-member gzip stream; plain bytes pass
    through untouched. Any corrupt member is fatal here — the member-
    isolated path is :func:`warc_records`."""
    if not payload.startswith(b"\x1f\x8b"):
        return payload
    return b"".join(_iter_gzip_members(payload))


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Incrementally parse a PLAIN (already-inflated) WARC stream,
    yielding each record as soon as its framing closes:
    {warc_type, target_uri, content_length, payload}. A framing error
    (bad marker, bad Content-Length, truncated body) raises from that
    record's step — records already yielded SURVIVE with the caller;
    the stream cannot resync past the error (Content-Length framing
    has no sync marker), so the remainder is lost."""
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
        yield {
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "content_length": length,
            "payload": body,
        }
        pos = body_start + length


def parse_warc(payload: bytes) -> list[dict]:
    """Parse a (possibly per-record-gzipped) WARC stream into records:
    [{warc_type, target_uri, content_length, payload}]. ATOMIC
    contract: framing errors (bad marker, bad Content-Length,
    truncated body, corrupt gzip) raise and nothing is returned. For
    survivable-prefix semantics iterate :func:`iter_warc_records`; for
    per-member isolation on the ``.warc.gz`` layout use
    :func:`warc_records`."""
    return list(iter_warc_records(_gunzip_members(bytes(payload))))


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
    parse path: (asset_id, record_idx, warc_type, target_uri,
    content_length, text, parse_error). Zero shuffles; archive bytes
    stay in-task.

    Error isolation matches the container's structure: a ``.warc.gz``
    payload is parsed one gzip MEMBER at a time, so a malformed member
    becomes one error row (``record_idx`` = its running position) and
    later members still parse; a corrupt member the inflater cannot
    step past quarantines the archive TAIL behind one error row. A
    plain stream has only Content-Length framing — no resync point —
    so its first framing error quarantines the rest of that asset."""

    def rows_for(asset_id, payload, out) -> None:
        if payload is None:
            out.append((asset_id, None, None, None, None, None,
                        "NULL payload"))
            return
        data = bytes(payload)
        idx = 0

        def emit(rec) -> None:
            nonlocal idx
            out.append(
                (
                    asset_id,
                    idx,
                    rec["warc_type"],
                    rec["target_uri"],
                    rec["content_length"],
                    rec["payload"].decode(text_encoding, "replace"),
                    None,
                )
            )
            idx += 1

        if data.startswith(b"\x1f\x8b"):
            members = _iter_gzip_members(data)
            while True:
                try:
                    member = next(members)
                except StopIteration:
                    return
                except Exception as exc:  # noqa: BLE001 — corrupt member
                    # inflater can't step past it: tail is lost
                    out.append((asset_id, idx, None, None, None, None,
                                str(exc)[:200]))
                    return
                try:
                    # incremental: records framed before a mid-member
                    # error are already emitted and survive
                    for rec in iter_warc_records(member):
                        emit(rec)
                except Exception as exc:  # noqa: BLE001 — bad member
                    out.append((asset_id, idx, None, None, None, None,
                                str(exc)[:200]))
                    idx += 1  # next member re-syncs
        else:
            try:
                # incremental: the prefix parsed before a framing error
                # survives; only the unresyncable remainder is lost
                for rec in iter_warc_records(data):
                    emit(rec)
            except Exception as exc:  # noqa: BLE001 — framing-fatal tail
                out.append((asset_id, idx, None, None, None, None,
                            str(exc)[:200]))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, buf in zip(
                pdf["asset_id"].tolist(), pdf["payload"].tolist()
            ):
                rows_for(aid, buf, out)
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
