"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` kernels.

Image decode is REAL in this codec-less container for the three core
formats — stdlib BMP (byte slicing), PNG (zlib + all five scanline
filters), and baseline JPEG (``operators/jpeg``, Huffman+DCT) — with
PIL preferred automatically when importable for everything else
(progressive/palette/16-bit/interlaced raise ``NotImplementedError``
without it). Audio (RIFF/WAVE) lives in ``operators/audio`` and video
(RIFF/AVI) in ``operators/video``; ``video.decode_media`` is the
unified sniff-and-dispatch entry point. ``fake_decode_features``
remains as the deterministic byte-histogram stand-in for plumbing
tests of formats outside the ladder.

Scale notes: binary payloads ride in Arrow record batches; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` sized so batch_bytes ≈
rows × payload fits executor memory. Feature extraction is embarrassingly
parallel — zero shuffles in this module.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# asset = one media object; metadata is typed, payload is opaque binary
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = (
    "asset_id long, media_type string, n_bytes int, "
    "byte_entropy double, features array<float>"
)


def _try_import_pillow():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit
    BI_RGB Windows BMP — pure byte packing (stdlib only), so the REAL
    encode/decode rung runs in codec-less containers. Bottom-up row
    order, BGR channel order, rows padded to 4 bytes, per the public BMP
    file-format spec."""
    import struct

    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp expects an (h, w, 3) uint8 array")
    h, w, _ = pixels.shape
    row_size = ((3 * w + 3) // 4) * 4
    data_size = row_size * h
    # rows bottom-up, channels BGR, right-padded with zeros
    padded = np.zeros((h, row_size), dtype=np.uint8)
    padded[:, : 3 * w] = pixels[::-1, :, ::-1].reshape(h, 3 * w)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    return header + padded.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BI_RGB BMP to an (h, w, 3) uint8 RGB
    array — the stdlib-only real-decode rung (inverse of
    :func:`encode_bmp`). Raises ``ValueError`` on anything that is not a
    well-formed 24-bit uncompressed BMP (truncated file, other bit
    depths, RLE compression): corrupt media must fail loudly at the
    decode boundary, not propagate garbage pixels downstream."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP (header={hdr_size}, bpp={bpp}, "
            f"compression={compression}); only 24-bit BI_RGB is handled"
        )
    if h <= 0 or w <= 0:
        raise ValueError("top-down or degenerate BMP not supported")
    row_size = ((3 * w + 3) // 4) * 4
    if len(payload) < data_offset + row_size * h:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=data_offset
    ).reshape(h, row_size)
    # strip padding, flip bottom-up rows, BGR → RGB
    return rows[:, : 3 * w].reshape(h, w, 3)[::-1, :, ::-1].copy()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a PNG — stdlib only
    (struct + zlib): IHDR (8-bit, color type 2 truecolor,
    non-interlaced), one zlib-compressed IDAT of filter-0 scanlines,
    IEND, with correct per-chunk CRC32s per the public PNG spec."""
    import struct
    import zlib

    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_png expects an (h, w, 3) uint8 array")
    h, w, _ = pixels.shape
    raw = b"".join(b"\x00" + pixels[r].tobytes() for r in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG to an (h, w, channels) uint8 array — the stdlib
    compressed-format rung (zlib inflate + per-scanline unfilter).
    Supports 8-bit non-interlaced grayscale (1ch), gray+alpha (2ch),
    RGB (3ch) and RGBA (4ch), with ALL five scanline filters (None /
    Sub / Up / Average / Paeth) reconstructed per the PNG spec; chunk
    CRCs are verified. Raises ``ValueError`` on anything else (palette,
    16-bit, interlaced, truncated, corrupt) — corrupt media fails loudly
    at the decode boundary.

    Filter reconstruction is numpy-vectorized where the math allows and
    plain-int elsewhere: None/Up are whole-row array ops, Sub is a
    per-channel-lane cumsum (mod-256 distributes over the prefix sum),
    and Average/Paeth — serial in the pixel index by spec — run as
    Python-int list loops (≈6-10x the old numpy-scalar-indexing loop;
    np.int16 element access dominates at ~µs/byte). Working memory is
    ~2.1 bytes per decoded byte (uint8 output rows + one int16 row
    pair), which with the faster loops supports the 16 MP cap;
    filter-heavy ultra-res corpora should still use the PIL rung."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 12 <= len(payload):
        ln, tag = struct.unpack_from(">I4s", payload, pos)
        if pos + 12 + ln > len(payload):
            raise ValueError("truncated PNG chunk")
        data = payload[pos + 8 : pos + 8 + ln]
        crc = struct.unpack_from(">I", payload, pos + 8 + ln)[0]
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    if len(ihdr) != 13:
        # struct.unpack would raise struct.error, which escapes the
        # ValueError-only handlers at the decode boundary
        raise ValueError(f"malformed IHDR chunk (len={len(ihdr)})")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
    if depth != 8 or channels is None or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color_type={ctype}, "
            f"interlace={interlace}); 8-bit non-interlaced "
            f"gray/gray+alpha/RGB/RGBA only"
        )
    if w == 0 or h == 0:
        raise ValueError("degenerate PNG dimensions")
    # Stats-kernel rung cap: working memory is ~2.1 bytes per decoded
    # byte (uint8 output + raw scanlines + one int16 row pair), and the
    # unfilter runs at ~0.24 µs/byte worst case (all-Paeth, measured;
    # Sub/Up/None are vectorized at 100-300 MB/s) — so 16 MP RGBA costs
    # ~21 s all-Paeth / ~1 s mixed-or-vector-filtered within ~150 MB,
    # vs minutes under the old per-byte numpy-scalar loop and its 4 MP
    # ceiling. Bigger imagery belongs on the PIL rung (preferred
    # automatically when importable — see decode_image).
    if w * h > 16_000_000:
        raise ValueError(
            f"PNG dimensions too large for the stdlib rung ({w}x{h}); "
            f"use the PIL rung for >16 MP imagery"
        )
    stride = w * channels
    expected = h * (stride + 1)
    try:
        # bounded inflate: cap the output at expected+1 bytes so a
        # decompression-bomb IDAT (KBs inflating to GBs) raises as a
        # per-row ValueError instead of OOMing the executor
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), expected + 1)
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT inflate failed: {exc}") from exc
    if len(raw) != expected:
        raise ValueError("PNG scanline data length mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    # uint8 output rows + ONE int16 previous-row buffer: every
    # intermediate fits int16 (Average sums ≤ 765, Paeth p ∈ [-255,
    # 510], distances ≤ 765) and the unfilter math is mod-256 either
    # way. None/Up are whole-row vector ops; Sub is a per-lane cumsum
    # (mod 256 distributes over the prefix sum); Average/Paeth are
    # serial in the pixel index BY SPEC — they run on plain Python ints
    # (list indexing ~6-10x faster than np scalar indexing per byte).
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    prev16 = np.zeros(stride, dtype=np.int16)
    for r in range(h):
        f = int(arr[r, 0])
        line = arr[r, 1:].astype(np.int16)
        if f == 0:
            rec = line
        elif f == 2:  # Up — vectorized
            rec = (line + prev16) & 0xFF
        elif f == 1:  # Sub — per-channel-lane prefix sum, vectorized
            rec = (
                np.cumsum(
                    line.reshape(w, bpp), axis=0, dtype=np.int64
                ).reshape(stride)
                & 0xFF
            ).astype(np.int16)
        elif f == 3:  # Average — plain-int serial recurrence
            ln = line.tolist()
            pv = prev16.tolist()
            for i in range(bpp):
                ln[i] = (ln[i] + (pv[i] >> 1)) & 0xFF
            for i in range(bpp, stride):
                ln[i] = (ln[i] + ((ln[i - bpp] + pv[i]) >> 1)) & 0xFF
            rec = np.asarray(ln, dtype=np.int16)
        elif f == 4:  # Paeth — plain-int serial recurrence
            ln = line.tolist()
            pv = prev16.tolist()
            for i in range(bpp):  # a = c = 0 -> predictor is b
                ln[i] = (ln[i] + pv[i]) & 0xFF
            for i in range(bpp, stride):
                a = ln[i - bpp]
                b = pv[i]
                c = pv[i - bpp]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                ln[i] = (ln[i] + pred) & 0xFF
            rec = np.asarray(ln, dtype=np.int16)
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[r] = rec
        prev16 = rec
    return out.reshape(h, w, channels)


def decode_image(payload: bytes):
    """Real image decode, three rungs:

    - uncompressed 24-bit BMP → stdlib byte slicing (:func:`decode_bmp`),
      returns an (h, w, 3) uint8 RGB numpy array — executes in this
      codec-less container, so the real-decode path is tested here.
    - 8-bit non-interlaced PNG → stdlib zlib + unfilter
      (:func:`decode_png`), (h, w, channels) uint8 — the real
      COMPRESSED-format rung, also codec-less.
    - baseline JPEG → the stdlib Huffman+IDCT decoder
      (:func:`operators.jpeg.decode_jpeg`) — the web-corpus format,
      executable (and executed, in tests) without any codec library.
    - anything else → PIL when importable (production rung), else
      ``NotImplementedError``.

    Rung order: BMP always takes the stdlib path first (vectorized byte
    slicing — no codec can beat it); PNG prefers PIL when importable
    (C-speed unfilter; the stdlib decoder's Sub/Average/Paeth rows are a
    per-byte Python loop, orders of magnitude slower on filter-heavy
    real-world PNGs) and falls back to the stdlib decoder in codec-less
    containers — so production hosts with PIL never silently pay the
    pure-Python cost, and CI without PIL still executes a REAL
    compressed-format decode.

    Cite: mirrors how the reference gates optional behavior behind
    runtime checks rather than hard deps (defensive parsing throughout
    `iis_etl/logic.py:23-56`). Swap in torchvision/ffmpeg kernels on a
    real cluster for the compressed formats.
    """
    pillow = _try_import_pillow()
    if payload[:2] == b"BM":
        try:
            return decode_bmp(payload)
        except ValueError:
            # a BMP variant the stdlib rung doesn't handle (32-bit, RLE,
            # top-down): fall through to PIL rather than failing a
            # payload PIL could decode
            if pillow is None:
                raise
    elif payload[:8] == _PNG_SIG and pillow is None:
        return decode_png(payload)
    elif payload[:2] == b"\xff\xd8" and pillow is None:
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if pillow is None:
        raise NotImplementedError(
            "decoding non-BMP/PNG/JPEG images requires a codec library "
            "(PIL) not present in this container; use encode_bmp/"
            "encode_png/encode_jpeg + their decoders, or "
            "fake_decode_features for plumbing tests"
        )
    import io as _io

    img = pillow.open(_io.BytesIO(payload))
    # normalize exotic modes to pixel VALUES: palette ('P') would
    # otherwise come back as color-table indices and CMYK as 4 raw
    # channels — silently wrong pixel stats, not just a shape quirk
    if img.mode not in ("L", "LA", "RGB", "RGBA"):
        img = img.convert("RGB")
    arr = np.asarray(img)
    # normalize to the stdlib rungs' (h, w, channels) ndarray contract
    return arr[:, :, None] if arr.ndim == 2 else arr


def bmp_pixel_stats(assets: DataFrame) -> DataFrame:
    """REAL pixel statistics through the actual decoder: each payload is
    decoded with :func:`decode_image` (stdlib BMP rung — no fake
    features) and reduced to (width, height, n_bytes, pixel_sum). Rows
    whose payload fails to decode surface decode_error instead of being
    dropped (per-row error isolation, same contract as the REST source).
    Arrow-batched mapInPandas, zero shuffles."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            # plain-list zip, not iterrows: Series construction per row
            # costs ~50 µs — ~50x the loop body for small payloads
            for aid, buf in zip(
                pdf["asset_id"].tolist(), pdf["payload"].tolist()
            ):
                n_bytes = 0 if buf is None else int(len(buf))
                try:
                    if buf is None:
                        raise ValueError("NULL payload")
                    px = decode_image(bytes(buf))
                    out.append(
                        (
                            aid,
                            int(px.shape[1]),
                            int(px.shape[0]),
                            n_bytes,
                            int(px.astype(np.int64).sum()),
                            None,
                        )
                    )
                except Exception as exc:  # noqa: BLE001 — decode boundary:
                    # stdlib rung raises ValueError/NotImplementedError,
                    # the PIL rung raises codec-specific errors; all must
                    # land as error rows, not task failures
                    out.append(
                        (aid, None, None, n_bytes, None,
                         str(exc)[:200])
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id", "width", "height", "n_bytes", "pixel_sum",
                    "decode_error",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        stats,
        "asset_id long, width int, height int, n_bytes int, "
        "pixel_sum long, decode_error string",
    )


def dhash_images(assets: DataFrame, out_h: int = 8, out_w: int = 8) -> DataFrame:
    """Perceptual difference-hash (dHash, the public recipe) through the
    REAL decode path: decode each payload, reduce to integer grayscale
    (channel SUM — order-preserving vs the mean but exactly
    integer-arithmetic, so the oracle can recompute it), nearest-neighbor
    sample an (out_h, out_w+1) grid with floor-index arithmetic
    src = (i · dim) // out, and emit one bit per adjacent-column
    comparison. The 64-bit hash ships as two 32-bit halves (``hash_hi``,
    ``hash_lo``) — BIGINT-safe on every engine, SQL-recomputable for
    synthetic pixels, and reassembled as needed by the pairing join.
    Near-identical images differ in a few bits; crops/shifts differ in
    many — the standard cheap image-dedup signal. Zero shuffles."""
    if out_h * out_w > 64:
        # numpy uint64 << k for k >= 64 is C-undefined (silently zeroed
        # or wrapped) — the grid must fit the 64-bit signature
        raise ValueError(
            f"out_h*out_w must be <= 64 (64-bit signature packing); "
            f"got {out_h}x{out_w}"
        )

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, buf in zip(
                pdf["asset_id"].tolist(), pdf["payload"].tolist()
            ):
                try:
                    if buf is None:
                        raise ValueError("NULL payload")
                    px = decode_image(bytes(buf))
                    g = px.astype(np.int64).sum(axis=2)
                    h, w = g.shape
                    rows = (np.arange(out_h) * h) // out_h
                    cols = (np.arange(out_w + 1) * w) // (out_w + 1)
                    grid = g[np.ix_(rows, cols)]
                    bits = (grid[:, 1:] > grid[:, :-1]).astype(np.uint64)
                    flat = bits.reshape(-1)
                    val = int(
                        (flat << np.arange(out_h * out_w, dtype=np.uint64))
                        .sum()
                    )
                    out.append(
                        (aid, val >> 32, val & 0xFFFFFFFF, None)
                    )
                except Exception as exc:  # noqa: BLE001 — decode boundary
                    out.append((aid, None, None, str(exc)[:200]))
            yield pd.DataFrame(
                out,
                columns=["asset_id", "hash_hi", "hash_lo", "decode_error"],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        hashes,
        "asset_id long, hash_hi long, hash_lo long, decode_error string",
    )


def phash_images(assets: DataFrame, grid: int = 32) -> DataFrame:
    """Perceptual DCT hash (pHash, the public recipe) through the REAL
    decode path: decode → integer grayscale (channel sum, like
    :func:`dhash_images`) → nearest-neighbor sample a ``grid``×``grid``
    plane (floor-index arithmetic) → 2-D orthonormal DCT-II → keep the
    top-left 8×8 low-frequency block MINUS the DC term (63 coefficients)
    → one bit per coefficient vs their median, packed into the standard
    ``hash_hi``/``hash_lo`` halves (bit 63 unused, always 0).

    Dropping DC and thresholding at the median makes the signature
    invariant to any positive affine pixel transform a·px + b (a > 0):
    AC coefficients scale by ``a`` (linearity), the median scales with
    them, and ``b`` lands entirely in the discarded DC — so global
    brightness/contrast shifts cannot flip a bit (law-tested). dHash
    only gets gain invariance; pHash survives the low-frequency edits
    (blur, mild recompression) that flip many dHash bits, at the cost
    of a DCT per row. Pair with :func:`hamming_near_dup_pairs` via
    :func:`sig_from_halves`. Zero shuffles."""
    from .audio import _dct2_orthonormal

    dct = _dct2_orthonormal(grid, grid)

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, buf in zip(
                pdf["asset_id"].tolist(), pdf["payload"].tolist()
            ):
                try:
                    if buf is None:
                        raise ValueError("NULL payload")
                    px = decode_image(bytes(buf))
                    g = px.astype(np.int64).sum(axis=2).astype(np.float64)
                    h, w = g.shape
                    rows = (np.arange(grid) * h) // grid
                    cols = (np.arange(grid) * w) // grid
                    plane = g[np.ix_(rows, cols)]
                    coeffs = dct @ plane @ dct.T
                    block = coeffs[:8, :8].reshape(-1)[1:]  # drop DC
                    bits = (block > np.median(block)).astype(np.uint64)
                    val = int(
                        (bits << np.arange(63, dtype=np.uint64)).sum()
                    )
                    out.append(
                        (aid, val >> 32, val & 0xFFFFFFFF, None)
                    )
                except Exception as exc:  # noqa: BLE001 — decode boundary
                    out.append((aid, None, None, str(exc)[:200]))
            yield pd.DataFrame(
                out,
                columns=["asset_id", "hash_hi", "hash_lo", "decode_error"],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        hashes,
        "asset_id long, hash_hi long, hash_lo long, decode_error string",
    )


def image_metadata(
    assets: DataFrame, with_scrub_stats: bool = False
) -> DataFrame:
    """EXIF metadata scan — the PII face of image ingest: orientation
    (rotation-aware decode) and GPS geotags (location PII that MUST be
    found before payloads ship). JPEG APP1/TIFF walk via
    ``operators/jpeg.parse_exif``; non-JPEG payloads report no EXIF
    (BMP/PNG carry none in these rungs). Zero shuffles.

    ``with_scrub_stats=True`` adds an ``n_bytes_removed`` column —
    what :func:`strip_image_metadata` would splice out — computed in
    the SAME pass over the payload bytes (the strip is a cheap segment
    walk; re-reading every payload through a second kernel just to
    count removed bytes would double the scan I/O)."""
    from .jpeg import parse_exif, strip_jpeg_metadata

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, buf in zip(
                pdf["asset_id"].tolist(), pdf["payload"].tolist()
            ):
                try:
                    if buf is None:
                        raise ValueError("NULL payload")
                    p = bytes(buf)
                    if p[:2] == b"\xff\xd8":
                        e = parse_exif(p)
                        removed = (
                            len(p) - len(strip_jpeg_metadata(p))
                            if with_scrub_stats
                            else None
                        )
                    else:
                        e = {"orientation": None, "has_gps": False,
                             "gps_lat": None, "gps_lon": None}
                        removed = 0 if with_scrub_stats else None
                    row = (aid, e["orientation"], e["has_gps"],
                           e["gps_lat"], e["gps_lon"], None)
                except Exception as exc:  # noqa: BLE001 — decode boundary
                    row = (aid, None, None, None, None,
                           str(exc)[:200])
                    removed = None
                out.append(row + ((removed,) if with_scrub_stats else ()))
            cols = ["asset_id", "orientation", "has_gps", "gps_lat",
                    "gps_lon", "decode_error"]
            if with_scrub_stats:
                cols.append("n_bytes_removed")
            yield pd.DataFrame(out, columns=cols)

    schema = (
        "asset_id long, orientation int, has_gps boolean, "
        "gps_lat double, gps_lon double, decode_error string"
    )
    if with_scrub_stats:
        schema += ", n_bytes_removed int"
    return assets.select("asset_id", "payload").mapInPandas(scan, schema)


def strip_image_metadata(assets: DataFrame) -> DataFrame:
    """Metadata scrub — remove EXIF/XMP/ICC/comment segments from JPEG
    payloads by pure byte splicing (``operators/jpeg.
    strip_jpeg_metadata``): decoded pixels are bit-identical, geotags
    and thumbnails are gone. Non-JPEG payloads pass through untouched.
    Returns (asset_id, payload, n_bytes_removed, decode_error); the
    text-side sibling of ``functions/text.redact_pii``. Zero shuffles —
    payloads never leave the task."""
    from .jpeg import strip_jpeg_metadata

    def scrub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, buf in zip(
                pdf["asset_id"].tolist(), pdf["payload"].tolist()
            ):
                try:
                    if buf is None:
                        raise ValueError("NULL payload")
                    p = bytes(buf)
                    cleaned = (
                        strip_jpeg_metadata(p)
                        if p[:2] == b"\xff\xd8"
                        else p
                    )
                    out.append(
                        (aid, cleaned, len(p) - len(cleaned),
                         None)
                    )
                except Exception as exc:  # noqa: BLE001 — decode boundary
                    out.append((aid, None, None, str(exc)[:200]))
            yield pd.DataFrame(
                out,
                columns=["asset_id", "payload", "n_bytes_removed",
                         "decode_error"],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        scrub,
        "asset_id long, payload binary, n_bytes_removed int, "
        "decode_error string",
    )


def image_sharpness(assets: DataFrame) -> DataFrame:
    """Variance-of-Laplacian sharpness (the classic public blur gate):
    decode, reduce to integer grayscale (channel sum, like dHash),
    convolve the 4-neighbor Laplacian via array shifts (pure numpy —
    no per-pixel Python), return its variance. Blurry/near-constant
    images score low; the standard per-cluster quality signal to feed
    :func:`..dedup.canonical_per_cluster` so near-dup resolution keeps
    the SHARPEST copy. (asset_id, width, height, sharpness). Zero
    shuffles."""

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, buf in zip(
                pdf["asset_id"].tolist(), pdf["payload"].tolist()
            ):
                try:
                    if buf is None:
                        raise ValueError("NULL payload")
                    g = (
                        decode_image(bytes(buf))
                        .astype(np.int64)
                        .sum(axis=2)
                        .astype(np.float64)
                    )
                    h, w = g.shape
                    if h < 3 or w < 3:
                        lap_var = 0.0
                    else:
                        lap = (
                            4.0 * g[1:-1, 1:-1]
                            - g[:-2, 1:-1]
                            - g[2:, 1:-1]
                            - g[1:-1, :-2]
                            - g[1:-1, 2:]
                        )
                        lap_var = float(lap.var())
                    out.append((aid, w, h, lap_var, None))
                except Exception as exc:  # noqa: BLE001 — decode boundary
                    out.append(
                        (aid, None, None, None, str(exc)[:200])
                    )
            yield pd.DataFrame(
                out,
                columns=["asset_id", "width", "height", "sharpness",
                         "decode_error"],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        score,
        "asset_id long, width int, height int, sharpness double, "
        "decode_error string",
    )


def sig_from_halves(df: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Reassemble a 64-bit perceptual signature from its BIGINT-safe
    32-bit halves (``hash_hi``/``hash_lo``), dropping decode failures —
    the shared glue between every signature kernel (image dHash, audio
    fingerprint, video frame dHash) and
    :func:`hamming_near_dup_pairs`. Returns (id_col, sig)."""
    return df.where(F.col("decode_error").isNull()).select(
        id_col,
        (
            F.shiftleft(F.col("hash_hi"), 32).bitwiseOR(F.col("hash_lo"))
        ).alias("sig"),
    )


def hamming_near_dup_pairs(
    signatures: DataFrame,
    max_hamming: int = 6,
    bands: int = 8,
    id_col: str = "asset_id",
    sig_col: str = "sig",
) -> DataFrame:
    """Generic 64-bit-signature near-duplicate pairing (the SimHash
    pigeonhole recipe as a reusable operator): split each signature
    into ``bands`` chunks — any pair within ``max_hamming`` bit flips
    shares at least one identical chunk when ``bands > max_hamming`` —
    bucket-join on (band_idx, chunk), then verify the exact Hamming
    distance JVM-side (``bit_count`` of the XOR). Shuffles signature
    rows × bands (8-byte keys), NEVER the n²/2 pair space; verify
    touches candidates only. Used by the image dHash and audio
    fingerprint dedup paths; any 64-bit perceptual signature plugs in.
    Returns (asset_a, asset_b, hamming) with a < b."""
    if bands <= max_hamming:
        raise ValueError(
            f"pigeonhole needs bands > max_hamming ({bands} <= {max_hamming})"
        )
    width = 64 // bands
    mask = (1 << width) - 1
    hashed = signatures.select(
        F.col(id_col).alias("asset_id"), F.col(sig_col).alias("sig")
    )
    banded = hashed.select(
        "asset_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sig"), b * width)
                    .bitwiseAND(F.lit(mask))
                    for b in range(bands)
                ]
            )
        ).alias("band", "chunk"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("asset_a"),
            F.col("b.asset_id").alias("asset_b"),
            F.bit_count(
                F.col("a.sig").bitwiseXOR(F.col("b.sig"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def image_near_dup_pairs(
    assets: DataFrame,
    max_hamming: int = 6,
    bands: int = 8,
    method: str = "dhash",
) -> DataFrame:
    """Image near-duplicate candidate pairs: dHash (fast, gradient
    signature) or pHash (DCT low-frequency signature — robust to
    brightness/contrast and low-frequency edits) through the REAL
    decode path, paired by :func:`hamming_near_dup_pairs`."""
    if method == "dhash":
        sigs = sig_from_halves(dhash_images(assets))
    elif method == "phash":
        sigs = sig_from_halves(phash_images(assets))
    else:
        raise ValueError(f"unknown method {method!r} (dhash | phash)")
    return hamming_near_dup_pairs(sigs, max_hamming, bands)


def _synthetic_pixels(i: int) -> np.ndarray:
    """Deterministic synthetic image for id ``i``: dims w = 4 + i % 5,
    h = 3 + i % 4; channel values are fixed affine functions of
    (id, row, col) mod 256 — so pixel sums are reproducible in ANSI SQL
    and decode paths are oracle-adjudicable."""
    w, h = 4 + i % 5, 3 + i % 4
    r_idx = np.arange(h, dtype=np.int64)[:, None]
    c_idx = np.arange(w, dtype=np.int64)[None, :]
    return np.stack(
        [
            (i + 11 * r_idx + 13 * c_idx) % 256,  # R
            (i + 5 * r_idx + 7 * c_idx) % 256,  # G
            (i + 2 * r_idx + 3 * c_idx) % 256,  # B
        ],
        axis=2,
    ).astype(np.uint8)


def _synthesize_assets(ids: DataFrame, id_col: str, encoder) -> DataFrame:
    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                (i, encoder(_synthetic_pixels(i)))
                for i in pdf[id_col].tolist()
            ]
            yield pd.DataFrame(out, columns=["asset_id", "payload"])

    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        synth, "asset_id long, payload binary"
    )


def synthesize_bmp_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Deterministic synthetic BMP per id (see :func:`_synthetic_pixels`
    for the oracle-reproducible pixel formula). Encoding runs through the
    real :func:`encode_bmp`."""
    return _synthesize_assets(ids, id_col, encode_bmp)


def synthesize_png_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Deterministic synthetic PNG per id — same pixel formula as the BMP
    synth, encoded through the real :func:`encode_png` (zlib-compressed),
    so the compressed-format decode rung is exercised end-to-end with
    oracle-recomputable pixel sums."""
    return _synthesize_assets(ids, id_col, encode_png)


def synthesize_jpeg_assets(
    ids: DataFrame, id_col: str = "asset_id", quality: int = 92
) -> DataFrame:
    """Deterministic synthetic baseline JPEG per id — same pixel formula,
    encoded through the real :func:`operators.jpeg.encode_jpeg`
    (DCT + Huffman), so the LOSSY web-corpus rung is exercised
    end-to-end. Unlike BMP/PNG the decoded pixels differ from the
    source by bounded quantization error, never exactly."""
    from .jpeg import encode_jpeg

    return _synthesize_assets(
        ids, id_col, lambda px: encode_jpeg(px, quality=quality)
    )


def synthesize_exif_jpeg_assets(
    ids: DataFrame, id_col: str = "asset_id"
) -> DataFrame:
    """Synthetic JPEGs with a REAL EXIF APP1 injected (orientation
    1 + id % 8; GPS lat (id % 90) + 0.5, lon −((id % 180) + 0.25) —
    values whose degree/minute encoding round-trips EXACTLY in float,
    so the oracle can assert the decoded coordinates to the digit)."""
    from .jpeg import build_exif_app1, encode_jpeg

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col].tolist():
                base = encode_jpeg(_synthetic_pixels(i), quality=92)
                app1 = build_exif_app1(
                    orientation=1 + i % 8,
                    gps=((i % 90) + 0.5, -((i % 180) + 0.25)),
                )
                payloads.append(base[:2] + app1 + base[2:])
            yield pd.DataFrame(
                {"asset_id": pdf[id_col], "payload": payloads}
            )

    return ids.select(id_col).mapInPandas(
        synth, f"{id_col} long, payload binary"
    )


def fake_decode_features(docs: DataFrame, n_features: int = 16) -> DataFrame:
    """Deterministic stand-in decoder: byte histogram (n_features buckets,
    L1-normalized) + byte entropy per asset. Exercises the exact plumbing
    a real decoder uses (binary in Arrow batches → numpy → feature array
    column); only the kernel body changes on a real cluster."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, mt, buf in zip(
                pdf["asset_id"].tolist(),
                pdf["media_type"].tolist(),
                pdf["payload"].tolist(),
            ):
                if buf is None or len(buf) == 0:
                    rows.append(
                        (aid, mt, 0, 0.0,
                         np.zeros(n_features, dtype=np.float32))
                    )
                    continue
                arr = np.frombuffer(buf, dtype=np.uint8)
                hist = np.bincount(arr >> 4 if n_features == 16 else arr % n_features,
                                   minlength=n_features).astype(np.float64)
                probs = hist / hist.sum()
                nz = probs[probs > 0]
                entropy = float(-(nz * np.log2(nz)).sum())
                rows.append(
                    (
                        aid,
                        mt,
                        int(len(arr)),
                        round(entropy, 6),
                        (hist / hist.sum()).astype(np.float32),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "media_type", "n_bytes", "byte_entropy", "features",
                ],
            )

    return docs.select(
        "asset_id", "media_type", "payload"
    ).mapInPandas(extract, FEATURE_SCHEMA)


def frame_sample(assets: DataFrame, frame_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """'Video' frame sampling over the opaque payload: split the binary
    into fixed-size chunks and emit up to max_frames evenly-spaced
    (asset_id, frame_idx, frame payload) rows — the partition/explode
    shape of a real frame sampler, with byte-slicing standing in for
    actual video decode."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, buf in zip(
                pdf["asset_id"].tolist(), pdf["payload"].tolist()
            ):
                buf = buf or b""
                n_frames = max(len(buf) // frame_bytes, 1)
                step = max(n_frames // max_frames, 1)
                for i, f in enumerate(range(0, n_frames, step)[:max_frames]):
                    out.append(
                        (aid, i, buf[f * frame_bytes : (f + 1) * frame_bytes])
                    )
            yield pd.DataFrame(out, columns=["asset_id", "frame_idx", "frame"])

    return assets.select("asset_id", "payload").mapInPandas(
        sample, "asset_id long, frame_idx int, frame binary"
    )


def resize_images(
    assets: DataFrame, target_w: int = 64, target_h: int = 64
) -> DataFrame:
    """Image resize kernel: (asset_id, width, height, payload) with the
    payload re-encoded at target dimensions.

    Rungs, best-first per row:

    - payloads the stdlib codecs decode (24-bit BMP, 8-bit PNG) get a
      REAL nearest-neighbor resample (index-map in numpy — the
      deterministic resampling a GPU/vision pipeline would replace with
      area/bilinear kernels) and re-encode through the stdlib PNG
      encoder — executes in this codec-less container;
    - other decodable images via PIL when importable (`Image.resize`,
      PNG re-encode);
    - non-image payloads fall back per-row to a deterministic
      byte-stride downsample — payload strided to exactly
      target_w*target_h bytes (cycled when the source is smaller) — so
      the Spark plumbing (binary in/out through Arrow, metadata column
      rewrite, per-partition batching) is identical to production and
      fully testable on any host.
    """
    pillow = _try_import_pillow()

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = target_w * target_h
        for pdf in batches:
            out = []
            for aid, buf in zip(
                pdf["asset_id"].tolist(), pdf["payload"].tolist()
            ):
                buf = buf or b""
                resized = None
                if len(buf) > 0 and (
                    buf[:2] == b"BM" or bytes(buf[:8]) == _PNG_SIG
                ):
                    try:
                        px = (
                            decode_bmp(bytes(buf))
                            if buf[:2] == b"BM"
                            else decode_png(bytes(buf))
                        )
                        h, w = px.shape[:2]
                        if px.shape[2] < 3:  # gray / gray+alpha → RGB
                            px = np.repeat(px[:, :, :1], 3, axis=2)
                        elif px.shape[2] > 3:  # RGBA → drop alpha
                            px = px[:, :, :3]
                        ri = (np.arange(target_h) * h) // target_h
                        ci = (np.arange(target_w) * w) // target_w
                        resized = encode_png(
                            np.ascontiguousarray(px[ri][:, ci])
                        )
                    except ValueError:
                        resized = None  # unsupported variant → next rung
                if resized is None and pillow is not None and len(buf) > 0:
                    import io as _io

                    try:
                        img = pillow.open(_io.BytesIO(buf)).resize(
                            (target_w, target_h)
                        )
                        sink = _io.BytesIO()
                        img.save(sink, format="PNG")
                        resized = sink.getvalue()
                    except Exception:
                        resized = None  # not an image — stride fallback
                if resized is not None:
                    pass
                elif len(buf) == 0:
                    resized = b"\x00" * n_out
                else:
                    arr = np.frombuffer(buf, dtype=np.uint8)
                    idx = (np.arange(n_out) * len(arr) // n_out) % len(arr)
                    resized = arr[idx].tobytes()
                out.append((aid, target_w, target_h, resized))
            yield pd.DataFrame(
                out, columns=["asset_id", "width", "height", "payload"]
            )

    return assets.select("asset_id", "payload").mapInPandas(
        resize, "asset_id long, width int, height int, payload binary"
    )


def documents_as_assets(documents: DataFrame) -> DataFrame:
    """Adaptor: treat the documents fixture's text bytes as opaque media
    payloads so the multimodal plumbing is testable on driver data."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.lit(None).cast("string").alias("codec"),
    )
