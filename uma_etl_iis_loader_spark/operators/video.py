"""Video column operators: AVI payloads as opaque ``binary`` columns,
parsed and frame-decoded through Arrow-batched ``mapInPandas`` kernels —
the video face of the multimodal story (images: ``operators/multimodal``;
audio: ``operators/audio``; lossy codec: ``operators/jpeg``).

Like RIFF/WAVE, the AVI container is pure byte layout (public spec:
RIFF 'AVI ' → LIST hdrl (avih, strl) → LIST movi ('00db' uncompressed
DIB / '00dc' compressed frames)), so REAL container parsing and REAL
frame decode run in this codec-less container:

- uncompressed '00db' frames are bottom-up padded BGR DIBs — decoded by
  vectorized numpy slicing (same layout as the BMP pixel array,
  `multimodal.decode_bmp`);
- MJPEG '00dc' frames are baseline JPEGs — decoded by the stdlib
  Huffman+IDCT codec (`operators/jpeg`).

Per-frame pixel sums, dimensions, and frame byte sizes are recomputable
in ANSI SQL from the deterministic synthesis formulas, so the video
pipeline is oracle-adjudicated end-to-end like the image and audio
rungs.

Scale notes: all kernels are embarrassingly parallel (zero shuffles);
frame fan-out multiplies row counts by frames-per-asset, so downstream
ops see an exploded but still narrow frame table. Swap the synthesis
for an object-store read and the MJPEG rung for an ffmpeg kernel on a
real cluster; the container walk, per-row error isolation, and frame
table schema are what this module pins.

Cite: the reference has no media path (`iis_etl/` is relational ETL);
this module is extension surface (SURVEY.md §6) — the video column
family a multimodal training-data pipeline needs.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .multimodal import decode_image, encode_bmp

_RIFF = b"RIFF"
_LIST = b"LIST"


def _dib_bytes(pixels: np.ndarray) -> bytes:
    """Pack an (h, w, 3) uint8 RGB array as raw uncompressed DIB pixel
    data: bottom-up rows, BGR channel order, rows padded to 4 bytes —
    the '00db' frame payload per the AVI/DIB spec (same layout as the
    BMP pixel array, minus headers)."""
    h, w = pixels.shape[:2]
    row_size = ((3 * w + 3) // 4) * 4
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : 3 * w] = pixels[::-1, :, ::-1].reshape(h, 3 * w)
    return rows.tobytes()


def _decode_dib(data: bytes, w: int, h: int) -> np.ndarray:
    """Decode raw uncompressed 24-bit DIB pixel data (inverse of
    :func:`_dib_bytes`) to an (h, w, 3) uint8 RGB array — vectorized
    numpy slicing, no per-pixel Python."""
    row_size = ((3 * w + 3) // 4) * 4
    if len(data) < row_size * h:
        raise ValueError("truncated DIB frame")
    rows = np.frombuffer(data, dtype=np.uint8, count=row_size * h).reshape(
        h, row_size
    )
    return rows[:, : 3 * w].reshape(h, w, 3)[::-1, :, ::-1].copy()


def _chunk(cid: bytes, body: bytes) -> bytes:
    return struct.pack("<4sI", cid, len(body)) + body + (b"\x00" * (len(body) & 1))


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(_LIST, ltype + body)


def encode_avi(
    frames: list[np.ndarray],
    fps: int = 10,
    codec: str = "DIB ",
    frame_encoder=None,
) -> bytes:
    """Encode a list of (h, w, 3) uint8 RGB frames as a spec-shaped AVI:
    RIFF 'AVI ' → LIST hdrl (avih MainAVIHeader + LIST strl with
    strh/strf) → LIST movi with one '00db' (raw DIB) or '00dc'
    (compressed, e.g. MJPEG via ``frame_encoder``) chunk per frame.
    All frames must share dimensions (the AVI stream contract)."""
    if not frames:
        raise ValueError("empty frame list")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("AVI streams require uniform frame dimensions")
    n = len(frames)
    if frame_encoder is None:
        payloads = [_dib_bytes(f) for f in frames]
        fcc = b"00db"
    else:
        payloads = [frame_encoder(f) for f in frames]
        fcc = b"00dc"
    max_bytes = max(len(p) for p in payloads)
    us_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, max_bytes * fps, 0, 0x10, n, 0, 1, max_bytes, w, h,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids", codec.encode("ascii"), 0, 0, 0, 0, 1, fps, 0, n,
        max_bytes, 10_000, 0, 0, 0, w, h,
    )
    # BITMAPINFOHEADER: biCompression 0 = BI_RGB for DIB; fourcc for MJPG
    compression = 0 if frame_encoder is None else int.from_bytes(
        codec.encode("ascii"), "little"
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, compression, 3 * w * h, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(fcc, p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return struct.pack("<4sI", _RIFF, len(body)) + body


def decode_avi(payload: bytes) -> tuple[list[np.ndarray], dict]:
    """Parse an AVI payload: walk the RIFF tree (skipping unknown chunks
    per the spec), read dimensions/frame-count/rate from the avih
    MainAVIHeader, and decode every movi frame — '00db' raw DIB via
    numpy slicing, '00dc' via :func:`multimodal.decode_image` (stdlib
    baseline-JPEG rung for MJPEG; PIL when importable for other
    codecs). Interleaved files that group frame chunks inside
    ``LIST rec `` lists (the spec's interleaving construct) parse too.
    Returns (frames as (h, w, 3) uint8 RGB arrays, meta dict with
    width/height/n_frames/us_per_frame plus ``frame_bytes`` — the ACTUAL
    per-frame chunk sizes, which for compressed streams differ from the
    decoded size). Raises ``ValueError`` on malformed containers —
    corrupt media fails loudly at the decode boundary (caught per-row
    by the stats kernels)."""
    if len(payload) < 12 or payload[:4] != _RIFF or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    meta: dict = {}
    frames: list[np.ndarray] = []
    frame_bytes: list[int] = []

    def walk(buf: bytes, pos: int, end: int, in_movi: bool, depth: int) -> None:
        # spec nesting is shallow (RIFF > movi > rec = 3); the cap turns
        # an adversarial deeply-nested LIST chain into the contract's
        # ValueError instead of a RecursionError
        if depth > 16:
            raise ValueError("RIFF list nesting too deep")
        while pos + 8 <= end:
            cid, size = struct.unpack_from("<4sI", buf, pos)
            pos += 8
            if cid == _LIST and size >= 4:
                ltype = buf[pos : pos + 4]
                walk(
                    buf, pos + 4, min(pos + size, end),
                    ltype == b"movi" or (in_movi and ltype == b"rec "),
                    depth + 1,
                )
            elif cid == b"avih":
                if size < 40 or pos + 40 > end:
                    raise ValueError("truncated avih chunk")
                vals = struct.unpack_from("<10I", buf, pos)
                meta.update(
                    us_per_frame=vals[0], n_frames=vals[4],
                    width=vals[8], height=vals[9],
                )
            elif in_movi and cid[2:] in (b"db", b"dc"):
                if "width" not in meta:
                    raise ValueError("movi frame before avih header")
                data = buf[pos : pos + size]
                if len(data) < size:
                    raise ValueError("truncated frame chunk")
                if cid[2:] == b"db":
                    frames.append(
                        _decode_dib(data, meta["width"], meta["height"])
                    )
                else:
                    frames.append(decode_image(data))
                frame_bytes.append(len(data))
            pos += size + (size & 1)

    walk(payload, 12, len(payload), False, 0)
    if "width" not in meta:
        raise ValueError("missing avih header")
    meta["frame_bytes"] = frame_bytes
    return frames, meta


def decode_media(payload: bytes) -> dict:
    """Unified media dispatch: sniff the container magic and route to
    the real decoder — BMP/PNG/JPEG → :func:`multimodal.decode_image`
    (``{"kind": "image", "pixels": (h, w, c) uint8}``), RIFF/WAVE →
    :func:`audio.decode_wav` (``{"kind": "audio", "samples": (n, ch)
    int16, "sample_rate": int}``), RIFF/AVI → :func:`decode_avi`
    (``{"kind": "video", "frames": [...], "meta": {...}}``). Raises
    ``ValueError`` on unknown or malformed payloads — the single decode
    boundary a mixed-media ingest kernel needs."""
    from .multimodal import _PNG_SIG

    if len(payload) < 12:
        raise ValueError("payload too short to identify")
    if payload[:4] == _RIFF:
        form = payload[8:12]
        if form == b"WAVE":
            from .audio import decode_wav

            samples, rate = decode_wav(payload)
            return {"kind": "audio", "samples": samples, "sample_rate": rate}
        if form == b"AVI ":
            frames, meta = decode_avi(payload)
            return {"kind": "video", "frames": frames, "meta": meta}
        raise ValueError(f"unknown RIFF form {form!r}")
    if (
        payload[:2] == b"BM"
        or payload[:8] == _PNG_SIG
        or payload[:2] == b"\xff\xd8"
    ):
        return {"kind": "image", "pixels": decode_image(payload)}
    raise ValueError("unrecognized media container")


# ---------------------------------------------------------------------------
# deterministic synthesis (oracle-recomputable formulas)
# ---------------------------------------------------------------------------


def _synthetic_frame(i: int, f: int) -> np.ndarray:
    """Deterministic frame f of synthetic video i: dims w = 4 + i % 5,
    h = 3 + i % 4 (uniform across frames, per the AVI stream contract);
    channel values are fixed affine functions of (id, frame, row, col)
    mod 256 — the video analogue of :func:`multimodal._synthetic_pixels`,
    so per-frame pixel sums are reproducible in ANSI SQL."""
    w, h = 4 + i % 5, 3 + i % 4
    r = np.arange(h, dtype=np.int64)[:, None]
    c = np.arange(w, dtype=np.int64)[None, :]
    return np.stack(
        [
            (i + 7 * f + 11 * r + 13 * c) % 256,
            (i + 3 * f + 5 * r + 7 * c) % 256,
            (i + f + 2 * r + 3 * c) % 256,
        ],
        axis=2,
    ).astype(np.uint8)


def synthetic_frame_count(i: int) -> int:
    """Frames in synthetic video i: 2 + i % 4 (oracle: ``2 + id % 4``)."""
    return 2 + i % 4


def _synthesize_avi(ids: DataFrame, id_col: str, frame_encoder) -> DataFrame:
    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i in pdf[id_col].tolist():
                frames = [
                    _synthetic_frame(i, f)
                    for f in range(synthetic_frame_count(i))
                ]
                if frame_encoder is None:
                    payload = encode_avi(frames)
                else:
                    payload = encode_avi(
                        frames, codec="MJPG", frame_encoder=frame_encoder
                    )
                out.append((i, payload))
            yield pd.DataFrame(out, columns=["asset_id", "payload"])

    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        synth, "asset_id long, payload binary"
    )


def synthesize_avi_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Deterministic uncompressed-DIB AVI per id (see
    :func:`_synthetic_frame` for the oracle-reproducible formula),
    written through the real :func:`encode_avi`."""
    return _synthesize_avi(ids, id_col, None)


def synthesize_mjpeg_assets(
    ids: DataFrame, id_col: str = "asset_id", quality: int = 92
) -> DataFrame:
    """Deterministic MJPEG AVI per id — same frame formula, each frame
    encoded through the real stdlib baseline-JPEG codec
    (:func:`operators.jpeg.encode_jpeg`), so the compressed video rung
    is exercised end-to-end with bounded-error pixel sums."""
    from .jpeg import encode_jpeg

    return _synthesize_avi(
        ids, id_col, lambda px: encode_jpeg(px, quality=quality)
    )


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

_FRAME_STATS_DDL = (
    "asset_id long, frame_idx int, width int, height int, n_frames int, "
    "frame_bytes int, pixel_sum long, decode_error string"
)


def video_frame_stats(assets: DataFrame) -> DataFrame:
    """REAL per-frame statistics through the actual container parser and
    frame decoders: each payload goes through :func:`decode_avi` and
    emits one row per frame with (width, height, n_frames, frame_bytes —
    the frame's ACTUAL chunk size: decoded DIB bytes for '00db', the
    compressed JPEG length for '00dc', pixel_sum). Failed parses
    surface one ``decode_error`` row per asset
    instead of failing the task. Arrow-batched mapInPandas, zero
    shuffles; the frame fan-out happens inside the kernel (rows out =
    Σ frames), keeping the container bytes off the shuffle path."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, buf in zip(
                pdf["asset_id"].tolist(), pdf["payload"].tolist()
            ):
                try:
                    if buf is None:
                        raise ValueError("NULL payload")
                    frames, meta = decode_avi(bytes(buf))
                    for fi, px in enumerate(frames):
                        out.append(
                            (
                                aid, fi,
                                int(px.shape[1]), int(px.shape[0]),
                                len(frames), meta["frame_bytes"][fi],
                                int(px.astype(np.int64).sum()), None,
                            )
                        )
                except Exception as exc:  # noqa: BLE001 — decode boundary
                    out.append(
                        (aid, None, None, None, None, None, None,
                         str(exc)[:200])
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id", "frame_idx", "width", "height", "n_frames",
                    "frame_bytes", "pixel_sum", "decode_error",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        stats, _FRAME_STATS_DDL
    )


def synthesize_mixed_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Deterministic MIXED-media corpus: id % 3 picks the container —
    0 → BMP (multimodal's pixel formula), 1 → WAV (audio's sample
    formula), 2 → uncompressed AVI (this module's frame formula) — all
    encoded through the real codecs, so the dispatch path is
    oracle-adjudicable end-to-end from the three synthesis formulas."""
    from .audio import _synthetic_samples, encode_wav
    from .multimodal import _synthetic_pixels

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i in pdf[id_col].tolist():
                if i % 3 == 0:
                    payload = encode_bmp(_synthetic_pixels(i))
                elif i % 3 == 1:
                    payload = encode_wav(*_synthetic_samples(i))
                else:
                    payload = encode_avi(
                        [
                            _synthetic_frame(i, f)
                            for f in range(synthetic_frame_count(i))
                        ]
                    )
                out.append((i, payload))
            yield pd.DataFrame(out, columns=["asset_id", "payload"])

    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        synth, "asset_id long, payload binary"
    )


def media_ingest_stats(assets: DataFrame) -> DataFrame:
    """Unified mixed-media ingest: ONE pass over heterogeneous binary
    payloads, each sniffed and decoded by :func:`decode_media`, reduced
    to a kind-tagged feature row — (kind, n_units, metric_sum) where
    n_units/metric_sum are pixels/pixel-sum for images, samples/
    sample-sum for audio, frames/total-pixel-sum for video. The ingest
    shape a mixed crawl actually needs: no per-format pre-partitioning,
    per-row error isolation, zero shuffles."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, buf in zip(
                pdf["asset_id"].tolist(), pdf["payload"].tolist()
            ):
                try:
                    if buf is None:
                        raise ValueError("NULL payload")
                    m = decode_media(bytes(buf))
                    if m["kind"] == "image":
                        px = m["pixels"]
                        n_units = int(px.shape[0] * px.shape[1])
                        metric = int(px.astype(np.int64).sum())
                    elif m["kind"] == "audio":
                        n_units = int(m["samples"].shape[0])
                        metric = int(m["samples"].astype(np.int64).sum())
                    else:
                        n_units = len(m["frames"])
                        metric = int(
                            sum(
                                f.astype(np.int64).sum()
                                for f in m["frames"]
                            )
                        )
                    out.append((aid, m["kind"], n_units, metric, None))
                except Exception as exc:  # noqa: BLE001 — decode boundary
                    out.append(
                        (aid, None, None, None, str(exc)[:200])
                    )
            yield pd.DataFrame(
                out,
                columns=["asset_id", "kind", "n_units", "metric_sum",
                         "decode_error"],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        stats,
        "asset_id long, kind string, n_units int, metric_sum long, "
        "decode_error string",
    )


def video_near_dup_pairs(
    assets: DataFrame,
    max_hamming: int = 6,
    min_matching_frames: int = 2,
    max_frames: int = 4,
) -> DataFrame:
    """Video near-duplicate candidate pairs — a pure composition of the
    existing perceptual-dedup operators: sample up to ``max_frames``
    evenly-spaced REAL frames per clip (:func:`sample_video_frames`),
    dHash each frame (`multimodal.dhash_images`), pair frames by the
    shared pigeonhole operator (`multimodal.hamming_near_dup_pairs`),
    then lift frame pairs to clip pairs that share at least
    ``min_matching_frames`` near-duplicate frames. Frame keys pack as
    clip_id·64 + sample_idx — the DENSE sample ordinal, which is
    < max_frames ≤ 64 by construction (the original ``frame_idx`` can
    be arbitrarily large and would collide across clips) — so the whole
    path reuses the 64-bit-signature machinery unchanged.

    ``n_matching_frames`` counts DISTINCT matched frames on the less-
    covered side (min of the two per-side distinct counts), not raw
    frame pairs — a static clip whose every frame matches one frame of
    another clip shares ONE frame, not four. Returns
    (asset_a, asset_b, n_matching_frames, min_hamming) with a < b."""
    from .multimodal import (
        dhash_images,
        hamming_near_dup_pairs,
        sig_from_halves,
    )

    if max_frames > 64:
        raise ValueError("max_frames must be <= 64 (frame-key packing)")
    frames = sample_video_frames(assets, max_frames=max_frames).where(
        F.col("decode_error").isNull()
    )
    keyed = frames.select(
        (F.col("asset_id") * 64 + F.col("sample_idx")).alias("asset_id"),
        F.col("image_payload").alias("payload"),
    )
    sigs = sig_from_halves(dhash_images(keyed))
    frame_pairs = hamming_near_dup_pairs(sigs, max_hamming)
    return (
        frame_pairs.select(
            F.expr("asset_a div 64").alias("clip_a"),  # exact long division
            F.expr("asset_b div 64").alias("clip_b"),
            (F.col("asset_a") % 64).alias("frame_a"),
            (F.col("asset_b") % 64).alias("frame_b"),
            "hamming",
        )
        .where(F.col("clip_a") < F.col("clip_b"))
        .groupBy("clip_a", "clip_b")
        .agg(
            F.least(
                F.countDistinct("frame_a"), F.countDistinct("frame_b")
            ).alias("n_matching_frames"),
            F.min("hamming").alias("min_hamming"),
        )
        .where(F.col("n_matching_frames") >= min_matching_frames)
        .select(
            F.col("clip_a").alias("asset_a"),
            F.col("clip_b").alias("asset_b"),
            "n_matching_frames",
            "min_hamming",
        )
    )


def _scene_deltas(
    frames: list[np.ndarray], threshold: float
) -> list[tuple[int, float]]:
    """Shared cut detector for the two scene kernels: mean absolute
    per-pixel delta between consecutive frames, normalized to [0, 1];
    returns (frame_idx, delta) for every frame whose delta from its
    predecessor exceeds ``threshold``. Diffs one pair at a time — no
    whole-clip pixel materialization."""
    cuts = []
    prev = None
    for fi, f in enumerate(frames):
        cur = f.astype(np.int16)
        if prev is not None:
            delta = float(np.abs(cur - prev).mean() / 255.0)
            if delta > threshold:
                cuts.append((fi, delta))
        prev = cur
    return cuts


def detect_scene_cuts(
    assets: DataFrame, threshold: float = 0.3
) -> DataFrame:
    """Scene-cut detection (the public frame-difference baseline):
    decode every frame, compute the mean absolute per-pixel delta
    between consecutive frames normalized to [0, 1], and emit one row
    per cut where the delta exceeds ``threshold`` — the segmentation a
    video pipeline runs before sampling keyframes per SCENE instead of
    per fixed stride. (asset_id, cut_idx, frame_idx, delta); clips with
    no cut emit nothing, decode failures one error row. Frames diff one
    pair at a time — no whole-clip pixel materialization. Zero
    shuffles."""

    def cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, buf in zip(
                pdf["asset_id"].tolist(), pdf["payload"].tolist()
            ):
                try:
                    if buf is None:
                        raise ValueError("NULL payload")
                    frames, _meta = decode_avi(bytes(buf))
                    for cut_idx, (fi, delta) in enumerate(
                        _scene_deltas(frames, threshold)
                    ):
                        out.append(
                            (aid, cut_idx, fi, delta, None)
                        )
                except Exception as exc:  # noqa: BLE001 — decode boundary
                    out.append(
                        (aid, None, None, None, str(exc)[:200])
                    )
            yield pd.DataFrame(
                out,
                columns=["asset_id", "cut_idx", "frame_idx", "delta",
                         "decode_error"],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        cuts,
        "asset_id long, cut_idx int, frame_idx int, delta double, "
        "decode_error string",
    )


def sample_keyframes_per_scene(
    assets: DataFrame, threshold: float = 0.3, max_frames: int = 64
) -> DataFrame:
    """Scene-aware keyframe extraction — the composition
    :func:`detect_scene_cuts` exists for: segment each clip at its
    cuts, emit the MIDDLE frame of every scene as a standalone BMP
    payload (one representative per scene beats a fixed stride, which
    over-samples static scenes and skips short ones). Single decode
    pass per clip — cuts and keyframes in one kernel, not a join of
    two decodes. (asset_id, scene_idx, frame_idx, image_payload);
    ``max_frames`` caps pathological cut storms. Zero shuffles."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, buf in zip(
                pdf["asset_id"].tolist(), pdf["payload"].tolist()
            ):
                try:
                    if buf is None:
                        raise ValueError("NULL payload")
                    frames, _meta = decode_avi(bytes(buf))
                    bounds = (
                        [0]
                        + [fi for fi, _ in _scene_deltas(frames, threshold)]
                        + [len(frames)]
                    )
                    for si in range(min(len(bounds) - 1, max_frames)):
                        lo, hi = bounds[si], bounds[si + 1]
                        if hi <= lo:
                            continue
                        mid = (lo + hi - 1) // 2
                        out.append(
                            (aid, si, mid,
                             encode_bmp(frames[mid]), None)
                        )
                except Exception as exc:  # noqa: BLE001 — decode boundary
                    out.append(
                        (aid, None, None, None, str(exc)[:200])
                    )
            yield pd.DataFrame(
                out,
                columns=["asset_id", "scene_idx", "frame_idx",
                         "image_payload", "decode_error"],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        sample,
        "asset_id long, scene_idx int, frame_idx int, "
        "image_payload binary, decode_error string",
    )


def sample_video_frames(
    assets: DataFrame, max_frames: int = 4
) -> DataFrame:
    """Extract up to ``max_frames`` evenly-spaced REAL frames per video
    and re-encode each as a standalone BMP image payload — the
    video → image handoff (sampled frames feed the image feature /
    resize / dedup pipeline downstream). Sampling positions follow the
    same stride contract as :func:`multimodal.frame_sample`
    (step = max(n // max_frames, 1), capped) so coverage is
    deterministic. Emits both the original in-clip ``frame_idx`` and
    the dense sample ordinal ``sample_idx`` (0..max_frames−1 — the
    bounded key downstream packers should use). Zero shuffles."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, buf in zip(
                pdf["asset_id"].tolist(), pdf["payload"].tolist()
            ):
                try:
                    if buf is None:
                        raise ValueError("NULL payload")
                    frames, _meta = decode_avi(bytes(buf))
                    n = len(frames)
                    step = max(n // max_frames, 1)
                    picked = list(range(0, n, step))[:max_frames]
                    for si, fi in enumerate(picked):
                        out.append(
                            (aid, fi, si,
                             encode_bmp(frames[fi]), None)
                        )
                except Exception as exc:  # noqa: BLE001 — decode boundary
                    out.append((aid, None, None, None,
                                str(exc)[:200]))
            yield pd.DataFrame(
                out,
                columns=["asset_id", "frame_idx", "sample_idx",
                         "image_payload", "decode_error"],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        sample,
        "asset_id long, frame_idx int, sample_idx int, "
        "image_payload binary, decode_error string",
    )
