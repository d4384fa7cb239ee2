"""Audio column operators: WAV payloads as opaque ``binary`` columns
decoded, analyzed, and resampled through Arrow-batched ``mapInPandas``
kernels — the audio face of the multimodal story (images:
``operators/multimodal``; lossy codec: ``operators/jpeg``).

Unlike image formats, uncompressed audio needs no codec library at all:
RIFF/WAVE PCM is pure byte layout (public file-format spec), so the REAL
decode rung — header walk, ``np.frombuffer`` sample view, channel
de-interleave — runs in this codec-less container and is
oracle-adjudicated end-to-end (sample sums, byte sizes, FFT dominant
bins, and resample endpoints are all recomputable in ANSI SQL from the
deterministic synthesis formulas).

Scale notes: every kernel here is embarrassingly parallel — binary
payloads ride in Arrow record batches, decode/FFT/resample are per-row
numpy (vectorized over samples, never per-sample Python), zero shuffles
in this module. Swap the synthesis for an object-store read and the
rungs for ffmpeg/torchaudio kernels on a real cluster; the Spark-side
plumbing (schema, batching, per-row error isolation) is what this
module pins.

Cite: the reference has no audio path (`iis_etl/` is relational ETL);
this module is extension surface — the multimodal column family a
training-data pipeline needs (SURVEY.md §6).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RIFF = b"RIFF"
_WAVE = b"WAVE"

# canonical header emitted by encode_wav: RIFF(12) + fmt(8+16) + data(8)
WAV_HEADER_BYTES = 44


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode an (n,) or (n, channels) int16 array as a canonical
    RIFF/WAVE PCM file — 44-byte header + little-endian interleaved
    samples, per the public WAVE spec. Pure byte packing (stdlib
    ``struct`` + numpy), mirroring :func:`multimodal.encode_bmp`."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"samples must be (n,) or (n, ch), got {arr.shape}")
    n, ch = arr.shape
    data = arr.tobytes()  # C-order == channel-interleaved frames
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16
    )
    hdr = struct.pack("<4sI4s", _RIFF, 4 + len(fmt) + 8 + len(data), _WAVE)
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE PCM payload to ((n, channels) int16 array,
    sample_rate). A real chunk walk — unknown chunks (LIST, fact, cue)
    are skipped per the spec, so files from arbitrary encoders parse,
    not just :func:`encode_wav`'s canonical layout. 16-bit PCM
    (format 1) and 8-bit unsigned PCM (widened to int16) are supported;
    anything else raises ``ValueError`` (caught per-row by the stats
    kernels — error isolation, same contract as the image rungs)."""
    if len(payload) < 12 or payload[:4] != _RIFF or payload[8:12] != _WAVE:
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    ch = rate = bits = None
    data = None
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        if cid == b"fmt ":
            if size < 16 or pos + 16 > end:
                raise ValueError("truncated fmt chunk")
            fmt_tag, ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", payload, pos
            )
            if fmt_tag != 1:
                raise ValueError(f"unsupported WAVE format tag {fmt_tag}")
            if ch == 0 or ch > 64 or rate == 0:
                raise ValueError(
                    f"malformed fmt chunk (channels={ch}, rate={rate})"
                )
        elif cid == b"data":
            data = payload[pos : pos + size]
            if len(data) < size:
                raise ValueError("truncated data chunk")
        # chunks are word-aligned: odd sizes carry a pad byte
        pos += size + (size & 1)
    if ch is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if bits == 16:
        flat = np.frombuffer(data, dtype="<i2")
    elif bits == 8:
        # 8-bit WAVE is unsigned with 128 bias, per the spec
        flat = np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    n = len(flat) // ch
    return flat[: n * ch].reshape(n, ch).astype(np.int16), int(rate)


# ---------------------------------------------------------------------------
# deterministic synthesis (oracle-recomputable formulas)
# ---------------------------------------------------------------------------


def _synthetic_samples(i: int) -> tuple[np.ndarray, int]:
    """Deterministic mono signal for id ``i``: n = 50 + i % 60 samples of
    x[k] = (i*31 + k*17) % 4001 - 2000 at rate 8000 + (i % 3)*4000 Hz —
    fixed modular arithmetic, so sample sums, byte sizes, and resample
    endpoints are reproducible in ANSI SQL (the audio analogue of
    :func:`multimodal._synthetic_pixels`)."""
    n = 50 + i % 60
    k = np.arange(n, dtype=np.int64)
    x = (i * 31 + k * 17) % 4001 - 2000
    return x.astype(np.int16), 8000 + (i % 3) * 4000


def _synthetic_tone(i: int, n: int = 64, rate: int = 16000) -> tuple[np.ndarray, int, int]:
    """Pure tone for id ``i``: an integer number of periods b = 1 + i % 16
    across n = 64 samples, amplitude 12000. The rFFT of an
    integer-period tone concentrates all non-DC energy in bin b, so the
    spectral argmax is EXACTLY b — int16 quantization noise is broadband
    and ~80 dB below the peak, so the oracle can assert the dominant bin
    from the construction parameter alone."""
    b = 1 + i % 16
    k = np.arange(n)
    x = np.round(12000.0 * np.sin(2.0 * np.pi * b * k / n)).astype(np.int16)
    return x, rate, b


def _synthesize_wav(ids: DataFrame, id_col: str, gen) -> DataFrame:
    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i in pdf[id_col].tolist():
                x, rate = gen(i)[:2]
                out.append((i, encode_wav(x, rate)))
            yield pd.DataFrame(out, columns=["asset_id", "payload"])

    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        synth, "asset_id long, payload binary"
    )


def synthesize_wav_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Deterministic synthetic WAV per id (modular-arithmetic samples,
    see :func:`_synthetic_samples`), encoded through the real
    :func:`encode_wav`."""
    return _synthesize_wav(ids, id_col, _synthetic_samples)


def synthesize_tone_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Deterministic pure-tone WAV per id (integer-period sine, see
    :func:`_synthetic_tone`) for spectral-path adjudication."""
    return _synthesize_wav(ids, id_col, _synthetic_tone)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def wav_sample_stats(assets: DataFrame) -> DataFrame:
    """REAL sample statistics through the actual decoder: each payload is
    parsed with :func:`decode_wav` and reduced to (n_samples, n_channels,
    sample_rate, n_bytes, sample_sum, duration_ms). Failed decodes
    surface ``decode_error`` instead of failing the task (per-row error
    isolation). Arrow-batched mapInPandas, zero shuffles."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, buf in zip(
                pdf["asset_id"].tolist(), pdf["payload"].tolist()
            ):
                n_bytes = 0 if buf is None else int(len(buf))
                try:
                    if buf is None:
                        raise ValueError("NULL payload")
                    x, rate = decode_wav(bytes(buf))
                    n = int(x.shape[0])
                    out.append(
                        (
                            aid, n, int(x.shape[1]), rate, n_bytes,
                            int(x.astype(np.int64).sum()),
                            int(1000 * n // rate) if rate else None, None,
                        )
                    )
                except Exception as exc:  # noqa: BLE001 — decode boundary
                    out.append(
                        (aid, None, None, None, n_bytes, None,
                         None, str(exc)[:200])
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id", "n_samples", "n_channels", "sample_rate",
                    "n_bytes", "sample_sum", "duration_ms", "decode_error",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        stats,
        "asset_id long, n_samples int, n_channels int, sample_rate int, "
        "n_bytes int, sample_sum long, duration_ms int, decode_error string",
    )


def audio_spectral_features(assets: DataFrame, n_bands: int = 8) -> DataFrame:
    """Spectral features through the real decode + FFT path: per payload,
    decode, mix channels to mono (mean), rFFT, and emit the dominant
    non-DC bin, spectral centroid (Hz), per-band log-energies (n_bands
    equal slices of the magnitude spectrum — the mel-free analogue; swap
    in a mel filterbank kernel on a real cluster), and a Parseval
    consistency boolean: sum of squared FFT magnitudes (DC/Nyquist
    weighted once, interior bins twice) must equal N · Σx² to 1e-6
    relative — a broken transform, window, or de-interleave blows it.
    Vectorized numpy per row, zero shuffles."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, buf in zip(
                pdf["asset_id"].tolist(), pdf["payload"].tolist()
            ):
                try:
                    if buf is None:
                        raise ValueError("NULL payload")
                    x, rate = decode_wav(bytes(buf))
                    mono = x.astype(np.float64).mean(axis=1)
                    n = len(mono)
                    spec = np.fft.rfft(mono)
                    mag2 = np.abs(spec) ** 2
                    # rFFT Parseval weights: DC once, Nyquist (even N)
                    # once, interior bins twice
                    w = np.full(len(mag2), 2.0)
                    w[0] = 1.0
                    if n % 2 == 0:
                        w[-1] = 1.0
                    e_freq = float((w * mag2).sum())
                    e_time = float((mono**2).sum()) * n
                    ok = bool(
                        abs(e_freq - e_time) <= 1e-6 * max(e_time, 1.0)
                    )
                    mag = np.sqrt(mag2)
                    dom = int(np.argmax(mag[1:]) + 1) if len(mag) > 1 else 0
                    freqs = np.arange(len(mag)) * rate / n
                    msum = float(mag.sum())
                    centroid = float((freqs * mag).sum() / msum) if msum else 0.0
                    bands = np.array_split(mag2, n_bands)
                    band_e = np.array(
                        [np.log1p(b.sum()) for b in bands], dtype=np.float32
                    )
                    out.append(
                        (aid, n, rate, dom, round(centroid, 6),
                         ok, band_e, None)
                    )
                except Exception as exc:  # noqa: BLE001 — decode boundary
                    out.append(
                        (aid, None, None, None, None, None, None,
                         str(exc)[:200])
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id", "n_samples", "sample_rate", "dominant_bin",
                    "spectral_centroid_hz", "parseval_ok", "band_log_energy",
                    "decode_error",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        feats,
        "asset_id long, n_samples int, sample_rate int, dominant_bin int, "
        "spectral_centroid_hz double, parseval_ok boolean, "
        "band_log_energy array<float>, decode_error string",
    )


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def _mel_hz_points(n_mels: int, rate: int) -> np.ndarray:
    """n_mels+2 mel-equally-spaced edge/center frequencies in [0, Nyquist]."""
    nyquist = rate / 2.0
    return _mel_to_hz(np.linspace(0.0, _hz_to_mel(nyquist), n_mels + 2))


def mel_filterbank(
    n_mels: int, n_fft_bins: int, rate: int, n_fft: int | None = None
) -> np.ndarray:
    """Triangular mel filterbank (the textbook construction): n_mels
    filters with peaks at mel-equally-spaced center frequencies between
    0 and Nyquist, each rising/falling linearly to its neighbors'
    centers. Returns an (n_mels, n_fft_bins) nonnegative matrix; each
    row peaks at 1. mel(f) = 2595·log10(1 + f/700).

    Bin k maps to frequency k·rate/n_fft. ``n_fft`` (the FFT length in
    samples) defaults to 2·(n_fft_bins−1) — exact for even-length
    rffts; pass it explicitly for odd-length FFTs, where assuming the
    even spacing would stretch every filter placement by N/(N−1)."""
    if n_fft is None:
        n_fft = 2 * (n_fft_bins - 1)
    hz_pts = _mel_hz_points(n_mels, rate)
    bin_freqs = np.arange(n_fft_bins) * (rate / n_fft)
    fb = np.zeros((n_mels, n_fft_bins))
    for m in range(n_mels):
        lo, center, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        rising = (bin_freqs - lo) / max(center - lo, 1e-12)
        falling = (hi - bin_freqs) / max(hi - center, 1e-12)
        fb[m] = np.clip(np.minimum(rising, falling), 0.0, None)
    return fb


def _mel_filters_sparse(
    n_mels: int, n_fft: int, rate: int
) -> list:
    """Sparse triangular mel filters for an ``n_fft``-sample rfft:
    a list of (start_bin, weights) pairs covering only each filter's
    support. Mel triangles overlap at most pairwise, so total storage
    is O(n_fft_bins) — versus O(n_mels · n_fft_bins) dense, which for
    whole-clip FFTs of long recordings is multi-GB per cache entry.
    Same construction (and bin→frequency mapping k·rate/n_fft) as
    :func:`mel_filterbank`."""
    n_bins = n_fft // 2 + 1
    hz_pts = _mel_hz_points(n_mels, rate)
    bin_hz = rate / n_fft
    filters = []
    for m in range(n_mels):
        lo, center, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        start = max(int(np.floor(lo / bin_hz)) + 1, 0)
        end = min(int(np.ceil(hi / bin_hz)) - 1, n_bins - 1)
        if end < start:
            # degenerate filter narrower than one bin: a unit delta at
            # the bin nearest the peak, so every filter has support
            start = min(max(int(round(center / bin_hz)), 0), n_bins - 1)
            filters.append((start, np.ones(1)))
            continue
        freqs = np.arange(start, end + 1) * bin_hz
        rising = (freqs - lo) / max(center - lo, 1e-12)
        falling = (hi - freqs) / max(hi - center, 1e-12)
        w = np.clip(np.minimum(rising, falling), 0.0, None)
        filters.append((start, w))
    return filters


def _dct2_orthonormal(n_out: int, n_in: int) -> np.ndarray:
    """DCT-II basis matrix (orthonormal scaling), rows = coefficients."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    basis = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in))
    basis *= np.sqrt(2.0 / n_in)
    basis[0] *= np.sqrt(0.5)
    return basis


def mfcc_features(
    assets: DataFrame, n_mels: int = 16, n_mfcc: int = 8
) -> DataFrame:
    """MFCC feature extraction through the real decode path: decode →
    mono → power spectrum → triangular mel filterbank → log → DCT-II →
    first ``n_mfcc`` coefficients (the standard speech/audio embedding
    front end; public textbook recipe). One whole-clip frame — chain
    after a windowing splitter for framewise MFCCs at production scale.
    Vectorized numpy per row, zero shuffles.

    Filters are held SPARSE — (start_bin, weights) per triangle, O(bins)
    total — and cached per distinct (clip length, rate) in a small LRU
    (mixed-length corpora would otherwise accrete one dense multi-GB
    matrix per distinct length for the life of the executor)."""
    from collections import OrderedDict

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fb_cache: OrderedDict = OrderedDict()
        dct = _dct2_orthonormal(n_mfcc, n_mels)
        for pdf in batches:
            out = []
            for aid, buf in zip(
                pdf["asset_id"].tolist(), pdf["payload"].tolist()
            ):
                try:
                    if buf is None:
                        raise ValueError("NULL payload")
                    x, rate = decode_wav(bytes(buf))
                    mono = x.astype(np.float64).mean(axis=1)
                    power = np.abs(np.fft.rfft(mono)) ** 2
                    key = (len(mono), rate)
                    if key in fb_cache:
                        fb_cache.move_to_end(key)
                    else:
                        fb_cache[key] = _mel_filters_sparse(
                            n_mels, len(mono), rate
                        )
                        if len(fb_cache) > 8:
                            fb_cache.popitem(last=False)
                    filters = fb_cache[key]
                    mel_e = np.empty(n_mels)
                    for m, (start, w) in enumerate(filters):
                        mel_e[m] = w @ power[start:start + len(w)]
                    mel_e = np.log(mel_e + 1e-10)
                    mfcc = (dct @ mel_e).astype(np.float32)
                    out.append((aid, rate, mfcc, None))
                except Exception as exc:  # noqa: BLE001 — decode boundary
                    out.append((aid, None, None, str(exc)[:200]))
            yield pd.DataFrame(
                out,
                columns=["asset_id", "sample_rate", "mfcc", "decode_error"],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        feats,
        "asset_id long, sample_rate int, mfcc array<float>, "
        "decode_error string",
    )


def mfcc_frames(
    assets: DataFrame,
    frame_len: int = 512,
    hop: int = 256,
    n_mels: int = 16,
    n_mfcc: int = 8,
    window: str | None = "hann",
) -> DataFrame:
    """FRAMEWISE MFCCs — the production-shaped front end
    (:func:`mfcc_features` is the whole-clip rung its docstring says to
    chain a splitter in front of; this IS that splitter, fused): decode
    → mono → overlapping ``frame_len``-sample frames every ``hop``
    samples (strided view, no copy) → optional Hann window → ONE batched
    rFFT over all frames (numpy vectorizes across the frame axis) → mel
    filterbank → log → DCT-II. One output row per (clip, frame).

    Frame-count law: n_frames = 1 + max(0, (n − frame_len) // hop);
    clips shorter than ``frame_len`` zero-pad to a single frame.
    With ``window=None`` and ``frame_len == n`` the single frame equals
    the whole-clip :func:`mfcc_features` output exactly (law-tested) —
    the two rungs share the mel construction and the k·rate/N bin grid.

    The filterbank here is DENSE but tiny — frame_len is fixed, so bins
    = frame_len//2+1 regardless of clip length; one cache entry per
    distinct sample rate (bounded by the corpus's rate set, not its
    clip-length set). Per-row work is numpy matrix ops over
    (n_frames × bins); zero shuffles."""
    win = None
    if window == "hann":
        win = np.hanning(frame_len)
    elif window is not None:
        raise ValueError(f"unknown window {window!r} (use 'hann' or None)")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fb_cache: dict = {}
        dct = _dct2_orthonormal(n_mfcc, n_mels)
        for pdf in batches:
            out = []
            for aid, buf in zip(
                pdf["asset_id"].tolist(), pdf["payload"].tolist()
            ):
                try:
                    if buf is None:
                        raise ValueError("NULL payload")
                    x, rate = decode_wav(bytes(buf))
                    mono = x.astype(np.float64).mean(axis=1)
                    if len(mono) < frame_len:
                        mono = np.pad(mono, (0, frame_len - len(mono)))
                    frames = np.lib.stride_tricks.sliding_window_view(
                        mono, frame_len
                    )[::hop]
                    if win is not None:
                        frames = frames * win
                    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
                    if rate not in fb_cache:
                        fb_cache[rate] = mel_filterbank(
                            n_mels, frame_len // 2 + 1, rate, n_fft=frame_len
                        )
                    fb = fb_cache[rate]
                    mel_e = np.log(power @ fb.T + 1e-10)
                    mfcc = (mel_e @ dct.T).astype(np.float32)
                    for fi in range(mfcc.shape[0]):
                        out.append((aid, fi, rate, mfcc[fi], None))
                except Exception as exc:  # noqa: BLE001 — decode boundary
                    out.append((aid, None, None, None,
                                str(exc)[:200]))
            yield pd.DataFrame(
                out,
                columns=["asset_id", "frame_idx", "sample_rate", "mfcc",
                         "decode_error"],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        feats,
        "asset_id long, frame_idx int, sample_rate int, "
        "mfcc array<float>, decode_error string",
    )


def detect_active_segments(
    assets: DataFrame,
    frame_len: int = 256,
    hop: int = 256,
    threshold_ratio: float = 0.1,
    min_frames: int = 1,
) -> DataFrame:
    """Energy-based activity detection (the classic VAD baseline — the
    public energy-threshold recipe): frame the clip, compute per-frame
    RMS, mark frames whose RMS exceeds ``threshold_ratio`` × the clip's
    peak frame RMS, and merge consecutive active frames into segments
    of at least ``min_frames``. One row per segment: (asset_id,
    seg_idx, start_sample, end_sample, n_frames, rms_mean). Clips with
    no active frame emit nothing; decode failures emit one error row.
    The front gate of any speech pipeline — silence never reaches the
    expensive downstream kernels. Vectorized numpy, zero shuffles."""

    def vad(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, buf in zip(
                pdf["asset_id"].tolist(), pdf["payload"].tolist()
            ):
                try:
                    if buf is None:
                        raise ValueError("NULL payload")
                    x, _rate = decode_wav(bytes(buf))
                    mono = x.astype(np.float64).mean(axis=1)
                    orig_n = len(mono)
                    if len(mono) < frame_len:
                        mono = np.pad(mono, (0, frame_len - len(mono)))
                    frames = np.lib.stride_tricks.sliding_window_view(
                        mono, frame_len
                    )[::hop]
                    rms = np.sqrt((frames**2).mean(axis=1))
                    peak = rms.max()
                    active = rms > threshold_ratio * peak if peak > 0 else (
                        np.zeros(len(rms), dtype=bool)
                    )
                    seg_idx = 0
                    i = 0
                    while i < len(active):
                        if not active[i]:
                            i += 1
                            continue
                        j = i
                        while j < len(active) and active[j]:
                            j += 1
                        if j - i >= min_frames:
                            out.append(
                                (
                                    aid, seg_idx,
                                    int(i * hop),
                                    # last frame may be zero-padded:
                                    # clamp to the real clip length
                                    min(
                                        int((j - 1) * hop + frame_len),
                                        orig_n,
                                    ),
                                    int(j - i),
                                    float(rms[i:j].mean()),
                                    None,
                                )
                            )
                            seg_idx += 1
                        i = j
                except Exception as exc:  # noqa: BLE001 — decode boundary
                    out.append(
                        (aid, None, None, None, None, None,
                         str(exc)[:200])
                    )
            yield pd.DataFrame(
                out,
                columns=["asset_id", "seg_idx", "start_sample",
                         "end_sample", "n_frames", "rms_mean",
                         "decode_error"],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        vad,
        "asset_id long, seg_idx int, start_sample long, end_sample long, "
        "n_frames int, rms_mean double, decode_error string",
    )


def audio_fingerprint(
    assets: DataFrame, n_frames: int = 9, n_bands: int = 8
) -> DataFrame:
    """Perceptual audio fingerprint (the public spectrogram-delta
    recipe, a simplified Haitsma-Kalker / Chromaprint shape): decode,
    mix to mono, split into ``n_frames`` equal segments, compute
    ``n_bands`` rFFT band energies per segment, and emit one bit per
    adjacent-FRAME energy comparison — bit(b, t) = E(b, t+1) > E(b, t)
    — packed into a 64-bit signature (``hash_hi``/``hash_lo`` 32-bit
    halves, like the image dHash). Energy RATIO comparisons make the
    signature invariant to global gain (law-tested); near-identical
    audio differs in a few bits. Pair with
    :func:`multimodal.hamming_near_dup_pairs`. Zero shuffles."""
    if n_bands * (n_frames - 1) > 64:
        # numpy uint64 << k for k >= 64 is C-undefined (silently zeroed
        # or wrapped) — comparison bits must fit the 64-bit signature
        raise ValueError(
            f"n_bands*(n_frames-1) must be <= 64 (64-bit signature "
            f"packing); got {n_bands}*{n_frames - 1}"
        )

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, buf in zip(
                pdf["asset_id"].tolist(), pdf["payload"].tolist()
            ):
                try:
                    if buf is None:
                        raise ValueError("NULL payload")
                    x, _rate = decode_wav(bytes(buf))
                    mono = x.astype(np.float64).mean(axis=1)
                    segs = np.array_split(mono, n_frames)
                    energies = np.zeros((n_bands, n_frames))
                    for t, seg in enumerate(segs):
                        if len(seg) == 0:
                            continue
                        mag2 = np.abs(np.fft.rfft(seg)) ** 2
                        for b_i, band in enumerate(
                            np.array_split(mag2, n_bands)
                        ):
                            energies[b_i, t] = band.sum()
                    bits = (
                        energies[:, 1:] > energies[:, :-1]
                    ).astype(np.uint64).reshape(-1)
                    val = int(
                        (bits << np.arange(len(bits), dtype=np.uint64)).sum()
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
        fp,
        "asset_id long, hash_hi long, hash_lo long, decode_error string",
    )


def audio_near_dup_pairs(
    assets: DataFrame, max_hamming: int = 6, bands: int = 8
) -> DataFrame:
    """Audio near-duplicate candidate pairs: spectrogram-delta
    fingerprints through the real WAV decode path, paired by the shared
    :func:`multimodal.hamming_near_dup_pairs` pigeonhole operator."""
    from .multimodal import hamming_near_dup_pairs, sig_from_halves

    sigs = sig_from_halves(audio_fingerprint(assets))
    return hamming_near_dup_pairs(sigs, max_hamming, bands)


def resample_audio(assets: DataFrame, target_rate: int = 16000) -> DataFrame:
    """Endpoint-aligned linear resample through the full
    decode → interpolate → re-encode pipeline. Output length is the
    integer contract n_out = max(2, n * target_rate // src_rate) and
    sample positions are ``linspace(0, n-1, n_out)`` — so the FIRST and
    LAST output samples equal the first and last input samples exactly
    (linspace endpoints are exact), which the oracle recomputes from the
    synthesis formula. The re-encoded payload is a canonical WAV at
    target_rate (n_bytes = 44 + 2·n_out·ch — also SQL-exact).
    Per-row numpy ``np.interp`` per channel; zero shuffles."""

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, buf in zip(
                pdf["asset_id"].tolist(), pdf["payload"].tolist()
            ):
                try:
                    if buf is None:
                        raise ValueError("NULL payload")
                    x, rate = decode_wav(bytes(buf))
                    n, ch = x.shape
                    n_out = max(2, n * target_rate // rate)
                    pos = np.linspace(0.0, n - 1, n_out)
                    k = np.arange(n, dtype=np.float64)
                    y = np.stack(
                        [
                            np.interp(pos, k, x[:, c].astype(np.float64))
                            for c in range(ch)
                        ],
                        axis=1,
                    )
                    yi = np.clip(np.round(y), -32768, 32767).astype(np.int16)
                    out.append(
                        (
                            aid, n, n_out, target_rate,
                            int(x[0, 0]), int(x[-1, 0]),
                            int(yi[0, 0]), int(yi[-1, 0]),
                            encode_wav(yi, target_rate), None,
                        )
                    )
                except Exception as exc:  # noqa: BLE001 — decode boundary
                    out.append(
                        (aid, None, None, target_rate, None, None,
                         None, None, None, str(exc)[:200])
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id", "n_samples_in", "n_samples_out",
                    "target_rate", "first_in", "last_in", "first_out",
                    "last_out", "payload", "decode_error",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        resample,
        "asset_id long, n_samples_in int, n_samples_out int, "
        "target_rate int, first_in int, last_in int, first_out int, "
        "last_out int, payload binary, decode_error string",
    )
