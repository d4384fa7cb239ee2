"""Decode-boundary fuzz: the per-row error-isolation contract of every
stats kernel requires that malformed media payloads raise cleanly
(ValueError / NotImplementedError — or decode to SOME array, for
corruptions a codec legitimately tolerates, e.g. bit flips inside pixel
data) rather than escaping as IndexError / struct.error / KeyError /
ZeroDivisionError or looping forever. Deterministic corpus: seeded
random bytes, truncations of valid payloads at every interesting
boundary, and single-bit flips sweeping the header region."""

from __future__ import annotations

import numpy as np
import pytest

from uma_etl_iis_loader_spark.operators.audio import decode_wav, encode_wav
from uma_etl_iis_loader_spark.operators.jpeg import decode_jpeg, encode_jpeg
from uma_etl_iis_loader_spark.operators.multimodal import (
    decode_bmp,
    decode_image,
    decode_png,
    encode_bmp,
    encode_png,
)
from uma_etl_iis_loader_spark.operators.video import (
    _synthetic_frame,
    decode_avi,
    encode_avi,
)

_ALLOWED = (ValueError, NotImplementedError)


def _pixels():
    return _synthetic_frame(11, 0)  # 5x6 RGB


def _valid_payloads():
    px = _pixels()
    wav = encode_wav(np.arange(40, dtype=np.int16) * 100 - 2000, 8000)
    return {
        "bmp": encode_bmp(px),
        "png": encode_png(px),
        "jpeg": encode_jpeg(px, quality=92),
        "wav": wav,
        "avi": encode_avi([_synthetic_frame(11, f) for f in range(3)]),
    }


_DECODERS = {
    "bmp": decode_bmp,
    "png": decode_png,
    "jpeg": decode_jpeg,
    "wav": decode_wav,
    "avi": decode_avi,
    "image_dispatch": decode_image,
}


def _check(decoder, payload):
    """Decoding must either succeed or raise an allowed error type."""
    try:
        decoder(bytes(payload))
    except _ALLOWED:
        pass
    # any other exception type propagates and fails the test


@pytest.mark.parametrize("fmt", ["bmp", "png", "jpeg", "wav", "avi"])
def test_truncations_fail_cleanly(fmt):
    payload = _valid_payloads()[fmt]
    decoder = _DECODERS[fmt]
    # every prefix boundary in the header region + coarse steps beyond
    cuts = list(range(0, min(len(payload), 80))) + list(
        range(80, len(payload), 7)
    )
    for cut in cuts:
        _check(decoder, payload[:cut])


@pytest.mark.parametrize("fmt", ["bmp", "png", "jpeg", "wav", "avi"])
def test_header_bit_flips_fail_cleanly(fmt):
    payload = bytearray(_valid_payloads()[fmt])
    decoder = _DECODERS[fmt]
    region = min(len(payload), 96)
    for byte_i in range(region):
        for bit in (0, 3, 7):
            corrupted = bytearray(payload)
            corrupted[byte_i] ^= 1 << bit
            _check(decoder, corrupted)


@pytest.mark.parametrize("fmt", ["bmp", "png", "jpeg", "wav", "avi"])
def test_random_bytes_fail_cleanly(fmt):
    rng = np.random.default_rng(1234)
    decoder = _DECODERS[fmt]
    for size in (0, 1, 7, 12, 54, 200, 4096):
        for _ in range(8):
            _check(decoder, rng.integers(0, 256, size, dtype=np.uint8).tobytes())


def test_random_bytes_with_valid_magic_fail_cleanly():
    # adversarial: correct magic, garbage after — exercises the deep
    # parse paths of the dispatcher rather than the signature check
    rng = np.random.default_rng(99)
    magics = [
        b"BM",
        b"\x89PNG\r\n\x1a\n",
        b"\xff\xd8",
        b"RIFF\x20\x00\x00\x00WAVE",
        b"RIFF\x20\x00\x00\x00AVI ",
    ]
    for magic in magics:
        for _ in range(10):
            tail = rng.integers(0, 256, 120, dtype=np.uint8).tobytes()
            _check(decode_image, magic + tail)
            _check(decode_wav, magic + tail)
            _check(decode_avi, magic + tail)


def test_zero_dimension_claims_fail_cleanly():
    # headers asserting absurd dims must not allocate or loop: clamp the
    # declared sizes of a valid BMP/WAV to zero / huge and decode
    import struct

    bmp = bytearray(encode_bmp(_pixels()))
    for w in (0, -5, 1 << 30):
        b = bytearray(bmp)
        struct.pack_into("<i", b, 18, w)
        _check(decode_bmp, b)
    wav = bytearray(encode_wav(np.int16([1, 2, 3]), 8000))
    for ch in (0, 65535):
        b = bytearray(wav)
        struct.pack_into("<H", b, 22, ch)
        _check(decode_wav, b)
