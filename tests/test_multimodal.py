from __future__ import annotations

import math

import numpy as np
import pytest

from uma_etl_iis_loader_spark.operators.multimodal import (
    decode_image,
    documents_as_assets,
    fake_decode_features,
    frame_sample,
)


def _assets(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return documents_as_assets(docs)


def test_decode_stub_raises_without_codec():
    from uma_etl_iis_loader_spark.operators.multimodal import _try_import_pillow

    if _try_import_pillow() is not None:
        pytest.skip("codec present — real path covered by the PIL-gated tests")
    with pytest.raises(NotImplementedError, match="codec"):
        decode_image(b"\x89PNG...")


# --- PIL-gated real-decode path (skips in this codec-less container; a
# codec-equipped host runs the genuine decode/resize instead of the
# stride stub) ---


def _png_bytes(w: int, h: int, seed: int) -> bytes:
    import io as _io

    from PIL import Image
    import numpy as np

    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    sink = _io.BytesIO()
    img.save(sink, format="PNG")
    return sink.getvalue()


def test_real_decode_image_roundtrip():
    pytest.importorskip("PIL")
    img = decode_image(_png_bytes(12, 7, seed=1))
    # an 8-bit non-interlaced PNG decodes via the stdlib PNG rung → an
    # (h, w, c) array; only formats outside that class reach PIL
    assert img.shape[:2] == (7, 12)


def test_real_resize_through_spark(spark):
    pytest.importorskip("PIL")
    import io as _io

    from PIL import Image

    from uma_etl_iis_loader_spark.operators.multimodal import resize_images

    rows = [(i, _png_bytes(20 + i, 10 + i, seed=i)) for i in range(4)]
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    out = resize_images(assets, target_w=8, target_h=8).collect()
    assert len(out) == 4
    for r in out:
        decoded = Image.open(_io.BytesIO(bytes(r.payload)))
        assert decoded.size == (8, 8)  # real PIL resize, PNG re-encoded


def test_real_resize_falls_back_on_non_image_payload(spark):
    pytest.importorskip("PIL")
    from uma_etl_iis_loader_spark.operators.multimodal import resize_images

    assets = spark.createDataFrame(
        [(1, b"definitely not an image")], "asset_id long, payload binary"
    )
    (r,) = resize_images(assets, target_w=4, target_h=4).collect()
    assert len(r.payload) == 16  # per-row stride fallback, not a crash


def test_fake_decode_features(spark, sf_dir):
    feats = fake_decode_features(_assets(spark, sf_dir)).collect()
    assert len(feats) > 0
    for r in feats[:20]:
        assert r.media_type in ("image", "audio", "video")
        assert r.n_bytes > 0
        assert len(r.features) == 16
        assert math.isclose(sum(r.features), 1.0, rel_tol=1e-5)
        assert 0.0 <= r.byte_entropy <= 4.0  # 16 buckets → max log2(16)


def test_frame_sample_bounds(spark, sf_dir):
    frames = frame_sample(_assets(spark, sf_dir), frame_bytes=64, max_frames=8).collect()
    per_asset: dict[int, list] = {}
    for r in frames:
        per_asset.setdefault(r.asset_id, []).append(r)
    for rows in per_asset.values():
        assert 1 <= len(rows) <= 8
        assert all(len(r.frame) <= 64 for r in rows)
        assert sorted(r.frame_idx for r in rows) == list(range(len(rows)))


def test_resize_images_shape_and_determinism(spark, sf_dir):
    from uma_etl_iis_loader_spark.operators.multimodal import resize_images

    a = resize_images(_assets(spark, sf_dir), target_w=8, target_h=4).collect()
    b = resize_images(_assets(spark, sf_dir), target_w=8, target_h=4).collect()
    assert len(a) > 0
    for r in a:
        assert (r.width, r.height) == (8, 4)
        assert len(r.payload) == 32  # stride stub emits exactly w*h bytes
    assert {(r.asset_id, bytes(r.payload)) for r in a} == {
        (r.asset_id, bytes(r.payload)) for r in b
    }


def test_bmp_roundtrip_exact():
    """encode_bmp → decode_bmp is lossless for arbitrary dims, including
    widths whose 3-byte rows need padding (w % 4 != 0)."""
    import numpy as np

    from uma_etl_iis_loader_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (4, 4), (7, 2), (13, 9)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payload = encode_bmp(px)
        row_size = ((3 * w + 3) // 4) * 4
        assert len(payload) == 54 + h * row_size
        back = decode_bmp(payload)
        assert back.shape == (h, w, 3)
        assert (back == px).all()


def test_decode_bmp_rejects_corrupt_payloads():
    import numpy as np
    import pytest

    from uma_etl_iis_loader_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    good = encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_bmp(b"not a bmp at all")
    with pytest.raises(ValueError):
        decode_bmp(good[:40])  # truncated header
    with pytest.raises(ValueError):
        decode_bmp(good[:-8])  # truncated pixel data
    bad_bpp = bytearray(good)
    bad_bpp[28] = 8  # claim 8-bit
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad_bpp))


def test_decode_image_stdlib_bmp_rung_runs_without_pil():
    """decode_image must take the stdlib BMP path for BMP payloads — the
    real-decode rung that executes in this codec-less container (no skip
    marker here on purpose)."""
    import numpy as np

    from uma_etl_iis_loader_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
    )

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    out = decode_image(encode_bmp(px))
    assert isinstance(out, np.ndarray)
    assert (out == px).all()


def test_bmp_pixel_stats_distributed(spark):
    """The synthetic-BMP → real-decode kernel over Spark: dims, file
    size, and pixel sums match the generating formulas; no decode
    errors."""
    from uma_etl_iis_loader_spark.operators.multimodal import (
        bmp_pixel_stats,
        synthesize_bmp_assets,
    )

    ids = spark.range(0, 50).withColumnRenamed("id", "asset_id")
    rows = bmp_pixel_stats(synthesize_bmp_assets(ids)).collect()
    assert len(rows) == 50
    for r in rows:
        assert r.decode_error is None
        i = r.asset_id
        w, h = 4 + i % 5, 3 + i % 4
        assert (r.width, r.height) == (w, h)
        assert r.n_bytes == 54 + h * (((3 * w + 3) // 4) * 4)
        expect = sum(
            ((i + 11 * rr + 13 * cc) % 256)
            + ((i + 5 * rr + 7 * cc) % 256)
            + ((i + 2 * rr + 3 * cc) % 256)
            for rr in range(h)
            for cc in range(w)
        )
        assert r.pixel_sum == expect


def test_bmp_pixel_stats_isolates_decode_errors(spark):
    """A corrupt payload lands as a decode_error row, not a task
    failure."""
    from uma_etl_iis_loader_spark.operators.multimodal import bmp_pixel_stats

    df = spark.createDataFrame(
        [(1, bytearray(b"BMgarbage")), (2, bytearray(b"\x89PNG----"))],
        "asset_id long, payload binary",
    )
    rows = {r.asset_id: r for r in bmp_pixel_stats(df).collect()}
    assert rows[1].decode_error is not None  # malformed BMP
    assert rows[2].decode_error is not None  # non-BMP without PIL
    assert rows[1].pixel_sum is None


def test_decode_bmp_never_crashes_on_fuzzed_bytes():
    """Decode-boundary contract under fuzz: decode_bmp either returns a
    pixel array or raises ValueError — never any other exception — for
    random garbage AND randomly mutated valid BMPs (pure-Python check,
    no Spark)."""
    import numpy as np

    from uma_etl_iis_loader_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.default_rng(11)
    good = encode_bmp(
        rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    )
    cases = []
    for n in (0, 1, 2, 13, 54, 200):
        cases.append(rng.integers(0, 256, size=n, dtype=np.uint8).tobytes())
        cases.append(b"BM" + rng.integers(0, 256, size=n, dtype=np.uint8).tobytes())
    for _ in range(200):
        buf = bytearray(good)
        for _ in range(rng.integers(1, 6)):
            buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
        cases.append(bytes(buf))
        cases.append(bytes(buf[: rng.integers(0, len(buf))]))
    for payload in cases:
        try:
            out = decode_bmp(payload)
            assert out.ndim == 3 and out.shape[2] == 3
        except ValueError:
            pass  # the only permitted failure mode


# --- stdlib PNG codec (zlib + unfilter — runs in this codec-less
# container, closing the compressed-format gap) ---


def _ref_png(pixels, filters):
    """Hand-build a PNG applying the GIVEN per-row filter types (the
    encoder itself always emits filter 0) — exercises the decoder's
    Sub/Up/Average/Paeth reconstruction against independently-computed
    filtered bytes, straight from the PNG spec definitions."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = pixels.shape
    stride = w * ch
    flat = pixels.reshape(h, stride).astype(np.int64)
    raw = bytearray()
    for r in range(h):
        f = filters[r % len(filters)]
        cur = flat[r]
        prev = flat[r - 1] if r else np.zeros(stride, dtype=np.int64)
        line = np.zeros(stride, dtype=np.int64)
        for i in range(stride):
            a = cur[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[i] = (cur[i] - pred) % 256
        raw += bytes([f]) + bytes(line.astype(np.uint8))

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_encode_decode():
    import numpy as np

    from uma_etl_iis_loader_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(7)
    for w, h in [(1, 1), (5, 3), (16, 16), (33, 9)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_png(encode_png(px))
        assert out.shape == (h, w, 3)
        assert (out == px).all()


def test_png_decode_all_filter_types():
    """Every scanline filter (None/Sub/Up/Average/Paeth) reconstructs
    exactly, for RGB and RGBA and grayscale, against independently
    filtered reference bytes."""
    import numpy as np

    from uma_etl_iis_loader_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(11)
    for ch in (1, 2, 3, 4):
        px = rng.integers(0, 256, (7, 6, ch), dtype=np.uint8)
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            got = decode_png(_ref_png(px, filters))
            assert got.shape == (7, 6, ch), (ch, filters)
            assert (got == px).all(), (ch, filters)


def test_png_unfilter_throughput_supports_16mp_cap():
    """Pins the decode throughput the 16 MP cap is sized for: the
    worst-case all-Paeth recurrence (plain-int loop, measured ~0.24
    µs/byte) must stay under 1 µs/byte even on a noisy CI box, and the
    vectorized Sub lane-cumsum must beat 20 MB/s. Regressing to the old
    numpy-scalar per-byte loop (~2-3 µs/byte) trips both bounds."""
    import struct
    import time
    import zlib

    import numpy as np

    from uma_etl_iis_loader_spark.operators.multimodal import decode_png

    def build(filt, w=500, h=500, ch=3):
        rng = np.random.default_rng(0)
        rows = b"".join(
            bytes([filt])
            + rng.integers(0, 256, w * ch, dtype=np.uint8).tobytes()
            for _ in range(h)
        )
        def chunk(tag, data):
            return (
                struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(rows, 1)) + chunk(b"IEND", b"")
        )

    n_bytes = 500 * 500 * 3
    paeth = build(4)
    decode_png(paeth)  # warm
    t0 = time.time()
    decode_png(paeth)
    per_byte = (time.time() - t0) / n_bytes
    assert per_byte < 1e-6, f"Paeth unfilter {per_byte*1e9:.0f} ns/byte"

    sub = build(1)
    t0 = time.time()
    decode_png(sub)
    assert n_bytes / (time.time() - t0) > 20e6, "Sub lane-cumsum too slow"

    # the raised cap admits >4 MP imagery (old ceiling) outright
    big = build(0, w=2400, h=2400)  # 5.76 MP, filter-0 (vectorized)
    assert decode_png(big).shape == (2400, 2400, 3)


def test_png_decode_rejects_corrupt():
    import numpy as np
    import pytest as _pytest

    from uma_etl_iis_loader_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    good = encode_png(px)
    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM" + good)
    with _pytest.raises(ValueError, match="CRC"):
        bad = bytearray(good)
        bad[-18] ^= 0xFF  # flip a byte inside IDAT
        decode_png(bytes(bad))
    with _pytest.raises(ValueError, match="truncated|missing"):
        decode_png(good[:30])


def test_png_decode_image_dispatch_and_spark_stats(spark):
    """decode_image routes PNG payloads to the stdlib rung (no PIL
    needed) and the mapInPandas stats kernel computes real pixel sums
    from zlib-compressed payloads."""
    import numpy as np

    from uma_etl_iis_loader_spark.operators.multimodal import (
        _synthetic_pixels,
        bmp_pixel_stats,
        synthesize_png_assets,
    )

    img = decode_image(
        __import__(
            "uma_etl_iis_loader_spark.operators.multimodal",
            fromlist=["encode_png"],
        ).encode_png(_synthetic_pixels(5))
    )
    assert (img == _synthetic_pixels(5)).all()

    ids = spark.range(0, 40).selectExpr("id AS asset_id")
    rows = bmp_pixel_stats(synthesize_png_assets(ids)).collect()
    assert len(rows) == 40
    for r in rows:
        px = _synthetic_pixels(r.asset_id)
        assert r.decode_error is None
        assert (r.width, r.height) == (px.shape[1], px.shape[0])
        assert r.pixel_sum == int(px.astype(np.int64).sum())


def test_real_resize_stdlib_codec_rung(spark):
    """BMP/PNG payloads resize through the REAL decode → nearest-neighbor
    → PNG re-encode path in this codec-less container (no PIL, no
    stride fallback): output payloads are valid PNGs of the target
    dimensions whose pixels are the exact nearest-neighbor index map of
    the source."""
    import numpy as np

    from uma_etl_iis_loader_spark.operators.multimodal import (
        _synthetic_pixels,
        decode_png,
        resize_images,
        synthesize_bmp_assets,
        synthesize_png_assets,
    )

    ids = spark.range(0, 12).selectExpr("id AS asset_id")
    for synth in (synthesize_bmp_assets, synthesize_png_assets):
        rows = resize_images(synth(ids), target_w=6, target_h=5).collect()
        assert len(rows) == 12
        for r in rows:
            px = decode_png(bytes(r.payload))  # valid stdlib PNG out
            assert px.shape == (5, 6, 3)
            src = _synthetic_pixels(r.asset_id)
            h, w = src.shape[:2]
            ri = (np.arange(5) * h) // 5
            ci = (np.arange(6) * w) // 6
            assert (px == src[ri][:, ci]).all(), r.asset_id


def test_resize_text_payload_keeps_stride_fallback(spark):
    """Non-image payloads (no BMP/PNG magic) still take the stride
    fallback — the multimodal_ops 'resize' oracle contract (n_bytes ==
    w*h) is unchanged."""
    from uma_etl_iis_loader_spark.operators.multimodal import resize_images

    assets = spark.createDataFrame(
        [(1, b"BM not actually a bitmap"), (2, b"plain text payload")],
        "asset_id long, payload binary",
    )
    rows = {r.asset_id: r for r in resize_images(assets, 4, 4).collect()}
    assert len(rows[1].payload) == 16  # malformed BMP → stride, not crash
    assert len(rows[2].payload) == 16


def test_png_decode_bounded_against_bombs_and_bad_ihdr():
    """Review regression: a decompression-bomb IDAT and a wrong-length
    IHDR both raise ValueError (per-row error isolation), never OOM or
    struct.error."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from uma_etl_iis_loader_spark.operators.multimodal import decode_png

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    # bomb: 4x4 RGB declared, IDAT inflates to 64 MB of zeros
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    bomb = sig + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(b"\x00" * (64 << 20))
    ) + chunk(b"IEND", b"")
    with _pytest.raises(ValueError, match="length mismatch"):
        decode_png(bomb)

    # absurd declared dimensions reject before any allocation
    huge = struct.pack(">IIBBBBB", 1 << 20, 1 << 20, 8, 2, 0, 0, 0)
    big = sig + chunk(b"IHDR", huge) + chunk(
        b"IDAT", zlib.compress(b"\x00" * 16)
    ) + chunk(b"IEND", b"")
    with _pytest.raises(ValueError, match="too large"):
        decode_png(big)

    # IHDR with a valid CRC but wrong length: ValueError, not struct.error
    bad_ihdr = sig + chunk(b"IHDR", b"\x00" * 12) + chunk(
        b"IDAT", zlib.compress(b"\x00" * 8)
    ) + chunk(b"IEND", b"")
    with _pytest.raises(ValueError, match="IHDR"):
        decode_png(bad_ihdr)


# --- perceptual hashing / image near-dup ---


def test_dhash_deterministic_and_formula(spark):
    import numpy as np

    from uma_etl_iis_loader_spark.operators.multimodal import (
        _synthetic_pixels,
        dhash_images,
        synthesize_bmp_assets,
    )

    ids = spark.range(20).withColumnRenamed("id", "asset_id")
    rows = {
        r["asset_id"]: r
        for r in dhash_images(synthesize_bmp_assets(ids)).collect()
    }
    assert len(rows) == 20
    for i, r in rows.items():
        assert r["decode_error"] is None
        px = _synthetic_pixels(i)
        g = px.astype(np.int64).sum(axis=2)
        h, w = g.shape
        grid = g[np.ix_((np.arange(8) * h) // 8, (np.arange(9) * w) // 9)]
        bits = (grid[:, 1:] > grid[:, :-1]).astype(np.uint64).reshape(-1)
        val = int((bits << np.arange(64, dtype=np.uint64)).sum())
        assert (r["hash_hi"], r["hash_lo"]) == (val >> 32, val & 0xFFFFFFFF)


def test_image_near_dup_pairs_finds_planted_dup(spark):
    import numpy as np
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.multimodal import (
        encode_bmp,
        image_near_dup_pairs,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    near = base.copy()
    near[3, 4] = near[3, 4] ^ 1  # one-pixel perturbation
    far = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assets = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": [1, 2, 3],
                "payload": [encode_bmp(p) for p in (base, near, far)],
            }
        )
    )
    pairs = image_near_dup_pairs(assets, max_hamming=6).collect()
    found = {(r["asset_a"], r["asset_b"]) for r in pairs}
    assert (1, 2) in found
    assert not any(3 in p for p in found)
    for r in pairs:
        assert r["hamming"] <= 6 and r["asset_a"] < r["asset_b"]


def test_image_near_dup_identical_images_hamming_zero(spark):
    import numpy as np
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.multimodal import (
        encode_bmp,
        image_near_dup_pairs,
    )

    px = np.arange(27, dtype=np.uint8).reshape(3, 3, 3) * 9
    assets = spark.createDataFrame(
        pd.DataFrame(
            {"asset_id": [10, 11], "payload": [encode_bmp(px)] * 2}
        )
    )
    rows = image_near_dup_pairs(assets).collect()
    assert len(rows) == 1 and rows[0]["hamming"] == 0


def test_image_near_dup_pigeonhole_guard(spark):
    import pytest as _pytest

    from uma_etl_iis_loader_spark.operators.multimodal import (
        image_near_dup_pairs,
    )

    from pyspark.sql import functions as F

    ids = spark.range(2).withColumnRenamed("id", "asset_id")
    assets = ids.withColumn("payload", F.lit(b"x"))
    with _pytest.raises(ValueError, match="pigeonhole"):
        image_near_dup_pairs(assets, max_hamming=8, bands=8)


def test_hamming_pairing_pigeonhole_recall_property(spark):
    # completeness law: with bands > max_hamming, EVERY pair within
    # max_hamming bits must be found — plant pairs at every distance
    # 0..6 among random 64-bit signatures and require exact recall
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.multimodal import (
        hamming_near_dup_pairs,
    )

    rng = __import__("numpy").random.default_rng(42)
    sigs = []
    expected = set()
    next_id = 0
    for d in range(7):
        base = int(rng.integers(0, 2**63))
        flip_positions = rng.choice(64, size=d, replace=False)
        other = base
        for p in flip_positions:
            other ^= 1 << int(p)

        def to_i64(v):  # signed-64 wrap so the pandas column stays int64
            return v - (1 << 64) if v >= (1 << 63) else v

        a, b = next_id, next_id + 1
        sigs += [(a, to_i64(base)), (b, to_i64(other))]
        expected.add((a, b, d))
        next_id += 100  # keep planted pairs far apart in id space
    df = spark.createDataFrame(
        pd.DataFrame(sigs, columns=["asset_id", "sig"])
    )
    found = {
        (r["asset_a"], r["asset_b"], r["hamming"])
        for r in hamming_near_dup_pairs(df, max_hamming=6, bands=8).collect()
    }
    assert expected <= found  # pigeonhole guarantees every planted pair


def test_hamming_pairing_no_cartesian(spark):
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.multimodal import (
        hamming_near_dup_pairs,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"asset_id": range(10), "sig": range(10)})
    )
    plan = (
        hamming_near_dup_pairs(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dhash_grid_packing_guard(spark):
    # >64 grid bits would hit numpy's UB shift-by->=64 — must raise
    import pytest as _pytest

    from uma_etl_iis_loader_spark.operators.multimodal import (
        dhash_images,
        synthesize_bmp_assets,
    )

    ids = spark.range(1).withColumnRenamed("id", "asset_id")
    with _pytest.raises(ValueError, match="64"):
        dhash_images(synthesize_bmp_assets(ids), out_h=16, out_w=8)


# --- pHash (DCT perceptual hash) ---


def _phash_sig(spark, images):
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.multimodal import (
        encode_bmp,
        phash_images,
        sig_from_halves,
    )

    assets = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": list(range(len(images))),
                "payload": [encode_bmp(im) for im in images],
            }
        )
    )
    return {
        r["asset_id"]: r["sig"]
        for r in sig_from_halves(phash_images(assets)).collect()
    }


def test_phash_affine_invariance(spark):
    # pHash drops DC and thresholds ACs at their median, so any positive
    # affine pixel transform a*px + b leaves every bit unchanged
    rng = np.random.default_rng(5)
    base = rng.integers(60, 160, (40, 40, 3), dtype=np.uint8)
    brighter = np.clip(base.astype(np.int32) + 40, 0, 255).astype(np.uint8)
    contrast = np.clip(base.astype(np.float64) * 1.4 - 20, 0, 255).astype(
        np.uint8
    )
    sigs = _phash_sig(spark, [base, brighter, contrast])
    assert sigs[0] == sigs[1]
    # contrast stretch clips/rounds a little — allow a few flipped bits
    assert bin(sigs[0] ^ sigs[2]).count("1") <= 4


def test_phash_near_dup_and_distinct(spark):
    rng = np.random.default_rng(6)
    base = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    near = base.copy()
    near[3, 3] ^= 1  # one-pixel tweak
    other = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    sigs = _phash_sig(spark, [base, near, other])
    assert bin(sigs[0] ^ sigs[1]).count("1") <= 6
    assert bin(sigs[0] ^ sigs[2]).count("1") > 10
    # top bit is unused (63-bit signature)
    for s in sigs.values():
        assert s >= 0 and s < (1 << 63)


def test_phash_pairing_method(spark):
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.multimodal import (
        encode_bmp,
        image_near_dup_pairs,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    near = np.clip(base.astype(np.int32) + 30, 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assets = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": [1, 2, 3],
                "payload": [encode_bmp(x) for x in (base, near, other)],
            }
        )
    )
    pairs = {
        (r["asset_a"], r["asset_b"])
        for r in image_near_dup_pairs(assets, method="phash").collect()
    }
    assert (1, 2) in pairs and not any(3 in p for p in pairs)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="method"):
        image_near_dup_pairs(assets, method="ahash")


# --- EXIF metadata: scan + scrub ---


def test_image_metadata_and_strip(spark):
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.jpeg import (
        build_exif_app1,
        encode_jpeg,
    )
    from uma_etl_iis_loader_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
        image_metadata,
        strip_image_metadata,
    )

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    plain = encode_jpeg(px)
    tagged = plain[:2] + build_exif_app1(
        orientation=6, gps=(52.52, -13.405)
    ) + plain[2:]
    bmp = encode_bmp(px)
    assets = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": [1, 2, 3, 4],
                "payload": [tagged, plain, bmp, b"junk"],
            }
        )
    )
    meta = {r["asset_id"]: r for r in image_metadata(assets).collect()}
    assert meta[1]["has_gps"] and meta[1]["orientation"] == 6
    assert abs(meta[1]["gps_lat"] - 52.52) < 1e-3
    assert abs(meta[1]["gps_lon"] + 13.405) < 1e-3
    assert not meta[2]["has_gps"] and meta[2]["orientation"] is None
    assert not meta[3]["has_gps"] and meta[3]["decode_error"] is None
    # junk is not a JPEG: reported as no-EXIF, not an error (sniff path)
    assert not meta[4]["has_gps"]

    scrubbed = {
        r["asset_id"]: r for r in strip_image_metadata(assets).collect()
    }
    assert scrubbed[1]["n_bytes_removed"] > 0
    # geotags gone, pixels bit-identical
    clean = bytes(scrubbed[1]["payload"])
    meta2 = {
        r["asset_id"]: r
        for r in image_metadata(
            spark.createDataFrame(
                pd.DataFrame({"asset_id": [1], "payload": [clean]})
            )
        ).collect()
    }
    assert not meta2[1]["has_gps"]
    np.testing.assert_array_equal(decode_image(clean), decode_image(plain))
    # non-JPEG passthrough untouched
    assert bytes(scrubbed[3]["payload"]) == bmp
    assert scrubbed[3]["n_bytes_removed"] == 0

    # fused scan+scrub-stats pass agrees with the scrub kernel's count
    fused = {
        r["asset_id"]: r
        for r in image_metadata(assets, with_scrub_stats=True).collect()
    }
    for i in (1, 2, 3):
        assert fused[i]["n_bytes_removed"] == scrubbed[i]["n_bytes_removed"]
    assert fused[1]["has_gps"] and fused[1]["orientation"] == 6


def test_image_sharpness_orders_blur(spark):
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.multimodal import (
        encode_bmp,
        image_sharpness,
    )

    rng = np.random.default_rng(11)
    sharp = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    # box-blur the sharp image (valid interior conv, cast back)
    f = sharp.astype(np.float64)
    blurred = f.copy()
    blurred[1:-1, 1:-1] = (
        f[:-2, :-2] + f[:-2, 1:-1] + f[:-2, 2:]
        + f[1:-1, :-2] + f[1:-1, 1:-1] + f[1:-1, 2:]
        + f[2:, :-2] + f[2:, 1:-1] + f[2:, 2:]
    ) / 9.0
    blurred = np.clip(np.round(blurred), 0, 255).astype(np.uint8)
    flat = np.full((16, 16, 3), 128, dtype=np.uint8)
    assets = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": [1, 2, 3, 4],
                "payload": [
                    encode_bmp(sharp),
                    encode_bmp(blurred),
                    encode_bmp(flat),
                    b"junk",
                ],
            }
        )
    )
    rows = {r["asset_id"]: r for r in image_sharpness(assets).collect()}
    assert rows[1]["sharpness"] > rows[2]["sharpness"] > 0
    assert rows[3]["sharpness"] == 0.0  # constant image: no edges
    assert rows[4]["decode_error"] is not None
    # reference equality: kernel == direct numpy on the same pixels
    g = sharp.astype(np.int64).sum(axis=2).astype(np.float64)
    lap = (4 * g[1:-1, 1:-1] - g[:-2, 1:-1] - g[2:, 1:-1]
           - g[1:-1, :-2] - g[1:-1, 2:])
    assert abs(rows[1]["sharpness"] - lap.var()) < 1e-6
