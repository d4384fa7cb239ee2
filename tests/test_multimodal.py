from __future__ import annotations

import math

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
    assert img.size == (12, 7)


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
