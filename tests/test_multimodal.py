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
    with pytest.raises(NotImplementedError, match="codec"):
        decode_image(b"\x89PNG...")


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
