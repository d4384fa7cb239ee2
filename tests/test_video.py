from __future__ import annotations

import numpy as np
import pytest

from uma_etl_iis_loader_spark.operators.multimodal import decode_bmp
from uma_etl_iis_loader_spark.operators.video import (
    _decode_dib,
    _dib_bytes,
    _synthetic_frame,
    decode_avi,
    encode_avi,
    sample_video_frames,
    synthesize_avi_assets,
    synthesize_mjpeg_assets,
    synthetic_frame_count,
    video_frame_stats,
)

# ---------------------------------------------------------------------------
# container codec (pure Python — no Spark)
# ---------------------------------------------------------------------------


def _frames(i=3, n=4):
    return [_synthetic_frame(i, f) for f in range(n)]


def test_dib_round_trip():
    px = _synthetic_frame(5, 0)
    h, w = px.shape[:2]
    np.testing.assert_array_equal(_decode_dib(_dib_bytes(px), w, h), px)


def test_avi_round_trip_uncompressed():
    frames = _frames()
    payload = encode_avi(frames, fps=10)
    out, meta = decode_avi(payload)
    assert meta["n_frames"] == 4 and meta["us_per_frame"] == 100_000
    assert meta["width"] == frames[0].shape[1]
    assert meta["height"] == frames[0].shape[0]
    assert len(out) == 4
    for a, b in zip(out, frames):
        np.testing.assert_array_equal(a, b)


def test_avi_round_trip_mjpeg_bounded_error():
    from uma_etl_iis_loader_spark.operators.jpeg import encode_jpeg

    frames = _frames(i=7, n=3)
    payload = encode_avi(
        frames, codec="MJPG", frame_encoder=lambda px: encode_jpeg(px, 92)
    )
    out, meta = decode_avi(payload)
    assert len(out) == 3
    for a, b in zip(out, frames):
        assert a.shape == b.shape
        true = int(b.astype(np.int64).sum())
        got = int(a.astype(np.int64).sum())
        assert abs(got - true) <= 0.05 * true + 200


def test_avi_skips_unknown_chunks():
    import struct

    frames = _frames(i=1, n=2)
    payload = encode_avi(frames)
    # splice a JUNK chunk (odd size → pad byte) between hdrl and movi;
    # body excludes the 12-byte RIFF header but keeps the 'AVI ' form type
    junk = struct.pack("<4sI", b"JUNK", 5) + b"abcde" + b"\x00"
    movi_at = payload.index(b"movi") - 8  # LIST header of the movi list
    body = b"AVI " + payload[12:movi_at] + junk + payload[movi_at:]
    rebuilt = struct.pack("<4sI", b"RIFF", len(body)) + body
    out, meta = decode_avi(rebuilt)
    assert len(out) == 2
    np.testing.assert_array_equal(out[0], frames[0])


@pytest.mark.parametrize(
    "payload", [b"", b"RIFF", b"RIFF\x00\x00\x00\x00WAVE", b"AVI junkdata"]
)
def test_avi_rejects_garbage(payload):
    with pytest.raises(ValueError):
        decode_avi(payload)


def test_avi_rejects_nonuniform_frames():
    with pytest.raises(ValueError, match="uniform"):
        encode_avi([_synthetic_frame(0, 0), _synthetic_frame(1, 0)])


def test_synthetic_frame_formula():
    px = _synthetic_frame(9, 2)
    w, h = 4 + 9 % 5, 3 + 9 % 4
    assert px.shape == (h, w, 3)
    assert px[0, 0, 0] == (9 + 7 * 2) % 256
    assert px[1, 2, 1] == (9 + 3 * 2 + 5 * 1 + 7 * 2) % 256
    assert synthetic_frame_count(9) == 2 + 9 % 4


# ---------------------------------------------------------------------------
# Spark kernels
# ---------------------------------------------------------------------------


def _ids(spark, n=30):
    return spark.range(n).withColumnRenamed("id", "asset_id")


def test_video_frame_stats_adjudicable(spark):
    rows = video_frame_stats(synthesize_avi_assets(_ids(spark))).collect()
    by_asset: dict[int, list] = {}
    for r in rows:
        assert r["decode_error"] is None
        by_asset.setdefault(r["asset_id"], []).append(r)
    assert len(by_asset) == 30
    for i, rs in by_asset.items():
        n_f = synthetic_frame_count(i)
        assert len(rs) == n_f
        w, h = 4 + i % 5, 3 + i % 4
        for r in sorted(rs, key=lambda x: x["frame_idx"]):
            f = r["frame_idx"]
            px = _synthetic_frame(i, f)
            assert (r["width"], r["height"], r["n_frames"]) == (w, h, n_f)
            assert r["frame_bytes"] == ((3 * w + 3) // 4) * 4 * h
            assert r["pixel_sum"] == int(px.astype(np.int64).sum())


def test_video_frame_stats_mjpeg_bounded(spark):
    rows = video_frame_stats(
        synthesize_mjpeg_assets(_ids(spark, n=8))
    ).collect()
    for r in rows:
        assert r["decode_error"] is None
        i, f = r["asset_id"], r["frame_idx"]
        true = int(_synthetic_frame(i, f).astype(np.int64).sum())
        assert abs(r["pixel_sum"] - true) <= 0.05 * true + 200
        assert (r["width"], r["height"]) == (4 + i % 5, 3 + i % 4)


def test_video_frame_stats_error_isolation(spark):
    import pandas as pd

    good = encode_avi(_frames(i=2, n=2))
    bad = spark.createDataFrame(
        pd.DataFrame({"asset_id": [1, 2, 3],
                      "payload": [good, b"garbage", None]})
    )
    rows = video_frame_stats(bad).collect()
    ok = [r for r in rows if r["decode_error"] is None]
    err = [r for r in rows if r["decode_error"] is not None]
    assert {r["asset_id"] for r in ok} == {1} and len(ok) == 2
    assert {r["asset_id"] for r in err} == {2, 3}


def test_sample_video_frames_round_trips_to_images(spark):
    rows = sample_video_frames(
        synthesize_avi_assets(_ids(spark, n=12)), max_frames=4
    ).collect()
    for r in rows:
        assert r["decode_error"] is None
        px = decode_bmp(bytes(r["image_payload"]))
        np.testing.assert_array_equal(
            px, _synthetic_frame(r["asset_id"], r["frame_idx"])
        )
    # stride contract: step 1 for n<=5, so idx in [0, min(n, 4))
    by_asset: dict[int, set] = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], set()).add(r["frame_idx"])
    for i, idxs in by_asset.items():
        assert idxs == set(range(min(synthetic_frame_count(i), 4)))


def test_video_kernels_zero_shuffles(spark):
    plan = video_frame_stats(
        synthesize_avi_assets(_ids(spark))
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_decode_media_dispatch():
    import numpy as np

    from uma_etl_iis_loader_spark.operators.audio import encode_wav
    from uma_etl_iis_loader_spark.operators.multimodal import (
        encode_bmp,
        encode_png,
    )
    from uma_etl_iis_loader_spark.operators.video import decode_media

    px = _synthetic_frame(4, 0)
    img = decode_media(encode_bmp(px))
    assert img["kind"] == "image"
    np.testing.assert_array_equal(img["pixels"], px)
    assert decode_media(encode_png(px))["kind"] == "image"

    wav = decode_media(encode_wav(np.int16([1, -2, 3]), 8000))
    assert wav["kind"] == "audio" and wav["sample_rate"] == 8000
    np.testing.assert_array_equal(wav["samples"][:, 0], [1, -2, 3])

    vid = decode_media(encode_avi(_frames(i=4, n=2)))
    assert vid["kind"] == "video" and len(vid["frames"]) == 2

    with pytest.raises(ValueError, match="unknown RIFF form"):
        decode_media(b"RIFF\x04\x00\x00\x00XXXX")
    with pytest.raises(ValueError, match="unrecognized"):
        decode_media(b"\x00" * 64)


def test_avi_rec_list_interleaved_frames_parse():
    # spec interleaving: frame chunks grouped inside 'LIST rec ' within
    # movi must decode like flat movi chunks
    import struct

    frames = _frames(i=6, n=2)
    flat = encode_avi(frames)
    movi_at = flat.index(b"movi") - 8
    hdrl_part = flat[12:movi_at]
    movi_size = struct.unpack_from("<I", flat, movi_at + 4)[0]
    movi_chunks = flat[movi_at + 12 : movi_at + 8 + movi_size]
    rec = struct.pack("<4sI", b"LIST", 4 + len(movi_chunks)) + b"rec " + movi_chunks
    movi = struct.pack("<4sI", b"LIST", 4 + len(rec)) + b"movi" + rec
    body = b"AVI " + hdrl_part + movi
    payload = struct.pack("<4sI", b"RIFF", len(body)) + body
    out, meta = decode_avi(payload)
    assert len(out) == 2
    np.testing.assert_array_equal(out[0], frames[0])
    np.testing.assert_array_equal(out[1], frames[1])


def test_avi_deep_list_nesting_raises_valueerror():
    import struct

    body = b"AVI "
    # 64 nested LISTs, each claiming to contain the next
    inner = b""
    for _ in range(64):
        inner = struct.pack("<4sI", b"LIST", 4 + len(inner)) + b"hdrl" + inner
    body += inner
    payload = struct.pack("<4sI", b"RIFF", len(body)) + body
    with pytest.raises(ValueError, match="nesting"):
        decode_avi(payload)


def test_mjpeg_frame_bytes_is_actual_chunk_size(spark):
    rows = video_frame_stats(
        synthesize_mjpeg_assets(_ids(spark, n=4))
    ).collect()
    for r in rows:
        i = r["asset_id"]
        w, h = 4 + i % 5, 3 + i % 4
        dib_size = ((3 * w + 3) // 4) * 4 * h
        # a JPEG of a tiny frame is NOT the DIB size — frame_bytes must
        # report the real compressed chunk length
        assert r["frame_bytes"] != dib_size
        assert r["frame_bytes"] > 100  # headers + tables + scan


def test_avi_round_trip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(1, 8),   # n_frames
        st.integers(1, 12),  # width
        st.integers(1, 9),   # height
        st.integers(0, 2**32 - 1),  # pixel seed
        st.sampled_from([1, 10, 30, 60]),  # fps
    )
    def check(n, w, h, seed, fps):
        rng = np.random.default_rng(seed)
        frames = [
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for _ in range(n)
        ]
        out, meta = decode_avi(encode_avi(frames, fps=fps))
        assert meta["n_frames"] == n
        assert meta["us_per_frame"] == 1_000_000 // fps
        assert meta["frame_bytes"] == [((3 * w + 3) // 4) * 4 * h] * n
        assert len(out) == n
        for a, b in zip(out, frames):
            np.testing.assert_array_equal(a, b)

    check()


def test_media_ingest_stats_mixed_dispatch(spark):
    from uma_etl_iis_loader_spark.operators.audio import _synthetic_samples
    from uma_etl_iis_loader_spark.operators.multimodal import _synthetic_pixels
    from uma_etl_iis_loader_spark.operators.video import (
        media_ingest_stats,
        synthesize_mixed_assets,
    )

    rows = {
        r["asset_id"]: r
        for r in media_ingest_stats(
            synthesize_mixed_assets(_ids(spark, n=30))
        ).collect()
    }
    assert len(rows) == 30
    for i, r in rows.items():
        assert r["decode_error"] is None
        if i % 3 == 0:
            px = _synthetic_pixels(i)
            assert r["kind"] == "image"
            assert r["n_units"] == px.shape[0] * px.shape[1]
            assert r["metric_sum"] == int(px.astype(np.int64).sum())
        elif i % 3 == 1:
            x, _ = _synthetic_samples(i)
            assert r["kind"] == "audio"
            assert r["n_units"] == len(x)
            assert r["metric_sum"] == int(x.astype(np.int64).sum())
        else:
            nf = synthetic_frame_count(i)
            assert r["kind"] == "video"
            assert r["n_units"] == nf
            total = sum(
                int(_synthetic_frame(i, f).astype(np.int64).sum())
                for f in range(nf)
            )
            assert r["metric_sum"] == total


def test_video_near_dup_pairs_planted(spark):
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.video import video_near_dup_pairs

    rng = np.random.default_rng(21)
    base_frames = [
        rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(4)
    ]
    near_frames = [f.copy() for f in base_frames]
    near_frames[0][2, 2] ^= 1  # one-pixel change in one frame
    far_frames = [
        rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(4)
    ]
    assets = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": [1, 2, 3],
                "payload": [
                    encode_avi(base_frames),
                    encode_avi(near_frames),
                    encode_avi(far_frames),
                ],
            }
        )
    )
    pairs = video_near_dup_pairs(assets, min_matching_frames=2).collect()
    found = {(r["asset_a"], r["asset_b"]): r for r in pairs}
    assert (1, 2) in found
    r = found[(1, 2)]
    assert r["n_matching_frames"] >= 3 and r["min_hamming"] == 0
    assert not any(3 in k for k in found)


def test_video_near_dup_max_frames_guard(spark):
    import pytest as _pytest

    from pyspark.sql import functions as F

    from uma_etl_iis_loader_spark.operators.video import video_near_dup_pairs

    ids = spark.range(2).withColumnRenamed("id", "asset_id")
    assets = ids.withColumn("payload", F.lit(b"x"))
    with _pytest.raises(ValueError, match="max_frames"):
        video_near_dup_pairs(assets, max_frames=100)


def test_video_near_dup_counts_distinct_frames_not_pairs(spark):
    # a STATIC clip (4 identical frames) vs a clip with exactly one
    # matching frame: the pigeonhole join yields 4 frame PAIRS, but the
    # clips share only ONE distinct frame — min_matching_frames=2 must
    # NOT report them as near-duplicates
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.video import video_near_dup_pairs

    rng = np.random.default_rng(33)
    shared = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    static_clip = [shared.copy() for _ in range(4)]
    mixed_clip = [shared.copy()] + [
        rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(3)
    ]
    assets = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": [1, 2],
                "payload": [encode_avi(static_clip), encode_avi(mixed_clip)],
            }
        )
    )
    pairs = video_near_dup_pairs(assets, min_matching_frames=2).collect()
    assert pairs == []
    # with threshold 1 the pair IS reported, with the honest count of 1
    pairs1 = video_near_dup_pairs(assets, min_matching_frames=1).collect()
    assert len(pairs1) == 1
    assert pairs1[0]["n_matching_frames"] == 1
    assert pairs1[0]["min_hamming"] == 0


def test_video_near_dup_long_clips_no_key_collision(spark):
    # clips longer than 64 frames: the ORIGINAL frame index exceeds 63,
    # so packing by it would alias frames into neighboring clips; the
    # dense sample ordinal must keep adjacent unrelated clips unpaired
    import pandas as pd

    rng = np.random.default_rng(34)

    from uma_etl_iis_loader_spark.operators.video import video_near_dup_pairs

    def clip(seed):
        r = np.random.default_rng(seed)
        return [
            r.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(96)
        ]

    a, b = clip(1), clip(2)
    assets = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": [10, 11],
                "payload": [encode_avi(a), encode_avi(b)],
            }
        )
    )
    # unrelated random clips: no near-dup pair may appear (with the old
    # frame_idx packing, clip 10's frame 64 decoded as clip 11 frame 0)
    pairs = video_near_dup_pairs(assets, min_matching_frames=1).collect()
    assert pairs == []
    # a true near-dup of clip 10 (one-pixel tweak) IS still found
    near = [f.copy() for f in a]
    near[0][1, 1] ^= 1
    assets2 = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": [10, 11, 12],
                "payload": [
                    encode_avi(a),
                    encode_avi(b),
                    encode_avi(near),
                ],
            }
        )
    )
    pairs2 = {
        (r["asset_a"], r["asset_b"])
        for r in video_near_dup_pairs(
            assets2, min_matching_frames=1
        ).collect()
    }
    assert (10, 12) in pairs2 and (10, 11) not in pairs2


def test_detect_scene_cuts_planted(spark):
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.video import detect_scene_cuts

    rng = np.random.default_rng(41)
    scene_a = rng.integers(0, 256, (12, 12, 3), dtype=np.uint8)
    scene_b = rng.integers(0, 256, (12, 12, 3), dtype=np.uint8)
    # 3 near-identical frames of A, hard cut, 2 frames of B
    frames = [scene_a, scene_a.copy(), scene_a.copy(), scene_b, scene_b.copy()]
    frames[1][0, 0] ^= 1  # sub-threshold wiggle
    assets = spark.createDataFrame(
        pd.DataFrame({"asset_id": [1], "payload": [encode_avi(frames)]})
    )
    rows = detect_scene_cuts(assets).collect()
    assert len(rows) == 1
    assert rows[0]["frame_idx"] == 3 and rows[0]["delta"] > 0.25
    # static clip: no cuts
    static = spark.createDataFrame(
        pd.DataFrame(
            {"asset_id": [2], "payload": [encode_avi([scene_a] * 4)]}
        )
    )
    assert detect_scene_cuts(static).collect() == []


def test_sample_keyframes_per_scene(spark):
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.video import (
        sample_keyframes_per_scene,
    )

    rng = np.random.default_rng(43)
    a = rng.integers(0, 256, (10, 10, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (10, 10, 3), dtype=np.uint8)
    # scene A: frames 0-3 (static), scene B: frames 4-5
    frames = [a, a.copy(), a.copy(), a.copy(), b, b.copy()]
    assets = spark.createDataFrame(
        pd.DataFrame({"asset_id": [1], "payload": [encode_avi(frames)]})
    )
    rows = sample_keyframes_per_scene(assets).collect()
    assert [(r["scene_idx"], r["frame_idx"]) for r in rows] == [
        (0, 1),  # middle of frames 0..3 -> (0+3)//2 = 1
        (1, 4),  # middle of frames 4..5 -> (4+5)//2 = 4
    ]
    # payloads decode back to the scene's pixels
    np.testing.assert_array_equal(
        decode_bmp(bytes(rows[0]["image_payload"])), a
    )
    np.testing.assert_array_equal(
        decode_bmp(bytes(rows[1]["image_payload"])), b
    )
