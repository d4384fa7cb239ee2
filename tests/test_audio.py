from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from uma_etl_iis_loader_spark.operators.audio import (
    WAV_HEADER_BYTES,
    _synthetic_samples,
    _synthetic_tone,
    audio_spectral_features,
    decode_wav,
    encode_wav,
    resample_audio,
    synthesize_tone_assets,
    synthesize_wav_assets,
    wav_sample_stats,
)

# ---------------------------------------------------------------------------
# codec (pure Python — no Spark)
# ---------------------------------------------------------------------------


def test_wav_round_trip_mono():
    x = np.array([0, 1, -1, 32767, -32768, 123], dtype=np.int16)
    payload = encode_wav(x, 8000)
    assert len(payload) == WAV_HEADER_BYTES + 2 * len(x)
    y, rate = decode_wav(payload)
    assert rate == 8000
    assert y.shape == (6, 1)
    np.testing.assert_array_equal(y[:, 0], x)


def test_wav_round_trip_stereo():
    x = np.arange(20, dtype=np.int16).reshape(10, 2) * 100 - 900
    y, rate = decode_wav(encode_wav(x, 44100))
    assert rate == 44100
    np.testing.assert_array_equal(y, x)


def test_wav_chunk_walk_skips_unknown_chunks():
    # a LIST chunk (odd size → pad byte) between fmt and data, per spec
    x = np.array([5, -5, 7], dtype=np.int16)
    canonical = encode_wav(x, 16000)
    fmt_chunk = canonical[12:36]
    data_chunk = canonical[36:]
    import struct

    extra = struct.pack("<4sI", b"LIST", 3) + b"abc" + b"\x00"  # pad
    body = fmt_chunk + extra + data_chunk
    payload = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    y, rate = decode_wav(payload)
    assert rate == 16000
    np.testing.assert_array_equal(y[:, 0], x)


def test_wav_8bit_decode():
    # hand-build an 8-bit unsigned PCM file; decoder widens with -128 bias
    import struct

    samples = bytes([128, 0, 255, 130])
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 8000, 1, 8)
    data = struct.pack("<4sI", b"data", len(samples)) + samples
    body = fmt + data
    payload = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    y, rate = decode_wav(payload)
    np.testing.assert_array_equal(y[:, 0], [0, -128, 127, 2])


@pytest.mark.parametrize(
    "payload",
    [b"", b"RIFF", b"RIFX1234WAVE", b"RIFF\x00\x00\x00\x00WAVE"],
)
def test_wav_decode_rejects_garbage(payload):
    with pytest.raises(ValueError):
        decode_wav(payload)


def test_wav_decode_rejects_non_pcm():
    import struct

    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 3, 1, 8000, 32000, 4, 32)
    body = fmt + struct.pack("<4sI", b"data", 0)
    payload = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(payload)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=200),
    st.sampled_from([8000, 16000, 22050, 44100]),
    st.integers(1, 3),
)
def test_wav_round_trip_property(vals, rate, ch):
    n = len(vals) - len(vals) % ch
    if n == 0:
        n, vals = ch, (vals * ch)[:ch]
    x = np.array(vals[:n], dtype=np.int16).reshape(-1, ch)
    y, r = decode_wav(encode_wav(x, rate))
    assert r == rate
    np.testing.assert_array_equal(y, x)


# ---------------------------------------------------------------------------
# synthesis formulas match their documented SQL-recomputable contracts
# ---------------------------------------------------------------------------


def test_synthetic_samples_formula():
    x, rate = _synthetic_samples(7)
    assert len(x) == 50 + 7 % 60 and rate == 8000 + (7 % 3) * 4000
    assert x[0] == (7 * 31) % 4001 - 2000
    assert x[-1] == (7 * 31 + (len(x) - 1) * 17) % 4001 - 2000


def test_synthetic_tone_dominant_bin():
    for i in range(20):
        x, rate, b = _synthetic_tone(i)
        spec = np.abs(np.fft.rfft(x.astype(np.float64)))
        assert int(np.argmax(spec[1:]) + 1) == b == 1 + i % 16


# ---------------------------------------------------------------------------
# Spark kernels
# ---------------------------------------------------------------------------


def _ids(spark, n=40):
    return spark.range(n).withColumnRenamed("id", "asset_id")


def test_wav_sample_stats_adjudicable_columns(spark):
    rows = {
        r["asset_id"]: r
        for r in wav_sample_stats(synthesize_wav_assets(_ids(spark))).collect()
    }
    assert len(rows) == 40
    for i, r in rows.items():
        x, rate = _synthetic_samples(i)
        assert r["decode_error"] is None
        assert r["n_samples"] == len(x)
        assert r["n_channels"] == 1
        assert r["sample_rate"] == rate
        assert r["n_bytes"] == WAV_HEADER_BYTES + 2 * len(x)
        assert r["sample_sum"] == int(x.astype(np.int64).sum())
        assert r["duration_ms"] == 1000 * len(x) // rate


def test_wav_sample_stats_error_isolation(spark):
    import pandas as pd

    bad = spark.createDataFrame(
        pd.DataFrame(
            {"asset_id": [1, 2, 3],
             "payload": [encode_wav(np.int16([1, 2]), 8000), b"junk", None]}
        )
    )
    rows = {r["asset_id"]: r for r in wav_sample_stats(bad).collect()}
    assert rows[1]["decode_error"] is None and rows[1]["sample_sum"] == 3
    assert rows[2]["decode_error"] is not None
    assert rows[3]["decode_error"] is not None and rows[3]["n_bytes"] == 0


def test_spectral_features_tone_assets(spark):
    rows = audio_spectral_features(
        synthesize_tone_assets(_ids(spark))
    ).collect()
    assert len(rows) == 40
    for r in rows:
        i = r["asset_id"]
        assert r["decode_error"] is None
        assert r["dominant_bin"] == 1 + i % 16
        assert r["parseval_ok"] is True
        assert r["n_samples"] == 64 and r["sample_rate"] == 16000
        # an integer-period tone's centroid sits near its frequency
        tone_hz = (1 + i % 16) * 16000 / 64
        assert abs(r["spectral_centroid_hz"] - tone_hz) < 0.15 * 16000 / 2
        assert len(r["band_log_energy"]) == 8


def test_parseval_holds_on_arbitrary_signals(spark):
    rows = audio_spectral_features(
        synthesize_wav_assets(_ids(spark))
    ).collect()
    assert all(r["parseval_ok"] for r in rows)


def test_resample_contract(spark):
    rows = {
        r["asset_id"]: r
        for r in resample_audio(
            synthesize_wav_assets(_ids(spark)), target_rate=16000
        ).collect()
    }
    for i, r in rows.items():
        x, rate = _synthetic_samples(i)
        n_out = max(2, len(x) * 16000 // rate)
        assert r["decode_error"] is None
        assert r["n_samples_out"] == n_out
        # endpoint alignment: first/last output == first/last input
        assert r["first_out"] == r["first_in"] == int(x[0])
        assert r["last_out"] == r["last_in"] == int(x[-1])
        assert len(r["payload"]) == WAV_HEADER_BYTES + 2 * n_out
        # re-encoded payload decodes at the target rate
        y, out_rate = decode_wav(bytes(r["payload"]))
        assert out_rate == 16000 and len(y) == n_out


def test_resample_identity_when_rates_match():
    # src rate 16000 (i % 3 == 2) → n_out == n and samples preserved
    i = 2
    x, rate = _synthetic_samples(i)
    assert rate == 16000
    import pandas as pd

    from uma_etl_iis_loader_spark.session import build_session

    spark = build_session("tests", shuffle_partitions=8)
    df = spark.createDataFrame(
        pd.DataFrame({"asset_id": [i], "payload": [encode_wav(x, rate)]})
    )
    r = resample_audio(df, target_rate=16000).collect()[0]
    y, _ = decode_wav(bytes(r["payload"]))
    np.testing.assert_array_equal(y[:, 0], x)


def test_audio_kernels_zero_shuffles(spark):
    plan = wav_sample_stats(
        synthesize_wav_assets(_ids(spark))
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- perceptual fingerprint / audio near-dup ---


def test_audio_fingerprint_gain_invariance(spark):
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.audio import audio_fingerprint

    rng = np.random.default_rng(3)
    base = (rng.standard_normal(800) * 3000).astype(np.int16)
    scaled = (base.astype(np.float64) * 0.5).astype(np.int16)
    assets = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": [1, 2],
                "payload": [encode_wav(base, 8000), encode_wav(scaled, 8000)],
            }
        )
    )
    rows = {r["asset_id"]: r for r in audio_fingerprint(assets).collect()}
    # energy-comparison bits are invariant to global gain
    assert (rows[1]["hash_hi"], rows[1]["hash_lo"]) == (
        rows[2]["hash_hi"], rows[2]["hash_lo"],
    )


def test_audio_near_dup_pairs_planted(spark):
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.audio import audio_near_dup_pairs

    rng = np.random.default_rng(11)
    base = (rng.standard_normal(800) * 3000).astype(np.int16)
    near = base.copy()
    near[100:110] = near[100:110] + 40  # tiny local perturbation
    far = (rng.standard_normal(800) * 3000).astype(np.int16)
    assets = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": [1, 2, 3],
                "payload": [encode_wav(s, 8000) for s in (base, near, far)],
            }
        )
    )
    pairs = audio_near_dup_pairs(assets, max_hamming=6).collect()
    found = {(r["asset_a"], r["asset_b"]) for r in pairs}
    assert (1, 2) in found
    assert not any(3 in p for p in found)


# --- mel / MFCC front end ---


def test_mel_filterbank_shape_and_laws():
    from uma_etl_iis_loader_spark.operators.audio import mel_filterbank

    fb = mel_filterbank(16, 129, 16000)
    assert fb.shape == (16, 129)
    assert (fb >= 0).all()
    # every filter peaks at (approximately) 1 and has support
    assert (fb.max(axis=1) > 0.5).all() and (fb.max(axis=1) <= 1.0 + 1e-9).all()
    # interior bins are covered by at least one filter
    assert (fb.sum(axis=0)[3:-3] > 0).all()


def test_dct2_orthonormal():
    from uma_etl_iis_loader_spark.operators.audio import _dct2_orthonormal

    d = _dct2_orthonormal(16, 16)
    np.testing.assert_allclose(d @ d.T, np.eye(16), atol=1e-12)


def test_mfcc_features_kernel(spark):
    from uma_etl_iis_loader_spark.operators.audio import mfcc_features

    rows = mfcc_features(synthesize_tone_assets(_ids(spark, n=20))).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["decode_error"] is None
        assert len(r["mfcc"]) == 8
        assert all(np.isfinite(v) for v in r["mfcc"])
    # determinism: same asset → identical coefficients on a second run
    again = mfcc_features(synthesize_tone_assets(_ids(spark, n=20))).collect()
    assert {r["asset_id"]: list(r["mfcc"]) for r in rows} == {
        r["asset_id"]: list(r["mfcc"]) for r in again
    }


def test_mfcc_distinguishes_tones(spark):
    # different dominant frequencies must produce different MFCC vectors
    from uma_etl_iis_loader_spark.operators.audio import mfcc_features

    rows = {
        r["asset_id"]: np.array(r["mfcc"])
        for r in mfcc_features(synthesize_tone_assets(_ids(spark, n=8))).collect()
    }
    # ids 0..7 have tone bins 1..8 — all pairwise distinct
    vecs = list(rows.values())
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            assert not np.allclose(vecs[i], vecs[j], atol=1e-3)


def test_audio_fingerprint_packing_guard(spark):
    # >64 comparison bits would hit numpy's UB shift-by->=64 — must raise
    import pytest as _pytest

    from uma_etl_iis_loader_spark.operators.audio import audio_fingerprint

    with _pytest.raises(ValueError, match="64-bit signature"):
        audio_fingerprint(
            synthesize_tone_assets(_ids(spark, n=1)), n_frames=17, n_bands=8
        )
    # default params use exactly 64 bits — fine
    audio_fingerprint(synthesize_tone_assets(_ids(spark, n=1)))


def test_mel_sparse_matches_dense():
    # sparse (start, weights) filters == nonzero slices of the dense
    # matrix, for both even and odd FFT lengths (odd exercises the
    # k*rate/N bin mapping that linspace-to-Nyquist would warp)
    from uma_etl_iis_loader_spark.operators.audio import (
        _mel_filters_sparse,
        mel_filterbank,
    )

    for n_fft in (256, 1001):
        n_bins = n_fft // 2 + 1
        dense = mel_filterbank(16, n_bins, 8000, n_fft=n_fft)
        sparse = _mel_filters_sparse(16, n_fft, 8000)
        assert len(sparse) == 16
        for m, (start, w) in enumerate(sparse):
            rebuilt = np.zeros(n_bins)
            rebuilt[start:start + len(w)] = w
            np.testing.assert_allclose(rebuilt, dense[m], atol=1e-12)
            assert w.sum() > 0  # every filter has support


def test_mel_filterbank_odd_fft_top_bin():
    # for an odd-length FFT the top bin is (N-1)/(2N)*rate, NOT Nyquist;
    # filters must be placed on the true k*rate/N grid
    from uma_etl_iis_loader_spark.operators.audio import mel_filterbank

    n_fft = 1001
    n_bins = 501
    fb = mel_filterbank(16, n_bins, 8000, n_fft=n_fft)
    fb_even_assumption = mel_filterbank(16, n_bins, 8000)
    # the two grids genuinely differ (spacing 8000/1001 vs 8.0 Hz)
    assert not np.allclose(fb, fb_even_assumption)


# --- framewise MFCC ---


def test_mfcc_frames_count_law_and_padding(spark):
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.audio import encode_wav, mfcc_frames

    rng = np.random.default_rng(7)
    clips = {
        1: 300,  # 1 + (300-128)//64 = 3 frames
        2: 128,  # exactly one frame
        3: 50,   # shorter than frame_len -> zero-pad, one frame
    }
    assets = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": list(clips),
                "payload": [
                    encode_wav(
                        rng.integers(-2000, 2000, (n, 1)).astype(np.int16),
                        16000,
                    )
                    for n in clips.values()
                ],
            }
        )
    )
    rows = mfcc_frames(assets, frame_len=128, hop=64).collect()
    by_asset: dict[int, list] = {}
    for r in rows:
        assert r["decode_error"] is None
        assert len(r["mfcc"]) == 8
        by_asset.setdefault(r["asset_id"], []).append(r["frame_idx"])
    assert sorted(by_asset[1]) == [0, 1, 2]
    assert by_asset[2] == [0]
    assert by_asset[3] == [0]


def test_mfcc_frames_whole_clip_law(spark):
    # window=None + frame_len == clip length -> the single frame equals
    # the whole-clip mfcc_features output (shared mel construction)
    from uma_etl_iis_loader_spark.operators.audio import (
        mfcc_features,
        mfcc_frames,
    )

    assets = synthesize_tone_assets(_ids(spark, n=8))
    whole = {
        r["asset_id"]: np.array(r["mfcc"])
        for r in mfcc_features(assets).collect()
    }
    framed = mfcc_frames(assets, frame_len=64, hop=64, window=None).collect()
    assert len(framed) == 8
    for r in framed:
        assert r["frame_idx"] == 0
        np.testing.assert_allclose(
            np.array(r["mfcc"]), whole[r["asset_id"]], atol=1e-4
        )


def test_mfcc_frames_hann_differs_and_localizes(spark):
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.audio import encode_wav, mfcc_frames

    # tone in the first half, silence in the second: framewise MFCCs
    # must differ across halves (the whole point of framing)
    k = np.arange(256)
    tone = np.round(12000 * np.sin(2 * np.pi * 8 * k / 256)).astype(np.int16)
    sig = np.concatenate([tone, np.zeros(256, dtype=np.int16)])
    assets = spark.createDataFrame(
        pd.DataFrame(
            {"asset_id": [1], "payload": [encode_wav(sig[:, None], 16000)]}
        )
    )
    rows = {
        r["frame_idx"]: np.array(r["mfcc"])
        for r in mfcc_frames(assets, frame_len=128, hop=128).collect()
    }
    assert sorted(rows) == [0, 1, 2, 3]
    assert not np.allclose(rows[0], rows[3], atol=1e-3)
    # hann vs rectangular genuinely differ
    rect = {
        r["frame_idx"]: np.array(r["mfcc"])
        for r in mfcc_frames(
            assets, frame_len=128, hop=128, window=None
        ).collect()
    }
    assert not np.allclose(rows[0], rect[0], atol=1e-3)


def test_mfcc_frames_bad_window_and_error_isolation(spark):
    import pandas as pd
    import pytest as _pytest

    from uma_etl_iis_loader_spark.operators.audio import mfcc_frames

    assets = spark.createDataFrame(
        pd.DataFrame({"asset_id": [1], "payload": [b"not a wav"]})
    )
    with _pytest.raises(ValueError, match="window"):
        mfcc_frames(assets, window="hamming")
    rows = mfcc_frames(assets).collect()
    assert len(rows) == 1 and rows[0]["decode_error"] is not None


def test_detect_active_segments_planted(spark):
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.audio import (
        detect_active_segments,
        encode_wav,
    )

    # tone(1024) | silence(1024) | tone(512): two active segments
    k = np.arange(1024)
    tone = np.round(8000 * np.sin(2 * np.pi * 16 * k / 1024))
    sig = np.concatenate([tone, np.zeros(1024), tone[:512]]).astype(np.int16)
    assets = spark.createDataFrame(
        pd.DataFrame(
            {"asset_id": [1], "payload": [encode_wav(sig[:, None], 16000)]}
        )
    )
    rows = detect_active_segments(
        assets, frame_len=256, hop=256
    ).collect()
    assert [r["seg_idx"] for r in rows] == [0, 1]
    a, b = rows
    assert a["start_sample"] == 0 and a["end_sample"] == 1024
    assert b["start_sample"] == 2048 and b["end_sample"] == 2560
    assert a["rms_mean"] > 0 and a["decode_error"] is None
    # all-silence clip emits nothing; garbage isolates as an error row
    assets2 = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": [2, 3],
                "payload": [
                    encode_wav(np.zeros((512, 1), dtype=np.int16), 16000),
                    b"junk",
                ],
            }
        )
    )
    rows2 = detect_active_segments(assets2, frame_len=256, hop=256).collect()
    by_id: dict[int, list] = {}
    for r in rows2:
        by_id.setdefault(r["asset_id"], []).append(r)
    assert 2 not in by_id
    assert by_id[3][0]["decode_error"] is not None


def test_detect_active_segments_short_clip_end_clamped(spark):
    # a 100-sample tone zero-pads to one 256-sample frame; end_sample
    # must report the REAL clip length, not the padded frame end
    import pandas as pd

    from uma_etl_iis_loader_spark.operators.audio import (
        detect_active_segments,
        encode_wav,
    )

    k = np.arange(100)
    tone = np.round(8000 * np.sin(2 * np.pi * 8 * k / 100)).astype(np.int16)
    assets = spark.createDataFrame(
        pd.DataFrame(
            {"asset_id": [1], "payload": [encode_wav(tone[:, None], 16000)]}
        )
    )
    rows = detect_active_segments(assets, frame_len=256, hop=256).collect()
    assert len(rows) == 1
    assert rows[0]["start_sample"] == 0 and rows[0]["end_sample"] == 100
