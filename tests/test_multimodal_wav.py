"""REAL WAV codec tests: RIFF/WAVE PCM chunk walk + frombuffer reshape
(functions/multimodal.py).  Mirrors the BMP/PNG codec test strategy:
exact roundtrips across shapes/channels/rates, named failures on
malformed payloads, and the Spark mapInPandas stages on genuine WAV
bytes."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from entropy_balance_weighting_spark.functions import multimodal
from entropy_balance_weighting_spark.functions.multimodal import (
    decode_wav,
    encode_wav,
)


def _rng():
    return np.random.default_rng(11)


def test_wav_roundtrip_mono_stereo_rates():
    rng = _rng()
    for n in (1, 7, 160, 1001):
        for ch in (1, 2, 4):
            for rate in (8000, 16000, 44100):
                s = rng.integers(-32768, 32768, (n, ch), dtype=np.int16)
                out, r = decode_wav(encode_wav(s, rate))
                assert r == rate
                np.testing.assert_array_equal(out, s)


def test_wav_roundtrip_1d_mono_input():
    s = _rng().integers(-32768, 32768, 50, dtype=np.int16)
    out, _ = decode_wav(encode_wav(s))
    assert out.shape == (50, 1)
    np.testing.assert_array_equal(out[:, 0], s)


def test_wav_decodes_8bit_pcm():
    """8-bit unsigned PCM widens to int16 via (v-128)<<8 — hand-built
    payload since encode_wav only emits 16-bit."""
    raw = np.array([[0, 128], [255, 1]], dtype=np.uint8)  # 2 frames, 2 ch
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 2, 2, 8)
    body = raw.tobytes()
    data = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    payload = b"RIFF" + struct.pack("<I", len(data)) + data
    out, rate = decode_wav(payload)
    assert rate == 8000
    expected = ((raw.astype(np.int16) - 128) << 8).astype(np.int16)
    np.testing.assert_array_equal(out, expected)


def test_wav_tolerates_extra_chunks_and_odd_padding():
    """Real-world WAVs carry LIST/fact chunks (word-aligned); the chunk
    walk must skip them, including odd-length chunks with a pad byte."""
    s = _rng().integers(-1000, 1000, (9, 1), dtype=np.int16)
    good = encode_wav(s, 12000)
    # splice an odd-length junk chunk between fmt and data
    fmt_end = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad to even
    spliced = good[:fmt_end] + junk + good[fmt_end:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    out, rate = decode_wav(spliced)
    assert rate == 12000
    np.testing.assert_array_equal(out, s)


def test_wav_rejects_unsupported_and_malformed():
    s = _rng().integers(-100, 100, (5, 1), dtype=np.int16)
    good = encode_wav(s)
    # not RIFF at all
    with pytest.raises(NotImplementedError, match="not a RIFF/WAVE"):
        decode_wav(b"\x89PNG\r\n\x1a\n" + bytes(60))
    # RIFF but not WAVE
    with pytest.raises(NotImplementedError, match="not a RIFF/WAVE"):
        decode_wav(b"RIFF" + struct.pack("<I", 40) + b"AVI " + bytes(40))
    # non-PCM format tag
    bad = bytearray(good)
    bad[20:22] = struct.pack("<H", 3)  # IEEE float
    with pytest.raises(NotImplementedError, match="PCM"):
        decode_wav(bytes(bad))
    # 24-bit samples
    bad = bytearray(good)
    bad[34:36] = struct.pack("<H", 24)
    with pytest.raises(NotImplementedError, match="PCM"):
        decode_wav(bytes(bad))
    # truncated data chunk must be a NAMED error
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(good[:-4])
    # missing data chunk entirely (junk-padded past the 44-byte minimum)
    hdr_only = good[: 12 + 8 + 16] + b"LIST" + struct.pack("<I", 8) + bytes(8)
    hdr_only = b"RIFF" + struct.pack("<I", len(hdr_only) - 8) + hdr_only[8:]
    with pytest.raises(ValueError, match="missing fmt/data"):
        decode_wav(hdr_only)
    # zero channels
    bad = bytearray(good)
    bad[22:24] = struct.pack("<H", 0)
    with pytest.raises(ValueError, match="channels"):
        decode_wav(bytes(bad))


def test_decode_audio_batch_features_exact():
    rng = _rng()
    sigs = [
        rng.integers(-2000, 2000, (n, ch), dtype=np.int16)
        for n, ch in [(20, 1), (33, 2), (7, 1)]
    ]
    out = multimodal.decode_audio_batch(
        pd.Series([encode_wav(s, 16000) for s in sigs])
    )
    for i, s in enumerate(sigs):
        assert out["n_samples"][i] == s.shape[0]
        assert out["n_channels"][i] == s.shape[1]
        assert out["sample_rate"][i] == 16000
        f = s.astype(np.float64)
        np.testing.assert_allclose(
            out["feature"][i], [f.mean(), f.min(), f.max(), (f * f).mean()]
        )
        # the exact-integer reconstruction the SQL oracle relies on
        cells = s.shape[0] * s.shape[1]
        assert round(out["feature"][i][0] * cells) == int(s.sum())
        assert round(out["feature"][i][3] * cells) == int(
            (s.astype(np.int64) ** 2).sum()
        )


def test_resample_audio_batch_nearest_neighbor():
    rng = _rng()
    s = rng.integers(-3000, 3000, (50, 2), dtype=np.int16)
    out = multimodal.resample_audio_batch(pd.Series([encode_wav(s, 22050)]), 16)
    rs, rate = decode_wav(out[0])
    assert rate == 22050
    idx = np.arange(16) * 50 // 16
    np.testing.assert_array_equal(rs, s[idx])


def test_spark_stages_on_real_wav_bytes(spark):
    """extract_audio_features + resample_audio over genuine WAV payloads
    in a Spark DataFrame — values match a local numpy recompute exactly."""
    rng = _rng()
    ids = list(range(24))
    sigs = {
        i: rng.integers(-5000, 5000, (i % 30 + 10, i % 2 + 1), dtype=np.int16)
        for i in ids
    }
    pdf = pd.DataFrame(
        {"doc_id": ids, "payload": [encode_wav(sigs[i], 8000) for i in ids]}
    )
    df = spark.createDataFrame(pdf).repartition(4)
    feats = {
        r["doc_id"]: r for r in multimodal.extract_audio_features(df).collect()
    }
    for i in ids:
        f = sigs[i].astype(np.float64)
        assert feats[i]["n_samples"] == sigs[i].shape[0]
        assert feats[i]["n_channels"] == sigs[i].shape[1]
        assert feats[i]["sample_rate"] == 8000
        np.testing.assert_allclose(
            feats[i]["feature"], [f.mean(), f.min(), f.max(), (f * f).mean()]
        )
    resampled = {
        r["doc_id"]: r for r in multimodal.resample_audio(df, 8).collect()
    }
    for i in ids:
        rs, _ = decode_wav(bytes(resampled[i]["payload"]))
        n0 = sigs[i].shape[0]
        idx = np.arange(8) * n0 // 8
        np.testing.assert_array_equal(rs, sigs[i][idx])


# -- G.711 µ-law / A-law companding -------------------------------------------


def test_g711_every_code_roundtrips_through_linear():
    """code -> linear -> code is the identity for all 256 A-law codes and
    all µ-law codes except 0x7F (µ-law's 'minus zero' aliases to 0xFF —
    both decode to 0, a spec property, not a bug)."""
    codes = np.arange(256, dtype=np.uint8)
    rt_a = multimodal.alaw_encode(multimodal.alaw_decode(codes))
    np.testing.assert_array_equal(rt_a, codes)
    rt_u = multimodal.ulaw_encode(multimodal.ulaw_decode(codes))
    bad = np.nonzero(rt_u != codes)[0]
    assert bad.tolist() == [0x7F]
    assert int(multimodal.ulaw_decode(np.array([0x7F]))[0]) == 0
    assert int(rt_u[0x7F]) == 0xFF


def test_g711_known_reference_points():
    """Spot values from the G.711 expansion tables."""
    assert int(multimodal.ulaw_decode(np.array([0xFF]))[0]) == 0
    assert int(multimodal.ulaw_decode(np.array([0x80]))[0]) == 32124
    assert int(multimodal.ulaw_decode(np.array([0x00]))[0]) == -32124
    assert int(multimodal.alaw_decode(np.array([0xD5]))[0]) == 8
    assert int(multimodal.alaw_decode(np.array([0x55]))[0]) == -8
    # sign bit SET means positive on the A-law wire: 0xAA^0x55 = 0xFF
    assert int(multimodal.alaw_decode(np.array([0xAA]))[0]) == 32256
    assert int(multimodal.alaw_decode(np.array([0x2A]))[0]) == -32256
    assert int(multimodal.alaw_encode(np.array([32767], dtype=np.int16))[0]) == 0xAA


def test_g711_companding_error_bounds():
    """linear -> code -> linear stays within the top-segment quantization
    step (µ-law also clips at ±32124 ± the 644 clip margin)."""
    rng = _rng()
    x = rng.integers(-32768, 32768, 100_000).astype(np.int16)
    x = np.concatenate(
        [x, np.array([-32768, -32767, -1, 0, 1, 32766, 32767], dtype=np.int16)]
    )
    eu = np.abs(multimodal.ulaw_decode(multimodal.ulaw_encode(x)).astype(int) - x)
    ea = np.abs(multimodal.alaw_decode(multimodal.alaw_encode(x)).astype(int) - x)
    assert eu.max() <= 644  # 32768 - 32124 clip margin dominates
    assert ea.max() <= 512  # top-segment step


def test_wav_container_g711_roundtrips():
    rng = _rng()
    s = rng.integers(-32768, 32768, (300, 2)).astype(np.int16)
    for fmt, kernel in (
        ("ulaw", multimodal.ulaw_decode),
        ("alaw", multimodal.alaw_decode),
    ):
        enc = multimodal.encode_wav(s, 8000, fmt=fmt)
        out, rate = multimodal.decode_wav(enc)
        assert rate == 8000 and out.shape == s.shape
        # container decode == kernel applied to the companded codes
        want = kernel(
            {"ulaw": multimodal.ulaw_encode, "alaw": multimodal.alaw_encode}[fmt](s)
        )
        np.testing.assert_array_equal(out, want)


def test_wav_rejects_unknown_companding():
    with pytest.raises(ValueError, match="fmt must be one of"):
        multimodal.encode_wav(np.zeros(4, dtype=np.int16), fmt="adpcm")


# -- audio fingerprint ---------------------------------------------------------


def test_audio_fingerprint_volume_invariant_and_discriminative():
    rng = _rng()
    base = rng.integers(-2000, 2000, 500).astype(np.int64)
    fp1 = multimodal.audio_fingerprint(base)
    fp2 = multimodal.audio_fingerprint(base * 3)  # exact volume scale
    other = rng.integers(-2000, 2000, 500).astype(np.int64)
    assert fp1 == fp2
    assert fp1 != multimodal.audio_fingerprint(other)
    # monotone-increasing energy envelope sets every bit
    ramp = np.repeat(np.arange(16) * 100, 10)
    assert multimodal.audio_fingerprint(ramp) == (1 << 15) - 1
    assert multimodal.audio_fingerprint(ramp[::-1]) == 0
    assert multimodal.audio_fingerprint(np.array([], dtype=np.int64)) == 0


def test_fingerprint_audio_spark_stage_mixed_wav_flac(spark):
    """The fingerprint stage dispatches WAV and FLAC payloads; a FLAC
    re-encode of the same samples must produce the same fingerprint
    (lossless)."""
    from entropy_balance_weighting_spark.functions.flac_codec import encode_flac

    rng = _rng()
    s = rng.integers(-2000, 2000, 400).astype(np.int16)
    rows = [
        (0, bytearray(multimodal.encode_wav(s, 8000))),
        (1, bytearray(encode_flac(s, 8000, block_size=64))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r["fingerprint"] for r in multimodal.fingerprint_audio(df).collect()}
    assert out[0] == out[1]
