"""REAL FLAC codec tests (functions/flac_codec.py): fixed-predictor +
Rice encoding roundtrips (lossless, exact), CRC-8/CRC-16 verification,
and hand-built streams for the decoder-only paths the encoder doesn't
emit — LPC subframes, multi-partition residuals, Rice escape codes, and
mid/side stereo decorrelation."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from entropy_balance_weighting_spark.functions import multimodal
from entropy_balance_weighting_spark.functions.flac_codec import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_coded,
    _zigzag,
    decode_flac,
    encode_flac,
)


def _rng():
    return np.random.default_rng(41)


def _smooth(n):
    t = np.arange(n)
    return (1000 * np.sin(t / 50) + 500 * np.sin(t / 13)).astype(np.int16)


def test_flac_roundtrips_exact():
    rng = _rng()
    cases = [
        _smooth(5000),
        rng.integers(-32768, 32768, 3000).astype(np.int16),  # worst case
        np.full(2000, 42, dtype=np.int16),  # constant
        np.array([123], dtype=np.int16),  # single sample
        np.arange(-500, 500, dtype=np.int16),  # pure ramp (order-2 zeros)
    ]
    for s in cases:
        for bs in (256, 1024, 4096):
            out, rate = decode_flac(encode_flac(s, 8000, block_size=bs))
            assert rate == 8000
            np.testing.assert_array_equal(out[:, 0], s)


def test_flac_actually_compresses_smooth_signals():
    s = _smooth(20_000)
    payload = encode_flac(s, 16_000)
    assert len(payload) < 0.4 * (2 * len(s))


def test_flac_stereo_and_8bit():
    rng = _rng()
    base = _smooth(3000)
    st = np.stack([base, (base // 2 + 7).astype(np.int16)], axis=1)
    out, _ = decode_flac(encode_flac(st, 48_000, block_size=777))
    np.testing.assert_array_equal(out, st)
    small = rng.integers(-128, 128, 1000).astype(np.int16)
    out, _ = decode_flac(encode_flac(small, 8000, bits_per_sample=8))
    np.testing.assert_array_equal(out[:, 0], small)


def test_flac_rejects_malformed():
    s = _smooth(500)
    good = encode_flac(s, 8000)
    with pytest.raises(NotImplementedError, match="not a FLAC"):
        decode_flac(b"RIFF" + bytes(40))
    with pytest.raises(ValueError):
        decode_flac(good[: len(good) - 10])
    # corrupt one entropy byte: a CRC must catch it
    bad = bytearray(good)
    bad[-10] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|malformed"):
        decode_flac(bytes(bad))
    with pytest.raises(ValueError, match="exceed"):
        encode_flac(np.array([300], dtype=np.int16), 8000, bits_per_sample=8)


def _handmade_frame(subframe_writer, n_ch=1, bs=16, ch_asgn=None, bps=16):
    """Build a one-frame FLAC stream around a custom subframe body."""
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(bs, 16)
    si.write(bs, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(bs, 36)
    body = bytes(si.out) + bytes(16)
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
    hdr = _BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 2)
    hdr.write(0b0111, 4)  # 16-bit blocksize at end
    hdr.write(0, 4)  # rate from streaminfo
    hdr.write(ch_asgn if ch_asgn is not None else n_ch - 1, 4)
    hdr.write(0b100, 3)  # 16 bps
    hdr.write(0, 1)
    header = bytes(hdr.out) + _utf8_coded(0) + struct.pack(">H", bs - 1)
    header += bytes([_crc8(header)])
    fw = _BitWriter()
    fw.out += header
    subframe_writer(fw)
    fw.align()
    frame = bytes(fw.out)
    out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def _write_rice(fw, res, param):
    for v in _zigzag(np.asarray(res, dtype=np.int64)).tolist():
        fw.write_unary(v >> param)
        if param:
            fw.write(v & ((1 << param) - 1), param)


def test_flac_decodes_handmade_lpc_subframe():
    """LPC order-1 with coefficient 1 and shift 0 is the fixed-1
    predictor — decoder-only path verified against the known signal."""
    x = np.arange(100, 116, dtype=np.int64)  # bs = 16
    res = np.diff(x)

    # precision field 3 -> 4-bit coefficients; shift 0; coeff +1
    def sub_ok(fw):
        fw.write(0, 1)
        fw.write(0b100000, 6)
        fw.write(0, 1)
        fw.write(int(x[0]), 16)
        fw.write(3, 4)  # precision = 4 bits
        fw.write(0, 5)  # shift 0
        fw.write(1, 4)  # qlp coeff = +1
        fw.write(0b00, 2)  # rice method 0
        fw.write(0, 4)  # partition order 0
        fw.write(2, 4)  # rice param
        _write_rice(fw, res, 2)

    payload = _handmade_frame(sub_ok, bs=16)
    out, rate = decode_flac(payload)
    np.testing.assert_array_equal(out[:, 0], x)


def test_flac_decodes_rice_partitions_and_escape():
    """Partition order 2 (4 partitions) with one ESCAPE partition
    (verbatim 6-bit residuals) — decoder-only residual paths."""
    x = np.arange(200, 216, dtype=np.int64)  # bs 16, order 0 verbatim-ish
    # FIXED order 0: residual == signal

    def sub(fw):
        fw.write(0, 1)
        fw.write(0b001000, 6)  # FIXED order 0
        fw.write(0, 1)
        fw.write(0b00, 2)
        fw.write(2, 4)  # partition order 2 -> 4 partitions of 4
        for p in range(4):
            part = x[p * 4 : (p + 1) * 4]
            if p == 1:  # escape partition: raw 10-bit residuals
                fw.write(15, 4)
                fw.write(10, 5)
                for v in part.tolist():
                    fw.write(int(v), 10)
            else:
                fw.write(3, 4)
                _write_rice(fw, part, 3)

    out, _ = decode_flac(_handmade_frame(sub, bs=16))
    np.testing.assert_array_equal(out[:, 0], x)


def test_flac_decodes_mid_side_and_left_side():
    left = np.array([100, 120, 90, 80] * 4, dtype=np.int64)
    right = np.array([60, 70, 50, 40] * 4, dtype=np.int64)
    mid = (left + right) >> 1
    side = left - right

    def verbatim(fw, vals, bits):
        fw.write(0, 1)
        fw.write(0b000001, 6)  # VERBATIM
        fw.write(0, 1)
        for v in vals.tolist():
            fw.write(int(v), bits)

    def sub_ms(fw):
        verbatim(fw, mid, 16)
        verbatim(fw, side, 17)  # side carries one extra bit

    out, _ = decode_flac(_handmade_frame(sub_ms, n_ch=2, bs=16, ch_asgn=10))
    np.testing.assert_array_equal(out[:, 0], left)
    np.testing.assert_array_equal(out[:, 1], right)

    def sub_ls(fw):
        verbatim(fw, left, 16)
        verbatim(fw, side, 17)

    out, _ = decode_flac(_handmade_frame(sub_ls, n_ch=2, bs=16, ch_asgn=8))
    np.testing.assert_array_equal(out[:, 0], left)
    np.testing.assert_array_equal(out[:, 1], right)


def test_flac_decodes_wasted_bits():
    """A subframe whose samples share k low zero bits can be coded with
    wasted-bits: decoder must shift back up."""
    x = (np.arange(16, dtype=np.int64) - 8) << 3  # 3 wasted bits

    def sub(fw):
        fw.write(0, 1)
        fw.write(0b000001, 6)  # VERBATIM
        fw.write(1, 1)  # wasted-bits flag
        fw.write(1, 3)  # unary 2 -> wasted = 3 (two zeros then a one)
        for v in (x >> 3).tolist():
            fw.write(int(v), 13)  # 16 - 3 effective bits

    out, _ = decode_flac(_handmade_frame(sub, bs=16))
    np.testing.assert_array_equal(out[:, 0], x)


def test_audio_dispatch_and_spark_stage(spark):
    """decode_audio_batch dispatches WAV and FLAC in one Arrow batch;
    the Spark feature stage decodes both for real."""
    rng = _rng()
    s1 = _smooth(400)
    s2 = rng.integers(-2000, 2000, 300).astype(np.int16)
    rows = [
        (0, bytearray(multimodal.encode_wav(s1, 8000))),
        (1, bytearray(encode_flac(s2, 16_000, block_size=64))),
        (2, bytearray(multimodal.encode_wav(s2, 8000, fmt="ulaw"))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in multimodal.extract_audio_features(df).collect()}
    assert out[0]["n_samples"] == 400 and out[0]["sample_rate"] == 8000
    assert out[1]["n_samples"] == 300 and out[1]["sample_rate"] == 16000
    np.testing.assert_allclose(
        out[1]["feature"][0], s2.astype(np.float64).mean()
    )
    with pytest.raises(NotImplementedError, match="unsupported audio format"):
        multimodal.decode_audio(b"OggS" + bytes(40))


def test_resample_clips_24bit_samples_instead_of_wrapping(monkeypatch):
    """decode_audio returns int32 for >16-bit FLAC; requantizing to PCM16
    must saturate, not wrap (r7 advice: bare astype(int16) wrapped)."""
    import pandas as pd

    from entropy_balance_weighting_spark.functions import multimodal as mm

    # 24-bit-range samples: +4M wraps to ~+... under astype(int16); the
    # correct saturating answer is +32767 / -32768.
    s = np.array([4_000_000, -4_000_000, 1000, -1000], dtype=np.int32)
    monkeypatch.setattr(mm, "decode_audio", lambda b: (s, 8000))
    out = mm.resample_audio_batch(pd.Series([b"ignored"]), 4)
    dec, rate = mm.decode_wav(out.iloc[0])
    assert rate == 8000
    np.testing.assert_array_equal(
        np.asarray(dec).ravel(), [32767, -32768, 1000, -1000]
    )


def test_flac_multichannel_roundtrip():
    """1-8 independent channels roundtrip exactly (the FLAC channel
    field is 3 bits; the per-channel subframe loop is channel-generic),
    and a 6-channel stream survives the decode_audio -> encode_wav
    re-encode path (WAV takes any channel count)."""
    from entropy_balance_weighting_spark.functions import multimodal
    from entropy_balance_weighting_spark.functions.flac_codec import (
        decode_flac,
        encode_flac,
    )

    rng = np.random.default_rng(5)
    for ch in (3, 6, 8):
        s = rng.integers(-32768, 32768, (3000, ch)).astype(np.int64)
        out, rate = decode_flac(encode_flac(s, 48000, block_size=512))
        assert out.shape == (3000, ch) and rate == 48000
        np.testing.assert_array_equal(out, s)
    s6 = rng.integers(-32768, 32768, (100, 6)).astype(np.int64)
    wav = multimodal.encode_wav(
        np.asarray(decode_flac(encode_flac(s6))[0], dtype=np.int16), 16000
    )
    dec, _ = multimodal.decode_wav(wav)
    np.testing.assert_array_equal(np.asarray(dec), s6)
    with pytest.raises(ValueError, match=r"\(N,1\.\.8\)"):
        encode_flac(np.zeros((4, 9), dtype=np.int64))
