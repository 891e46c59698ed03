"""REAL uncompressed-AVI demuxer tests (functions/avi_codec.py): RIFF
chunk-tree walk, bottom-up BGR DIB frame decode, and the Spark fan-out
sampler that re-encodes sampled frames as standalone BMPs.  Uncompressed
DIB is lossless, so roundtrips assert EXACT frame equality."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from entropy_balance_weighting_spark.functions import multimodal
from entropy_balance_weighting_spark.functions.avi_codec import (
    decode_avi_frames,
    encode_avi,
)


def _rng():
    return np.random.default_rng(31)


def test_avi_roundtrip_exact():
    rng = _rng()
    for n, h, w in [(1, 1, 1), (3, 5, 7), (8, 16, 12), (4, 9, 13)]:
        fr = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
        out, fps = decode_avi_frames(encode_avi(fr, fps=25))
        assert fps == 25.0
        assert len(out) == n
        for i in range(n):
            np.testing.assert_array_equal(out[i], fr[i])


def test_avi_odd_width_stride_padding():
    """Widths whose 3-byte rows are not 4-aligned exercise the DIB stride
    pad on both sides."""
    rng = _rng()
    for w in (1, 2, 3, 5, 6, 7):
        fr = rng.integers(0, 256, (2, 3, w, 3), dtype=np.uint8)
        out, _ = decode_avi_frames(encode_avi(fr))
        np.testing.assert_array_equal(np.stack(out), fr)


def test_avi_rejects_malformed_and_unsupported():
    rng = _rng()
    good = encode_avi(rng.integers(0, 256, (2, 4, 4, 3), dtype=np.uint8))
    with pytest.raises(NotImplementedError, match="not a RIFF/AVI"):
        decode_avi_frames(b"GIF89a" + bytes(40))
    with pytest.raises(ValueError, match="overruns|truncated|missing"):
        decode_avi_frames(good[: len(good) // 2])
    # flip biCompression to a nonzero FOURCC: named gap, not garbage
    bad = bytearray(good)
    i = bad.index(b"strf") + 8 + 16
    bad[i : i + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="only uncompressed"):
        decode_avi_frames(bytes(bad))


def test_avi_encode_rejects_bad_shapes():
    with pytest.raises(ValueError, match="expected"):
        encode_avi(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="expected"):
        encode_avi(np.zeros((0, 4, 4, 3), dtype=np.uint8))


def test_sample_video_frames_real_demux(spark):
    """The Spark sampler demuxes genuine AVI payloads and every sampled
    frame is a decodable BMP with the exact source pixels."""
    rng = _rng()
    vids = {}
    rows = []
    for did in range(6):
        n, h, w = did % 4 + 2, did % 3 + 4, did % 5 + 4
        fr = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
        vids[did] = fr
        rows.append((did, bytearray(encode_avi(fr))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = multimodal.sample_video_frames(df, every_n=2).collect()
    seen = {}
    for r in out:
        px = multimodal.decode_image(bytes(r["frame"]))  # REAL BMP decode
        np.testing.assert_array_equal(px, vids[r["doc_id"]][r["frame_idx"]])
        seen.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for did, fr in vids.items():
        assert sorted(seen[did]) == list(range(0, len(fr), 2))


def _multistream_avi(frames: np.ndarray, fps: int = 30) -> bytes:
    """Build an AVI whose VIDEO stream is stream index 1: stream 0 is an
    'auds' stream with its own >=40-byte strf, and the movi LIST
    interleaves foreign '00wb'/'00db' chunks (stream 0) between the real
    '01db' video frames.  A demuxer that takes the first strf or every
    ##db chunk decodes garbage here (r7 advice)."""
    from entropy_balance_weighting_spark.functions.avi_codec import _bmp_rows

    fr = np.asarray(frames, dtype=np.uint8)
    n, h, w, _ = fr.shape
    stride = (w * 3 + 3) // 4 * 4
    frame_size = stride * h

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(subtype: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", subtype + data)

    avih = struct.pack("<14I", 1_000_000 // fps, 0, 0, 0, n, 0, 2,
                       frame_size, w, h, 0, 0, 0, 0)
    strh_common = struct.pack(
        "<IHHIIIIIIIi4H", 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0, 0,
        0, 0, w, h,
    )
    # stream 0: audio, with a 40-byte strf full of poison values that
    # would parse as a ridiculous BITMAPINFOHEADER
    auds_strh = b"auds" + b"\x00\x00\x00\x00" + strh_common
    auds_strf = struct.pack("<IiiHHIIiiII", 40, -7, -9, 1, 13, 0xDEAD,
                            0, 0, 0, 0, 0)
    # stream 1: the real video stream
    vids_strh = b"vids" + b"DIB " + strh_common
    vids_strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            frame_size, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", auds_strh) + chunk(b"strf", auds_strf))
        + lst(b"strl", chunk(b"strh", vids_strh) + chunk(b"strf", vids_strf)),
    )
    movi_children = b""
    for f in fr:
        # foreign stream-0 chunks interleaved BEFORE each real frame:
        # one audio-data chunk and one hostile '00db' that is NOT a frame
        movi_children += chunk(b"00wb", b"\x42" * 37)
        movi_children += chunk(b"00db", b"\x99" * 11)
        movi_children += chunk(b"01db", _bmp_rows(f))
    body = b"AVI " + hdrl + lst(b"movi", movi_children)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_multistream_picks_vids_stream_only():
    rng = _rng()
    fr = rng.integers(0, 256, (3, 4, 6, 3), dtype=np.uint8)
    out, fps = decode_avi_frames(_multistream_avi(fr, fps=24))
    assert fps == 24.0
    assert len(out) == 3  # the '00db' poison chunks must NOT be frames
    for i in range(3):
        np.testing.assert_array_equal(out[i], fr[i])


def test_video_band_signatures_cross_format_dup(spark):
    """A clip and its brightness-shifted, GIF-re-encoded, extra-trailer
    variant must share every common-prefix (band, sig) bucket; an
    unrelated clip must share none."""
    from entropy_balance_weighting_spark.functions import multimodal as mm
    from entropy_balance_weighting_spark.functions.gif_codec import (
        encode_gif_animation,
    )

    rng = _rng()
    h, w, ncom = 12, 14, 6
    r = np.arange(h)[:, None]
    c = np.arange(w)[None, :]

    def clip(offset, extra, seed):
        fr = []
        for f in range(ncom):
            g = (7 * 17 + f * 29 + r * 23 + c * 31) % 251 + offset
            fr.append(np.repeat(g[:, :, None], 3, axis=2))
        for f in range(ncom, ncom + extra):
            g = (seed * 41 + f * 29 + r * 23 + c * 31) % 251
            fr.append(np.repeat(g[:, :, None], 3, axis=2))
        return np.asarray(fr, dtype=np.uint8)

    payloads = [
        (0, bytes(encode_avi(clip(0, 0, 0), fps=24))),
        (1, bytes(encode_gif_animation(clip(2, 2, 1)))),  # shifted + trailer
        (2, bytes(encode_avi(rng.integers(0, 251, (6, h, w, 3)).astype(np.uint8)))),
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    frames = mm.sample_video_frames(df, every_n=2)
    sigs = mm.video_band_signatures(
        mm.dhash_video_frames(frames), every_n=2, band_size=2
    )
    rows = {(x.doc_id, x.band): x.sig for x in sigs.collect()}
    # Shared prefix (sampled ordinals 0,1) fills band 0 identically for
    # both variants; the variant's trailer frame joins ITS band 1, so
    # band 1 legitimately differs — any-shared-band is the dup signal.
    assert rows[(0, 0)] == rows[(1, 0)]
    assert rows[(0, 1)] != rows[(1, 1)]
    assert rows[(2, 0)] != rows[(0, 0)]


def test_avi_mjpeg_roundtrip():
    """Motion-JPEG AVI: every frame is a baseline JPEG from our own
    codec; demux + per-frame decode recovers the frames within JPEG
    tolerance (smooth frames, q=95), fps and frame count exact; DIB
    output stays byte-exact alongside."""
    base = np.linspace(0, 200, 48 * 64).reshape(48, 64).astype(np.uint8)
    frames = np.stack(
        [np.stack([base + i * 3] * 3, axis=2) for i in range(5)]
    ).astype(np.uint8)
    avi = encode_avi(frames, fps=24, codec="mjpg", quality=95)
    out, fps = decode_avi_frames(avi)
    assert fps == 24.0 and len(out) == 5
    for o, f in zip(out, frames):
        assert o.shape == f.shape
        assert float(np.abs(o.astype(int) - f.astype(int)).mean()) < 2.0
    with pytest.raises(ValueError, match="codec must be"):
        encode_avi(frames, codec="h264")
