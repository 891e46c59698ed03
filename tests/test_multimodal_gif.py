"""REAL GIF codec tests: full variable-width LZW in both directions,
global/local palettes, four-pass interlace, sub-block framing
(functions/gif_codec.py).  GIF is lossless on indexed data, so roundtrips
assert EXACT pixel equality — including streams long enough to force
12-bit codes and a mid-stream CLEAR table reset (the case where a
deferred table walk would corrupt pre-reset segments)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from entropy_balance_weighting_spark.functions import multimodal
from entropy_balance_weighting_spark.functions.gif_codec import (
    _interlace_order,
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)


def _rng():
    return np.random.default_rng(29)


# -- LZW layer ---------------------------------------------------------------


def test_lzw_roundtrip_random_symbols():
    rng = _rng()
    for mcs in (2, 4, 8):
        n_sym = 1 << mcs
        seq = rng.integers(0, n_sym, 5000)
        out = lzw_decode(lzw_encode(seq, mcs), mcs, len(seq))
        np.testing.assert_array_equal(out, seq)


def test_lzw_roundtrip_constant_sequence_exercises_kwkwk():
    """All-equal input makes every emitted code the just-added entry
    (the code == next_code KwKwK case) — the classic LZW edge."""
    seq = np.zeros(10_000, dtype=np.int64)
    out = lzw_decode(lzw_encode(seq, 2), 2, len(seq))
    np.testing.assert_array_equal(out, seq)


def test_lzw_roundtrip_through_table_full_and_clear_reset():
    """Random 8-bit data beyond ~3.9k codes forces 12-bit widths and a
    CLEAR reset; pre-reset output must not be corrupted by the slot
    rewrites that follow the reset."""
    rng = _rng()
    seq = rng.integers(0, 256, 60_000)
    out = lzw_decode(lzw_encode(seq, 8), 8, len(seq))
    np.testing.assert_array_equal(out, seq)


def test_lzw_encode_rejects_out_of_range_symbol():
    with pytest.raises(ValueError, match="out of range"):
        lzw_encode(np.array([0, 4]), 2)


def test_lzw_decode_truncated_stream_raises():
    data = lzw_encode(np.arange(16) % 4, 2)
    with pytest.raises(ValueError, match="ended at"):
        lzw_decode(data[: len(data) // 2], 2, 16)


# -- container layer ---------------------------------------------------------


def test_gif_roundtrip_exact_all_variants():
    rng = _rng()
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (37, 53))
    want = pal[idx]
    for interlace in (False, True):
        for local in (False, True):
            out = decode_gif(
                encode_gif(idx, pal, interlace=interlace, local_palette=local)
            )
            np.testing.assert_array_equal(out, want)


def test_gif_small_palette_and_single_row_and_column():
    rng = _rng()
    pal = np.array([[0, 0, 0], [255, 128, 7]], dtype=np.uint8)
    for shape in ((1, 17), (23, 1), (1, 1)):
        idx = rng.integers(0, 2, shape)
        np.testing.assert_array_equal(decode_gif(encode_gif(idx, pal)), pal[idx])


def test_gif_large_image_spans_many_subblocks_and_clears():
    """>255-byte LZW data forces multi-sub-block framing; 300x400 random
    forces CLEAR resets inside one image."""
    rng = _rng()
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (300, 400))
    payload = encode_gif(idx, pal, interlace=True)
    assert len(payload) > 10_000
    np.testing.assert_array_equal(decode_gif(payload), pal[idx])


def test_gif_interlace_order_is_a_permutation():
    for h in (1, 2, 3, 7, 8, 9, 64):
        order = _interlace_order(h)
        assert sorted(order.tolist()) == list(range(h))
    # GIF89a appendix E example: first rows of each pass for h=16
    assert _interlace_order(16)[:2].tolist() == [0, 8]


def test_gif_skips_extension_blocks():
    """A GCE extension (as animation tools emit) before the image
    descriptor is skipped, not misparsed."""
    rng = _rng()
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, (5, 6))
    payload = bytearray(encode_gif(idx, pal))
    # splice a Graphic Control Extension right before the 0x2C descriptor
    at = payload.index(0x2C, 13)
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    spliced = bytes(payload[:at]) + gce + bytes(payload[at:])
    np.testing.assert_array_equal(decode_gif(spliced), pal[idx])


def test_gif_malformed_payloads_raise_named_errors():
    rng = _rng()
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    good = encode_gif(rng.integers(0, 4, (5, 6)), pal)
    with pytest.raises(NotImplementedError, match="not a GIF"):
        decode_gif(b"NOTGIF" + bytes(40))
    with pytest.raises(ValueError, match="truncated header"):
        decode_gif(b"GIF89a" + bytes(3))
    with pytest.raises(ValueError, match="truncated sub-block"):
        decode_gif(good[:-6])
    # a frame descriptor claiming to exceed the logical screen
    bad = bytearray(good)
    at = bad.index(0x2C, 13)
    bad[at + 5] = 0xFF  # frame width low byte -> huge
    with pytest.raises(ValueError, match="outside"):
        decode_gif(bytes(bad))


def test_decode_image_dispatches_gif_magic():
    rng = _rng()
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, (9, 11))
    out = multimodal.decode_image(encode_gif(idx, pal))
    np.testing.assert_array_equal(out, pal[idx])


# -- Spark stages on genuine GIF bytes ---------------------------------------


def test_decode_image_batch_mixed_gif_png_bmp():
    rng = _rng()
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (6, 7))
    rgb = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    pay = pd.Series(
        [
            encode_gif(idx, pal),
            multimodal.encode_png(rgb),
            multimodal.encode_bmp(rgb),
        ]
    )
    out = multimodal.decode_image_batch(pay)
    assert out["height"].tolist() == [6, 5, 5]
    assert out["width"].tolist() == [7, 4, 4]
    g = pal[idx].astype(np.float64)
    np.testing.assert_allclose(
        out["feature"][0], [g.mean(), g.std(), g.min(), g.max()]
    )


def test_resize_gif_input_nearest_neighbor():
    rng = _rng()
    pal = rng.integers(0, 256, (32, 3), dtype=np.uint8)
    idx = rng.integers(0, 32, (10, 12))
    out = multimodal.resize_image_batch(pd.Series([encode_gif(idx, pal)]), 8, 6)
    px = multimodal.decode_image(out[0])
    assert px.shape == (6, 8, 3)
    ri = np.arange(6) * 10 // 6
    ci = np.arange(8) * 12 // 8
    np.testing.assert_array_equal(px, pal[idx][np.ix_(ri, ci)])


def test_gif_through_spark_extract_features(spark):
    rng = _rng()
    pal = rng.integers(0, 256, (64, 3), dtype=np.uint8)
    rows = []
    imgs = {}
    for did in range(8):
        idx = rng.integers(0, 64, (4 + did, 5 + did))
        imgs[did] = pal[idx]
        rows.append((did, bytearray(encode_gif(idx, pal, interlace=did % 2 == 1))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r["doc_id"]: r
        for r in multimodal.extract_features(df).collect()
    }
    assert len(out) == 8
    for did, im in imgs.items():
        r = out[did]
        assert (r["height"], r["width"]) == im.shape[:2]
        np.testing.assert_allclose(r["feature"][0], im.astype(np.float64).mean())


# -- animation ----------------------------------------------------------------


def test_gif_animation_roundtrips_exactly():
    rng = _rng()
    from entropy_balance_weighting_spark.functions.gif_codec import (
        decode_gif_frames,
        encode_gif_animation,
    )

    for n, h, w in [(1, 4, 5), (3, 7, 6), (5, 9, 8)]:
        fr = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
        out = decode_gif_frames(encode_gif_animation(fr))
        assert len(out) == n
        np.testing.assert_array_equal(np.stack(out), fr)
    # decode_gif (still contract) reads the poster frame of an animation
    fr = rng.integers(0, 256, (3, 5, 5, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_gif(encode_gif_animation(fr)), fr[0]
    )


def test_gif_animation_compositing_offsets_and_transparency():
    """Hand-built animation: a partial frame at an offset with a
    transparency index must composite over the previous canvas."""
    import struct

    from entropy_balance_weighting_spark.functions.gif_codec import (
        decode_gif_frames,
        lzw_encode,
    )

    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]], np.uint8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0)  # GCT, 4 entries, bg 0
    out += pal.tobytes()

    def image(left, top, w, h, idx, gce_flags=None, transparent=0):
        buf = bytearray()
        if gce_flags is not None:
            buf += b"\x21\xf9\x04" + bytes([gce_flags, 0, 0, transparent, 0])
        buf += struct.pack("<BHHHHB", 0x2C, left, top, w, h, 0)
        data = lzw_encode(np.asarray(idx).reshape(-1), 2)
        buf.append(2)
        buf.append(len(data))
        buf += data
        buf.append(0)
        return buf

    # frame 1: full screen of color 1
    out += image(0, 0, 4, 4, np.full((4, 4), 1))
    # frame 2: 2x2 patch at (1,1), color 2 with index 3 transparent
    patch = np.array([[2, 3], [3, 2]])
    out += image(1, 1, 2, 2, patch, gce_flags=0x01, transparent=3)
    out.append(0x3B)
    frames = decode_gif_frames(bytes(out))
    assert len(frames) == 2
    np.testing.assert_array_equal(frames[0], pal[np.full((4, 4), 1)])
    want = pal[np.full((4, 4), 1)].copy()
    want[1, 1] = pal[2]
    want[2, 2] = pal[2]  # transparent cells keep frame-1 pixels
    np.testing.assert_array_equal(frames[1], want)


def test_gif_animation_disposal_restore_background_and_previous():
    import struct

    from entropy_balance_weighting_spark.functions.gif_codec import (
        decode_gif_frames,
        lzw_encode,
    )

    pal = np.array([[9, 9, 9], [255, 0, 0], [0, 255, 0], [7, 7, 7]], np.uint8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 3, 3, 0x80 | 1, 0, 0)  # bg index 0
    out += pal.tobytes()

    def image(idx, disposal, transparent=None):
        buf = bytearray()
        flags = (disposal << 2) | (1 if transparent is not None else 0)
        buf += b"\x21\xf9\x04" + bytes([flags, 0, 0, transparent or 0, 0])
        buf += struct.pack("<BHHHHB", 0x2C, 0, 0, 3, 3, 0)
        data = lzw_encode(np.asarray(idx).reshape(-1), 2)
        buf.append(2)
        buf.append(len(data))
        buf += data
        buf.append(0)
        return buf

    # frame 1 paints color 1 with disposal 2 (restore to background);
    # frame 2 paints ONE cell (rest transparent... simplest: full paint of
    # color 2) -- after frame 1 the canvas reverts to bg before frame 2
    out += image(np.full((3, 3), 1), disposal=2)
    out += image(np.full((3, 3), 2), disposal=0)
    out.append(0x3B)
    frames = decode_gif_frames(bytes(out))
    np.testing.assert_array_equal(frames[0], pal[np.full((3, 3), 1)])
    np.testing.assert_array_equal(frames[1], pal[np.full((3, 3), 2)])
    # disposal 3 (restore previous): frame 2's paint must not persist
    out2 = bytearray(b"GIF89a")
    out2 += struct.pack("<HHBBB", 3, 3, 0x80 | 1, 0, 0)
    out2 += pal.tobytes()
    out2 += image(np.full((3, 3), 1), disposal=0)
    out2 += image(np.full((3, 3), 2), disposal=3)
    # frame 3: index 0 marked TRANSPARENT, so only the two corner cells
    # paint — the rest must show whatever the disposal left behind
    out2 += image(
        np.array([[3, 0, 0], [0, 0, 0], [0, 0, 3]]), disposal=0, transparent=0
    )
    out2.append(0x3B)
    frames2 = decode_gif_frames(bytes(out2))
    np.testing.assert_array_equal(frames2[1], pal[np.full((3, 3), 2)])
    # frame 3 composites over the RESTORED frame-1 canvas, not frame 2
    want = pal[np.full((3, 3), 1)].copy()
    want[0, 0] = pal[3]
    want[2, 2] = pal[3]
    np.testing.assert_array_equal(frames2[2], want)


def test_sample_video_frames_dispatches_gif_animation(spark):
    rng = _rng()
    from entropy_balance_weighting_spark.functions.gif_codec import (
        encode_gif_animation,
    )

    vids = {}
    rows = []
    for did in range(4):
        fr = rng.integers(0, 256, (did % 3 + 2, 5, 6, 3), dtype=np.uint8)
        vids[did] = fr
        rows.append((did, bytearray(encode_gif_animation(fr))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = multimodal.sample_video_frames(df, every_n=2).collect()
    for r in out:
        px = multimodal.decode_image(bytes(r["frame"]))
        np.testing.assert_array_equal(px, vids[r["doc_id"]][r["frame_idx"]])
