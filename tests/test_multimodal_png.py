"""REAL PNG codec tests: stdlib zlib + the five PNG filter types in
numpy (functions/multimodal.py).  Mirrors the BMP codec's test strategy:
exact roundtrips across shapes/filters/color types, named failures on
malformed payloads, and the Spark mapInPandas stages on genuine PNG
bytes."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
import pytest

from entropy_balance_weighting_spark.functions import multimodal
from entropy_balance_weighting_spark.functions.multimodal import (
    _PNG_MAGIC,
    _png_chunk,
    decode_image,
    decode_png,
    encode_png,
)


def _rng():
    return np.random.default_rng(7)


def test_png_roundtrip_gray_and_rgb_all_filter_modes():
    rng = _rng()
    for h, w in [(1, 1), (1, 9), (7, 1), (5, 5), (13, 17), (24, 3)]:
        for mode in ("cycle", "none"):
            g = rng.integers(0, 256, (h, w), dtype=np.uint8)
            out = decode_png(encode_png(g, filters=mode))
            assert out.shape == (h, w, 3)
            for ch in range(3):
                np.testing.assert_array_equal(out[:, :, ch], g)
            rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            np.testing.assert_array_equal(
                decode_png(encode_png(rgb, filters=mode)), rgb
            )


def test_png_cycle_mode_exercises_all_five_filters():
    """filters='cycle' must actually emit every filter type 0-4 so a
    roundtrip proves all five unfilter paths."""
    b = encode_png(_rng().integers(0, 256, (10, 9, 3), dtype=np.uint8))
    pos, idat = 8, b""
    while pos + 8 <= len(b):
        (clen,) = struct.unpack_from(">I", b, pos)
        if b[pos + 4 : pos + 8] == b"IDAT":
            idat += b[pos + 8 : pos + 8 + clen]
        pos += 12 + clen
    raw = zlib.decompress(idat)
    rowlen = 1 + 9 * 3
    assert sorted({raw[y * rowlen] for y in range(10)}) == [0, 1, 2, 3, 4]


def test_png_decodes_each_filter_in_isolation():
    """Hand-built single-filter images: every row carries the SAME filter
    type, so a bug in any one unfilter path cannot hide behind the
    others."""
    rng = _rng()
    px = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
    raw16 = px.reshape(6, 24).astype(np.int16)
    prev = np.zeros_like(raw16)
    prev[1:] = raw16[:-1]
    left = np.zeros_like(raw16)
    left[:, 3:] = raw16[:, :-3]
    upleft = np.zeros_like(raw16)
    upleft[1:, 3:] = raw16[:-1, :-3]
    p = left + prev - upleft
    pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
    paeth = np.where(
        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
    )
    filtered = {
        0: raw16,
        1: raw16 - left,
        2: raw16 - prev,
        3: raw16 - ((left + prev) >> 1),
        4: raw16 - paeth,
    }
    for f, rows in filtered.items():
        body = bytearray()
        for y in range(6):
            body.append(f)
            body += (rows[y] & 0xFF).astype(np.uint8).tobytes()
        png = (
            _PNG_MAGIC
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 6, 8, 2, 0, 0, 0))
            + _png_chunk(b"IDAT", zlib.compress(bytes(body)))
            + _png_chunk(b"IEND", b"")
        )
        np.testing.assert_array_equal(decode_png(png), px, err_msg=f"filter {f}")


def test_png_rgba_decodes_alpha_dropped():
    rng = _rng()
    rgba = rng.integers(0, 256, (3, 4, 4), dtype=np.uint8)
    body = bytearray()
    for y in range(3):
        body.append(0)
        body += rgba[y].tobytes()
    png = (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 6, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(bytes(body)))
        + _png_chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(png), rgba[:, :, :3])


def test_png_rejects_unsupported_and_malformed():
    px = _rng().integers(0, 256, (4, 4), dtype=np.uint8)
    good = encode_png(px)
    # not a PNG at all
    with pytest.raises(NotImplementedError):
        decode_png(b"BM" + bytes(60))
    # sub-byte depths became REAL in r9 — a truncated 4-bit stream is now
    # the named malformed error, and the remaining gap is the spec-illegal
    # combo (sub-byte RGB), still a named NotImplementedError
    sb_ihdr = _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 4, 0, 0, 0, 0))
    with pytest.raises(ValueError, match="filtered bytes"):
        decode_png(_PNG_MAGIC + sb_ihdr + _png_chunk(b"IDAT", zlib.compress(b"x")) + _png_chunk(b"IEND", b""))
    bad_ihdr = _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 4, 2, 0, 0, 0))
    with pytest.raises(NotImplementedError, match="depth"):
        decode_png(_PNG_MAGIC + bad_ihdr + _png_chunk(b"IDAT", zlib.compress(b"x")) + _png_chunk(b"IEND", b""))
    # 16-bit palette is spec-illegal and stays a named error
    p16_ihdr = _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 16, 3, 0, 0, 0))
    with pytest.raises(NotImplementedError, match="palette"):
        decode_png(_PNG_MAGIC + p16_ihdr + _png_chunk(b"IDAT", zlib.compress(b"x")) + _png_chunk(b"IEND", b""))
    # Adam7 is now REAL; a truncated interlaced stream is a named error
    il_ihdr = _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1))
    with pytest.raises(ValueError, match="filtered bytes"):
        decode_png(_PNG_MAGIC + il_ihdr + _png_chunk(b"IDAT", zlib.compress(b"x")) + _png_chunk(b"IEND", b""))
    # palette image without a PLTE chunk
    p_ihdr = _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0))
    with pytest.raises(ValueError, match="missing PLTE"):
        decode_png(_PNG_MAGIC + p_ihdr + _png_chunk(b"IDAT", zlib.compress(bytes(20))) + _png_chunk(b"IEND", b""))
    # truncation into the IDAT chunk must be a named ValueError, not an
    # index error (cutting only the 12-byte IEND trailer still decodes)
    with pytest.raises(ValueError, match="truncated"):
        decode_png(good[: len(good) - 20])
    # wrong decompressed length
    short = (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(bytes(7)))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="filtered bytes"):
        decode_png(short)


def test_decode_image_dispatches_on_magic_bytes():
    rng = _rng()
    rgb = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(encode_png(rgb)), rgb)
    np.testing.assert_array_equal(
        decode_image(multimodal.encode_bmp(rgb)), rgb
    )
    # JPEG magic now reaches the REAL baseline decoder, which names the
    # malformation rather than the format gap
    with pytest.raises(ValueError, match="truncated segment"):
        decode_image(b"\xff\xd8\xff\xe0" + bytes(60))
    # TIFF magic now reaches the REAL strip decoder (garbage IFD)
    with pytest.raises(ValueError, match="truncated IFD"):
        decode_image(b"II*\x00" + bytes(60))
    with pytest.raises(NotImplementedError, match="unsupported image format"):
        decode_image(b"8BPS" + bytes(60))  # Photoshop magic — genuinely absent


def test_decode_image_batch_mixed_png_and_bmp():
    """One Arrow batch carrying BOTH formats decodes per-payload via the
    magic dispatch — the realistic mixed-corpus shape."""
    rng = _rng()
    imgs = [rng.integers(0, 256, (4 + i, 5 + i, 3), dtype=np.uint8) for i in range(4)]
    pay = pd.Series(
        [
            encode_png(imgs[0]),
            multimodal.encode_bmp(imgs[1]),
            encode_png(imgs[2], filters="none"),
            multimodal.encode_bmp(imgs[3]),
        ]
    )
    out = multimodal.decode_image_batch(pay)
    for i, im in enumerate(imgs):
        assert out["height"][i] == im.shape[0]
        assert out["width"][i] == im.shape[1]
        g = im.astype(np.float64)
        np.testing.assert_allclose(
            out["feature"][i], [g.mean(), g.std(), g.min(), g.max()]
        )


def test_resize_png_input_nearest_neighbor():
    rng = _rng()
    rgb = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
    out = multimodal.resize_image_batch(pd.Series([encode_png(rgb)]), 8, 6)
    px = multimodal.decode_image(out[0])
    assert px.shape == (6, 8, 3)
    ri = np.arange(6) * 10 // 6
    ci = np.arange(8) * 12 // 8
    np.testing.assert_array_equal(px, rgb[ri[:, None], ci[None, :]])


def test_spark_stages_on_real_png_bytes(spark):
    """extract_features + resize_images over genuine PNG payloads in a
    Spark DataFrame — values match a local numpy recompute exactly."""
    rng = _rng()
    ids = list(range(24))
    imgs = {
        i: rng.integers(0, 256, (i % 7 + 3, i % 9 + 3, 3), dtype=np.uint8)
        for i in ids
    }
    pdf = pd.DataFrame(
        {"doc_id": ids, "payload": [encode_png(imgs[i]) for i in ids]}
    )
    df = spark.createDataFrame(pdf).repartition(4)
    feats = {
        r["doc_id"]: r
        for r in multimodal.extract_features(df).collect()
    }
    for i in ids:
        g = imgs[i].astype(np.float64)
        assert feats[i]["width"] == imgs[i].shape[1]
        assert feats[i]["height"] == imgs[i].shape[0]
        np.testing.assert_allclose(
            feats[i]["feature"], [g.mean(), g.std(), g.min(), g.max()]
        )
    resized = {
        r["doc_id"]: r for r in multimodal.resize_images(df, 5, 4).collect()
    }
    for i in ids:
        px = multimodal.decode_image(bytes(resized[i]["payload"]))
        h0, w0 = imgs[i].shape[:2]
        ri = np.arange(4) * h0 // 4
        ci = np.arange(5) * w0 // 5
        np.testing.assert_array_equal(px, imgs[i][ri[:, None], ci[None, :]])


def test_png_adam7_interlace_roundtrips_exactly():
    """Adam7: seven passes, each filtered independently with a restarted
    previous-row — odd sizes cover empty passes."""
    rng = _rng()
    for shape in ((1, 1, 3), (2, 3, 3), (7, 5, 3), (8, 8, 3), (9, 13, 3), (40, 33)):
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        want = px if px.ndim == 3 else np.repeat(px[:, :, None], 3, axis=2)
        for filt in ("cycle", "none"):
            out = decode_png(encode_png(px, filters=filt, interlace=True))
            np.testing.assert_array_equal(out, want)


def test_png_palette_roundtrips_exactly():
    """Color type 3: PLTE gather, plain and interlaced, 1..256 entries."""
    rng = _rng()
    for n in (1, 2, 17, 256):
        pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, (11, 14)).astype(np.uint8)
        for interlace in (False, True):
            out = decode_png(encode_png(idx, palette=pal, interlace=interlace))
            np.testing.assert_array_equal(out, pal[idx])


def test_png_palette_rejects_bad_inputs():
    pal = np.zeros((4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="index out of range"):
        encode_png(np.full((2, 2), 9, dtype=np.uint8), palette=pal)
    with pytest.raises(ValueError, match="palette mode expects"):
        encode_png(np.zeros((2, 2, 3), dtype=np.uint8), palette=pal)


def test_png_16bit_roundtrip_all_filters_and_adam7():
    """depth=16: samples are 2 filter bytes (byte-channel doubling, no
    separate filter path); decode keeps the big-endian high byte.  Gray
    and RGB, cycle/none filters, plain and Adam7."""
    rng = _rng()
    for shape in ((1, 1), (25, 33), (16, 5, 3), (7, 40, 3)):
        px16 = rng.integers(0, 65536, shape, dtype=np.uint16)
        want = (px16 >> 8).astype(np.uint8)
        if px16.ndim == 2:
            want = np.repeat(want[:, :, None], 3, axis=2)
        for interlace in (False, True):
            for filters in ("cycle", "none"):
                out = decode_png(
                    encode_png(
                        px16, depth=16, interlace=interlace, filters=filters
                    )
                )
                np.testing.assert_array_equal(out, want)


def test_png_16bit_rejects_palette_and_bad_depth():
    rng = _rng()
    with pytest.raises(ValueError, match="16-bit palette"):
        encode_png(
            rng.integers(0, 4, (4, 4), dtype=np.uint16),
            depth=16,
            palette=np.zeros((4, 3), dtype=np.uint8),
        )
    with pytest.raises(ValueError, match="depth must be"):
        encode_png(rng.integers(0, 256, (4, 4), dtype=np.uint8), depth=12)


def test_png_subbyte_gray_and_palette_roundtrip():
    """1/2/4-bit PNG (gray + palette), plain and Adam7, every filter
    mode: decode reproduces the exact sample grid (gray expanded by the
    integral 255/(2^d-1) factor) and the header probe reads dims."""
    from entropy_balance_weighting_spark.functions.multimodal import (
        probe_image,
    )

    rng = _rng()
    for depth in (1, 2, 4):
        scale = 255 // ((1 << depth) - 1)
        for interlace in (False, True):
            for filters in ("cycle", "none"):
                g = rng.integers(0, 1 << depth, (13, 17), dtype=np.uint8)
                out = decode_png(
                    encode_png(
                        g, depth=depth, interlace=interlace, filters=filters
                    )
                )
                want = np.repeat(
                    (g * scale).astype(np.uint8)[:, :, None], 3, axis=2
                )
                np.testing.assert_array_equal(out, want)
                pal = rng.integers(0, 256, (1 << depth, 3), dtype=np.uint8)
                idx = rng.integers(0, 1 << depth, (9, 31), dtype=np.uint8)
                out2 = decode_png(
                    encode_png(
                        idx, depth=depth, palette=pal,
                        interlace=interlace, filters=filters,
                    )
                )
                np.testing.assert_array_equal(out2, pal[idx])
        p = probe_image(encode_png(np.zeros((5, 7), dtype=np.uint8), depth=depth))
        assert (p["width"], p["height"]) == (7, 5)


def test_png_subbyte_rejects_bad_inputs():
    rng = _rng()
    with pytest.raises(ValueError, match="out of range for depth 2"):
        encode_png(np.array([[4]], dtype=np.uint8), depth=2)
    with pytest.raises(ValueError, match="sample array"):
        encode_png(rng.integers(0, 2, (4, 4, 3), dtype=np.uint8), depth=1)
    with pytest.raises(ValueError, match="palette must have"):
        encode_png(
            np.zeros((4, 4), dtype=np.uint8), depth=2,
            palette=np.zeros((8, 3), dtype=np.uint8),  # 8 > 2^2
        )
