"""REAL baseline-TIFF codec tests (functions/tiff_codec.py): IFD walk in
both byte orders, strip layout, TIFF-variant LZW (MSB-first, EARLY code
width change — deliberately distinct from GIF LZW), PackBits RLE, and
photometric mappings.  Lossless, so roundtrips assert EXACT equality."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from entropy_balance_weighting_spark.functions import multimodal
from entropy_balance_weighting_spark.functions.tiff_codec import (
    decode_tiff,
    encode_tiff,
    lzw_decode_tiff,
    lzw_encode_tiff,
    packbits_decode,
    packbits_encode,
)


def _rng():
    return np.random.default_rng(37)


# -- compression layers --------------------------------------------------------


def test_tiff_lzw_roundtrips():
    rng = _rng()
    for data in (
        rng.integers(0, 256, 50_000, dtype=np.uint8).tobytes(),  # clears
        bytes(30_000),  # KwKwK-heavy
        (np.arange(60_000) // 7 % 256).astype(np.uint8).tobytes(),
        b"",
        b"\x01",
    ):
        assert lzw_decode_tiff(lzw_encode_tiff(data), len(data)) == data


def test_tiff_lzw_differs_from_gif_lzw():
    """TIFF LZW is MSB-first with early change — the same input must NOT
    produce the same stream as the GIF variant."""
    from entropy_balance_weighting_spark.functions.gif_codec import lzw_encode

    data = bytes(range(256)) * 4
    tiff_stream = lzw_encode_tiff(data)
    gif_stream = lzw_encode(np.frombuffer(data, dtype=np.uint8), 8)
    assert tiff_stream != gif_stream


def test_tiff_lzw_truncated_raises():
    data = lzw_encode_tiff(b"hello world" * 10)
    with pytest.raises(ValueError, match="ended at"):
        lzw_decode_tiff(data[: len(data) // 3], 110)


def test_packbits_roundtrips_and_spec_shapes():
    rng = _rng()
    for data in (
        b"",
        b"a",
        b"aaaa" * 100,  # long runs
        rng.integers(0, 256, 10_000, dtype=np.uint8).tobytes(),  # literals
        b"ab" * 300 + b"c" * 500,  # mixed
        bytes([1] * 200),  # run > 128 must split
    ):
        assert packbits_decode(packbits_encode(data), len(data)) == data
    # runs of >=3 must actually compress
    assert len(packbits_encode(b"x" * 100)) < 10


# -- container -----------------------------------------------------------------


def test_tiff_roundtrip_exact_all_variants():
    rng = _rng()
    for shape in ((1, 1), (5, 7), (13, 17), (40, 33)):
        for comp in ("none", "lzw", "packbits"):
            for be in (False, True):
                for rps in (None, 4):
                    g = rng.integers(0, 256, shape, dtype=np.uint8)
                    out = decode_tiff(
                        encode_tiff(
                            g, compression=comp, big_endian=be, rows_per_strip=rps
                        )
                    )
                    np.testing.assert_array_equal(
                        out, np.repeat(g[:, :, None], 3, axis=2)
                    )
                    rgb = rng.integers(0, 256, shape + (3,), dtype=np.uint8)
                    out = decode_tiff(
                        encode_tiff(
                            rgb, compression=comp, big_endian=be, rows_per_strip=rps
                        )
                    )
                    np.testing.assert_array_equal(out, rgb)


def test_tiff_large_lzw_multistrip():
    rng = _rng()
    big = rng.integers(0, 256, (200, 300, 3), dtype=np.uint8)
    payload = encode_tiff(big, compression="lzw", rows_per_strip=16)
    np.testing.assert_array_equal(decode_tiff(payload), big)


def test_tiff_whitiszero_and_palette_decode():
    """Hand-built photometric-0 (inverted gray) and photometric-3
    (16-bit ColorMap) files — paths the encoder doesn't emit."""
    g = _rng().integers(0, 256, (4, 5), dtype=np.uint8)
    payload = bytearray(encode_tiff(g))
    # find the 262 tag (photometric) in the IFD and set value 1 -> 0
    (n,) = struct.unpack_from("<H", payload, 8)
    for i in range(n):
        off = 10 + 12 * i
        tag = struct.unpack_from("<H", payload, off)[0]
        if tag == 262:
            struct.pack_into("<H", payload, off + 8, 0)
    out = decode_tiff(bytes(payload))
    np.testing.assert_array_equal(out[:, :, 0], 255 - g)

    # palette: gray payload + photometric 3 + a ColorMap appended
    idx = _rng().integers(0, 16, (3, 4), dtype=np.uint8)
    pal8 = _rng().integers(0, 256, (256, 3), dtype=np.uint8)
    payload = bytearray(encode_tiff(idx))
    (n,) = struct.unpack_from("<H", payload, 8)
    for i in range(n):
        off = 10 + 12 * i
        tag = struct.unpack_from("<H", payload, off)[0]
        if tag == 262:
            struct.pack_into("<H", payload, off + 8, 3)
    # append ColorMap values (SHORT, 768 entries, planar R..G..B, <<8)
    cm_off = len(payload)
    for ch in range(3):
        for v in pal8[:, ch]:
            payload += struct.pack("<H", int(v) << 8)
    # append a fresh IFD entry is complex; instead rewrite the IFD with
    # one extra entry at the end of the file
    entries = [payload[10 + 12 * i : 22 + 12 * i] for i in range(n)]
    entries.append(struct.pack("<HHI", 320, 3, 768) + struct.pack("<I", cm_off))
    entries.sort(key=lambda e: struct.unpack_from("<H", e)[0])
    new_ifd_off = len(payload)
    payload += struct.pack("<H", n + 1)
    for e in entries:
        payload += e
    payload += struct.pack("<I", 0)
    struct.pack_into("<I", payload, 4, new_ifd_off)
    out = decode_tiff(bytes(payload))
    np.testing.assert_array_equal(out, pal8[idx])


def test_tiff_rejects_unsupported_and_malformed():
    g = _rng().integers(0, 256, (4, 4), dtype=np.uint8)
    good = encode_tiff(g)
    with pytest.raises(NotImplementedError, match="not a TIFF"):
        decode_tiff(b"8BPS" + bytes(40))
    with pytest.raises(ValueError, match="compression must be"):
        encode_tiff(g, compression="jpeg")
    with pytest.raises(ValueError, match="truncated strip|out of range"):
        decode_tiff(good[: len(good) - 8])
    # 16-bit depth
    bad = bytearray(good)
    (n,) = struct.unpack_from("<H", bad, 8)
    for i in range(n):
        off = 10 + 12 * i
        if struct.unpack_from("<H", bad, off)[0] == 258:
            struct.pack_into("<H", bad, off + 8, 16)
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_tiff(bytes(bad))


def test_decode_image_dispatches_tiff_magic():
    rng = _rng()
    rgb = rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)
    for be in (False, True):
        out = multimodal.decode_image(encode_tiff(rgb, big_endian=be))
        np.testing.assert_array_equal(out, rgb)


def test_tiff_through_spark_extract_features(spark):
    rng = _rng()
    rows = []
    imgs = {}
    for did in range(6):
        px = rng.integers(0, 256, (4 + did, 5 + did, 3), dtype=np.uint8)
        imgs[did] = px
        rows.append(
            (
                did,
                bytearray(
                    encode_tiff(
                        px,
                        compression=("none", "lzw", "packbits")[did % 3],
                        big_endian=did % 2 == 1,
                    )
                ),
            )
        )
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in multimodal.extract_features(df).collect()}
    for did, im in imgs.items():
        assert (out[did]["height"], out[did]["width"]) == im.shape[:2]
        np.testing.assert_allclose(
            out[did]["feature"][0], im.astype(np.float64).mean()
        )


def test_tiff_predictor_roundtrip_and_tag():
    """Horizontal predictor (tag 317 = 2): exact roundtrip for every
    compression, and the tag is actually written (a predictor-encoded
    LZW gradient must compress better than plain LZW — the point of the
    predictor)."""
    rng = _rng()
    for comp in ("none", "lzw", "packbits"):
        for shape in ((1, 1), (9, 13), (23, 31)):
            g = rng.integers(0, 256, shape + (3,), dtype=np.uint8)
            out = decode_tiff(encode_tiff(g, compression=comp, predictor=True))
            np.testing.assert_array_equal(out, g)
    # smooth gradient: predictor turns rows into tiny deltas -> LZW wins
    grad = np.tile(np.arange(200, dtype=np.uint8), (40, 1))
    plain = encode_tiff(grad, compression="lzw")
    pred = encode_tiff(grad, compression="lzw", predictor=True)
    assert len(pred) < len(plain)


def test_tiff_tiled_roundtrip_edge_crop():
    """Tiled TIFF (tags 322-325): non-multiple image dims exercise the
    zero-padded edge tiles; predictor composes with tiling (applied per
    tile row); both byte orders."""
    rng = _rng()
    for shape in ((16, 16), (17, 33), (45, 70), (5, 90)):
        for comp in ("none", "lzw", "packbits"):
            for pred in (False, True):
                rgb = rng.integers(0, 256, shape + (3,), dtype=np.uint8)
                out = decode_tiff(
                    encode_tiff(
                        rgb, compression=comp, tile=(16, 32), predictor=pred
                    )
                )
                np.testing.assert_array_equal(out, rgb)
    g = rng.integers(0, 256, (20, 20), dtype=np.uint8)
    out = decode_tiff(encode_tiff(g, tile=(16, 16), big_endian=True))
    np.testing.assert_array_equal(out, np.repeat(g[:, :, None], 3, axis=2))


def test_tiff_tile_dims_validated():
    g = _rng().integers(0, 256, (8, 8), dtype=np.uint8)
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff(g, tile=(15, 16))
    # unsupported predictor value still a named error
    good = encode_tiff(g, compression="lzw", predictor=True)
    bad = bytearray(good)
    (n,) = struct.unpack_from("<H", bad, 8)
    for i in range(n):
        off = 10 + 12 * i
        if struct.unpack_from("<H", bad, off)[0] == 317:
            struct.pack_into("<H", bad, off + 8, 3)  # fp predictor on uint8
    with pytest.raises(NotImplementedError, match="floating-point predictor"):
        decode_tiff(bytes(bad))


def test_tiff_truncated_tile_named_error():
    g = _rng().integers(0, 256, (33, 50), dtype=np.uint8)
    tiled = encode_tiff(g, compression="none", tile=(16, 16))
    with pytest.raises(ValueError, match="truncated tile|short tile|out of range"):
        decode_tiff(tiled[: len(tiled) - 20])


def test_tiff_deflate_roundtrip_and_legacy_tag():
    """Adobe Deflate (tag 8) roundtrips exactly across strip/tile and
    predictor modes; the legacy 32946 deflate tag decodes too; a
    corrupted deflate stream raises the named error."""
    rng = _rng()
    img = rng.integers(0, 256, (31, 47, 3), dtype=np.uint8)
    for kw in (
        dict(compression="deflate"),
        dict(compression="deflate", predictor=True),
        dict(compression="deflate", rows_per_strip=7, big_endian=True),
        dict(compression="deflate", tile=(16, 16), predictor=True),
    ):
        np.testing.assert_array_equal(decode_tiff(encode_tiff(img, **kw)), img)
    enc = bytearray(encode_tiff(img, compression="deflate"))
    (n,) = struct.unpack_from("<H", enc, 8)
    for i in range(n):
        off = 10 + 12 * i
        if struct.unpack_from("<H", enc, off)[0] == 259:
            struct.pack_into("<H", enc, off + 8, 32946 & 0xFFFF)
    np.testing.assert_array_equal(decode_tiff(bytes(enc)), img)
    bad = bytearray(encode_tiff(img, compression="deflate"))
    bad[-10] ^= 0xFF
    with pytest.raises(ValueError, match="bad deflate|short strip|truncated"):
        decode_tiff(bytes(bad))


def test_tiff_float32_roundtrip_all_variants():
    """32-bit IEEE-float TIFF (SampleFormat 3) with the floating-point
    predictor (tag 317 = 3, the TechNote-3 byte-plane scheme): exact
    float roundtrip across compressions, byte orders, strip and tile
    layouts, gray and RGB."""
    rng = _rng()
    for shape in ((9, 13), (9, 13, 3)):
        f = (rng.normal(size=shape) * 100).astype(np.float32)
        want = (
            np.repeat(f[:, :, None], 3, axis=2) if f.ndim == 2 else f
        )
        for comp in ("none", "lzw", "deflate", "packbits"):
            for pred in (False, True):
                for be in (False, True):
                    out = decode_tiff(
                        encode_tiff(
                            f, compression=comp, predictor=pred,
                            big_endian=be,
                        )
                    )
                    assert out.dtype == np.float32
                    np.testing.assert_array_equal(out, want)
        out = decode_tiff(
            encode_tiff(f, compression="deflate", predictor=True,
                        tile=(16, 16))
        )
        np.testing.assert_array_equal(out, want)
        out = decode_tiff(
            encode_tiff(f, compression="lzw", predictor=True,
                        rows_per_strip=4)
        )
        np.testing.assert_array_equal(out, want)


def test_tiff_float_special_values_and_tag():
    """NaN/inf/-0.0 survive the fp predictor bit-exactly, and the wire
    carries SampleFormat=3 + predictor=3."""
    f = np.array(
        [[np.nan, np.inf, -np.inf], [-0.0, 1e-38, 3.4e38]], dtype=np.float32
    )
    t = encode_tiff(f, compression="deflate", predictor=True)
    out = decode_tiff(t)
    np.testing.assert_array_equal(
        out.view(np.uint32), np.repeat(f[:, :, None], 3, axis=2).view(np.uint32)
    )
    # wire tags: 339 (SampleFormat) = 3 and 317 (Predictor) = 3
    (n,) = struct.unpack_from("<H", t, 8)
    tags = {}
    for i in range(n):
        off = 10 + 12 * i
        tag = struct.unpack_from("<H", t, off)[0]
        tags[tag] = struct.unpack_from("<H", t, off + 8)[0]
    assert tags[339] == 3 and tags[317] == 3 and tags[258] == 32
