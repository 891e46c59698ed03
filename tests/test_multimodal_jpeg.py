"""REAL baseline-JPEG codec tests: the full DCT/quantize/Huffman pipeline
in pure numpy + stdlib (functions/jpeg_codec.py).  JPEG is lossy, so the
test strategy differs from BMP/PNG/WAV: roundtrips assert TIGHT ERROR
BOUNDS (and exactness for DC-only images) rather than bit equality, plus
named failures on unsupported/malformed payloads and the Spark stages on
genuine JPEG bytes."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from entropy_balance_weighting_spark.functions import multimodal
from entropy_balance_weighting_spark.functions.jpeg_codec import (
    _DCT_M,
    _ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def _rng():
    return np.random.default_rng(13)


def _gradient(h, w, base=60, dr=3, dc=2):
    r = np.arange(h)[:, None]
    c = np.arange(w)[None, :]
    return np.clip(base + dr * r + dc * c, 0, 255).astype(np.uint8)


def test_dct_matrix_is_orthonormal():
    np.testing.assert_allclose(_DCT_M @ _DCT_M.T, np.eye(8), atol=1e-12)


def test_zigzag_is_a_permutation_with_known_prefix():
    assert sorted(_ZIGZAG) == list(range(64))
    # first diagonal entries of the spec's zigzag order (row*8+col)
    assert list(_ZIGZAG[:6]) == [0, 1, 8, 16, 9, 2]


def test_jpeg_constant_image_roundtrips_exactly():
    """A constant block is pure DC; quantized DC reconstructs the exact
    level at any reasonable quality."""
    for level in (0, 64, 130, 255):
        px = np.full((8, 8, 3), level, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(px, 90))
        assert int(np.abs(out.astype(int) - level).max()) <= 1


def test_jpeg_smooth_roundtrip_error_bounds():
    """Smooth gradients concentrate energy in low-frequency coefficients;
    a correct codec reconstructs within a few levels at quality >= 75
    across non-multiple-of-8 shapes (exercising edge padding)."""
    for h, w in [(1, 1), (5, 9), (13, 21), (16, 16), (24, 7)]:
        g = _gradient(h, w)
        rgb = np.stack(
            [g, np.clip(g.astype(int) + 20, 0, 255), np.clip(g.astype(int) + 40, 0, 255)],
            axis=-1,
        ).astype(np.uint8)
        for q in (75, 90, 95):
            out = decode_jpeg(encode_jpeg(rgb, q))
            assert out.shape == (h, w, 3)
            assert int(np.abs(out.astype(int) - rgb.astype(int)).max()) <= 4
        gray_out = decode_jpeg(encode_jpeg(g, 90))
        assert gray_out.shape == (h, w, 3)
        assert int(np.abs(gray_out[:, :, 0].astype(int) - g.astype(int)).max()) <= 2


def test_jpeg_noise_roundtrip_bounded_by_quantization():
    """Worst-case content (uniform noise) still reconstructs within the
    high-quality quantization error envelope — a wrong IDCT norm, zigzag,
    or Huffman table blows far past this."""
    noisy = _rng().integers(0, 256, (24, 17, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noisy, 95))
    err = np.abs(out.astype(int) - noisy.astype(int))
    assert int(err.max()) <= 40
    assert float(err.mean()) <= 6.0


def test_jpeg_quality_monotonicity():
    noisy = _rng().integers(0, 256, (16, 16, 3), dtype=np.uint8)
    errs = []
    for q in (50, 75, 95):
        out = decode_jpeg(encode_jpeg(noisy, q))
        errs.append(float(np.abs(out.astype(int) - noisy.astype(int)).mean()))
    assert errs[0] >= errs[1] >= errs[2]


def test_jpeg_byte_stuffing_roundtrip():
    """Content tuned to emit 0xFF bytes in the entropy stream must still
    roundtrip (stuff on encode, unstuff on decode).  Many random images
    statistically guarantee stuffed bytes appear."""
    rng = _rng()
    saw_stuffed = False
    for _ in range(8):
        px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        payload = encode_jpeg(px, 95)
        body = payload[2:-2]
        if b"\xff\x00" in body:
            saw_stuffed = True
        out = decode_jpeg(payload)
        assert int(np.abs(out.astype(int) - px.astype(int)).max()) <= 40
    assert saw_stuffed


def test_jpeg_rejects_unsupported_and_malformed():
    good = encode_jpeg(_gradient(8, 8), 90)
    with pytest.raises(NotImplementedError, match="not a JPEG"):
        decode_jpeg(b"BM" + bytes(60))
    # SOF2 is now REAL: relabeling a baseline stream as progressive makes
    # its full-band scan header (Ss=0, Se=63) malformed, a named error
    prog = bytearray(good)
    i = prog.find(b"\xff\xc0")
    prog[i : i + 2] = b"\xff\xc2"
    with pytest.raises(ValueError, match="DC scan with Se>0"):
        decode_jpeg(bytes(prog))
    # arithmetic-coded SOF9
    arith = bytearray(good)
    arith[i : i + 2] = b"\xff\xc9"
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(arith))
    # extended sequential SOF1
    ext = bytearray(good)
    ext[i : i + 2] = b"\xff\xc1"
    with pytest.raises(NotImplementedError, match="baseline sequential and progressive"):
        decode_jpeg(bytes(ext))
    # truncation inside the entropy stream
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) - 6])
    # missing SOS
    j = good.find(b"\xff\xda")
    with pytest.raises(ValueError, match="missing SOF/SOS"):
        decode_jpeg(good[:j] + b"\xff\xd9")


def test_jpeg_chroma_subsampling_roundtrips():
    """4:2:2 and 4:2:0 (the dominant web layouts): smooth images
    reconstruct as tightly as 4:4:4 (chroma is near-constant), and
    chroma-edge content stays within the subsampling loss envelope."""
    g = _gradient(13, 21)
    rgb = np.stack(
        [g, np.clip(g.astype(int) + 20, 0, 255), np.clip(g.astype(int) + 40, 0, 255)],
        axis=-1,
    ).astype(np.uint8)
    for ss in ("4:4:4", "4:2:2", "4:2:0"):
        out = decode_jpeg(encode_jpeg(rgb, 90, subsampling=ss))
        assert out.shape == rgb.shape
        assert int(np.abs(out.astype(int) - rgb.astype(int)).max()) <= 4, ss
    # hard chroma edges on 8-aligned boundaries: subsampled planes are
    # box-downsampled cleanly, so the roundtrip stays within a few levels
    blocks = np.zeros((16, 16, 3), dtype=np.uint8)
    blocks[:8, :, 0] = 200
    blocks[8:, :, 2] = 200
    blocks[:, :8, 1] = 120
    for ss in ("4:2:2", "4:2:0"):
        out = decode_jpeg(encode_jpeg(blocks, 95, subsampling=ss))
        assert int(np.abs(out.astype(int) - blocks.astype(int)).max()) <= 8, ss


def test_jpeg_odd_dims_subsampled_roundtrip():
    """Non-multiple-of-16 dims exercise the MCU edge padding + crop on
    both the downsampled chroma and the upsample path."""
    for h, w in [(9, 11), (17, 23), (8, 33)]:
        g = _gradient(h, w, base=50)
        rgb = np.stack([g, g, np.clip(g.astype(int) + 30, 0, 255)], axis=-1).astype(
            np.uint8
        )
        out = decode_jpeg(encode_jpeg(rgb, 90, subsampling="4:2:0"))
        assert out.shape == (h, w, 3)
        assert int(np.abs(out.astype(int) - rgb.astype(int)).max()) <= 4


def test_jpeg_malformed_sampling_factors_rejected():
    good = encode_jpeg(_gradient(8, 8, base=90), 90)
    bad = bytearray(good)
    i = bad.find(b"\xff\xc0")
    # SOF0 body: len(2) prec(1) h(2) w(2) nc(1) then [cid samp tq]
    bad[i + 11] = 0x00  # zero sampling factors
    with pytest.raises(ValueError, match="sampling factors"):
        decode_jpeg(bytes(bad))
    with pytest.raises(ValueError, match="unsupported subsampling"):
        encode_jpeg(_gradient(8, 8), 90, subsampling="4:1:1")


def test_decode_image_dispatches_jpeg():
    g = _gradient(6, 7)
    rgb = np.repeat(g[:, :, None], 3, axis=2)
    out = multimodal.decode_image(encode_jpeg(rgb, 95))
    assert out.shape == (6, 7, 3)
    assert int(np.abs(out.astype(int) - rgb.astype(int)).max()) <= 2


def test_decode_image_batch_mixed_all_four_payload_kinds():
    """One Arrow batch carrying BMP + PNG + JPEG decodes per-payload via
    the magic dispatch."""
    rng = _rng()
    imgs = [rng.integers(0, 256, (6, 6, 3), dtype=np.uint8) for _ in range(2)]
    grad = np.repeat(_gradient(6, 6)[:, :, None], 3, axis=2)
    pay = pd.Series(
        [
            multimodal.encode_bmp(imgs[0]),
            multimodal.encode_png(imgs[1]),
            encode_jpeg(grad, 95),
        ]
    )
    out = multimodal.decode_image_batch(pay)
    assert list(out["width"]) == [6, 6, 6]
    g = imgs[0].astype(np.float64)
    np.testing.assert_allclose(
        out["feature"][0], [g.mean(), g.std(), g.min(), g.max()]
    )
    # the JPEG row's stats are within quantization error of the original
    gg = grad.astype(np.float64)
    assert abs(out["feature"][2][0] - gg.mean()) <= 2.0


def test_spark_stages_on_real_jpeg_bytes(spark):
    """extract_features + resize_images over genuine JPEG payloads in a
    Spark DataFrame — dims exact, values within quantization error."""
    ids = list(range(12))
    imgs = {
        i: np.repeat(
            _gradient(i % 5 + 6, i % 7 + 6, base=40 + i)[:, :, None], 3, axis=2
        )
        for i in ids
    }
    pdf = pd.DataFrame(
        {"doc_id": ids, "payload": [encode_jpeg(imgs[i], 95) for i in ids]}
    )
    df = spark.createDataFrame(pdf).repartition(3)
    feats = {r["doc_id"]: r for r in multimodal.extract_features(df).collect()}
    for i in ids:
        assert feats[i]["height"] == imgs[i].shape[0]
        assert feats[i]["width"] == imgs[i].shape[1]
        g = imgs[i].astype(np.float64)
        assert abs(feats[i]["feature"][0] - g.mean()) <= 2.0
    resized = {
        r["doc_id"]: r for r in multimodal.resize_images(df, 5, 4).collect()
    }
    for i in ids:
        px = multimodal.decode_image(bytes(resized[i]["payload"]))
        assert px.shape == (4, 5, 3)
        h0, w0 = imgs[i].shape[:2]
        ri = np.arange(4) * h0 // 4
        ci = np.arange(5) * w0 // 5
        want = imgs[i][ri[:, None], ci[None, :]].astype(int)
        assert int(np.abs(px.astype(int) - want).max()) <= 4


def test_jpeg_restart_intervals_roundtrip():
    """DRI/RSTn: every restart interval decodes BYTE-IDENTICAL to the
    non-DRI encoding of the same image (the entropy content is the same;
    only the predictor resets and byte-aligned markers differ), across
    subsampling layouts."""
    px = _rng().integers(0, 256, (33, 41, 3), dtype=np.uint8)
    for ss in ("4:4:4", "4:2:0"):
        base = decode_jpeg(encode_jpeg(px, 95, subsampling=ss))
        for interval in (1, 2, 3, 7):
            payload = encode_jpeg(
                px, 95, subsampling=ss, restart_interval=interval
            )
            assert b"\xff\xdd" in payload  # DRI segment present
            np.testing.assert_array_equal(decode_jpeg(payload), base)


def test_jpeg_corrupt_restart_marker_rejected():
    px = _rng().integers(0, 256, (24, 24, 3), dtype=np.uint8)
    payload = bytearray(encode_jpeg(px, 95, restart_interval=1))
    # find the first RST0 marker in the entropy stream and corrupt it
    i = payload.find(b"\xff\xd0", payload.find(b"\xff\xda"))
    assert i > 0
    payload[i + 1] = 0xD5  # wrong restart index
    with pytest.raises(ValueError, match="expected RST0"):
        decode_jpeg(bytes(payload))


# -- progressive (SOF2) -------------------------------------------------------


def test_progressive_decode_equals_baseline_decode():
    """Progressive and baseline encode the SAME quantized coefficients,
    so their decodes must match bit-for-bit — across color modes,
    subsampling layouts, qualities, and odd sizes (empty/partial MCUs)."""
    rng = _rng()
    cases = []
    for shape, sub in [
        ((8, 8), "4:4:4"),
        ((13, 21), "4:2:0"),
        ((31, 17), "4:2:2"),
        ((7, 5), "4:4:4"),
    ]:
        g = _gradient(*shape)
        cases.append((g, sub))
        cases.append((np.stack([g, g, g], -1), sub))
        cases.append((rng.integers(0, 256, shape + (3,), dtype=np.uint8), sub))
    for px, sub in cases:
        for q in (30, 90):
            base = decode_jpeg(encode_jpeg(px, q, sub))
            prog = decode_jpeg(encode_jpeg(px, q, sub, progressive=True))
            np.testing.assert_array_equal(prog, base)


def test_progressive_stream_structure():
    """The progressive fixture really is multi-scan SOF2: one SOF2
    marker, no SOF0, and the full 10-scan color script."""
    px = np.stack([_gradient(16, 16)] * 3, -1).astype(np.uint8)
    b = encode_jpeg(px, 90, progressive=True)
    assert b.count(b"\xff\xc2") >= 1 and b.find(b"\xff\xc0") == -1
    # count SOS markers outside entropy data is tricky; the script emits
    # 10 SOS segments and each starts with FF DA immediately after either
    # a table segment or previous scan's entropy bytes
    assert b.count(b"\xff\xda") >= 10


def test_progressive_exercises_eob_runs():
    """A mostly-flat image makes consecutive all-zero AC bands, forcing
    EOBn symbols with r>0 (multi-block EOB runs) through both encode and
    decode."""
    px = np.full((64, 64), 128, dtype=np.uint8)
    px[0, 0] = 140  # one active block so the AC scans are not empty
    base = decode_jpeg(encode_jpeg(px, 90))
    prog = decode_jpeg(encode_jpeg(px, 90, progressive=True))
    np.testing.assert_array_equal(prog, base)


def test_progressive_noise_stresses_ac_refinement():
    """Dense random coefficients at low quality maximize refinement
    traffic (history coefficients, buffered correction bits, ZRLs)."""
    rng = _rng()
    px = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    for q in (20, 75):
        base = decode_jpeg(encode_jpeg(px, q, "4:2:0"))
        prog = decode_jpeg(encode_jpeg(px, q, "4:2:0", progressive=True))
        np.testing.assert_array_equal(prog, base)


def test_progressive_rejects_restart_intervals():
    with pytest.raises(ValueError, match="restart intervals with progressive"):
        encode_jpeg(_gradient(8, 8), 90, restart_interval=2, progressive=True)


def test_progressive_truncated_scan_raises():
    px = np.stack([_gradient(16, 16)] * 3, -1).astype(np.uint8)
    b = encode_jpeg(px, 90, progressive=True)
    with pytest.raises(ValueError):
        decode_jpeg(b[: len(b) - 10])


# -- EXIF (APP1) metadata ------------------------------------------------------


def test_exif_build_extract_strip_roundtrip():
    from entropy_balance_weighting_spark.functions import exif_codec as x

    jp = encode_jpeg(_gradient(16, 16), 90)
    tagged = x.insert_app1(
        jp, x.build_exif(orientation=6, make="SynthCam 3000", gps=(37.7749, -122.4194))
    )
    meta = x.extract_exif(tagged)
    assert meta["orientation"] == 6
    assert meta["make"] == "SynthCam 3000"
    assert meta["has_gps"]
    assert abs(meta["gps_lat"] - 37.7749) < 1e-9
    assert abs(meta["gps_lon"] + 122.4194) < 1e-9
    clean = x.strip_exif(tagged)
    assert x.extract_exif(clean) == {}
    # the scrub must not touch entropy data
    np.testing.assert_array_equal(decode_jpeg(clean), decode_jpeg(jp))
    np.testing.assert_array_equal(decode_jpeg(tagged), decode_jpeg(jp))


def test_exif_no_gps_and_absent_cases():
    from entropy_balance_weighting_spark.functions import exif_codec as x

    jp = encode_jpeg(_gradient(8, 8), 90)
    assert x.extract_exif(jp) == {}
    assert x.strip_exif(jp) == jp  # nothing to strip
    t = x.insert_app1(jp, x.build_exif(orientation=1))
    assert x.extract_exif(t) == {"orientation": 1, "has_gps": False}
    # southern/western hemisphere signs
    t2 = x.insert_app1(jp, x.build_exif(gps=(-33.9, 151.2)))
    m2 = x.extract_exif(t2)
    assert m2["gps_lat"] < 0 < m2["gps_lon"]


def test_exif_survives_progressive_and_decoder_ignores_it():
    from entropy_balance_weighting_spark.functions import exif_codec as x

    px = _gradient(12, 20)
    jp = encode_jpeg(px, 90, progressive=True)
    tagged = x.insert_app1(jp, x.build_exif(orientation=3))
    np.testing.assert_array_equal(decode_jpeg(tagged), decode_jpeg(jp))
    assert x.extract_exif(tagged)["orientation"] == 3


def test_exif_hostile_value_offset_raises_named_valueerror():
    """An out-of-line IFD value offset pointing past the APP1 segment end
    must raise the codebase's named ValueError, not silently read foreign
    JPEG bytes or hit struct.error past EOF (r7 advice)."""
    import struct as _struct

    from entropy_balance_weighting_spark.functions import exif_codec as x

    jp = encode_jpeg(_gradient(16, 16), 90)
    payload = x.build_exif(make="SynthCam 3000 Ultra Wide", gps=(1.5, 2.5))
    tagged = x.insert_app1(jp, payload)
    # Locate the 'make' ASCII entry (tag 0x010F, type 2) inside the APP1
    # and redirect its out-of-line offset far past the segment end.
    app1 = tagged.index(b"Exif\x00\x00")
    t0 = app1 + 6
    (ifd0_off,) = _struct.unpack_from("<I", tagged, t0 + 4)
    (n,) = _struct.unpack_from("<H", tagged, t0 + ifd0_off)
    bad = bytearray(tagged)
    patched = False
    for i in range(n):
        e = t0 + ifd0_off + 2 + 12 * i
        tag, typ, count = _struct.unpack_from("<HHI", bad, e)
        if tag == 0x010F and typ == 2 and count > 4:
            _struct.pack_into("<I", bad, e + 8, 0x00FFFFFF)
            patched = True
    assert patched
    with pytest.raises(ValueError, match="value out of range"):
        x.extract_exif(bytes(bad))
    # Hostile entry COUNT that would run the IFD table past the segment.
    bad2 = bytearray(tagged)
    _struct.pack_into("<H", bad2, t0 + ifd0_off, 0x7FFF)
    with pytest.raises(ValueError, match="out of range"):
        x.extract_exif(bytes(bad2))
