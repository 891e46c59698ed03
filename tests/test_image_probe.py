"""Header-only image dimension probe (multimodal.probe_image): dims from
the first bytes, no pixel decode; WebP (VP8/VP8L/VP8X) dimensioned even
though pixel decode would need libwebp."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from entropy_balance_weighting_spark.functions import multimodal as mm
from entropy_balance_weighting_spark.functions.gif_codec import encode_gif
from entropy_balance_weighting_spark.functions.jpeg_codec import encode_jpeg
from entropy_balance_weighting_spark.functions.tiff_codec import encode_tiff

_PAL = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)


def _encoders(img):
    yield "bmp", mm.encode_bmp(img)
    yield "png", mm.encode_png(img)
    yield "jpeg", encode_jpeg(img)
    yield "gif", encode_gif(img[:, :, 0], _PAL)
    yield "tiff", encode_tiff(img, compression="lzw", predictor=True)
    yield "tiff", encode_tiff(img, tile=(16, 16), big_endian=True)


def test_probe_matches_encoders_every_format():
    rng = np.random.default_rng(9)
    for h, w in [(1, 1), (37, 53), (64, 17)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for fmt, payload in _encoders(img):
            m = mm.probe_image(payload)
            assert m == {"format": fmt, "width": w, "height": h}, (fmt, h, w)


def test_probe_webp_all_variants():
    for v in ("vp8", "vp8l", "vp8x"):
        m = mm.probe_image(mm.build_webp_header(641, 483, variant=v))
        assert m == {"format": "webp", "width": 641, "height": 483}


def test_probe_progressive_jpeg_and_exif_prefix():
    """The marker walk must skip APPn segments (EXIF) and find SOF2."""
    from entropy_balance_weighting_spark.functions.exif_codec import (
        build_exif,
        insert_app1,
    )

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    jp = encode_jpeg(img, progressive=True)
    assert mm.probe_image(jp)["width"] == 40
    tagged = insert_app1(jp, build_exif(gps=(10.5, -20.25)))
    assert mm.probe_image(tagged) == {
        "format": "jpeg", "width": 40, "height": 24,
    }


def test_probe_named_errors():
    with pytest.raises(NotImplementedError, match="header probe"):
        mm.probe_image(b"\x00unknownformat" + bytes(30))
    with pytest.raises(ValueError, match="no SOF"):
        mm.probe_image(b"\xff\xd8\xff\xd9")
    with pytest.raises(ValueError, match="bad VP8L"):
        mm.probe_image(
            b"RIFF" + bytes(4) + b"WEBPVP8L" + bytes(4) + b"\x00" + bytes(8)
        )
    with pytest.raises(ValueError, match="truncated header"):
        mm.probe_image(b"BM" + bytes(10))


@given(
    w=st.integers(1, 2000),
    h=st.integers(1, 2000),
    variant=st.sampled_from(["vp8", "vp8l", "vp8x"]),
)
@settings(max_examples=50, deadline=None)
def test_probe_webp_fuzz(w, h, variant):
    m = mm.probe_image(mm.build_webp_header(w, h, variant=variant))
    assert (m["width"], m["height"]) == (w, h)


def test_probe_image_spark_stage(spark):
    """probe_image_batch over mapInPandas: mixed-format corpus probed
    without decode; the plan stays Arrow-batched."""
    import pandas as pd

    from pyspark.sql import functions as F

    rng = np.random.default_rng(4)
    rows = []
    for i in range(12):
        h, w = 8 + i, 10 + 2 * i
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        payload = [
            mm.encode_bmp(img), mm.encode_png(img),
            mm.build_webp_header(w, h, variant="vp8l"),
        ][i % 3]
        rows.append((i, payload, w, h))
    df = spark.createDataFrame(
        rows, "id long, payload binary, want_w int, want_h int"
    )

    def gen(batches):
        for pdf in batches:
            out = mm.probe_image_batch(pdf["payload"])
            out.insert(0, "id", pdf["id"].values)
            yield out

    probed = df.select("id", "payload").mapInPandas(
        gen, "id long, n_bytes int, format string, width int, height int"
    )
    joined = probed.join(df.select("id", "want_w", "want_h"), "id")
    bad = joined.filter(
        (F.col("width") != F.col("want_w")) | (F.col("height") != F.col("want_h"))
    ).count()
    assert bad == 0
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
