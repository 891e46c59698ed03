"""Multimodal queries: opaque-binary payload plumbing, frame sampling,
feature extraction, and the REAL BMP/PNG decode paths.

Split from the former monolithic pipeline.py (round-7 verdict item #6);
registration names unchanged.  Hash-sensitive stages use the
engine-portable md5-prefix hash so the DuckDB oracles replicate them
bit-for-bit; float aggregates are rounded identically on both sides.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.functions import dedup, events, similarity
from entropy_balance_weighting_spark.functions import multimodal, packing, sampling, text
from entropy_balance_weighting_spark.queries.registry import register
from entropy_balance_weighting_spark.session import load_table


def _mm_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.text_as_binary(docs).select("doc_id", "payload", "source")


@register(
    "mm_frame_sample",
    survey="ext:multimodal-frames",
    oracle="""
WITH f AS (
  SELECT d.source, d.doc_id, r.i,
         substr(d.text, CAST(r.i * 64 + 1 AS BIGINT), 64) AS frame
  FROM documents d,
       unnest(range(0, CAST(ceil(strlen(d.text) / 64.0) AS BIGINT), 3)) AS r(i)
)
SELECT source,
       count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_frames,
       round(avg(strlen(frame)), 4) AS avg_frame_bytes,
       CAST(sum(ascii(substr(frame, 1, 1))) AS BIGINT) AS first_byte_sum
FROM f GROUP BY source ORDER BY source
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over opaque binary payloads: every 3rd
    64-byte frame becomes its own row through the fan-out ``mapInPandas``
    stage (real demuxer stubbed — deterministic byte frames exercise the
    identical plumbing), then typed aggregation of the sampled frames."""
    payloads = _mm_payloads(spark, sf_dir)
    frames = multimodal.sample_frames(
        payloads.select("doc_id", "payload"), frame_bytes=64, every_n=3
    )
    joined = frames.join(payloads.select("doc_id", "source"), "doc_id")
    return (
        joined.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_frames"),
            F.round(F.avg(F.length("frame")), 4).alias("avg_frame_bytes"),
            F.sum(F.ascii(F.substring(F.col("frame").cast("string"), 1, 1)))
            .cast("long")
            .alias("first_byte_sum"),
        )
        .orderBy("source")
    )


@register(
    "mm_feature_extract",
    survey="ext:multimodal",
    oracle="""
SELECT source, count(*) AS n_docs,
       round(avg(strlen(text)), 4) AS avg_bytes,
       round(avg(strlen(text) % 64 + 1), 4) AS avg_width,
       round(avg(strlen(text) % 48 + 1), 4) AS avg_height,
       round(avg(ascii(substr(text, 1, 1))), 4) AS avg_first_byte
FROM documents GROUP BY source ORDER BY source
""",
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: opaque binary payloads through the
    Arrow-batched ``mapInPandas`` feature extractor (deterministic fake
    decoder — the real image decoder is stubbed; the schema/batch/partition
    plumbing is the real thing) and typed aggregation of the results."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.text_as_binary(docs).select(
        "doc_id", "payload", "source"
    )
    feats = multimodal.extract_features(
        payloads, decoder=multimodal.fake_decode
    )
    joined = feats.join(payloads.select("doc_id", "source"), "doc_id")
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
            F.round(F.avg("width"), 4).alias("avg_width"),
            F.round(F.avg("height"), 4).alias("avg_height"),
            F.round(F.avg(F.element_at("feature", 2)), 4).alias("avg_first_byte"),
        )
        .orderBy("source")
    )


@register(
    "mm_bmp_decode",
    survey="ext:multimodal-bmp",
    oracle="""
WITH dims AS (
  SELECT doc_id, source,
         doc_id % 16 + 4 AS w, doc_id % 12 + 4 AS h
  FROM documents
), cells AS (
  SELECT d.doc_id, d.source, d.w, d.h,
         (d.doc_id * 31 + r.r * 7 + c.c * 13) % 256 AS v
  FROM dims d,
       unnest(range(0, d.h)) AS r(r),
       unnest(range(0, d.w)) AS c(c)
), per_doc AS (
  SELECT doc_id, source, max(w) AS w, max(h) AS h,
         CAST(sum(v) AS BIGINT) AS pix_sum,
         CAST(min(v) AS BIGINT) AS pix_min,
         CAST(max(v) AS BIGINT) AS pix_max
  FROM cells GROUP BY doc_id, source
), resized AS (
  SELECT d.doc_id,
         CAST(sum((d.doc_id * 31 + (i.i * d.h // 6) * 7
                   + (j.j * d.w // 8) * 13) % 256) AS BIGINT) AS rs_sum
  FROM dims d,
       unnest(range(0, 6)) AS i(i),
       unnest(range(0, 8)) AS j(j)
  GROUP BY d.doc_id
)
SELECT p.source,
       count(*) AS n_docs,
       round(avg(p.w), 6) AS avg_width,
       round(avg(p.h), 6) AS avg_height,
       round(sum(p.pix_sum) / CAST(sum(p.w * p.h) AS DOUBLE), 6) AS pix_mean,
       round(avg(p.pix_min), 6) AS avg_min,
       round(avg(p.pix_max), 6) AS avg_max,
       round(sum(r.rs_sum) / (48.0 * count(*)), 6) AS resized_mean
FROM per_doc p JOIN resized r USING (doc_id)
GROUP BY p.source ORDER BY p.source
""",
)
def mm_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode + resize end-to-end (no media library): each doc
    gets a genuine uncompressed BMP payload whose grayscale pixels are a
    pure function of ``doc_id`` (``(id·31 + row·7 + col·13) mod 256``),
    built with :func:`functions.multimodal.encode_bmp`; the payloads run
    through the REAL :func:`decode_image_batch` (header parse + stride
    slice) and the REAL nearest-neighbor :func:`resize_image_batch` to
    8×6, and the oracle recomputes every pixel arithmetically in SQL.
    Sums are reconstructed as exact integers (pixel mean × w·h rounds to
    the exact pixel sum in f64), so both sides divide identical integers
    — no float-order drift.  Decoder parity: a wrong stride, row order,
    or channel order shifts ``pix_mean``/``resized_mean`` and fails the
    hash."""
    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                h, w = d % 12 + 4, d % 16 + 4
                r = np.arange(h)[:, None]
                c = np.arange(w)[None, :]
                px = ((d * 31 + r * 7 + c * 13) % 256).astype(np.uint8)
                payloads.append(multimodal.encode_bmp(px))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    payloads = docs.mapInPandas(
        gen, "doc_id long, payload binary"
    ).persist()  # encode stage feeds two consumers; run Python once (r13)
    feats = multimodal.extract_features(payloads)  # REAL decoder
    resized = multimodal.resize_images(payloads, 8, 6)  # REAL resizer
    rs_feats = multimodal.extract_features(resized).select(
        "doc_id", F.element_at("feature", 1).alias("rs_mean")
    )
    area = F.col("width") * F.col("height")
    per_doc = feats.select(
        "doc_id",
        "width",
        "height",
        F.round(F.element_at("feature", 1) * area).cast("long").alias("pix_sum"),
        F.element_at("feature", 3).cast("long").alias("pix_min"),
        F.element_at("feature", 4).cast("long").alias("pix_max"),
    )
    joined = (
        per_doc.join(rs_feats, "doc_id")
        .withColumn("rs_sum", F.round(F.col("rs_mean") * 48).cast("long"))
        .join(docs, "doc_id")
    )
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("width"), 6).alias("avg_width"),
            F.round(F.avg("height"), 6).alias("avg_height"),
            F.round(
                F.sum("pix_sum")
                / F.sum((F.col("width") * F.col("height")).cast("double")),
                6,
            ).alias("pix_mean"),
            F.round(F.avg("pix_min"), 6).alias("avg_min"),
            F.round(F.avg("pix_max"), 6).alias("avg_max"),
            F.round(F.sum("rs_sum") / (48.0 * F.count(F.lit(1))), 6).alias(
                "resized_mean"
            ),
        )
        .orderBy("source")
    )



@register(
    "mm_jpeg_decode",
    survey="ext:multimodal-jpeg",
    oracle="""
SELECT source,
       count(*) AS n_docs,
       round(avg(doc_id % 13 + 5), 6) AS avg_width,
       round(avg(doc_id % 9 + 5), 6) AS avg_height,
       count(*) AS n_within_tol
FROM documents GROUP BY source ORDER BY source
""",
)
def mm_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode end-to-end (the full DCT/Huffman pipeline
    in pure numpy + stdlib, ``functions/jpeg_codec.py``): each doc gets a
    genuine quality-90 JPEG of a clip-free linear gradient
    (``30 + id%100 + 3·row + 2·col + 20·ch``, dims ``(id%9+5, id%13+5)``),
    cycling the chroma layout 4:4:4 / 4:2:0 / 4:2:2 by ``id mod 3``,
    emitting DRI/RSTn restart markers on odd ids, and writing ids
    ``≡ 2 (mod 4)`` as PROGRESSIVE (SOF2) multi-scan files, so the driver
    row covers the subsampled MCU scan, chroma upsample, restart-sync,
    and full progressive-reconstruction paths too,
    decoded through the REAL :func:`decode_image_batch` magic dispatch.
    JPEG is lossy, so unlike the BMP/PNG/WAV oracles the check is a
    TOLERANCE COUNT rather than exact pixel sums: a per-doc ``mapInPandas``
    stage recomputes the original pixels and counts docs whose decoded
    max-abs error stays ≤ 4 levels (a correct codec reconstructs smooth
    gradients within 1–2; a wrong IDCT normalization, zigzag order,
    Huffman table, or color transform blows the error to dozens of levels
    and collapses ``n_within_tol``, failing the driver hash).  Dimensions
    come from the REAL feature extractor and are hash-checked exactly."""
    import numpy as np
    import pandas as pd

    from entropy_balance_weighting_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def pixels(d: int) -> "np.ndarray":
        h, w = d % 9 + 5, d % 13 + 5
        r = np.arange(h)[:, None, None]
        c = np.arange(w)[None, :, None]
        ch = np.arange(3)[None, None, :]
        return (30 + d % 100 + 3 * r + 2 * c + 20 * ch).astype(np.uint8)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = [
                encode_jpeg(
                    pixels(int(d)),
                    90,
                    subsampling=("4:4:4", "4:2:0", "4:2:2")[int(d) % 3],
                    restart_interval=int(d) % 2,  # odd ids emit DRI/RSTn
                    # ids ≡ 2 (mod 4) are PROGRESSIVE (SOF2 multi-scan);
                    # they decode to the same pixels as baseline, so the
                    # oracle is unchanged while the driver row pins the
                    # progressive reconstruction too
                    progressive=int(d) % 4 == 2,
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    payloads = docs.mapInPandas(
        gen, "doc_id long, payload binary"
    ).persist()  # encode stage feeds two consumers; run Python once (r13)
    feats = multimodal.extract_features(payloads)  # REAL JPEG decoder

    def tol(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            errs = []
            for d, b in zip(pdf["doc_id"], pdf["payload"]):
                out = decode_jpeg(bytes(b)).astype(np.int64)
                errs.append(int(np.abs(out - pixels(int(d))).max()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "max_err": pd.Series(errs, dtype="int32"),
                }
            )

    errors = payloads.mapInPandas(tol, "doc_id long, max_err int")
    joined = feats.join(errors, "doc_id").join(docs, "doc_id")
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("width"), 6).alias("avg_width"),
            F.round(F.avg("height"), 6).alias("avg_height"),
            F.sum((F.col("max_err") <= 4).cast("long")).alias("n_within_tol"),
        )
        .orderBy("source")
    )


@register(
    "mm_wav_decode",
    survey="ext:multimodal-wav",
    oracle="""
WITH dims AS (
  SELECT doc_id, source,
         doc_id % 40 + 20 AS n, doc_id % 2 + 1 AS ch,
         8000 + doc_id % 4 * 4000 AS rate
  FROM documents
), cells AS (
  SELECT d.doc_id, d.source, d.n, d.ch,
         (d.doc_id * 37 + i.i * 11 + c.c * 101) % 2003 - 1001 AS v
  FROM dims d,
       unnest(range(0, d.n)) AS i(i),
       unnest(range(0, d.ch)) AS c(c)
), per_doc AS (
  SELECT doc_id, source, max(n) AS n, max(ch) AS ch,
         CAST(sum(v) AS BIGINT) AS samp_sum,
         CAST(min(v) AS BIGINT) AS samp_min,
         CAST(max(v) AS BIGINT) AS samp_max,
         CAST(sum(v * v) AS BIGINT) AS energy
  FROM cells GROUP BY doc_id, source
), resampled AS (
  SELECT d.doc_id,
         CAST(sum((d.doc_id * 37 + (i.i * d.n // 16) * 11
                   + c.c * 101) % 2003 - 1001) AS BIGINT) AS rs_sum
  FROM dims d,
       unnest(range(0, 16)) AS i(i),
       unnest(range(0, d.ch)) AS c(c)
  GROUP BY d.doc_id
)
SELECT p.source,
       count(*) AS n_docs,
       round(avg(p.n), 6) AS avg_samples,
       round(avg(p.ch), 6) AS avg_channels,
       round(avg(d.rate), 6) AS avg_rate,
       round(sum(p.samp_sum) / CAST(sum(p.n * p.ch) AS DOUBLE), 6) AS samp_mean,
       round(avg(p.samp_min), 6) AS avg_min,
       round(avg(p.samp_max), 6) AS avg_max,
       round(sum(p.energy) / CAST(sum(p.n * p.ch) AS DOUBLE), 6) AS energy_mean,
       round(sum(r.rs_sum) / CAST(sum(16 * p.ch) AS DOUBLE), 6) AS resampled_mean
FROM per_doc p
JOIN resampled r USING (doc_id)
JOIN dims d USING (doc_id)
GROUP BY p.source ORDER BY p.source
""",
)
def mm_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode + resample end-to-end (pure struct/numpy, no
    media library): each doc gets a genuine PCM16 RIFF/WAVE payload whose
    interleaved samples are a pure function of ``doc_id``
    (``(id·37 + frame·11 + channel·101) mod 2003 − 1001``, mono or stereo
    by ``id`` parity, rate 8/12/16/20 kHz by ``id mod 4``), encoded with
    :func:`functions.multimodal.encode_wav`; the payloads run the REAL
    :func:`decode_audio_batch` (RIFF chunk walk + frombuffer reshape) and
    the REAL nearest-neighbor :func:`resample_audio_batch` to 16 frames,
    and the oracle recomputes every sample arithmetically in SQL.  Sums
    and energies are reconstructed as exact integers (mean × n·ch and
    mean_square × n·ch round to the exact sample sum / energy in f64), so
    both sides divide identical integers — a wrong channel interleave,
    sample width, endianness, or chunk offset shifts ``samp_mean`` /
    ``energy_mean`` / ``resampled_mean`` and fails the hash."""
    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                n, ch = d % 40 + 20, d % 2 + 1
                rate = 8000 + d % 4 * 4000
                i = np.arange(n)[:, None]
                c = np.arange(ch)[None, :]
                s = ((d * 37 + i * 11 + c * 101) % 2003 - 1001).astype(
                    np.int16
                )
                payloads.append(multimodal.encode_wav(s, rate))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    payloads = docs.mapInPandas(
        gen, "doc_id long, payload binary"
    ).persist()  # encode stage feeds two consumers; run Python once (r13)
    feats = multimodal.extract_audio_features(payloads)  # REAL WAV decoder
    resampled = multimodal.resample_audio(payloads, 16)  # REAL resampler
    rs_feats = multimodal.extract_audio_features(resampled).select(
        "doc_id", F.element_at("feature", 1).alias("rs_mean")
    )
    cells = (F.col("n_samples") * F.col("n_channels")).cast("double")
    per_doc = feats.select(
        "doc_id",
        "n_samples",
        "n_channels",
        "sample_rate",
        F.round(F.element_at("feature", 1) * cells).cast("long").alias("samp_sum"),
        F.element_at("feature", 2).cast("long").alias("samp_min"),
        F.element_at("feature", 3).cast("long").alias("samp_max"),
        F.round(F.element_at("feature", 4) * cells).cast("long").alias("energy"),
    )
    joined = (
        per_doc.join(rs_feats, "doc_id")
        .withColumn(
            "rs_sum",
            F.round(F.col("rs_mean") * 16 * F.col("n_channels")).cast("long"),
        )
        .join(docs, "doc_id")
    )
    denom = F.sum((F.col("n_samples") * F.col("n_channels")).cast("double"))
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_samples"), 6).alias("avg_samples"),
            F.round(F.avg("n_channels"), 6).alias("avg_channels"),
            F.round(F.avg("sample_rate"), 6).alias("avg_rate"),
            F.round(F.sum("samp_sum") / denom, 6).alias("samp_mean"),
            F.round(F.avg("samp_min"), 6).alias("avg_min"),
            F.round(F.avg("samp_max"), 6).alias("avg_max"),
            F.round(F.sum("energy") / denom, 6).alias("energy_mean"),
            F.round(
                F.sum("rs_sum")
                / F.sum((F.lit(16) * F.col("n_channels")).cast("double")),
                6,
            ).alias("resampled_mean"),
        )
        .orderBy("source")
    )


@register(
    "mm_png_decode",
    survey="ext:multimodal-png",
    oracle="""
WITH dims AS (
  SELECT doc_id, source,
         doc_id % 14 + 4 AS w, doc_id % 10 + 4 AS h
  FROM documents
), cells AS (
  SELECT d.doc_id, d.source, d.w, d.h,
         (d.doc_id * 17 + r.r * 5 + c.c * 11 + ch.ch * 29) % 256 AS v
  FROM dims d,
       unnest(range(0, d.h)) AS r(r),
       unnest(range(0, d.w)) AS c(c),
       unnest(range(0, 3)) AS ch(ch)
), per_doc AS (
  SELECT doc_id, source, max(w) AS w, max(h) AS h,
         CAST(sum(v) AS BIGINT) AS pix_sum,
         CAST(min(v) AS BIGINT) AS pix_min,
         CAST(max(v) AS BIGINT) AS pix_max
  FROM cells GROUP BY doc_id, source
), resized AS (
  SELECT d.doc_id,
         CAST(sum((d.doc_id * 17 + (i.i * d.h // 6) * 5
                   + (j.j * d.w // 8) * 11 + ch.ch * 29) % 256) AS BIGINT)
           AS rs_sum
  FROM dims d,
       unnest(range(0, 6)) AS i(i),
       unnest(range(0, 8)) AS j(j),
       unnest(range(0, 3)) AS ch(ch)
  GROUP BY d.doc_id
)
SELECT p.source,
       count(*) AS n_docs,
       round(avg(p.w), 6) AS avg_width,
       round(avg(p.h), 6) AS avg_height,
       round(sum(p.pix_sum) / CAST(sum(p.w * p.h * 3) AS DOUBLE), 6) AS pix_mean,
       round(avg(p.pix_min), 6) AS avg_min,
       round(avg(p.pix_max), 6) AS avg_max,
       round(sum(r.rs_sum) / (144.0 * count(*)), 6) AS resized_mean
FROM per_doc p JOIN resized r USING (doc_id)
GROUP BY p.source ORDER BY p.source
""",
)
def mm_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode + resize end-to-end (stdlib zlib + numpy, no media
    library): each doc gets a genuine 8-bit PNG whose
    per-channel pixels are a pure function of ``doc_id``
    (``(id·17 + row·5 + col·11 + ch·29) mod 256``), encoded with
    :func:`functions.multimodal.encode_png` in filter-cycling mode so the
    driver-checked path exercises ALL FIVE PNG filter types
    (None/Sub/Up/Average/Paeth) through inflate + unfilter on decode.
    Encoding VARIANT rotates by ``doc_id mod 3``: plain RGB,
    Adam7-INTERLACED RGB, and PALETTE-indexed (color type 3, the image's
    distinct colors as PLTE) — the decoded pixels are identical in all
    three, so one oracle pins the plain, interlace, and palette decode
    paths at once.  The payloads then run the REAL
    :func:`decode_image_batch` (magic-dispatch → :func:`decode_png`) and
    the REAL nearest-neighbor :func:`resize_image_batch` to 8×6, and the
    oracle recomputes every channel value arithmetically in SQL.  Sums
    are reconstructed as exact integers (mean × w·h·3 rounds to the
    exact channel sum in f64), so both sides divide identical integers —
    a wrong filter reversal, stride, row order, channel order, interlace
    pass, or palette gather shifts ``pix_mean`` / ``resized_mean`` and
    fails the hash."""
    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                h, w = d % 10 + 4, d % 14 + 4
                r = np.arange(h)[:, None, None]
                c = np.arange(w)[None, :, None]
                ch = np.arange(3)[None, None, :]
                px = ((d * 17 + r * 5 + c * 11 + ch * 29) % 256).astype(
                    np.uint8
                )
                if d % 3 == 2:
                    # palette variant: distinct colors -> PLTE + indices
                    pal, inv = np.unique(
                        px.reshape(-1, 3), axis=0, return_inverse=True
                    )
                    payloads.append(
                        multimodal.encode_png(
                            inv.reshape(h, w).astype(np.uint8),
                            palette=pal,
                            filters="cycle",
                            interlace=False,
                        )
                    )
                    continue
                payloads.append(
                    multimodal.encode_png(
                        px, filters="cycle", interlace=d % 3 == 1
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    payloads = docs.mapInPandas(
        gen, "doc_id long, payload binary"
    ).persist()  # encode stage feeds two consumers; run Python once (r13)
    feats = multimodal.extract_features(payloads)  # REAL PNG decoder
    resized = multimodal.resize_images(payloads, 8, 6)  # REAL resizer
    rs_feats = multimodal.extract_features(resized).select(
        "doc_id", F.element_at("feature", 1).alias("rs_mean")
    )
    area3 = (F.col("width") * F.col("height") * 3).cast("double")
    per_doc = feats.select(
        "doc_id",
        "width",
        "height",
        F.round(F.element_at("feature", 1) * area3).cast("long").alias("pix_sum"),
        F.element_at("feature", 3).cast("long").alias("pix_min"),
        F.element_at("feature", 4).cast("long").alias("pix_max"),
    )
    joined = (
        per_doc.join(rs_feats, "doc_id")
        .withColumn("rs_sum", F.round(F.col("rs_mean") * 144).cast("long"))
        .join(docs, "doc_id")
    )
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("width"), 6).alias("avg_width"),
            F.round(F.avg("height"), 6).alias("avg_height"),
            F.round(
                F.sum("pix_sum")
                / F.sum((F.col("width") * F.col("height") * 3).cast("double")),
                6,
            ).alias("pix_mean"),
            F.round(F.avg("pix_min"), 6).alias("avg_min"),
            F.round(F.avg("pix_max"), 6).alias("avg_max"),
            F.round(F.sum("rs_sum") / (144.0 * F.count(F.lit(1))), 6).alias(
                "resized_mean"
            ),
        )
        .orderBy("source")
    )


@register(
    "mm_gif_decode",
    survey="ext:multimodal-gif",
    oracle="""
WITH dims AS (
  SELECT doc_id, source,
         doc_id % 13 + 4 AS w, doc_id % 9 + 4 AS h,
         doc_id % 15 + 2 AS n
  FROM documents
), cells AS (
  SELECT d.doc_id, d.source, d.w, d.h, d.n,
         (d.doc_id * 7
          + ((d.doc_id * 3 + r.r * 5 + c.c * 7) % d.n) * 13
          + ch.ch * 29) % 256 AS v
  FROM dims d,
       unnest(range(0, d.h)) AS r(r),
       unnest(range(0, d.w)) AS c(c),
       unnest(range(0, 3)) AS ch(ch)
), per_doc AS (
  SELECT doc_id, source, max(w) AS w, max(h) AS h, max(n) AS n,
         CAST(sum(v) AS BIGINT) AS pix_sum,
         CAST(min(v) AS BIGINT) AS pix_min,
         CAST(max(v) AS BIGINT) AS pix_max
  FROM cells GROUP BY doc_id, source
), resized AS (
  SELECT d.doc_id,
         CAST(sum((d.doc_id * 7
                   + ((d.doc_id * 3 + (i.i * d.h // 6) * 5
                       + (j.j * d.w // 8) * 7) % d.n) * 13
                   + ch.ch * 29) % 256) AS BIGINT) AS rs_sum
  FROM dims d,
       unnest(range(0, 6)) AS i(i),
       unnest(range(0, 8)) AS j(j),
       unnest(range(0, 3)) AS ch(ch)
  GROUP BY d.doc_id
)
SELECT p.source,
       count(*) AS n_docs,
       round(avg(p.w), 6) AS avg_width,
       round(avg(p.h), 6) AS avg_height,
       round(avg(p.n), 6) AS avg_colors,
       round(sum(p.pix_sum) / CAST(sum(p.w * p.h * 3) AS DOUBLE), 6) AS pix_mean,
       round(avg(p.pix_min), 6) AS avg_min,
       round(avg(p.pix_max), 6) AS avg_max,
       round(sum(r.rs_sum) / (144.0 * count(*)), 6) AS resized_mean
FROM per_doc p JOIN resized r USING (doc_id)
GROUP BY p.source ORDER BY p.source
""",
)
def mm_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode + resize end-to-end (full variable-width LZW in
    pure numpy/stdlib — see ``functions/gif_codec.py``): each doc gets a
    genuine single-frame GIF89a whose palette
    (``(id·7 + i·13 + ch·29) mod 256``, ``id mod 15 + 2`` colors) and
    index plane (``(id·3 + row·5 + col·7) mod n``) are pure functions of
    ``doc_id``; odd ids are written INTERLACED and ids divisible by 3 use
    a LOCAL color table, so the driver-checked path exercises the
    four-pass de-interlace, both palette locations, sub-block framing,
    and the LZW dictionary (growth + KwKwK) on every run.  The payloads
    then run the REAL :func:`decode_image_batch` (magic-dispatch →
    ``decode_gif``) and the REAL nearest-neighbor
    :func:`resize_image_batch` to 8×6; the oracle recomputes every
    channel value arithmetically in SQL (GIF is lossless on indexed
    data, so sums reconstruct exactly).  A wrong code-width bump,
    sub-block seam, palette gather, or interlace pass shifts
    ``pix_mean`` / ``resized_mean`` and fails the hash."""
    import numpy as np
    import pandas as pd

    from entropy_balance_weighting_spark.functions.gif_codec import encode_gif

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                n = d % 15 + 2
                h, w = d % 9 + 4, d % 13 + 4
                pal = (
                    (d * 7 + np.arange(n)[:, None] * 13 + np.arange(3)[None, :] * 29)
                    % 256
                ).astype(np.uint8)
                idx = (
                    d * 3 + np.arange(h)[:, None] * 5 + np.arange(w)[None, :] * 7
                ) % n
                payloads.append(
                    encode_gif(
                        idx, pal, interlace=bool(d % 2), local_palette=d % 3 == 0
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    payloads = docs.mapInPandas(
        gen, "doc_id long, payload binary"
    ).persist()  # encode stage feeds two consumers; run Python once (r13)
    feats = multimodal.extract_features(payloads)  # REAL GIF decoder
    resized = multimodal.resize_images(payloads, 8, 6)  # REAL resizer
    rs_feats = multimodal.extract_features(resized).select(
        "doc_id", F.element_at("feature", 1).alias("rs_mean")
    )
    area3 = (F.col("width") * F.col("height") * 3).cast("double")
    per_doc = feats.select(
        "doc_id",
        "width",
        "height",
        F.round(F.element_at("feature", 1) * area3).cast("long").alias("pix_sum"),
        F.element_at("feature", 3).cast("long").alias("pix_min"),
        F.element_at("feature", 4).cast("long").alias("pix_max"),
    )
    joined = (
        per_doc.join(rs_feats, "doc_id")
        .withColumn("rs_sum", F.round(F.col("rs_mean") * 144).cast("long"))
        .join(docs, "doc_id")
        .withColumn("n_colors", F.col("doc_id") % 15 + 2)
    )
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("width"), 6).alias("avg_width"),
            F.round(F.avg("height"), 6).alias("avg_height"),
            F.round(F.avg("n_colors"), 6).alias("avg_colors"),
            F.round(
                F.sum("pix_sum")
                / F.sum((F.col("width") * F.col("height") * 3).cast("double")),
                6,
            ).alias("pix_mean"),
            F.round(F.avg("pix_min"), 6).alias("avg_min"),
            F.round(F.avg("pix_max"), 6).alias("avg_max"),
            F.round(F.sum("rs_sum") / (144.0 * F.count(F.lit(1))), 6).alias(
                "resized_mean"
            ),
        )
        .orderBy("source")
    )


@register(
    "mm_g711_decode",
    survey="ext:multimodal-g711",
    oracle="""
WITH codes AS (
  SELECT d.doc_id, d.source, d.doc_id % 40 + 10 AS n,
         (d.doc_id * 13 + i.i * 7) % 256 AS u,
         d.doc_id % 2 AS is_u
  FROM documents d,
       unnest(range(0, d.doc_id % 40 + 10)) AS i(i)
), lin AS (
  SELECT doc_id, source, n,
    CASE WHEN is_u = 1 THEN
      CASE WHEN (255 - u) >= 128
           THEN 132 - ((((255 - u) & 15) * 8 + 132) << (((255 - u) >> 4) & 7))
           ELSE ((((255 - u) & 15) * 8 + 132) << (((255 - u) >> 4) & 7)) - 132
      END
    ELSE
      (CASE WHEN (xor(u, 85) & 128) != 0 THEN 1 ELSE -1 END)
      * (CASE WHEN ((xor(u, 85) >> 4) & 7) = 0
              THEN (xor(u, 85) & 15) * 16 + 8
              ELSE ((xor(u, 85) & 15) * 16 + 264)
                   << (CASE WHEN ((xor(u, 85) >> 4) & 7) > 1
                            THEN ((xor(u, 85) >> 4) & 7) - 1 ELSE 0 END)
         END)
    END AS s
  FROM codes
), per_doc AS (
  SELECT doc_id, source, max(n) AS n,
         CAST(sum(s) AS BIGINT) AS samp_sum,
         CAST(min(s) AS BIGINT) AS samp_min,
         CAST(max(s) AS BIGINT) AS samp_max,
         CAST(sum(s * s) AS BIGINT) AS energy
  FROM lin GROUP BY doc_id, source
)
SELECT source,
       count(*) AS n_docs,
       round(avg(n), 6) AS avg_samples,
       round(sum(samp_sum) / CAST(sum(n) AS DOUBLE), 6) AS samp_mean,
       round(avg(samp_min), 6) AS avg_min,
       round(avg(samp_max), 6) AS avg_max,
       round(sum(energy) / CAST(sum(n) AS DOUBLE), 6) AS energy_mean
FROM per_doc GROUP BY source ORDER BY source
""",
)
def mm_g711_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL G.711 companded-audio decode end-to-end: each doc gets a
    genuine RIFF/WAVE payload whose 8-bit code stream is a pure function
    of ``doc_id`` (``(id·13 + i·7) mod 256``) — odd ids µ-law (WAV
    format 7), even ids A-law (format 6) — written by
    :func:`functions.multimodal.encode_wav` and decoded by the REAL
    vectorized :func:`ulaw_decode`/:func:`alaw_decode` expansions inside
    :func:`extract_audio_features`.  The oracle recomputes BOTH G.711
    expansions arithmetically in SQL (bias-shift for µ-law, segment
    unfold for A-law — the codecs are exact integer maps, so sample sum,
    min/max, and energy reconstruct exactly).  A wrong complement, bias,
    segment shift, or sign convention in either law shifts ``samp_mean``
    / ``energy_mean`` and fails the hash."""
    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                n = d % 40 + 10
                codes = ((d * 13 + np.arange(n) * 7) % 256).astype(np.uint8)
                if d % 2:
                    samples = multimodal.ulaw_decode(codes)
                    fmt = "ulaw"
                else:
                    samples = multimodal.alaw_decode(codes)
                    fmt = "alaw"
                payloads.append(
                    multimodal.encode_wav(samples, 8000, fmt=fmt)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    payloads = docs.mapInPandas(gen, "doc_id long, payload binary")
    feats = multimodal.extract_audio_features(payloads)  # REAL G.711 decode
    cells = F.col("n_samples").cast("double")  # mono: ch = 1
    per_doc = feats.select(
        "doc_id",
        "n_samples",
        F.round(F.element_at("feature", 1) * cells).cast("long").alias("samp_sum"),
        F.element_at("feature", 2).cast("long").alias("samp_min"),
        F.element_at("feature", 3).cast("long").alias("samp_max"),
        F.round(F.element_at("feature", 4) * cells).cast("long").alias("energy"),
    ).join(docs, "doc_id")
    denom = F.sum(F.col("n_samples").cast("double"))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_samples"), 6).alias("avg_samples"),
            F.round(F.sum("samp_sum") / denom, 6).alias("samp_mean"),
            F.round(F.avg("samp_min"), 6).alias("avg_min"),
            F.round(F.avg("samp_max"), 6).alias("avg_max"),
            F.round(F.sum("energy") / denom, 6).alias("energy_mean"),
        )
        .orderBy("source")
    )


@register(
    "mm_avi_frames",
    survey="ext:multimodal-video",
    oracle="""
WITH dims AS (
  SELECT doc_id, source,
         doc_id % 7 + 3 AS nf, doc_id % 5 + 4 AS w, doc_id % 6 + 4 AS h
  FROM documents
), sampled AS (
  SELECT d.doc_id, d.source, d.w, d.h, f.f
  FROM dims d, unnest(range(0, d.nf, 2)) AS f(f)
), cells AS (
  SELECT s.doc_id, s.source, s.w, s.h, s.f,
         (s.doc_id * 11 + s.f * 17 + r.r * 5 + c.c * 3 + ch.ch * 7) % 256 AS v
  FROM sampled s,
       unnest(range(0, s.h)) AS r(r),
       unnest(range(0, s.w)) AS c(c),
       unnest(range(0, 3)) AS ch(ch)
), per_doc AS (
  SELECT doc_id, source, max(w) AS w, max(h) AS h,
         count(DISTINCT f) AS n_sampled,
         CAST(sum(v) AS BIGINT) AS pix_sum,
         CAST(min(v) AS BIGINT) AS pix_min,
         CAST(max(v) AS BIGINT) AS pix_max
  FROM cells GROUP BY doc_id, source
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_sampled) AS BIGINT) AS n_frames,
       round(avg(w), 6) AS avg_width,
       round(avg(h), 6) AS avg_height,
       round(sum(pix_sum) / CAST(sum(w * h * 3 * n_sampled) AS DOUBLE), 6)
         AS pix_mean,
       round(avg(pix_min), 6) AS avg_min,
       round(avg(pix_max), 6) AS avg_max
FROM per_doc GROUP BY source ORDER BY source
""",
)
def mm_avi_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video demux + frame-sample + decode end-to-end: each doc gets
    a genuine uncompressed-DIB AVI (``functions/avi_codec.py`` — RIFF
    chunk tree, bottom-up BGR DIB frames, idx1 index) whose frame pixels
    are a pure function of ``doc_id`` and frame index
    (``(id·11 + f·17 + row·5 + col·3 + ch·7) mod 256``,
    ``id mod 7 + 3`` frames of ``(id mod 6 + 4) × (id mod 5 + 4)``).
    :func:`sample_video_frames` demuxes FOR REAL and emits every 2nd
    frame as a standalone BMP payload; the sampled frames then run the
    REAL :func:`decode_image_batch`, and the oracle recomputes every
    sampled channel value arithmetically in SQL.  A wrong RIFF walk,
    stride, row order (bottom-up), BGR swap, or sampling step shifts
    ``n_frames`` / ``pix_mean`` and fails the hash."""
    import numpy as np
    import pandas as pd

    from entropy_balance_weighting_spark.functions.avi_codec import encode_avi

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                nf, w, h = d % 7 + 3, d % 5 + 4, d % 6 + 4
                f = np.arange(nf)[:, None, None, None]
                r = np.arange(h)[None, :, None, None]
                c = np.arange(w)[None, None, :, None]
                ch = np.arange(3)[None, None, None, :]
                frames = (
                    (d * 11 + f * 17 + r * 5 + c * 3 + ch * 7) % 256
                ).astype(np.uint8)
                payloads.append(encode_avi(frames, fps=24))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    payloads = docs.mapInPandas(gen, "doc_id long, payload binary")
    frames = multimodal.sample_video_frames(payloads, every_n=2)  # REAL demux
    feats = multimodal.extract_features(frames, payload_col="frame")  # REAL BMP
    area3 = (F.col("width") * F.col("height") * 3).cast("double")
    per_frame = feats.select(
        "doc_id",
        "width",
        "height",
        F.round(F.element_at("feature", 1) * area3).cast("long").alias("pix_sum"),
        F.element_at("feature", 3).cast("long").alias("pix_min"),
        F.element_at("feature", 4).cast("long").alias("pix_max"),
    )
    per_doc = per_frame.groupBy("doc_id").agg(
        F.max("width").alias("w"),
        F.max("height").alias("h"),
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("pix_sum").alias("pix_sum"),
        F.min("pix_min").alias("pix_min"),
        F.max("pix_max").alias("pix_max"),
    ).join(docs, "doc_id")
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_sampled").cast("long").alias("n_frames"),
            F.round(F.avg("w"), 6).alias("avg_width"),
            F.round(F.avg("h"), 6).alias("avg_height"),
            F.round(
                F.sum("pix_sum")
                / F.sum(
                    (F.col("w") * F.col("h") * 3 * F.col("n_sampled")).cast(
                        "double"
                    )
                ),
                6,
            ).alias("pix_mean"),
            F.round(F.avg("pix_min"), 6).alias("avg_min"),
            F.round(F.avg("pix_max"), 6).alias("avg_max"),
        )
        .orderBy("source")
    )


@register(
    "mm_gif_anim",
    survey="ext:multimodal-gif-anim",
    oracle="""
WITH dims AS (
  SELECT doc_id, source,
         doc_id % 6 + 2 AS nf, doc_id % 8 + 3 AS w, doc_id % 7 + 3 AS h
  FROM documents
), sampled AS (
  SELECT d.doc_id, d.source, d.w, d.h, f.f
  FROM dims d, unnest(range(0, d.nf, 3)) AS f(f)
), cells AS (
  SELECT s.doc_id, s.source, s.w, s.h, s.f,
         (s.doc_id * 19 + s.f * 23 + r.r * 3 + c.c * 5 + ch.ch * 11) % 256 AS v
  FROM sampled s,
       unnest(range(0, s.h)) AS r(r),
       unnest(range(0, s.w)) AS c(c),
       unnest(range(0, 3)) AS ch(ch)
), per_doc AS (
  SELECT doc_id, source, max(w) AS w, max(h) AS h,
         count(DISTINCT f) AS n_sampled,
         CAST(sum(v) AS BIGINT) AS pix_sum,
         CAST(min(v) AS BIGINT) AS pix_min,
         CAST(max(v) AS BIGINT) AS pix_max
  FROM cells GROUP BY doc_id, source
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_sampled) AS BIGINT) AS n_frames,
       round(avg(w), 6) AS avg_width,
       round(avg(h), 6) AS avg_height,
       round(sum(pix_sum) / CAST(sum(w * h * 3 * n_sampled) AS DOUBLE), 6)
         AS pix_mean,
       round(avg(pix_min), 6) AS avg_min,
       round(avg(pix_max), 6) AS avg_max
FROM per_doc GROUP BY source ORDER BY source
""",
)
def mm_gif_anim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL animated-GIF demux + frame-sample + decode end-to-end: each
    doc gets a genuine multi-frame GIF89a (``encode_gif_animation`` —
    NETSCAPE2.0 loop block, one GCE + full-screen image with a LOCAL
    palette per frame, real LZW) whose frame pixels are a pure function
    of ``doc_id`` and frame index
    (``(id·19 + f·23 + row·3 + col·5 + ch·11) mod 256``,
    ``id mod 6 + 2`` frames of ``(id mod 7 + 3) × (id mod 8 + 3)``).
    :func:`sample_video_frames` dispatches on the GIF magic, decodes the
    animation with real compositing semantics, and emits every 3rd frame
    as a standalone BMP; sampled frames then run the REAL
    :func:`decode_image_batch`, and the oracle recomputes every sampled
    channel value arithmetically in SQL.  A wrong GCE walk, local-palette
    read, frame-composite, or sampling step shifts ``n_frames`` /
    ``pix_mean`` and fails the hash."""
    import numpy as np
    import pandas as pd

    from entropy_balance_weighting_spark.functions.gif_codec import (
        encode_gif_animation,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                nf, w, h = d % 6 + 2, d % 8 + 3, d % 7 + 3
                f = np.arange(nf)[:, None, None, None]
                r = np.arange(h)[None, :, None, None]
                c = np.arange(w)[None, None, :, None]
                ch = np.arange(3)[None, None, None, :]
                frames = (
                    (d * 19 + f * 23 + r * 3 + c * 5 + ch * 11) % 256
                ).astype(np.uint8)
                payloads.append(encode_gif_animation(frames))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    payloads = docs.mapInPandas(gen, "doc_id long, payload binary")
    frames = multimodal.sample_video_frames(payloads, every_n=3)  # REAL demux
    feats = multimodal.extract_features(frames, payload_col="frame")  # REAL BMP
    area3 = (F.col("width") * F.col("height") * 3).cast("double")
    per_frame = feats.select(
        "doc_id",
        "width",
        "height",
        F.round(F.element_at("feature", 1) * area3).cast("long").alias("pix_sum"),
        F.element_at("feature", 3).cast("long").alias("pix_min"),
        F.element_at("feature", 4).cast("long").alias("pix_max"),
    )
    per_doc = per_frame.groupBy("doc_id").agg(
        F.max("width").alias("w"),
        F.max("height").alias("h"),
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("pix_sum").alias("pix_sum"),
        F.min("pix_min").alias("pix_min"),
        F.max("pix_max").alias("pix_max"),
    ).join(docs, "doc_id")
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_sampled").cast("long").alias("n_frames"),
            F.round(F.avg("w"), 6).alias("avg_width"),
            F.round(F.avg("h"), 6).alias("avg_height"),
            F.round(
                F.sum("pix_sum")
                / F.sum(
                    (F.col("w") * F.col("h") * 3 * F.col("n_sampled")).cast(
                        "double"
                    )
                ),
                6,
            ).alias("pix_mean"),
            F.round(F.avg("pix_min"), 6).alias("avg_min"),
            F.round(F.avg("pix_max"), 6).alias("avg_max"),
        )
        .orderBy("source")
    )


@register(
    "mm_tiff_decode",
    survey="ext:multimodal-tiff",
    oracle="""
WITH dims AS (
  SELECT doc_id, source,
         doc_id % 11 + 4 AS w, doc_id % 8 + 4 AS h
  FROM documents
), cells AS (
  SELECT d.doc_id, d.source, d.w, d.h,
         (d.doc_id * 23 + r.r * 7 + c.c * 3 + ch.ch * 31) % 256 AS v
  FROM dims d,
       unnest(range(0, d.h)) AS r(r),
       unnest(range(0, d.w)) AS c(c),
       unnest(range(0, 3)) AS ch(ch)
), per_doc AS (
  SELECT doc_id, source, max(w) AS w, max(h) AS h,
         CAST(sum(v) AS BIGINT) AS pix_sum,
         CAST(min(v) AS BIGINT) AS pix_min,
         CAST(max(v) AS BIGINT) AS pix_max
  FROM cells GROUP BY doc_id, source
)
SELECT source,
       count(*) AS n_docs,
       round(avg(w), 6) AS avg_width,
       round(avg(h), 6) AS avg_height,
       round(sum(pix_sum) / CAST(sum(w * h * 3) AS DOUBLE), 6) AS pix_mean,
       round(avg(pix_min), 6) AS avg_min,
       round(avg(pix_max), 6) AS avg_max
FROM per_doc GROUP BY source ORDER BY source
""",
)
def mm_tiff_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL TIFF decode end-to-end (``functions/tiff_codec.py`` — strip
    walk + TIFF-variant LZW / PackBits, pure struct/numpy): each doc gets
    a genuine baseline TIFF whose RGB pixels are a pure function of
    ``doc_id`` (``(id·23 + row·7 + col·3 + ch·31) mod 256``), cycling the
    compression none / LZW / PackBits by ``id mod 3``, the byte order
    II/MM by ``id mod 2``, and multi-strip layout (3 rows per strip) on
    ids divisible by 5 — decoded pixels are identical in every variant,
    so ONE exact-integer oracle pins all the strip/compression/endianness
    paths.  The payloads run the REAL :func:`decode_image_batch`
    (magic-dispatch → ``decode_tiff``); a wrong early-change LZW width,
    PackBits run, strip boundary, or endian read shifts ``pix_mean`` and
    fails the hash."""
    import numpy as np
    import pandas as pd

    from entropy_balance_weighting_spark.functions.tiff_codec import encode_tiff

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                h, w = d % 8 + 4, d % 11 + 4
                r = np.arange(h)[:, None, None]
                c = np.arange(w)[None, :, None]
                ch = np.arange(3)[None, None, :]
                px = ((d * 23 + r * 7 + c * 3 + ch * 31) % 256).astype(
                    np.uint8
                )
                payloads.append(
                    encode_tiff(
                        px,
                        compression=("none", "lzw", "packbits")[d % 3],
                        big_endian=bool(d % 2),
                        rows_per_strip=3 if d % 5 == 0 else None,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    payloads = docs.mapInPandas(gen, "doc_id long, payload binary")
    feats = multimodal.extract_features(payloads)  # REAL TIFF decoder
    area3 = (F.col("width") * F.col("height") * 3).cast("double")
    per_doc = feats.select(
        "doc_id",
        "width",
        "height",
        F.round(F.element_at("feature", 1) * area3).cast("long").alias("pix_sum"),
        F.element_at("feature", 3).cast("long").alias("pix_min"),
        F.element_at("feature", 4).cast("long").alias("pix_max"),
    ).join(docs, "doc_id")
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("width"), 6).alias("avg_width"),
            F.round(F.avg("height"), 6).alias("avg_height"),
            F.round(
                F.sum("pix_sum")
                / F.sum((F.col("width") * F.col("height") * 3).cast("double")),
                6,
            ).alias("pix_mean"),
            F.round(F.avg("pix_min"), 6).alias("avg_min"),
            F.round(F.avg("pix_max"), 6).alias("avg_max"),
        )
        .orderBy("source")
    )


@register(
    "mm_flac_decode",
    survey="ext:multimodal-flac",
    oracle="""
WITH codes AS (
  SELECT d.doc_id, d.source, d.doc_id % 60 + 20 AS n,
         ((d.doc_id * 7 + i.i * 13) % 4001) - 2000 AS s
  FROM documents d,
       unnest(range(0, d.doc_id % 60 + 20)) AS i(i)
), per_doc AS (
  SELECT doc_id, source, max(n) AS n,
         CAST(sum(s) AS BIGINT) AS samp_sum,
         CAST(min(s) AS BIGINT) AS samp_min,
         CAST(max(s) AS BIGINT) AS samp_max,
         CAST(sum(s * s) AS BIGINT) AS energy
  FROM codes GROUP BY doc_id, source
)
SELECT source,
       count(*) AS n_docs,
       round(avg(n), 6) AS avg_samples,
       round(sum(samp_sum) / CAST(sum(n) AS DOUBLE), 6) AS samp_mean,
       round(avg(samp_min), 6) AS avg_min,
       round(avg(samp_max), 6) AS avg_max,
       round(sum(energy) / CAST(sum(n) AS DOUBLE), 6) AS energy_mean
FROM per_doc GROUP BY source ORDER BY source
""",
)
def mm_flac_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-audio decode end-to-end: each doc gets a genuine
    FLAC stream (``functions/flac_codec.py`` — fixed predictors +
    Rice-coded residuals, frame CRCs) of mono int16 samples that are a
    pure function of ``doc_id`` (``((id·7 + i·13) mod 4001) − 2000``,
    ``id mod 60 + 20`` samples, block size 32 so multi-frame streams and
    the UTF-8 frame numbering are exercised), decoded by the REAL
    :func:`decode_audio_batch` (magic-dispatch → ``decode_flac``).  FLAC
    is lossless, so the oracle recomputes exact integer sample sums,
    extrema, and energy in SQL — a wrong Rice parameter read, predictor
    reconstruction, zigzag, or CRC seam shifts ``samp_mean`` /
    ``energy_mean`` and fails the hash."""
    import numpy as np
    import pandas as pd

    from entropy_balance_weighting_spark.functions.flac_codec import encode_flac

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                n = d % 60 + 20
                s = (((d * 7 + np.arange(n) * 13) % 4001) - 2000).astype(
                    np.int16
                )
                payloads.append(encode_flac(s, 16_000, block_size=32))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    payloads = docs.mapInPandas(gen, "doc_id long, payload binary")
    feats = multimodal.extract_audio_features(payloads)  # REAL FLAC decode
    cells = F.col("n_samples").cast("double")  # mono
    per_doc = feats.select(
        "doc_id",
        "n_samples",
        F.round(F.element_at("feature", 1) * cells).cast("long").alias("samp_sum"),
        F.element_at("feature", 2).cast("long").alias("samp_min"),
        F.element_at("feature", 3).cast("long").alias("samp_max"),
        F.round(F.element_at("feature", 4) * cells).cast("long").alias("energy"),
    ).join(docs, "doc_id")
    denom = F.sum(F.col("n_samples").cast("double"))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_samples"), 6).alias("avg_samples"),
            F.round(F.sum("samp_sum") / denom, 6).alias("samp_mean"),
            F.round(F.avg("samp_min"), 6).alias("avg_min"),
            F.round(F.avg("samp_max"), 6).alias("avg_max"),
            F.round(F.sum("energy") / denom, 6).alias("energy_mean"),
        )
        .orderBy("source")
    )


@register(
    "mm_dhash_dups",
    survey="ext:multimodal-phash-dedup",
    oracle="""
WITH d2 AS (
  SELECT doc_id, source, doc_id - doc_id % 3 AS base,
         (doc_id - doc_id % 3) % 12 + 16 AS h,
         (doc_id - doc_id % 3) % 10 + 16 AS w
  FROM documents
), bits AS (
  SELECT d.doc_id, d.source, i.i, j.j,
    CASE WHEN
      ((d.base * 17 + ((i.i * d.h) // 8) * 23
        + (((j.j + 1) * d.w) // 9) * 31) % 251)
      > ((d.base * 17 + ((i.i * d.h) // 8) * 23
          + ((j.j * d.w) // 9) * 31) % 251)
    THEN 1 ELSE 0 END AS b
  FROM d2 d, unnest(range(0, 8)) AS i(i), unnest(range(0, 8)) AS j(j)
), hashes AS (
  SELECT doc_id, source,
    CAST(sum(CASE WHEN i * 8 + j >= 32
                  THEN b * (1::BIGINT << (i * 8 + j - 32)) ELSE 0 END)
         AS BIGINT) AS hash_hi,
    CAST(sum(CASE WHEN i * 8 + j < 32
                  THEN b * (1::BIGINT << (i * 8 + j)) ELSE 0 END)
         AS BIGINT) AS hash_lo
  FROM bits GROUP BY doc_id, source
), clusters AS (
  SELECT source, hash_hi, hash_lo, count(*) AS csize
  FROM hashes GROUP BY source, hash_hi, hash_lo
)
SELECT source,
       count(*) AS n_clusters,
       CAST(sum(csize) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN csize >= 2 THEN csize ELSE 0 END) AS BIGINT)
         AS n_dup_docs,
       CAST(max(csize) AS BIGINT) AS max_cluster,
       CAST(sum(hash_lo % 9973) AS BIGINT) AS lo_checksum
FROM clusters GROUP BY source ORDER BY source
""",
)
def mm_dhash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup detection end-to-end: docs come in
    groups of three sharing one base pattern
    (``(base·17 + r·23 + c·31) mod 251``, dims from ``base``) with a
    per-doc CONSTANT BRIGHTNESS OFFSET (``doc_id mod 3``) — encoded as
    genuine grayscale BMPs, REAL-decoded, and 64-bit dHashed
    (:func:`functions.multimodal.dhash_images`: integer gray →
    nearest-neighbor 9×8 → adjacent-column comparisons).  dHash is
    invariant to the brightness shift, so each triple collides into one
    hash bucket — the scalable near-dup shape (exact groupBy on the
    hash, no pairwise compare).  The oracle recomputes every hash bit
    arithmetically in SQL (the offset cancels inside the comparison) and
    re-derives the cluster stats; a wrong gray formula, resize index,
    comparison direction, or bit order shifts ``lo_checksum`` /
    ``n_dup_docs`` and fails the hash."""
    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                base = d - d % 3
                h, w = base % 12 + 16, base % 10 + 16
                r = np.arange(h)[:, None]
                c = np.arange(w)[None, :]
                px = ((base * 17 + r * 23 + c * 31) % 251 + d % 3).astype(
                    np.uint8
                )
                payloads.append(multimodal.encode_bmp(px))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    payloads = docs.mapInPandas(gen, "doc_id long, payload binary")
    hashes = multimodal.dhash_images(payloads).join(docs, "doc_id")
    clusters = hashes.groupBy("source", "hash_hi", "hash_lo").agg(
        F.count(F.lit(1)).alias("csize")
    )
    return (
        clusters.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("csize").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("csize") >= 2, F.col("csize")).otherwise(0))
            .cast("long")
            .alias("n_dup_docs"),
            F.max("csize").cast("long").alias("max_cluster"),
            F.sum(F.col("hash_lo") % 9973).cast("long").alias("lo_checksum"),
        )
        .orderBy("source")
    )


@register(
    "mm_audio_fp_dups",
    survey="ext:multimodal-audio-fingerprint",
    oracle="""
WITH d2 AS (
  SELECT doc_id, source, doc_id - doc_id % 3 AS base,
         (doc_id - doc_id % 3) % 50 + 40 AS n
  FROM documents
), samp AS (
  SELECT d.doc_id, d.source, d.n, i.i,
         (((d.base * 11 + i.i * 17) % 1601) - 800) * (d.doc_id % 3 + 1) AS s,
         (i.i * 16) // d.n AS seg
  FROM d2 d, unnest(range(0, d.n)) AS i(i)
), energies AS (
  SELECT doc_id, source, seg, sum(s * s) AS e
  FROM samp GROUP BY doc_id, source, seg
), bits AS (
  SELECT a.doc_id, a.source, a.seg - 1 AS k,
         CASE WHEN a.e > b.e THEN 1 ELSE 0 END AS bit
  FROM energies a JOIN energies b
    ON a.doc_id = b.doc_id AND a.seg = b.seg + 1
), fps AS (
  SELECT doc_id, source,
         CAST(sum(bit * (1::BIGINT << k)) AS BIGINT) AS fp
  FROM bits GROUP BY doc_id, source
), clusters AS (
  SELECT source, fp, count(*) AS csize FROM fps GROUP BY source, fp
)
SELECT source,
       count(*) AS n_clusters,
       CAST(sum(csize) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN csize >= 2 THEN csize ELSE 0 END) AS BIGINT)
         AS n_dup_docs,
       CAST(max(csize) AS BIGINT) AS max_cluster,
       CAST(sum(fp % 9973) AS BIGINT) AS fp_checksum
FROM clusters GROUP BY source ORDER BY source
""",
)
def mm_audio_fp_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup detection via the volume-invariant energy-envelope
    fingerprint: docs come in triples sharing one base waveform
    (``((base·11 + i·17) mod 1601) − 800``, ``base mod 50 + 40``
    samples) scaled by ``doc_id mod 3 + 1`` — an EXACT integer volume
    change, which multiplies every span energy by the square of the
    factor and so cannot flip any adjacent-span comparison.  Payloads
    are genuine PCM16 WAVs, REAL-decoded, fingerprinted by
    :func:`functions.multimodal.fingerprint_audio` (15 bits over 16
    spans), and bucketed by exact groupBy; the oracle recomputes every
    span energy and comparison arithmetically in SQL.  A wrong span
    partition, energy sum, comparison direction, or bit order shifts
    ``fp_checksum`` / ``n_dup_docs`` and fails the hash."""
    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                base = d - d % 3
                n = base % 50 + 40
                s = (
                    (((base * 11 + np.arange(n) * 17) % 1601) - 800)
                    * (d % 3 + 1)
                ).astype(np.int16)
                payloads.append(multimodal.encode_wav(s, 8000))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    payloads = docs.mapInPandas(gen, "doc_id long, payload binary")
    fps = multimodal.fingerprint_audio(payloads).join(docs, "doc_id")
    clusters = fps.groupBy("source", "fingerprint").agg(
        F.count(F.lit(1)).alias("csize")
    )
    return (
        clusters.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("csize").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("csize") >= 2, F.col("csize")).otherwise(0))
            .cast("long")
            .alias("n_dup_docs"),
            F.max("csize").cast("long").alias("max_cluster"),
            F.sum(F.col("fingerprint") % 9973).cast("long").alias("fp_checksum"),
        )
        .orderBy("source")
    )


@register(
    "mm_exif_gps_scrub",
    survey="ext:multimodal-exif-scrub",
    oracle="""
WITH meta AS (
  SELECT doc_id, source,
         doc_id % 8 + 1 AS orientation,
         CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS has_gps,
         CASE WHEN doc_id % 3 = 0
              THEN (doc_id % 90) * 1000000 + 500000 ELSE 0 END AS lat_micro,
         CASE WHEN doc_id % 3 = 0
              THEN (CASE WHEN doc_id % 2 = 1 THEN -1 ELSE 1 END)
                   * ((doc_id % 180) * 1000000 + 250000)
              ELSE 0 END AS lon_micro
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(has_gps) AS BIGINT) AS n_gps,
       round(avg(orientation), 6) AS avg_orientation,
       CAST(sum(lat_micro) AS BIGINT) AS lat_micro_sum,
       CAST(sum(lon_micro) AS BIGINT) AS lon_micro_sum,
       CAST(0 AS BIGINT) AS n_gps_after_scrub,
       CAST(0 AS BIGINT) AS n_pixel_mismatch
FROM meta GROUP BY source ORDER BY source
""",
)
def mm_exif_gps_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF privacy scrub end-to-end: each doc gets a genuine JPEG with
    an APP1/Exif segment (``functions/exif_codec.py`` — embedded TIFF
    IFD): orientation ``id mod 8 + 1``, and on ids divisible by 3 a GPS
    sub-IFD with micro-degree-exact RATIONAL lat/lon.  The Spark stage
    extracts the metadata (REAL IFD walk), STRIPS every APP1 segment,
    re-extracts (must find nothing), and re-decodes both payloads (the
    scrub must not touch entropy data — pixels byte-identical).  The
    oracle recomputes the planted metadata arithmetically and pins
    ``n_gps_after_scrub = 0`` and ``n_pixel_mismatch = 0`` — a scrub
    that drops the wrong segment or shifts entropy bytes fails the
    hash."""
    import numpy as np
    import pandas as pd

    from entropy_balance_weighting_spark.functions.exif_codec import (
        build_exif,
        extract_exif,
        insert_app1,
        strip_exif,
    )
    from entropy_balance_weighting_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = {"doc_id": [], "orientation": [], "has_gps": [],
                    "lat_micro": [], "lon_micro": [],
                    "gps_after": [], "pixel_mismatch": []}
            for did in pdf["doc_id"]:
                d = int(did)
                h, w = d % 6 + 8, d % 9 + 8
                px = np.clip(
                    40 + d % 60
                    + 3 * np.arange(h)[:, None, None]
                    + 2 * np.arange(w)[None, :, None]
                    + 10 * np.arange(3)[None, None, :],
                    0,
                    255,
                ).astype(np.uint8)
                gps = None
                if d % 3 == 0:
                    lat = (d % 90) + 0.5
                    lon = ((d % 180) + 0.25) * (-1 if d % 2 else 1)
                    gps = (lat, lon)
                tagged = insert_app1(
                    encode_jpeg(px, 90),
                    build_exif(
                        orientation=d % 8 + 1, make=f"cam{d % 5}", gps=gps
                    ),
                )
                meta = extract_exif(tagged)
                clean = strip_exif(tagged)
                after = extract_exif(clean)
                rows["doc_id"].append(d)
                rows["orientation"].append(int(meta.get("orientation", 0)))
                rows["has_gps"].append(1 if meta.get("has_gps") else 0)
                rows["lat_micro"].append(
                    int(round(meta.get("gps_lat", 0.0) * 1_000_000))
                )
                rows["lon_micro"].append(
                    int(round(meta.get("gps_lon", 0.0) * 1_000_000))
                )
                rows["gps_after"].append(1 if after.get("has_gps") else 0)
                rows["pixel_mismatch"].append(
                    0
                    if np.array_equal(decode_jpeg(clean), decode_jpeg(tagged))
                    else 1
                )
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in rows.items()}
            )

    schema = (
        "doc_id long, orientation long, has_gps long, lat_micro long, "
        "lon_micro long, gps_after long, pixel_mismatch long"
    )
    extracted = docs.select("doc_id").mapInPandas(gen, schema).join(docs, "doc_id")
    return (
        extracted.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("has_gps").cast("long").alias("n_gps"),
            F.round(F.avg("orientation"), 6).alias("avg_orientation"),
            F.sum("lat_micro").cast("long").alias("lat_micro_sum"),
            F.sum("lon_micro").cast("long").alias("lon_micro_sum"),
            F.sum("gps_after").cast("long").alias("n_gps_after_scrub"),
            F.sum("pixel_mismatch").cast("long").alias("n_pixel_mismatch"),
        )
        .orderBy("source")
    )


@register(
    "mm_id3_scrub",
    survey="ext:multimodal-container-scrub",
    oracle="""
WITH meta AS (
  SELECT doc_id, source,
         doc_id % 7 AS title_code,
         CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS has_gps,
         CASE WHEN doc_id % 4 = 0
              THEN (doc_id % 90) * 1000000 + 500000 ELSE 0 END AS lat_micro,
         CASE WHEN doc_id % 4 = 0
              THEN (CASE WHEN doc_id % 2 = 1 THEN -1 ELSE 1 END)
                   * ((doc_id % 180) * 1000000 + 250000)
              ELSE 0 END AS lon_micro
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(has_gps) AS BIGINT) AS n_gps,
       CAST(sum(title_code) AS BIGINT) AS title_code_sum,
       CAST(sum(lat_micro) AS BIGINT) AS lat_micro_sum,
       CAST(sum(lon_micro) AS BIGINT) AS lon_micro_sum,
       CAST(0 AS BIGINT) AS n_gps_after_scrub,
       CAST(0 AS BIGINT) AS n_body_mismatch
FROM meta GROUP BY source ORDER BY source
""",
)
def mm_id3_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ID3v2 privacy scrub end-to-end (the MP3 sibling of
    ``mm_exif_gps_scrub``): each doc gets an "MP3" — an ID3v2.3 tag
    (``functions/container_meta.py``) in front of an opaque synthetic
    bitstream, plus a trailing ID3v1 block.  Planted: title
    ``track{id mod 7}`` and, on ids divisible by 4, a GPS TXXX frame at
    micro-degree-exact precision.  The Spark stage extracts the tag
    (REAL frame walk), STRIPS both tags, re-extracts (must find
    nothing), and compares the surviving bytes against the original
    bitstream (container scrub must be bitstream-exact — the engine
    never decodes MP3 audio, and doesn't need to).  The oracle
    recomputes the planted metadata arithmetically and pins
    ``n_gps_after_scrub = 0`` and ``n_body_mismatch = 0``."""
    import pandas as pd

    from entropy_balance_weighting_spark.functions.container_meta import (
        build_id3,
        extract_id3,
        strip_id3,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = {"doc_id": [], "title_code": [], "has_gps": [],
                    "lat_micro": [], "lon_micro": [],
                    "gps_after": [], "body_mismatch": []}
            for did in pdf["doc_id"]:
                d = int(did)
                body = bytes((d * 31 + i * 7) % 256 for i in range(64 + d % 64))
                gps = None
                if d % 4 == 0:
                    lat = (d % 90) + 0.5
                    lon = ((d % 180) + 0.25) * (-1 if d % 2 else 1)
                    gps = (lat, lon)
                mp3 = (
                    build_id3(title=f"track{d % 7}", artist=f"artist{d % 5}",
                              gps=gps)
                    + body
                    + b"TAG" + bytes(125)
                )
                meta = extract_id3(mp3)
                clean = strip_id3(mp3)
                after = extract_id3(clean)
                rows["doc_id"].append(d)
                rows["title_code"].append(
                    int(meta.get("title", "track-1").removeprefix("track"))
                )
                rows["has_gps"].append(1 if meta.get("has_gps") else 0)
                rows["lat_micro"].append(
                    int(round(meta.get("gps_lat", 0.0) * 1_000_000))
                )
                rows["lon_micro"].append(
                    int(round(meta.get("gps_lon", 0.0) * 1_000_000))
                )
                rows["gps_after"].append(1 if after.get("has_gps") else 0)
                rows["body_mismatch"].append(0 if clean == body else 1)
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in rows.items()}
            )

    schema = (
        "doc_id long, title_code long, has_gps long, lat_micro long, "
        "lon_micro long, gps_after long, body_mismatch long"
    )
    extracted = docs.select("doc_id").mapInPandas(gen, schema).join(docs, "doc_id")
    return (
        extracted.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("has_gps").cast("long").alias("n_gps"),
            F.sum("title_code").cast("long").alias("title_code_sum"),
            F.sum("lat_micro").cast("long").alias("lat_micro_sum"),
            F.sum("lon_micro").cast("long").alias("lon_micro_sum"),
            F.sum("gps_after").cast("long").alias("n_gps_after_scrub"),
            F.sum("body_mismatch").cast("long").alias("n_body_mismatch"),
        )
        .orderBy("source")
    )


@register(
    "mm_mp4_meta_scrub",
    survey="ext:multimodal-container-scrub",
    oracle="""
WITH meta AS (
  SELECT doc_id, source,
         doc_id % 6 AS clip_code,
         CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS has_gps,
         CASE WHEN doc_id % 3 = 0
              THEN (doc_id % 90) * 10000 + 5000 ELSE 0 END AS lat_e4,
         CASE WHEN doc_id % 3 = 0
              THEN (CASE WHEN doc_id % 2 = 1 THEN -1 ELSE 1 END)
                   * ((doc_id % 180) * 10000 + 2500)
              ELSE 0 END AS lon_e4
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(has_gps) AS BIGINT) AS n_gps,
       CAST(sum(clip_code) AS BIGINT) AS clip_code_sum,
       CAST(sum(lat_e4) AS BIGINT) AS lat_e4_sum,
       CAST(sum(lon_e4) AS BIGINT) AS lon_e4_sum,
       CAST(0 AS BIGINT) AS n_gps_after_scrub,
       CAST(0 AS BIGINT) AS n_mdat_mismatch
FROM meta GROUP BY source ORDER BY source
""",
)
def mm_mp4_meta_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4 atom-tree privacy scrub end-to-end: each doc gets a minimal
    ISO-BMFF file (``functions/container_meta.py`` — ftyp + moov with a
    stub mvhd and, where planted, a udta carrying the 3GPP ``©xyz``
    location and an ``©nam`` title + an mdat with an opaque synthetic
    bitstream).  Planted: title ``clip{id mod 6}`` and, on ids divisible
    by 3, GPS at 1e-4-degree-exact precision.  The Spark stage walks the
    atom tree (REAL 14496-12 box parse incl. 64-bit largesize), STRIPS
    the udta, re-extracts (must find nothing), and pins the mdat
    byte-identical — the engine scrubs containers it cannot decode
    (H.264 stays a named stub).  The oracle recomputes the plant
    arithmetically; ``n_gps_after_scrub = 0``, ``n_mdat_mismatch = 0``."""
    import pandas as pd

    from entropy_balance_weighting_spark.functions.container_meta import (
        build_mp4,
        extract_mp4_meta,
        strip_mp4_meta,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = {"doc_id": [], "clip_code": [], "has_gps": [],
                    "lat_e4": [], "lon_e4": [],
                    "gps_after": [], "mdat_mismatch": []}
            for did in pdf["doc_id"]:
                d = int(did)
                body = bytes((d * 17 + i * 13) % 256 for i in range(80 + d % 48))
                gps = None
                if d % 3 == 0:
                    lat = (d % 90) + 0.5
                    lon = ((d % 180) + 0.25) * (-1 if d % 2 else 1)
                    gps = (lat, lon)
                mp4 = build_mp4(body, name=f"clip{d % 6}", gps=gps)
                meta = extract_mp4_meta(mp4)
                clean = strip_mp4_meta(mp4)
                after = extract_mp4_meta(clean)
                i0 = mp4.index(b"mdat") - 4
                i1 = clean.index(b"mdat") - 4
                rows["doc_id"].append(d)
                rows["clip_code"].append(
                    int(meta.get("name", "clip-1").removeprefix("clip"))
                )
                rows["has_gps"].append(1 if meta.get("has_gps") else 0)
                rows["lat_e4"].append(
                    int(round(meta.get("gps_lat", 0.0) * 10_000))
                )
                rows["lon_e4"].append(
                    int(round(meta.get("gps_lon", 0.0) * 10_000))
                )
                rows["gps_after"].append(1 if after.get("has_gps") else 0)
                rows["mdat_mismatch"].append(
                    0 if clean[i1:] == mp4[i0:] else 1
                )
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in rows.items()}
            )

    schema = (
        "doc_id long, clip_code long, has_gps long, lat_e4 long, "
        "lon_e4 long, gps_after long, mdat_mismatch long"
    )
    extracted = docs.select("doc_id").mapInPandas(gen, schema).join(docs, "doc_id")
    return (
        extracted.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("has_gps").cast("long").alias("n_gps"),
            F.sum("clip_code").cast("long").alias("clip_code_sum"),
            F.sum("lat_e4").cast("long").alias("lat_e4_sum"),
            F.sum("lon_e4").cast("long").alias("lon_e4_sum"),
            F.sum("gps_after").cast("long").alias("n_gps_after_scrub"),
            F.sum("mdat_mismatch").cast("long").alias("n_mdat_mismatch"),
        )
        .orderBy("source")
    )


@register(
    "mm_video_fp_dups",
    survey="ext:multimodal-video-fingerprint",
    oracle="""
WITH d2 AS (
  SELECT doc_id, source, doc_id - doc_id % 3 AS base, doc_id % 3 AS v
  FROM documents
), dims AS (
  SELECT doc_id, source, base, v,
         base % 5 + 12 AS h, base % 7 + 12 AS w,
         (base % 4) * 2 + 6 AS ncom,
         (base % 4) * 2 + 6 + v AS ntot
  FROM d2
), frames AS (
  SELECT d.*, f.f FROM dims d, unnest(range(0, d.ntot)) AS f(f)
  WHERE f.f % 2 = 0
), bits AS (
  SELECT doc_id, source, f, i.i, j.j,
    CASE WHEN
      (CASE WHEN f < ncom
            THEN (base * 17 + f * 29 + ((i.i * h) // 8) * 23
                  + (((j.j + 1) * w) // 9) * 31) % 251
            ELSE (doc_id * 41 + f * 29 + ((i.i * h) // 8) * 23
                  + (((j.j + 1) * w) // 9) * 31) % 251 END)
      >
      (CASE WHEN f < ncom
            THEN (base * 17 + f * 29 + ((i.i * h) // 8) * 23
                  + ((j.j * w) // 9) * 31) % 251
            ELSE (doc_id * 41 + f * 29 + ((i.i * h) // 8) * 23
                  + ((j.j * w) // 9) * 31) % 251 END)
    THEN 1 ELSE 0 END AS b
  FROM frames, unnest(range(0, 8)) AS i(i), unnest(range(0, 8)) AS j(j)
), hashes AS (
  SELECT doc_id, source, f,
    CAST(sum(CASE WHEN i * 8 + j >= 32
                  THEN b * (1::BIGINT << (i * 8 + j - 32)) ELSE 0 END)
         AS BIGINT) AS hash_hi,
    CAST(sum(CASE WHEN i * 8 + j < 32
                  THEN b * (1::BIGINT << (i * 8 + j)) ELSE 0 END)
         AS BIGINT) AS hash_lo
  FROM bits GROUP BY doc_id, source, f
), sigs AS (
  SELECT doc_id, source, (f // 2) // 2 AS band,
    CAST(sum((hash_lo % 1000003) * (2 * ((f // 2) % 2) + 1)
             + (hash_hi % 1000003) * (2 * ((f // 2) % 2) + 2)) % 1000003
         AS BIGINT) AS sig
  FROM hashes GROUP BY doc_id, source, band
), buckets AS (
  SELECT source, band, sig, count(DISTINCT doc_id) AS csize
  FROM sigs GROUP BY source, band, sig
), bstats AS (
  SELECT source, count(*) AS n_buckets,
         CAST(sum(CASE WHEN csize >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_buckets,
         CAST(sum(sig % 9973) AS BIGINT) AS sig_checksum
  FROM buckets GROUP BY source
), dup_docs AS (
  SELECT source, count(DISTINCT doc_id) AS n_dup_docs FROM (
    SELECT DISTINCT s.source, s.doc_id
    FROM sigs s JOIN buckets b
      ON s.source = b.source AND s.band = b.band AND s.sig = b.sig
    WHERE b.csize >= 2
  ) GROUP BY source
)
SELECT d.source, count(*) AS n_docs,
       max(b.n_buckets) AS n_buckets,
       max(b.n_dup_buckets) AS n_dup_buckets,
       max(b.sig_checksum) AS sig_checksum,
       coalesce(max(dd.n_dup_docs), 0) AS n_dup_docs
FROM documents d
JOIN bstats b ON d.source = b.source
LEFT JOIN dup_docs dd ON d.source = dd.source
GROUP BY d.source ORDER BY d.source
""",
)
def mm_video_fp_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal video near-dup detection end-to-end (r7 verdict #5):
    docs come in groups of three sharing one clip — identical footage
    with a per-variant CONSTANT BRIGHTNESS OFFSET (dHash-invariant) and
    a per-variant number of extra TRAILING frames (a re-encode with a
    different trailer), encoded alternately as a genuine uncompressed
    AVI (even ids) or an animated GIF (odd ids) so dup groups span
    CONTAINER FORMATS.  The Spark pipeline: REAL demux + every-2nd-frame
    sample (:func:`multimodal.sample_video_frames`, magic dispatch), a
    64-bit dHash per sampled frame (:func:`multimodal.dhash_video_frames`
    — the only Python stage), then the per-frame hash SEQUENCE is banded
    like a MinHash signature (:func:`multimodal.video_band_signatures`,
    pure Catalyst arithmetic): clips sharing ANY ``(band, sig)`` bucket
    are near-dup candidates, so shifted/re-encoded/cross-format copies
    bucket together with no pairwise frame compare.  The oracle
    recomputes every frame's hash bits and every band signature
    arithmetically in SQL and re-derives the bucket stats."""
    import numpy as np
    import pandas as pd

    from entropy_balance_weighting_spark.functions.avi_codec import encode_avi
    from entropy_balance_weighting_spark.functions.gif_codec import (
        encode_gif_animation,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                base, v = d - d % 3, d % 3
                h, w = base % 5 + 12, base % 7 + 12
                ncom = (base % 4) * 2 + 6
                r = np.arange(h)[:, None]
                c = np.arange(w)[None, :]
                stack = []
                for f in range(ncom + v):
                    if f < ncom:
                        g = (base * 17 + f * 29 + r * 23 + c * 31) % 251 + v
                    else:
                        g = (d * 41 + f * 29 + r * 23 + c * 31) % 251
                    stack.append(np.repeat(g[:, :, None], 3, axis=2))
                fr = np.asarray(stack, dtype=np.uint8)
                payloads.append(
                    encode_avi(fr, fps=24) if d % 2 == 0
                    else encode_gif_animation(fr)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    payloads = docs.mapInPandas(gen, "doc_id long, payload binary")
    frames = multimodal.sample_video_frames(payloads, every_n=2)
    hashed = multimodal.dhash_video_frames(frames)
    # sigs sits on top of the Python encode→demux→dHash chain and feeds
    # BOTH the bucket stats and the dup-doc count; buckets feeds bstats
    # AND the dup filter.  Unpersisted, the consumers re-ran the whole
    # Python stage per reference — 7 expansions of the video pipeline per
    # query run (r13 optimization, guide §2.4/§4.5,
    # spikes/scan_multiplicity.py); both relations are band-row sized.
    sigs = (
        multimodal.video_band_signatures(hashed, every_n=2, band_size=2)
        .join(docs, "doc_id")
        .persist()
    )
    buckets = sigs.groupBy("source", "band", "sig").agg(
        F.countDistinct("doc_id").alias("csize")
    ).persist()
    bstats = buckets.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.when(F.col("csize") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_buckets"),
        F.sum(F.col("sig") % 9973).cast("long").alias("sig_checksum"),
    )
    dup_docs = (
        sigs.join(
            buckets.where(F.col("csize") >= 2).select("source", "band", "sig"),
            ["source", "band", "sig"],
        )
        .groupBy("source")
        .agg(F.countDistinct("doc_id").alias("n_dup_docs"))
    )
    return (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .join(bstats, "source")
        .join(dup_docs, "source", "left")
        .select(
            "source",
            "n_docs",
            "n_buckets",
            "n_dup_buckets",
            "sig_checksum",
            F.coalesce("n_dup_docs", F.lit(0)).cast("long").alias("n_dup_docs"),
        )
        .orderBy("source")
    )


@register(
    "mm_probe_dims",
    survey="ext:multimodal-probe",
    oracle="""
WITH f AS (
  SELECT doc_id,
         CASE doc_id % 5
           WHEN 0 THEN 'bmp' WHEN 1 THEN 'png' WHEN 2 THEN 'gif'
           WHEN 3 THEN 'jpeg' ELSE 'tiff'
         END AS format,
         doc_id % 16 + 4 AS w, doc_id % 12 + 4 AS h
  FROM documents
)
SELECT format,
       count(*) AS n_docs,
       round(avg(w), 6) AS avg_width,
       round(avg(h), 6) AS avg_height,
       CAST(min(w) AS BIGINT) AS min_width,
       CAST(max(w) AS BIGINT) AS max_width,
       CAST(sum(w * h) AS BIGINT) AS total_pixels
FROM f GROUP BY format ORDER BY format
""",
)
def mm_probe_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe-first media triage as a registered query: every doc gets a
    REAL encoded payload in one of five formats (BMP/PNG/GIF/JPEG/TIFF,
    chosen by ``doc_id % 5``, dims a pure function of ``doc_id``), and
    :func:`functions.multimodal.probe_images` reads ONLY the headers —
    no pixel decode — to recover format and dimensions; the oracle
    recomputes both arithmetically.  A probe that misparses any
    header's magic, byte order, or dimension fields shifts the per-
    format rollup and fails the hash.  This is the first pass a 100 TB
    image corpus runs: dimension/format filtering at header-read cost
    (~760× cheaper than decoding, bench_media_r09.json), decode only
    survivors."""
    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches):
        from entropy_balance_weighting_spark.functions import (
            gif_codec,
            jpeg_codec,
            tiff_codec,
        )

        palette = np.stack([np.arange(4)] * 3, axis=1).astype(np.uint8) * 80
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                h, w = d % 12 + 4, d % 16 + 4
                px = np.zeros((h, w), dtype=np.uint8)
                kind = d % 5
                if kind == 0:
                    payloads.append(multimodal.encode_bmp(px))
                elif kind == 1:
                    payloads.append(multimodal.encode_png(px))
                elif kind == 2:
                    payloads.append(gif_codec.encode_gif(px, palette))
                elif kind == 3:
                    payloads.append(jpeg_codec.encode_jpeg(px))
                else:
                    payloads.append(tiff_codec.encode_tiff(px))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    payloads = docs.mapInPandas(gen, "doc_id long, payload binary")
    probed = multimodal.probe_images(payloads)  # REAL header probe
    return (
        probed.groupBy("format")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("width"), 6).alias("avg_width"),
            F.round(F.avg("height"), 6).alias("avg_height"),
            F.min("width").cast("long").alias("min_width"),
            F.max("width").cast("long").alias("max_width"),
            F.sum(
                (F.col("width") * F.col("height")).cast("long")
            ).alias("total_pixels"),
        )
        .orderBy("format")
    )


@register(
    "mm_pdf_text",
    survey="ext:multimodal-pdf",
    oracle="""
SELECT source,
       count(*) AS n_docs,
       CAST(2 * count(*) AS BIGINT) AS n_pages,
       CAST(2 * count(*) AS BIGINT) AS n_streams,
       CAST(sum(length('Doc ' || CAST(doc_id AS VARCHAR)) +
                length(substr(text, 1, 40))) AS BIGINT) AS text_chars,
       CAST(sum(length('Doc ' || CAST(doc_id AS VARCHAR))) AS BIGINT)
           AS title_chars,
       CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_cid,
       CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_cid_decoded
FROM documents GROUP BY source ORDER BY source
""",
)
def mm_pdf_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PDF build + text-extraction round trip (pure stdlib, no PDF
    library): every third document (doc_id % 3 == 0) becomes a
    two-page Type0/CID PDF — Identity-H 2-byte hex show strings plus an
    embedded FlateDecode ``/ToUnicode`` CMap
    (:func:`functions.pdf_codec.build_pdf_cid`) — and the rest simple
    Type1 PDFs (:func:`build_pdf`); the REAL extractor recovers page
    count, per-stream text (CID text THROUGH the CMap — the r11
    verdict's CID task), and the Info title.  Every SIXTH document
    (doc_id % 6 == 0) builds with ``per_page_fonts=True``: each page
    carries its OWN Type0 font + CMap under the SAME ``/F1`` resource
    name with page-local CID assignment — the cross-page
    name-collision shape r13's per-page routing closed (a
    document-wide merged font map garbles one of the two pages and
    shifts ``text_chars``).  ``text_chars`` uses one arithmetic for
    all variants, so a CID decode that garbles or drops a single
    character fails the hash; ``n_cid``/``n_cid_decoded`` pin that
    every CID doc both flags AND decodes.  100 TB shape: one Arrow
    ``mapInPandas`` map stage, no shuffle before the tiny aggregate."""
    from entropy_balance_weighting_spark.functions import pdf_codec as pdf

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )

    def gen(batches):
        for p in batches:
            payloads = []
            for i, t in zip(p["doc_id"], p["text"]):
                pages = [[f"Doc {int(i)}"], [str(t)[:40]]]
                if int(i) % 3 == 0:
                    payloads.append(
                        pdf.build_pdf_cid(
                            pages,
                            title=f"Doc {int(i)}",
                            per_page_fonts=(int(i) % 6 == 0),
                        )
                    )
                else:
                    payloads.append(
                        pdf.build_pdf(pages, title=f"Doc {int(i)}")
                    )
            out = pdf.extract_pdf_text_batch(payloads)
            out.insert(0, "source", p["source"].to_numpy())
            yield out[
                ["source", "n_pages", "n_streams", "n_chars", "title",
                 "has_cid_font", "cid_decoded"]
            ]

    ex = docs.mapInPandas(
        gen,
        "source string, n_pages int, n_streams int, n_chars long, "
        "title string, has_cid_font boolean, cid_decoded boolean",
    )
    return (
        ex.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_pages").cast("long").alias("n_pages"),
            F.sum("n_streams").cast("long").alias("n_streams"),
            F.sum("n_chars").cast("long").alias("text_chars"),
            F.sum(F.length("title")).cast("long").alias("title_chars"),
            F.sum(F.when(F.col("has_cid_font"), 1).otherwise(0))
            .cast("long")
            .alias("n_cid"),
            F.sum(F.when(F.col("cid_decoded"), 1).otherwise(0))
            .cast("long")
            .alias("n_cid_decoded"),
        )
        .orderBy("source")
    )


@register(
    "mm_probe_video",
    survey="ext:multimodal-video-probe",
    oracle="""
WITH f AS (
  SELECT doc_id,
         CASE doc_id % 4 WHEN 2 THEN 'hevc' WHEN 3 THEN 'av1'
              ELSE 'h264' END AS codec,
         CASE doc_id % 4 WHEN 0 THEN 'h264' WHEN 1 THEN 'avcc'
              WHEN 2 THEN 'hvcc' ELSE 'av1c' END AS kind,
         CASE doc_id % 4 WHEN 2 THEN 'Main' WHEN 3 THEN 'Main'
              ELSE 'Baseline' END AS profile,
         CASE doc_id % 4 WHEN 2 THEN '4.1' WHEN 3 THEN '4.0'
              ELSE '4' END AS level,
         64 + (doc_id % 50) * 2 AS w,
         48 + (doc_id % 30) * 2 AS h
  FROM documents
)
SELECT codec, kind, profile, level,
       count(*) AS n_docs,
       CAST(sum(w) AS BIGINT) AS total_width,
       CAST(sum(h) AS BIGINT) AS total_height,
       CAST(min(w) AS BIGINT) AS min_width,
       CAST(max(w) AS BIGINT) AS max_width,
       CAST(0 AS BIGINT) AS n_errors
FROM f GROUP BY codec, kind, profile, level ORDER BY codec, kind
""",
)
def mm_probe_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video stream-parameter triage as a registered query — the third
    leg of probe-first curation after image headers (mm_probe_dims)
    and audio containers: every doc gets a REAL codec-parameter
    payload in one of four carrier forms (Annex-B H.264 / avcC / hvcC
    / av1C by ``doc_id % 4``, dims a pure even function of doc_id so
    the H.264 4:2:0 crop arithmetic is exercised), and
    :func:`multimodal.probe_video_streams` bit-parses profile, level,
    and dimensions WITHOUT frame decode.  The oracle recomputes every
    field arithmetically from the id — a bit-reader slip in any of the
    three SPS/OBU parsers shifts a per-codec rollup and fails the
    hash.  100 TB shape: generate + probe are one fused mapInPandas
    map stage; the only shuffle is the final rollup."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches):
        from entropy_balance_weighting_spark.functions import (
            container_meta as cm,
        )

        for p in batches:
            if not len(p):
                continue
            kinds, payloads = [], []
            for did in p["doc_id"]:
                d = int(did)
                w, h = 64 + (d % 50) * 2, 48 + (d % 30) * 2
                sel = d % 4
                if sel == 0:
                    sps = cm.build_h264_sps(width=w, height=h)
                    kinds.append("h264")
                    payloads.append(
                        cm.build_annexb([sps, b"\x68\xce\x38\x80",
                                         b"\x65\x88\x84\x00"])
                    )
                elif sel == 1:
                    kinds.append("avcc")
                    payloads.append(
                        cm.build_avcc(cm.build_h264_sps(width=w, height=h))
                    )
                elif sel == 2:
                    kinds.append("hvcc")
                    payloads.append(
                        cm.build_hvcc(cm.build_h265_sps(width=w, height=h))
                    )
                else:
                    kinds.append("av1c")
                    payloads.append(
                        cm.build_av1c(
                            cm.build_av1_sequence_header(width=w, height=h)
                        )
                    )
            yield pd.DataFrame(
                {
                    "doc_id": p["doc_id"].astype("int64"),
                    "kind": kinds,
                    "payload": payloads,
                }
            )

    streams = docs.mapInPandas(gen, "doc_id long, kind string, payload binary")
    probed = multimodal.probe_video_streams(streams)  # REAL bit parse
    return (
        probed.groupBy("codec", "kind", "profile", "level")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("width").cast("long").alias("total_width"),
            F.sum("height").cast("long").alias("total_height"),
            F.min("width").cast("long").alias("min_width"),
            F.max("width").cast("long").alias("max_width"),
            F.sum(
                F.when(F.col("error").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("n_errors"),
        )
        .orderBy("codec", "kind")
    )
