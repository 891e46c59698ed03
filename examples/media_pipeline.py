"""End-to-end multimodal curation example — the media surface chained
the way a production pre-training data run would chain it, using ONLY
the engine's pure-numpy/stdlib codecs (no media libraries).

Run:  python examples/media_pipeline.py [sf_dir]

Stages (every one an Arrow-batched ``mapInPandas`` map stage — no
shuffle until the final small aggregations, so cluster throughput is
per-core rate × cores):

1. ingest: synthesize a mixed-format corpus keyed off ``documents`` —
   JPEG (some progressive, some EXIF-tagged with GPS), PNG, GIF, TIFF —
   plus WAV/FLAC audio and AVI clips;
2. image QA: REAL decode of every payload (magic dispatch), dimensions +
   pixel stats via ``extract_features``;
3. privacy scrub: strip EXIF APP1 segments, count GPS-bearing docs
   before/after (after must be zero);
4. near-dup removal: 64-bit dHash over decoded pixels, exact groupBy
   bucketing, keep one doc per bucket;
5. audio QA + near-dup: decode WAV/FLAC, energy-envelope fingerprint,
   bucket, keep one per bucket;
6. video poster frames: demux AVI, sample every 2nd frame as BMP,
   re-decode through the same image pipeline.

Prints per-stage counts; exits nonzero if any invariant breaks.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.functions import multimodal as mm
from entropy_balance_weighting_spark.functions.avi_codec import encode_avi
from entropy_balance_weighting_spark.functions.exif_codec import (
    build_exif,
    extract_exif,
    insert_app1,
    strip_exif,
)
from entropy_balance_weighting_spark.functions.flac_codec import encode_flac
from entropy_balance_weighting_spark.functions.gif_codec import encode_gif
from entropy_balance_weighting_spark.functions.jpeg_codec import encode_jpeg
from entropy_balance_weighting_spark.functions.tiff_codec import encode_tiff
from entropy_balance_weighting_spark.session import get_spark, load_table


def main(sf_dir: str) -> int:
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    n_docs = docs.count()

    # -- 1. ingest: mixed-format corpus -----------------------------------
    def gen_images(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                # near-dup groups of 3 via shared base pattern
                base = d - d % 3
                h, w = base % 10 + 12, base % 8 + 12
                r = np.arange(h)[:, None, None]
                c = np.arange(w)[None, :, None]
                ch = np.arange(3)[None, None, :]
                px = ((base * 13 + r * 7 + c * 5 + ch * 11) % 251 + d % 3).astype(
                    np.uint8
                )
                kind = d % 4
                if kind == 0:
                    p = encode_jpeg(px, 90, progressive=d % 8 == 0)
                    if d % 6 == 0:  # plant EXIF GPS on some docs
                        p = insert_app1(
                            p, build_exif(orientation=1, gps=(37.5, -122.3))
                        )
                elif kind == 1:
                    p = mm.encode_png(px, interlace=d % 8 == 1)
                elif kind == 2:
                    pal, inv = np.unique(
                        px.reshape(-1, 3), axis=0, return_inverse=True
                    )
                    p = encode_gif(inv.reshape(h, w), pal)
                else:
                    p = encode_tiff(px, compression="lzw")
                payloads.append(p)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    images = docs.mapInPandas(gen_images, "doc_id long, payload binary")

    # -- 2. image QA ------------------------------------------------------
    feats = mm.extract_features(images)
    qa = feats.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(F.element_at("feature", 1)), 2).alias("mean_px"),
    ).collect()[0]
    assert qa["n"] == n_docs

    # -- 3. EXIF privacy scrub -------------------------------------------
    def scrub(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            before, after, clean = [], [], []
            for b in pdf["payload"]:
                b = bytes(b)
                meta = extract_exif(b) if b[:2] == b"\xff\xd8" else {}
                before.append(1 if meta.get("has_gps") else 0)
                stripped = strip_exif(b) if b[:2] == b"\xff\xd8" else b
                m2 = (
                    extract_exif(stripped)
                    if stripped[:2] == b"\xff\xd8"
                    else {}
                )
                after.append(1 if m2.get("has_gps") else 0)
                clean.append(stripped)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": clean,
                    "gps_before": pd.Series(before, dtype="int32"),
                    "gps_after": pd.Series(after, dtype="int32"),
                }
            )

    scrubbed = images.mapInPandas(
        scrub, "doc_id long, payload binary, gps_before int, gps_after int"
    )
    g = scrubbed.agg(
        F.sum("gps_before").alias("gps_before"),
        F.sum("gps_after").alias("gps_after"),
    ).collect()[0]
    assert g["gps_after"] == 0, "scrub left GPS metadata behind"

    # -- 4. image near-dup removal via dHash ------------------------------
    hashes = mm.dhash_images(scrubbed.select("doc_id", "payload"))
    kept_images = (
        hashes.groupBy("hash_hi", "hash_lo")
        .agg(F.min("doc_id").alias("doc_id"))
        .count()
    )

    # -- 5. audio QA + near-dup ------------------------------------------
    def gen_audio(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                base = d - d % 3
                n = base % 80 + 60
                s = (
                    (((base * 11 + np.arange(n) * 17) % 1601) - 800)
                    * (d % 3 + 1)
                ).astype(np.int16)
                payloads.append(
                    encode_flac(s, 8000, block_size=64)
                    if d % 2
                    else mm.encode_wav(s, 8000)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    audio = docs.mapInPandas(gen_audio, "doc_id long, payload binary")
    fps = mm.fingerprint_audio(audio)
    kept_audio = fps.groupBy("fingerprint").agg(F.min("doc_id")).count()

    # -- 6. video poster frames ------------------------------------------
    def gen_video(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                nf = d % 5 + 2
                fr = (
                    (d * 7 + np.arange(nf)[:, None, None, None] * 19
                     + np.arange(8)[None, :, None, None] * 3
                     + np.arange(8)[None, None, :, None] * 5
                     + np.arange(3)[None, None, None, :] * 11) % 256
                ).astype(np.uint8)
                payloads.append(encode_avi(fr, fps=12))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    video = docs.limit(200).mapInPandas(gen_video, "doc_id long, payload binary")
    frames = mm.sample_video_frames(video, every_n=2)
    frame_feats = mm.extract_features(frames, payload_col="frame")
    n_frames = frame_feats.count()

    print(
        f"docs={n_docs} image_qa_mean_px={qa['mean_px']} "
        f"gps_before={g['gps_before']} gps_after={g['gps_after']} "
        f"images_kept_after_dhash={kept_images} "
        f"audio_kept_after_fp={kept_audio} video_poster_frames={n_frames}"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
