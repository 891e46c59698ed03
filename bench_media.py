"""Single-core media-codec throughput bench.

Measures encode/decode wall time per format on realistic payload shapes
(64x64 RGB images, 1 s of 16 kHz mono audio, 8-frame 64x64 video) and
prints ONE JSON line {format: {encode_mb_s, decode_mb_s, decode_items_s,
payload_bytes}}.  Single-core on purpose: the Spark layer runs these
inside Arrow-batched ``mapInPandas`` stages, so cluster throughput is
(per-core rate) x (cores) with no shuffle — the per-core number IS the
scale story.  Production swaps in libjpeg/Pillow/ffmpeg behind the same
signatures; these numbers quantify the pure-Python fallback honestly.

Usage: python bench_media.py [--items N]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from entropy_balance_weighting_spark.functions import multimodal as mm
from entropy_balance_weighting_spark.functions.avi_codec import (
    decode_avi_frames,
    encode_avi,
)
from entropy_balance_weighting_spark.functions.flac_codec import (
    decode_flac,
    encode_flac,
)
from entropy_balance_weighting_spark.functions.gif_codec import (
    decode_gif,
    encode_gif,
)
from entropy_balance_weighting_spark.functions.jpeg_codec import (
    decode_jpeg,
    encode_jpeg,
)
from entropy_balance_weighting_spark.functions.tiff_codec import (
    decode_tiff,
    encode_tiff,
)


def _rate(nbytes: int, secs: float) -> float:
    return round(nbytes / max(secs, 1e-9) / 1e6, 3)


def bench(items: int) -> dict:
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    # smooth-ish image: realistic for photographic content, compresses
    g = np.clip(
        60 + 2 * np.arange(64)[:, None] + np.arange(64)[None, :], 0, 255
    ).astype(np.uint8)
    smooth = np.stack([g, g, g], axis=-1)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    gif_idx = rng.integers(0, 256, (64, 64))
    audio = (
        3000 * np.sin(np.arange(16_000) / 30)
        + 500 * np.sin(np.arange(16_000) / 7)
    ).astype(np.int16)
    frames = rng.integers(0, 256, (8, 64, 64, 3), dtype=np.uint8)

    cases = {
        "bmp": (lambda: mm.encode_bmp(img), mm.decode_bmp),
        "png": (lambda: mm.encode_png(smooth), mm.decode_png),
        "gif": (lambda: encode_gif(gif_idx, pal), decode_gif),
        "jpeg_baseline": (lambda: encode_jpeg(smooth, 90, "4:2:0"), decode_jpeg),
        "jpeg_progressive": (
            lambda: encode_jpeg(smooth, 90, "4:2:0", progressive=True),
            decode_jpeg,
        ),
        "tiff_lzw": (
            lambda: encode_tiff(smooth, compression="lzw"),
            decode_tiff,
        ),
        "wav_pcm16": (lambda: mm.encode_wav(audio, 16_000), mm.decode_wav),
        "wav_ulaw": (
            lambda: mm.encode_wav(audio, 16_000, fmt="ulaw"),
            mm.decode_wav,
        ),
        "flac": (
            lambda: encode_flac(audio, 16_000, block_size=4096),
            decode_flac,
        ),
        "avi": (lambda: encode_avi(frames), decode_avi_frames),
    }
    out = {}
    for name, (enc, dec) in cases.items():
        payload = enc()  # warm
        t0 = time.perf_counter()
        for _ in range(items):
            payload = enc()
        t_enc = time.perf_counter() - t0
        dec(payload)  # warm
        t0 = time.perf_counter()
        for _ in range(items):
            dec(payload)
        t_dec = time.perf_counter() - t0
        raw = {
            "bmp": img.nbytes, "png": smooth.nbytes, "gif": gif_idx.size * 3,
            "jpeg_baseline": smooth.nbytes, "jpeg_progressive": smooth.nbytes,
            "tiff_lzw": smooth.nbytes, "wav_pcm16": audio.nbytes,
            "wav_ulaw": audio.nbytes, "flac": audio.nbytes,
            "avi": frames.nbytes,
        }[name]
        out[name] = {
            "payload_bytes": len(payload),
            "encode_items_s": round(items / t_enc, 2),
            "decode_items_s": round(items / t_dec, 2),
            "encode_raw_mb_s": _rate(raw * items, t_enc),
            "decode_raw_mb_s": _rate(raw * items, t_dec),
        }

    # probe-vs-decode: the 100 TB triage ratio — a dimension filter that
    # reads headers (probe_image) vs one that decodes pixels, measured on
    # the same payloads.  This quantifies why the curation example probes
    # FIRST and decodes survivors only.
    probe_payloads = [
        mm.encode_bmp(img),
        mm.encode_png(smooth),
        encode_jpeg(smooth, 90, "4:2:0"),
        encode_gif(gif_idx, pal),
        encode_tiff(smooth, compression="lzw"),
    ]
    reps = max(items * 20, 100)  # probes are fast; widen for timer floor
    t0 = time.perf_counter()
    for _ in range(reps):
        for p in probe_payloads:
            mm.probe_image(p)
    t_probe = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(items):
        for p in probe_payloads:
            mm.decode_image(p)
    t_decode = time.perf_counter() - t0
    probes_s = reps * len(probe_payloads) / t_probe
    decodes_s = items * len(probe_payloads) / t_decode
    out["probe_vs_decode"] = {
        "probe_items_s": round(probes_s, 1),
        "decode_items_s": round(decodes_s, 1),
        "speedup": round(probes_s / decodes_s, 1),
    }
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=20)
    args = ap.parse_args()
    res = bench(args.items)
    print(json.dumps({"metric": "media_codec_throughput", "items": args.items,
                      "formats": res}))
