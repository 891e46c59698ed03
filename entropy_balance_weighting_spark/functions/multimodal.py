"""Multimodal column plumbing: treat image/audio/video payloads as opaque
``binary`` columns with typed metadata, and run decode / feature-extract /
resize / frame-sample as Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing here is REAL and tested — schema contracts, batch
shapes, partition behavior, UDF signatures.  The actual media decoders are
STUBBED (this container has no image/audio libraries):
:func:`decode_image_batch` raises ``NotImplementedError`` unless handed the
deterministic fake decoder, which derives a fixed-shape "feature" vector
from the payload bytes so the full pipeline is exercised end-to-end with
exact expected values.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Output contract of the feature-extraction stage
FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, feature array<double>"
)
FEATURE_DIM = 4


def decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """Decode a batch of image payloads → (width, height, pixels).

    STUB: real decoding needs an image library not present in this
    environment.  The plumbing that calls it is real; swap this function
    for a Pillow/torchvision implementation in production.
    """
    raise NotImplementedError(
        "image decoding requires an image library; use fake_decode for tests"
    )


def fake_decode(payloads: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in decoder: 'dimensions' and a FEATURE_DIM-long
    'feature' derived purely from payload bytes — exact, reproducible, and
    shaped like a real decoder's output."""
    n_bytes = payloads.map(len).astype("int32")
    width = (n_bytes % 64 + 1).astype("int32")
    height = (n_bytes % 48 + 1).astype("int32")
    feats = [
        np.array(
            [
                float(len(b)),
                float(b[0]) if len(b) else 0.0,
                float(b[-1]) if len(b) else 0.0,
                float(sum(b[:16]) % 256),
            ]
        )
        for b in payloads
    ]
    return pd.DataFrame(
        {"n_bytes": n_bytes, "width": width, "height": height, "feature": feats}
    )


def extract_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: Callable[[pd.Series], pd.DataFrame] = decode_image_batch,
) -> DataFrame:
    """Arrow-batched feature extraction over an opaque binary column.

    One ``mapInPandas`` pass; batches arrive Arrow-sized (no per-row
    Python dispatch), partitioning is preserved (no shuffle), and the
    output schema is the fixed FEATURE_SCHEMA contract.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            dec = decoder(pdf[payload_col])
            out = pd.DataFrame({"doc_id": pdf[id_col].astype("int64")})
            for c in ("n_bytes", "width", "height", "feature"):
                out[c] = dec[c].values
            yield out

    return df.select(id_col, payload_col).mapInPandas(fn, FEATURE_SCHEMA)


def text_as_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata adapter: UTF-8 encode the text column into a binary
    ``payload`` column, giving the multimodal path a real opaque-bytes
    input at every scale factor."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


# -- resize ----------------------------------------------------------------

RESIZED_SCHEMA = "doc_id long, width int, height int, payload binary"


def resize_image_batch(
    payloads: pd.Series, width: int, height: int
) -> pd.Series:
    """Resize a batch of image payloads to (width, height).

    STUB: real resizing needs an image library not present in this
    environment; swap for a Pillow/torchvision implementation in
    production.  The plumbing that calls it is real.
    """
    raise NotImplementedError(
        "image resizing requires an image library; use fake_resize for tests"
    )


def fake_resize(payloads: pd.Series, width: int, height: int) -> pd.Series:
    """Deterministic stand-in resizer: cycles the payload bytes to exactly
    ``width·height`` bytes (a 1-byte-per-pixel 'image') — exact,
    reproducible, and shaped like a real resizer's output."""
    target = width * height
    out = []
    for b in payloads:
        if not len(b):
            out.append(bytes(target))
        else:
            reps = -(-target // len(b))
            out.append((bytes(b) * reps)[:target])
    return pd.Series(out)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    resizer: Callable[[pd.Series, int, int], pd.Series] = resize_image_batch,
) -> DataFrame:
    """Arrow-batched resize stage: one ``mapInPandas`` pass, partitioning
    preserved, fixed RESIZED_SCHEMA output contract (every output payload
    is exactly ``width·height`` bytes)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": np.full(len(pdf), width, dtype="int32"),
                    "height": np.full(len(pdf), height, dtype="int32"),
                    "payload": resizer(pdf[payload_col], width, height).values,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(fn, RESIZED_SCHEMA)


# -- frame sampling --------------------------------------------------------

FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary"


def decode_video_frames(payload: bytes, frame_bytes: int) -> list[bytes]:
    """Split a video payload into frames.

    STUB for a real container/codec demuxer (no video libraries in this
    environment).  The deterministic fallback used by
    :func:`sample_frames` treats the payload as fixed-size byte frames —
    the Spark-side plumbing (fan-out row cardinality, batch shapes,
    schema) is identical either way.
    """
    raise NotImplementedError(
        "video decoding requires a codec library; use fixed-size byte "
        "frames (the sample_frames default) for tests"
    )


def sample_frames(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_bytes: int = 64,
    every_n: int = 3,
) -> DataFrame:
    """Frame sampling over opaque 'video' payloads: emit every
    ``every_n``-th fixed-size frame as its own row — the fan-out-shaped
    ``mapInPandas`` stage (output cardinality ≠ input cardinality), the
    pattern a real demuxer-based sampler would use unchanged."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for did, b in zip(pdf[id_col].astype("int64"), pdf[payload_col]):
                b = bytes(b)
                n_frames = -(-len(b) // frame_bytes) if len(b) else 0
                for i in range(0, n_frames, every_n):
                    ids.append(int(did))
                    idxs.append(i)
                    frames.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(fn, FRAME_SCHEMA)
