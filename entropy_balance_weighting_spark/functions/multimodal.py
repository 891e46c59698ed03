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
