"""Streaming exact deduplication — the ingest-time hygiene stage of a
training-data pipeline rendered Spark-native: ``withWatermark`` +
``dropDuplicatesWithinWatermark`` keeps per-key state only for the
watermark horizon, so the dedup state is BOUNDED no matter how long the
stream runs (a plain ``dropDuplicates`` on a stream retains state
forever — the classic unbounded-state foot-gun).

Scale shape: the engine hashes the dedup keys into the streaming state
store (RocksDB-backed on a real cluster); per micro-batch work is one
shuffle on the key columns.  Exactly the semantics of the batch
``exact_dup_stats`` normalization, applied continuously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream_df: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Drop rows whose NORMALIZED text (lower/trim — the
    ``exact_dup_stats`` convention) was already seen within the watermark
    horizon.  Returns the deduplicated stream with the normalization
    column removed.

    ``extra_keys`` widens the identity (e.g. per-source dedup).  The
    watermark bounds both late-data admission and dedup-state retention:
    a duplicate arriving later than ``watermark_delay`` after its
    original may be re-admitted — that is the documented, bounded-state
    trade every streaming dedup makes.
    """
    if not stream_df.isStreaming:
        raise ValueError(
            "streaming_exact_dedup expects a streaming DataFrame; for "
            "batch dedup use functions.dedup.exact_dup_stats"
        )
    keys = ["__norm", *(extra_keys or [])]
    out = (
        stream_df.withColumn("__norm", F.lower(F.trim(F.col(text_col))))
        .withWatermark(ts_col, watermark_delay)
        .dropDuplicatesWithinWatermark(keys)
    )
    return out.drop("__norm")
