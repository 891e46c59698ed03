"""Structured Streaming layer: incremental entropy-balance reweighting
over micro-batches (SURVEY §7.5 — extension surface; the reference is
strictly batch, §2.12)."""

from entropy_balance_weighting_spark.streaming.asof import (
    streaming_asof_join,
)
from entropy_balance_weighting_spark.streaming.dedup import (
    streaming_exact_dedup,
)
from entropy_balance_weighting_spark.streaming.incremental import (
    IncrementalReweighter,
)
from entropy_balance_weighting_spark.streaming.stateful import (
    running_key_stats,
    streaming_cdc_compact,
    streaming_heavy_hitter_candidates,
)

__all__ = [
    "IncrementalReweighter",
    "running_key_stats",
    "streaming_cdc_compact",
    "streaming_heavy_hitter_candidates",
    "streaming_asof_join",
    "streaming_exact_dedup",
]
