"""Deterministic sampling operators for training-data pipelines.

``df.sample()`` is non-reproducible across runs/partitionings (seeded
per-partition RNG — repartition the input and membership changes), which
is unacceptable for a 100 TB corpus where the sampled subset must be
re-derivable months later.  These operators instead hash a stable row key
(the engine-portable md5-prefix hash, :func:`functions.text.portable_hash32`)
into [0, 1) and keep rows below the target rate:

- membership depends ONLY on (key, salt) — stable under repartitioning,
  re-runs, engine version, and even engine (the DuckDB oracles replicate
  it bit-for-bit);
- the filter is a pure map-side projection — zero shuffle, fully
  pushdown-friendly; at 100 TB the sample never materializes the
  population;
- disjoint salts give independent samples (train/val/test splits from
  one pass).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, functions as F

from entropy_balance_weighting_spark.functions.text import portable_hash32

# hash bucket count: rates are expressed as integer per-10^6 thresholds so
# the oracle comparison is integer-exact (no float-boundary drift)
_BUCKETS = 1_000_000


def sample_bucket(key: Column | str, salt: str = "") -> Column:
    """Deterministic bucket in [0, 1e6) from a stable row key: the
    md5-prefix hash of ``salt || key`` — identical in Spark and DuckDB."""
    s = F.concat(F.lit(salt), F.col(key).cast("string") if isinstance(key, str) else key.cast("string"))
    return portable_hash32(s) % _BUCKETS


def deterministic_sample(
    df: DataFrame, key: str, rate: float, *, salt: str = ""
) -> DataFrame:
    """Keep each row iff ``hash(salt||key) mod 1e6 < rate·1e6`` — a
    reproducible Bernoulli(rate) sample, shuffle-free."""
    thr = int(round(rate * _BUCKETS))
    return df.filter(sample_bucket(key, salt) < F.lit(thr))


def stratified_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    rates: Mapping[str, float],
    *,
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (the reproducible counterpart of
    ``df.sampleBy``): each stratum gets its own keep-rate.  The rate lookup
    is a literal CASE chain when ``rates`` is small (pure codegen, no join);
    a corpus-scale rate table would broadcast-join instead — same plan
    shape either way, still zero shuffle on the fact side."""
    thr: Column = F.lit(int(round(default_rate * _BUCKETS)))
    for value, rate in sorted(rates.items()):
        thr = (
            F.when(F.col(strata_col) == value, F.lit(int(round(rate * _BUCKETS))))
            .otherwise(thr)
        )
    return df.filter(sample_bucket(key, salt) < thr)
