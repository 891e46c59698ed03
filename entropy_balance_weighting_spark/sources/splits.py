"""Deterministic train/val/test split sink with a verification manifest.

A training corpus is split ONCE and the split must be re-derivable
forever: membership here is a pure function of ``(salt, key)`` via the
engine-portable hash (:func:`functions.text.portable_hash32`), the same
primitive the deterministic samplers use — disjoint and exhaustive by
construction (adjacent ranges over one hash value), stable under
repartitioning, re-runs, and engines.

The write is ONE pass: the split label is a pure projection, the sink
partitions by it (directory per split), and the returned manifest holds
per-split row counts plus a portable checksum (sum of the key hashes mod
2^31) that any engine — including DuckDB over the written files — can
recompute to audit the split without re-reading the source.
"""

from __future__ import annotations

import json
import os
from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.functions.sampling import _BUCKETS, sample_bucket

_CHECK_MOD = 2**31


def split_column(key: str, rates: Mapping[str, float], *, salt: str = "") -> "F.Column":
    """CASE chain mapping the key's hash bucket into named splits by
    cumulative range.  ``rates`` must sum to 1 (exhaustive); ranges are
    half-open and adjacent, so splits are disjoint by construction."""
    total = sum(rates.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split rates must sum to 1, got {total}")
    b = sample_bucket(key, salt)
    expr = None
    cum = 0
    for name, rate in rates.items():  # caller-chosen order defines ranges
        cum += int(round(rate * _BUCKETS))
        expr = F.when(b < cum, F.lit(name)) if expr is None else expr.when(
            b < cum, F.lit(name)
        )
    # float-rounding slack: the last range absorbs bucket _BUCKETS-1
    last = next(reversed(list(rates)))
    return expr.otherwise(F.lit(last))


def write_splits(
    df: DataFrame,
    path: str,
    key: str,
    rates: Mapping[str, float],
    *,
    salt: str = "",
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` partitioned by deterministic split, plus
    ``_manifest.json`` (counts + portable per-split checksums; the
    underscore prefix keeps it invisible to Spark's file index, like
    ``_SUCCESS``).  Returns
    the manifest.  One scan for the write, one K-sized aggregate for the
    manifest."""
    labeled = df.withColumn("split", split_column(key, rates, salt=salt))
    labeled.repartition("split").write.mode(mode).partitionBy("split").parquet(path)

    stats = (
        labeled.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum(sample_bucket(key, salt)) % _CHECK_MOD).alias("checksum"),
        )
        .collect()
    )
    manifest = {
        "key": key,
        "salt": salt,
        "rates": dict(rates),
        "splits": {
            r["split"]: {"n_rows": r["n_rows"], "checksum": int(r["checksum"])}
            for r in stats
        },
    }
    with open(os.path.join(path, "_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    return manifest
