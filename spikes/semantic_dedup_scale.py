"""Spike: SemDeDup at corpus scale with the REAL k-means path.

Question: the registered query uses 8 fixed seed cells on 500 vectors;
at N vectors the paper's design wants C ≈ sqrt(N) k-means cells so the
within-cell pair join stays Σ|cell|² ≈ N^1.5 / C ≈ N.  Fit the IVF
quantizer (sample + driver Lloyd), hand its centers to
semantic_dedup_assignments, and measure the end-to-end wall + removal
counts on a corpus with planted near-parallel duplicates.

Run:  SPARK_GRAFT_SCALE_N=200000 python spikes/semantic_dedup_scale.py
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from entropy_balance_weighting_spark.functions.similarity import (
    adaptive_n_cells,
    fit_ivf_quantizer,
    semantic_dedup_assignments,
)
from entropy_balance_weighting_spark.session import get_spark

N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "200000"))
DIM = 64

spark = get_spark(master="local[32]", shuffle_partitions=64)

# synthetic embeddings, all JVM-side: 64-dim pseudo-gaussian-ish values
# from hashed ids; ids with id % 7 == 0 REUSE the base id's vector with a
# tiny deterministic perturbation -> planted near-parallel duplicates.
base_id = F.when(F.col("id") % 7 == 0, (F.col("id") / 7).cast("long")).otherwise(
    F.col("id")
)
vec = F.transform(
    F.sequence(F.lit(0), F.lit(DIM - 1)),
    lambda d: (
        F.pmod(F.xxhash64(base_id * 100 + d), F.lit(2001)) - F.lit(1000.0)
    )
    / F.lit(1000.0)
    + F.when(F.col("id") % 7 == 0, d.cast("double") * 1e-4).otherwise(F.lit(0.0)),
)
emb = spark.range(N).select(
    F.col("id").alias("vec_id"), vec.alias("embedding")
).persist()
emb.count()

t0 = time.time()
# C ~ sqrt(N): within-cell pair volume ~ N^2/C ~ N^1.5 — the paper's
# cluster-count regime for dedup (adaptive_n_cells targets IVF top-k
# recall and is far too coarse here).
n_cells = max(adaptive_n_cells(N), int(N**0.5))
# r9: the minibatch fit is the scale path (BLAS seeding + bincount
# Lloyd on the same bounded sample); measure it as the headline and the
# r8 full fit alongside for the removal-count-parity comparison.
centers = fit_ivf_quantizer(emb, n_cells=n_cells, method="minibatch")
t_fit = time.time() - t0

t1 = time.time()
centers_full = fit_ivf_quantizer(emb, n_cells=n_cells, method="full")
t_fit_full = time.time() - t1


def run_dedup(cent):
    t = time.time()
    asg = semantic_dedup_assignments(
        emb, threshold=0.999, centers=cent, method="blas"
    )
    stats = asg.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("removed").alias("n_removed"),
        F.countDistinct("cell_id").alias("n_cells_used"),
    ).collect()[0]
    return stats, time.time() - t


stats, t_dedup = run_dedup(centers)
stats_full, _ = run_dedup(centers_full)

out = {
    "metric": "semantic_dedup_wall",
    "value": round(t_fit + t_dedup, 2),
    "unit": "sec",
    "n_vectors": N,
    "dim": DIM,
    "n_cells": n_cells,
    "n_cells_used": stats["n_cells_used"],
    "quantizer_fit_sec": round(t_fit, 2),
    "quantizer_fit_full_sec": round(t_fit_full, 2),
    "dedup_sec": round(t_dedup, 2),
    "n_removed": int(stats["n_removed"]),
    "n_removed_full_fit": int(stats_full["n_removed"]),
    "planted_dups": N // 7,
    "vectors_per_sec": round(N / (t_fit + t_dedup), 1),
}
print(json.dumps(out))
spark.stop()
