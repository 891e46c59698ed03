"""Kernel-throughput benchmark at parameterized N — the scale evidence.

``bench.py`` measures sf-scale end-to-end wall time; this script measures
the distributed solver kernel's per-iteration scan throughput on a
synthetic problem whose size is an environment parameter, so the scale
claim behind the design (map-only iterations, K/K²-sized partials, zero
per-iteration shuffle) is reproducible at any N the machine can hold —
not an ad-hoc number in a doc.

The synthetic problem is generated entirely inside Spark (``spark.range``
+ hash-derived columns): no driver-side data, no parquet dependency, so
N is bounded only by executor memory.  Moment 0 is an intercept; the rest
are hash-uniform values in [0, 1).  Targets are the start-point moments
perturbed by 1% — feasible by construction, converges in a few Newton
iterations.

Environment:
- ``SPARK_GRAFT_SCALE_N``  rows (default 2_000_000)
- ``SPARK_GRAFT_SCALE_K``  moments (default 8)
- ``SPARK_GRAFT_CPUS``     local parallelism (session default)

Prints ONE JSON line:
``{"metric": "kernel_scan_throughput", "n": ..., "k": ...,
   "queries": {"pack": s, "stats_pass": s, "step_pass": s,
               "solve": s, "solve_iterations": i}, ...}``
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", 2_000_000))
    k = int(os.environ.get("SPARK_GRAFT_SCALE_K", 8))

    from pyspark.sql import functions as F

    from entropy_balance_weighting_spark.kernels.spark import SparkKernel
    from entropy_balance_weighting_spark.session import get_spark
    from entropy_balance_weighting_spark.solvers.newton import solve_unbounded

    spark = get_spark(app_name="ebw_bench_scale")
    cpus = spark.sparkContext.defaultParallelism
    # ~250k rows per partition: big enough to amortize per-task overhead,
    # small enough that a partition's dense scratch stays cache-friendly
    n_parts = max(cpus, n // 250_000)

    base = spark.range(0, n, 1, n_parts).select(
        F.col("id").alias("row_id"),
        (0.5 + F.pmod(F.hash("id"), F.lit(1000)) / 1000.0).alias("w0"),
        F.array(*[F.lit(j) for j in range(k)]).alias("idx"),
        F.array(
            F.lit(1.0),
            *[
                F.pmod(F.hash("id", F.lit(j)), F.lit(1000)) / 1000.0
                for j in range(1, k)
            ],
        ).alias("val"),
    )

    t0 = time.perf_counter()
    kern = SparkKernel.from_problem(None, None, k, prepacked=base)
    t_pack = time.perf_counter() - t0

    # steady-state per-pass timings (first pass warms codegen + worker pool)
    lam = np.zeros(k)
    kern.stats(lam)
    t_stats = min(_timed(lambda: kern.stats(lam)) for _ in range(3))
    stats0 = kern.stats(lam)
    dlam = np.full(k, 1e-3)
    kern.step_stats(lam, dlam)
    t_step = min(_timed(lambda: kern.step_stats(lam, dlam)) for _ in range(3))

    m = stats0.xt_w * 1.01
    t0 = time.perf_counter()
    res = solve_unbounded(
        kern, m, {"max_steps": 20}, original_weights=kern.new_weights()
    )
    t_solve = time.perf_counter() - t0
    if not res.converged:
        raise RuntimeError("scale solve did not converge — invalid measurement")
    kern.cleanup()

    per_pass = min(t_stats, t_step)
    print(
        json.dumps(
            {
                "metric": "kernel_scan_throughput",
                "value": round(n / per_pass, 1),
                "unit": "rows/sec",
                "n": n,
                "k": k,
                "partitions": n_parts,
                "queries": {
                    "pack": round(t_pack, 4),
                    "stats_pass": round(t_stats, 4),
                    "step_pass": round(t_step, 4),
                    "solve": round(t_solve, 4),
                    "solve_iterations": float(res.n_iterations),
                },
            }
        )
    )
    spark.stop()


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
