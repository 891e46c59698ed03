"""Same-session A/B: lagged-Jacobian gram reuse at grouped huge-K.

Builds ONE synthetic grouped problem (same construction as
bench_scale._bench_grouped: N rows, SPARK_GRAFT_SCALE_GROUPS groups × 2
numeric moments → K = 2·groups block-diagonal) and solves it with
gram_reuse OFF then ON, twice each, in one Spark session — the
within-session A/B discipline PLANS §16 prescribes for physical-plan
forks.  Reports wall, iterations, per-iteration wall, fresh/frozen scan
split, and the final max |violation| for each run.

Run:
  SPARK_GRAFT_SCALE_N=20000000 SPARK_GRAFT_SCALE_GROUPS=50000 \
      python spikes/gram_reuse_ab.py

``SPARK_GRAFT_SCALE_FEATS`` (default 2) sets the number of numeric
moments per group, so K = FEATS·groups and the per-group block width
k_b = FEATS — the r12 flip-point question (PLANS §18: accumulate cost
scales with Σk_b², the frozen-scan saving should WIN at k_b ≳ 8) is one
run with FEATS=8.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", 20_000_000))
    n_groups = int(os.environ.get("SPARK_GRAFT_SCALE_GROUPS", 50_000))
    n_feats = int(os.environ.get("SPARK_GRAFT_SCALE_FEATS", 2))
    repeats = int(os.environ.get("SPARK_GRAFT_AB_REPEATS", 2))

    from pyspark.sql import functions as F

    from entropy_balance_weighting_spark.plans.moment_spec import (
        MomentSpec,
        build_problem_tables,
        targets_from_problem,
    )
    from entropy_balance_weighting_spark.session import get_spark
    from entropy_balance_weighting_spark.solvers.api import entropy_balance

    spark = get_spark(app_name="gram_reuse_ab")
    cpus = spark.sparkContext.defaultParallelism
    n_parts = max(cpus, n // 250_000)
    feat_cols = [
        (F.pmod(F.hash("id", F.lit(i + 1)), F.lit(1000)) / 1000.0).alias(
            f"f{i + 1}"
        )
        for i in range(n_feats)
    ]
    df = spark.range(0, n, 1, n_parts).select(
        (0.5 + F.pmod(F.hash("id"), F.lit(1000)) / 1000.0).alias("w"),
        *feat_cols,
        F.pmod(F.col("id"), F.lit(n_groups)).alias("g"),
    )
    spec = MomentSpec(
        weight_col="w",
        numeric=tuple(f"f{i + 1}" for i in range(n_feats)),
        group=("g",),
    )
    pt = build_problem_tables(df, spec)
    targets = targets_from_problem(pt, perturb=0.01)

    def solve(extra: dict) -> dict:
        t0 = time.perf_counter()
        res = entropy_balance(
            mean_population_moments=targets,
            x_sample=pt,
            options={
                "force_distributed": True,
                "bounds": (0.2, 5.0),
                **extra,
            },
        )
        if res.converged:
            res.new_weights.count()
        wall = time.perf_counter() - t0
        if not res.converged:
            raise RuntimeError(f"{extra} did not converge")
        hist = res.diagnostics["history"]
        return {
            "wall": round(wall, 2),
            "iters": res.n_iterations,
            "per_iter": round(wall / max(res.n_iterations, 1), 2),
            "fresh_scans": sum(1 for h in hist if h["gram_fresh"]),
            "frozen_scans": sum(1 for h in hist if not h["gram_fresh"]),
            "max_viol": float(np.abs(res.constraint_violations).max()),
            "viols": [
                f"{h['violation']:.2e}"
                + ("" if h["gram_fresh"] else "*")
                for h in hist
            ],
        }

    configs = json.loads(
        os.environ.get(
            "SPARK_GRAFT_AB_CONFIGS",
            '[{"gram_reuse": false}, {"gram_reuse": true}]',
        )
    )
    out = {
        "metric": "gram_reuse_ab",
        "n": n,
        "k": int(pt.k),
        "groups": n_groups,
        "k_b": n_feats,
        "partitions": n_parts,
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "runs": [],
    }
    # warm once (codegen, caches) outside the measured region
    solve({"gram_reuse": False})
    for rep in range(repeats):
        for extra in configs:
            r = solve(extra)
            r["config"] = extra
            r["rep"] = rep
            out["runs"].append(r)
            print(json.dumps(r), file=sys.stderr, flush=True)
    out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
