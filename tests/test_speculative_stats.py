"""Pin the r13 speculative α=1 primal stats fusion (kernels/spark.py).

The step pass fuses the NEXT iteration's stats reductions for the α=1
primal candidate; when the driver indeed commits primal at exactly α=1
(measured: every commit on both unbounded bench problems), ``stats``
returns the stash with zero Spark jobs.  These tests pin the two contract
halves: the fusion must actually fire (hits > 0, fewer jobs), and a fused
solve must be BIT-IDENTICAL to the unfused one — same iteration history
floats, same multipliers, same weights — so iteration-count parity can
never drift.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def problem(spark):
    from entropy_balance_weighting_spark.plans import (
        MomentSpec,
        build_problem_tables,
    )
    from entropy_balance_weighting_spark.plans.moment_spec import (
        targets_from_problem,
    )
    from entropy_balance_weighting_spark.session import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    spec = MomentSpec(
        weight_col="l_quantity",
        numeric=("l_discount", "l_tax"),
        onehot=("l_returnflag",),
    )
    pt = build_problem_tables(li, spec)
    return pt, targets_from_problem(pt, perturb=0.02)


def _solve(spark, problem, flag: str):
    import entropy_balance_weighting_spark.kernels.spark as ks
    from entropy_balance_weighting_spark import entropy_balance

    pt, targets = problem
    spark.conf.set("spark.ebw.speculativeStats", flag)
    kernels = []
    orig_init = ks.SparkKernel.__init__

    def init(self, *a, **kw):
        orig_init(self, *a, **kw)
        kernels.append(self)

    ks.SparkKernel.__init__ = init
    try:
        res = entropy_balance(
            mean_population_moments=targets,
            x_sample=pt,
            options={"force_distributed": True},
        )
    finally:
        ks.SparkKernel.__init__ = orig_init
        spark.conf.set("spark.ebw.speculativeStats", "true")
    hits = sum(k.spec_hits for k in kernels)
    return res, hits


def test_speculative_fusion_fires_and_is_bit_identical(spark, problem):
    res_off, hits_off = _solve(spark, problem, "false")
    res_on, hits_on = _solve(spark, problem, "true")

    assert hits_off == 0
    # every analytic primal α=1 commit except the materialized ones must
    # convert its follow-up stats job into a stash hit
    assert hits_on > 0

    assert res_on.converged and res_off.converged
    assert res_on.n_iterations == res_off.n_iterations
    # bit-exact parity: the speculative pass mirrors _stats_pass expression
    # by expression, so every logged float must be IDENTICAL, not close
    h_on = res_on.diagnostics["history"]
    h_off = res_off.diagnostics["history"]
    assert h_on == h_off
    assert np.array_equal(
        res_on.equality_multipliers_estimate,
        res_off.equality_multipliers_estimate,
    )
    assert np.array_equal(
        res_on.constraint_violations, res_off.constraint_violations
    )
    w_on = res_on.new_weights.orderBy("row_id").collect()
    w_off = res_off.new_weights.orderBy("row_id").collect()
    assert w_on == w_off


def test_max_prog_is_value_neutral(spark, problem):
    """_MAX_PROG only decides replay-vs-materialize; the materialized
    wstar stores exactly what the replay computes, so results must be
    IDENTICAL at any cap.  Pins the r13 4→8 raise as value-neutral."""
    import entropy_balance_weighting_spark.kernels.spark as ks
    from entropy_balance_weighting_spark import entropy_balance

    pt, targets = problem
    out = []
    orig = ks.SparkKernel._MAX_PROG
    try:
        for mp in (2, 8):
            ks.SparkKernel._MAX_PROG = mp
            res = entropy_balance(
                mean_population_moments=targets,
                x_sample=pt,
                options={"force_distributed": True},
            )
            out.append(
                (
                    res.n_iterations,
                    res.diagnostics["history"],
                    res.equality_multipliers_estimate.tolist(),
                    res.new_weights.orderBy("row_id").collect(),
                )
            )
    finally:
        ks.SparkKernel._MAX_PROG = orig
    assert out[0] == out[1]


def test_speculation_disabled_after_two_misses(spark):
    """The miss counter must disable speculation permanently for the solve
    — bounded waste on problems where the fraction-to-boundary binds."""
    from entropy_balance_weighting_spark.kernels.spark import SparkKernel

    kern = SparkKernel.__new__(SparkKernel)
    kern._spec = None
    kern._spec_misses = 2
    kern._spec_conf = True
    assert not (kern._spec_conf and kern._spec_misses < 2)


def test_rollback_clears_speculative_stash(spark, problem):
    """A rolled-back commit invalidates the stash: stats() after rollback
    must never serve reductions of the undone state."""
    import entropy_balance_weighting_spark.kernels.spark as ks

    pt, _ = problem
    kern = ks.SparkKernel.from_problem(
        pt.x_long,
        pt.w0,
        pt.k,
        prepacked=pt.packed_arrays,
        known_sums=(pt.sum_w0, pt.n),
    )
    lam = np.zeros(kern.k)
    st0 = kern.stats(lam)
    assert st0 is not None
    dlam = np.full(kern.k, 1e-6)
    kern.step_stats(lam, dlam)
    assert kern._spec is not None and not kern._spec["committed"]
    kern.commit("primal", lam, dlam, 1.0)
    assert kern._spec is not None and kern._spec["committed"]
    kern.rollback()
    assert kern._spec is None
    kern.cleanup()
