"""Elastic-mode bounded entropy-balance solver (M4; SURVEY §3.2, ref C4).

Problem (public formulation, ref README.md:92-99): bound-constrained EBW
where the equality constraints are RELAXED with nonnegative elastic slacks
u, v priced at η per unit of L¹ violation:

    min  (1/η)·Σ w0(r log r − r + 1) + 1^T(u+v)
    s.t. A^T r − b + u − v = 0,   A_ineq^T r ≥ bounds,   u, v ≥ 0

so an infeasible problem still "converges", returning the violations as an
infeasibility certificate (ref: README.md:97-99).  A = Diag(w0)X, b = m·Σw0.

Primal-dual interior point with 9 state blocks.  The KKT Newton system —
dimension (n + 5K + up-to-4n) — is condensed analytically to ONE K×K Schur
system (L5, ref: ebw_routines.py:457-506) whose assembly needs exactly
three N-dimensional reductions per iteration (one fused kernel stats pass);
all other step blocks recover in closed form (ref: 507-535).  N-dim state
lives in the kernel; K-dim blocks (λ_eq, u, v, λ_u, λ_v) and scalars
(μ_s, μ_u, μ_v, η) live here.

Per iteration: 1 stats pass (which also materializes the previous lazy
commit AND returns the post-commit slack statistics the barrier rules
need — μ_s-dependent reductions decompose linearly/quadratically in μ_s,
so the driver re-derives them exactly at the updated value) → driver K×K
solve → 1 step pass → driver fraction-to-boundary + K-block steps → lazy
commit (zero jobs).  TWO jobs per iteration, the same shape as the
unbounded Newton solver; only K/K²-sized partials ever cross the driver
boundary (SURVEY §1.4, §3.4).

Documented deviations from the reference (all conservative):
- the alternate-optimality residual is evaluated against one consistent
  state (the reference mixes pre-update residuals with the post-update
  exponential term, ebw_routines.py:586-600);
- convergence breaks at the measured state instead of taking one extra
  committed step past it (ebw_routines.py:602-616);
- η growth (ebw_routines.py:576-584) takes effect one scan later than in
  the reference: η enters the residuals non-linearly, so the iteration
  whose scan detected the growth condition finishes consistently at the
  pre-growth η (μ_s updates are NOT lagged — they are re-derived exactly
  from the same scan).
"""

from __future__ import annotations

import logging
import math
from typing import Any

import numpy as np

from entropy_balance_weighting_spark.results import EntropyBalanceResults

logger = logging.getLogger("entropy_balance_weighting_spark")

TAU = 0.995

# gram-reuse auto-gate: freeze/skip only pays when the gram accumulate +
# payload is a real per-iteration cost.  1 MiB of gram payload ≈ K=128k
# flat doubles — the grouped huge-K regime (K=100k at k_b=2 is 1.6 MiB);
# the sf0.1 bench entries (K≈2000 grouped → 32 KiB) stay below it.
_GRAM_REUSE_MIN_BYTES = 1 << 20


def _ftb_k(point: np.ndarray, step: np.ndarray) -> float:
    """Fraction-to-boundary for a driver-side K block (ref: shared.py:76-91)."""
    blocked = step < 0
    if not blocked.any():
        return 1.0
    return min(1.0, float(np.min(-TAU * point[blocked] / step[blocked])))


def _mu_update(products: np.ndarray) -> float:
    """Mehrotra-flavored ζ/σ barrier rule (ref: ebw_routines.py:560-574)."""
    mean = float(np.mean(products))
    zeta = float(np.min(products)) / mean
    sigma = 0.1 * min(0.05 * (1.0 - zeta) / zeta, 2.0) ** 3
    return sigma * mean


def entropy_balance_elastic(
    *,
    mean_population_moments: Any,
    x_sample: Any,
    weights0: Any = None,
    options: dict | None = None,
) -> EntropyBalanceResults:
    """Public elastic entry point (ref: ebw_routines.py:334-340)."""
    from entropy_balance_weighting_spark.solvers.api import (
        _build_elastic_kernel,
        _validate_options,
    )

    opts = _validate_options(options)
    bounds = opts.get("bounds") or (0.0, None)
    kernel, m, original = _build_elastic_kernel(
        x_sample, weights0, mean_population_moments, opts, bounds
    )
    return solve_elastic(kernel, m, opts, original_weights=original)


def solve_elastic(
    kernel,
    m: np.ndarray,
    options: dict | None,
    *,
    original_weights,
) -> EntropyBalanceResults:
    opts = options or {}
    max_steps = int(opts.get("max_steps", 100))
    opt_tol = float(opts.get("optimality_violation", 1e-5))
    step_tol = float(opts.get("step_tol", 1e-8))
    # Opt-in mixed-precision payload wire (see the in-loop toggle and
    # kernels/elastic_spark.py set_wire_full for the measured trade).
    wire32_opt = bool(opts.get("payload_wire32", False))

    # Gram reuse across IP iterations (lagged Jacobian / quasi-Newton IP
    # steps): on frozen iterations the stats scan SKIPS the gram
    # accumulate — no Σk_b² bincount CPU, no gram payload bytes — and
    # the Schur system is assembled from the last fresh gram.  Residuals
    # are exact every scan regardless (the gram only shapes the step),
    # so the convergence test never sees a stale quantity.  OPT-IN
    # (default False): measured at 20M×100k grouped, skipping cuts
    # ~24% off a frozen iteration's wall but the lagged trajectory costs
    # +2–3 IP iterations (5 → 7/8) — a NET LOSS for the short
    # superlinear solves this engine runs (PLANS §18, the wire32 lesson
    # again: the IP path is where the iterations are).  r12 TESTED the
    # "wider blocks flip the trade" hypothesis at 20M×100k with k_b=8
    # and k_b=16 (bench_gram_reuse_ab_r12.json): REFUTED — the frozen-
    # scan saving grows with k_b (−28%/iter at 8, −32% at 16) but the
    # lagged-Hessian iteration penalty grows with it (+3 → +4 iters),
    # so k_b=8 is a wash and k_b=16 a 6% net loss.  The remaining
    # opt-in regime is LONG solves (20+ iterations), where per-iter
    # savings amortize a bounded trajectory cost.  "auto" applies the
    # block-structured ≥ _GRAM_REUSE_MIN_BYTES heuristic.
    gram_reuse_opt = opts.get("gram_reuse", False)
    gram_refresh_every = int(opts.get("gram_refresh_every", 3))
    # refresh when a frozen-gram iteration fails to cut the violation to
    # ≤ this fraction of the previous one (stalled contraction)
    gram_stall_ratio = float(opts.get("gram_stall_ratio", 0.5))
    # freeze only while the violation is ≥ this many decades above
    # tolerance: the endgame's superlinear contraction needs the true
    # Jacobian (a lagged one measurably costs iterations exactly there —
    # the same lesson as the wire32 f64 endgame, PLANS §16)
    gram_endgame_factor = float(opts.get("gram_endgame_factor", 1e4))
    if gram_reuse_opt == "auto":
        gram_reuse = (
            getattr(kernel, "supports_gram_skip", False)
            and getattr(kernel, "block_structure", None) is not None
            and getattr(kernel, "gram_payload_bytes", 0)
            >= _GRAM_REUSE_MIN_BYTES
        )
    else:
        gram_reuse = bool(gram_reuse_opt) and getattr(
            kernel, "supports_gram_skip", False
        )

    k = kernel.k
    sum_w0 = kernel.sum_w0
    b = m * sum_w0

    # K-dim init (ref: ebw_routines.py:372-395): elastic slacks absorb the
    # initial constraint gap so the IP starts strictly interior.
    cv = kernel.elastic_g1() - b
    u = np.where(cv < 0, -cv + 0.01, 0.01)
    v = np.where(cv > 0, cv + 0.01, 0.01)
    mu_s = mu_u = mu_v = 0.05
    lu = mu_u / u
    lv = mu_u / v  # ref uses mu_u for both inits (ebw_routines.py:389)
    lam = np.zeros(k)
    eta = float(opts.get("eta", 1.5 * max(float(lu.max()), float(lv.max()))))

    n_steps = 0
    converged = False
    error_message = ""
    prev_step: tuple[float, float] | None = None
    commit_pending = False
    history: list[dict] = []  # per-iteration trace (reference logging parity)

    # gram-reuse state: the last fresh gram, its age in iterations, and
    # the refresh triggers (age cap / stalled contraction / η growth)
    frozen_gram = None
    iters_since_fresh = 0
    force_refresh = False
    last_viol: float | None = None

    while True:
        # ONE scan per iteration start: materializes any pending lazy commit
        # AND returns the post-commit slack/multiplier aggregates plus the
        # μ_s-decomposition legs (EStats), so the barrier update needs no
        # separate pass.
        if gram_reuse:
            need_gram = (
                frozen_gram is None
                or force_refresh
                or iters_since_fresh >= gram_refresh_every
                or (
                    last_viol is not None
                    and last_viol < gram_endgame_factor * opt_tol
                )
            )
            st = kernel.elastic_stats(lam, eta, mu_s, need_gram=need_gram)
        else:
            st = kernel.elastic_stats(lam, eta, mu_s)
        if st.gram is not None:
            frozen_gram = st.gram
            iters_since_fresh = 0
            force_refresh = False
        else:
            iters_since_fresh += 1
        rhs_leg = st.rhs_leg
        cs_sq = st.cs_sq
        if commit_pending:
            # Barrier updates from THIS scan's post-commit state; the
            # μ_s-dependent reductions are re-derived EXACTLY (linear /
            # quadratic in μ_s — see EStats) at the new value.
            mean_sl = st.sl_sum / st.sl_cnt
            zeta = st.sl_min / mean_sl
            sigma = 0.1 * min(0.05 * (1.0 - zeta) / zeta, 2.0) ** 3
            new_mu_s = sigma * mean_sl
            mu_u = _mu_update(u * lu)
            mu_v = _mu_update(v * lv)
            rhs_leg = st.rhs_leg + (mu_s - new_mu_s) * st.rhs_mu_leg
            cs_sq = (
                st.sl_sq
                - 2.0 * new_mu_s * st.sl_sum
                + st.sl_cnt * new_mu_s**2
            )
            mu_s = new_mu_s
            max_lm = max(
                float(np.abs(lam).max()),
                st.lm_max,
                float(lu.max()),
                float(lv.max()),
            )
            if eta < max_lm:
                # Grow the L¹ price (ref: 576-584).  Documented deviation:
                # the growth takes effect from the NEXT scan (η enters the
                # residuals non-linearly, so this iteration's system — built
                # by the same scan — uses the pre-growth η consistently);
                # the reference applies it one pass earlier.
                eta_next = 2.0 * max_lm
                # η rescales the (1/η)·w0/r leg of h̃, i.e. the gram's
                # diagonal weights — a frozen gram computed under the old
                # η is materially stale: refresh at the next scan (the
                # first one that runs at the grown η).
                force_refresh = True
            else:
                eta_next = eta
        else:
            eta_next = eta

        ce = st.g1 - b + u - v
        cu = 1.0 - lam - lu
        cvv = 1.0 + lam - lv
        clu = u * lu - mu_u
        clv = v * lv - mu_v
        k_sq = (
            float(ce @ ce)
            + float(cu @ cu)
            + float(cvv @ cvv)
            + float(clu @ clu)
            + float(clv @ clv)
        )
        opt_viol = math.sqrt(st.cd_sq + st.ci_sq + cs_sq + k_sq)
        alt_viol = math.sqrt(st.alt_sq + st.ci_sq + cs_sq + k_sq)
        # stalled contraction under a frozen gram → refresh next scan
        cur_viol = min(opt_viol, alt_viol)
        if (
            st.gram is None
            and last_viol is not None
            and cur_viol > gram_stall_ratio * last_viol
        ):
            force_refresh = True
        last_viol = cur_viol
        logger.info(
            "elastic iter=%d f=%.6e |Ce|=%.3e viol=%.3e alt=%.3e eta=%.3e",
            n_steps,
            st.f_val,
            float(np.linalg.norm(ce)),
            opt_viol,
            alt_viol,
            eta,
        )
        history.append(
            {
                "iter": n_steps,
                "criterion": st.f_val,
                "ce_norm": float(np.linalg.norm(ce)),
                "violation": opt_viol,
                "alt_violation": alt_viol,
                "eta": eta,
                "mu_s": mu_s,
                "gram_fresh": st.gram is not None,
            }
        )
        if st.has_nan or not math.isfinite(opt_viol):
            error_message = "NaN in elastic optimality conditions"
            break
        # Mixed-precision refinement (OPT-IN, options["payload_wire32"]):
        # large-K kernels wire the payload tail as float32 while the
        # residual is far from tolerance (the bandwidth phase) and
        # switch to float64 for the endgame — a float32 step direction
        # floors the achievable residual ~3-4 decades above f64
        # (kernels/elastic_spark.py set_wire_full).  The 1e4× switch
        # sits a full decade above the measured f32 floor; even so the
        # f32 phase costs ~+1 IP iteration (PLANS §16), which is why
        # the default stays f64 — the trade only pays when the wire is
        # genuinely the bottleneck (many-executor network reduces).
        if wire32_opt and hasattr(kernel, "set_wire_full"):
            kernel.set_wire_full(min(opt_viol, alt_viol) < 1e4 * opt_tol)
        if eta_next <= eta and min(opt_viol, alt_viol) < opt_tol:
            # When η grew this iteration the residuals above were evaluated
            # at the pre-growth η, so declaring convergence here could stop
            # with the L¹ price still below the max multiplier; take one
            # more pass so the check sees the grown η.
            converged = True
            break
        if (
            prev_step is not None
            and prev_step[0] < step_tol
            and prev_step[1] < step_tol
        ):
            converged = True
            logger.info("step sizes converged")
            break
        if n_steps >= max_steps:
            error_message = f"Max steps {max_steps} exceeded"
            break

        # Condensed K×K Schur system (L5) with adaptive Tikhonov (L3) and
        # ×10 escalation on failure (L2; ref: 448-455,497-506).  On the
        # block-diagonal large-K path both lhs assembly and the solve stay
        # per-block — nothing K²-sized on the driver either.
        from entropy_balance_weighting_spark.solvers.linalg import (
            BlockGram,
            solve_regularized,
        )

        delta = max(1e-8, 1e-5 * opt_viol**0.55)
        rhs = (
            ce
            + (v / lv) * (cvv + clv / v)
            - (u / lu) * (cu + clu / u)
            - rhs_leg
        )
        gram_cur = st.gram if st.gram is not None else frozen_gram
        try:
            if isinstance(gram_cur, BlockGram):
                lhs = gram_cur.with_added_diag(u / lu + v / lv)
                dlam = -solve_regularized(lhs, rhs, delta)
            else:
                lhs = gram_cur + np.diag(u / lu + v / lv)
                eye = np.eye(k)
                while True:
                    try:
                        dlam = -np.linalg.solve(lhs + delta * eye, rhs)
                        break
                    except np.linalg.LinAlgError:
                        delta *= 10.0
                        if delta > 1e12:
                            raise
        except np.linalg.LinAlgError:
            error_message = "Singular Schur system"
            break

        sp = kernel.elastic_step(lam, dlam, eta, mu_s)
        if sp.has_nan:
            error_message = "NaN in elastic step"
            break

        # Closed-form K-dim step blocks (ref: 522-535)
        u_step = (u / lu) * (dlam - (cu + clu / u))
        v_step = (v / lv) * (-dlam - (cvv + clv / v))
        lu_step = (1.0 / u) * (-clu - lu * u_step)
        lv_step = (1.0 / v) * (-clv - lv * v_step)

        alpha_p = min(
            min(1.0, sp.ftb_slack), _ftb_k(u, u_step), _ftb_k(v, v_step)
        )
        alpha_d = min(
            min(1.0, sp.ftb_dual), _ftb_k(lu, lu_step), _ftb_k(lv, lv_step)
        )

        kernel.elastic_commit(lam, dlam, eta, mu_s, alpha_p, alpha_d)
        commit_pending = True
        eta = eta_next  # η growth applies from the next scan (see above)
        lam = lam + alpha_d * dlam
        u = u + alpha_p * u_step
        v = v + alpha_p * v_step
        lu = lu + alpha_d * lu_step
        lv = lv + alpha_d * lv_step
        n_steps += 1
        prev_step = (
            alpha_p * math.sqrt(sp.rstep_sq),
            float(np.linalg.norm(sum_w0 * alpha_p * sp.xt_rstep)),
        )

    # Every break leaves the loop right after an ``elastic_stats`` scan with
    # no commit pending (commits are followed by the next scan before any
    # break can fire), so ``st.g1`` IS the materialized final state's g1 —
    # reuse it instead of paying one more full ``elastic_g1`` scan.
    final_cv = st.g1 - b
    attempt = kernel.new_weights()
    return EntropyBalanceResults(
        new_weights=attempt if converged else original_weights,
        converged=converged,
        n_iterations=n_steps,
        constraint_violations=final_cv,
        failure_weights=attempt,
        equality_multipliers_estimate=lam,
        moment_slack_multipliers_estimate=np.concatenate([lu, lv]),
        eta=eta,
        error_message=error_message,
        diagnostics={
            "optimality_violation": float(np.linalg.norm(final_cv)),
            "history": history,
        },
    )
