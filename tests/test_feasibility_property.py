"""Feasibility property tests — the engine analogue of the reference's
subtlest-bug-catcher (SURVEY §5 layer 6; ref: test_parametric.py:34-83).

The reference uses a ``scipy.optimize.linprog`` phase-1 oracle; scipy is
not available here, so the independent oracle is an accelerated projected
-gradient NNLS: min_{r≥0} ‖(Diag(w0)X)^T r − b‖.  A zero minimum ⇔ a
nonnegative weight vector matching the moments exists.  Assertions only
fire when the oracle is DECISIVE (residual clearly zero or clearly not),
so borderline cases can't flake.

Also the total-function property (ref: test_parametric.py:11-31): any
float input either returns a result or raises ValueError.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from entropy_balance_weighting_spark import entropy_balance


def _nnls_residual(x: np.ndarray, w0: np.ndarray, m: np.ndarray) -> float:
    """min_{r≥0} ‖A^T r − b‖ / ‖b‖ via FISTA on the box-constrained LS."""
    a = (x * w0[:, None]).T  # k×n
    b = m * w0.sum()
    bn = float(np.linalg.norm(b))
    if bn == 0:
        return 0.0
    lip = 2.0 * float(np.linalg.eigvalsh(a @ a.T).max())
    r = np.ones(a.shape[1])
    y = r.copy()
    t = 1.0
    for _ in range(5000):
        grad = 2.0 * a.T @ (a @ y - b)
        r_new = np.maximum(y - grad / lip, 0.0)
        t_new = (1.0 + np.sqrt(1.0 + 4.0 * t * t)) / 2.0
        y = r_new + (t - 1.0) / t_new * (r_new - r)
        r, t = r_new, t_new
    return float(np.linalg.norm(a @ r - b)) / bn


def _classify(x, w0, m) -> str:
    res = _nnls_residual(x, w0, m)
    if res < 1e-7:
        return "feasible"
    if res > 1e-3:
        return "infeasible"
    return "borderline"


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    seed=st.integers(0, 10_000),
    scale=st.floats(0.1, 3.0),
    flip=st.booleans(),
)
def test_feasibility_matches_convergence(seed, scale, flip):
    """Solver-converged ⇒ an exact moment match exists AND the oracle does
    not certify infeasibility; oracle-infeasible ⇒ solver must not claim
    convergence."""
    rng = np.random.default_rng(seed)
    n, k = 60, 3
    x = rng.uniform(size=(n, k))
    w0 = rng.uniform(0.5, 2.0, size=n)
    m = x.T @ w0 / w0.sum() * scale
    if flip:
        m = m * np.array([1.0, -1.0, 1.0])  # usually pushes outside the cone

    verdict = _classify(x, w0, m)
    res = entropy_balance(mean_population_moments=m, x_sample=x, weights0=w0)
    if res.converged:
        gap = np.abs(x.T @ res.new_weights - m * w0.sum()).max()
        assert gap < 1e-3
        assert verdict != "infeasible"
        assert np.all(res.new_weights > 0)
    if verdict == "infeasible":
        assert not res.converged


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    seed=st.integers(0, 10_000),
    scale=st.floats(0.2, 2.0),
)
def test_elastic_always_converges_and_certifies(seed, scale):
    """Elastic mode ALWAYS converges (ref: test_parametric_elastic.py:39-83)
    and its violation certificate agrees with the feasibility oracle."""
    rng = np.random.default_rng(seed)
    n, k = 50, 3
    x = rng.uniform(size=(n, k))
    w0 = rng.uniform(0.5, 2.0, size=n)
    m = x.T @ w0 / w0.sum() * scale
    res = entropy_balance(
        mean_population_moments=m,
        x_sample=x,
        weights0=w0,
        options={"bounds": (0.0, None), "max_steps": 200},
    )
    assert res.converged, f"elastic failed to converge (seed={seed})"
    rel_viol = np.abs(res.constraint_violations).max() / w0.sum()
    verdict = _classify(x, w0, m)
    if verdict == "feasible":
        assert rel_viol < 1e-4
    elif verdict == "infeasible":
        assert rel_viol > 1e-6


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_total_function_property(data):
    """Any float input (NaN/Inf included) either returns an
    EntropyBalanceResults or raises ValueError (ref: test_parametric.py:11-31)."""
    n, k = 12, 2
    elems = st.floats(allow_nan=True, allow_infinity=True, width=64)
    x = np.array(
        data.draw(
            st.lists(
                st.lists(elems, min_size=k, max_size=k), min_size=n, max_size=n
            )
        )
    )
    w0 = np.array(data.draw(st.lists(elems, min_size=n, max_size=n)))
    m = np.array(data.draw(st.lists(elems, min_size=k, max_size=k)))
    try:
        res = entropy_balance(
            mean_population_moments=m,
            x_sample=x,
            weights0=w0,
            options={"max_steps": 5},
        )
        assert hasattr(res, "converged")
    except ValueError:
        pass
