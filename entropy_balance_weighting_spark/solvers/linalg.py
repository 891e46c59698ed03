"""Driver-local K×K linear algebra (SURVEY §2.10 L1-L3).

scipy/PARDISO are not assumed in this environment; ``numpy.linalg`` handles
K up to a few thousand densely, which covers the collected Gram matrices
(K² ≲ 10⁶ doubles — driver-scale by SURVEY §1.4).
"""

from __future__ import annotations

import numpy as np


def tikhonov_penalty(residual_norm: float) -> float:
    """Adaptive regularization weight δ = max(1e-8, 1e-5·‖res‖^0.55).

    The collinearity defense (ref: ebw_routines.py:235-239): keeps the
    Newton system solvable when the Gram matrix is rank-deficient.
    """
    return max(1e-8, float(1e-5 * residual_norm**0.55))


def solve_regularized(
    lhs: np.ndarray, rhs: np.ndarray, penalty: float, *, max_escalations: int = 30
) -> np.ndarray:
    """Solve (lhs + δI)x = rhs, escalating δ ×10 on numerical failure.

    Same retry semantics as the reference's dense path (ref:
    ebw_routines.py:247-257): require positive-definiteness (Cholesky
    check, the numpy analogue of ``assume_a='pos'``), escalate the
    Tikhonov term until the system factorizes and yields finite values.
    """
    k = lhs.shape[0]
    eye = np.eye(k)
    for _ in range(max_escalations):
        a = lhs + penalty * eye
        try:
            np.linalg.cholesky(a)  # positive-definiteness gate
            x = np.linalg.solve(a, rhs)
            if np.all(np.isfinite(x)):
                return x
        except np.linalg.LinAlgError:
            pass
        penalty *= 10.0
    raise np.linalg.LinAlgError("K×K system unsolvable after escalating regularization")
