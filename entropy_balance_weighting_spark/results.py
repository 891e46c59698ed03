"""Result container for all solver entry points.

Mirrors the reference's ``EntropyBalanceResults`` fields (ref:
shared.py:15-38) so a user of the reference can switch without changing
downstream code.  ``new_weights`` may be either a numpy array (local
kernel / collected) or a Spark DataFrame ``(row_id, new_weight)``
(distributed kernel) — both expose the same semantic content.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np


@dataclass
class EntropyBalanceResults:
    """Outcome of one entropy-balance solve.

    Failure semantics follow the reference exactly (ref:
    ebw_routines.py:321-331): when the solve does not converge,
    ``new_weights`` holds the ORIGINAL weights and the failed attempt is
    preserved in ``failure_weights``.
    """

    new_weights: Any  # np.ndarray (N,) or DataFrame(row_id, new_weight)
    converged: bool
    n_iterations: int
    constraint_violations: np.ndarray | None = None
    failure_weights: Any = None
    equality_multipliers_estimate: np.ndarray | None = None
    moment_slack_multipliers_estimate: np.ndarray | None = None
    eta: float | np.ndarray | None = None
    error_message: str = ""
    diagnostics: dict = field(default_factory=dict)
