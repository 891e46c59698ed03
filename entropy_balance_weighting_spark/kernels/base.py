"""Kernel interface shared by the local and distributed implementations."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol

import numpy as np


@dataclass
class IterStats:
    """All N→{scalar,K,K×K} reductions one Newton iteration needs.

    Computed in a single pass over the data (the distributed kernel fuses
    them into one mapInPandas job).  ``xt_w`` and ``xt_wcd`` are UNSCALED
    (no Σw0 factor); the driver applies scaling.
    """

    f_val: float  # Σ w0·(r·log r − r + 1), r = wstar/q
    xt_w: np.ndarray  # X^T wstar                         (K,)
    cd_sq: float  # ‖Cd‖², Cd = log(wstar/q) − Xλ
    xt_wcd: np.ndarray  # X^T (wstar ∘ Cd)                  (K,)
    gram: np.ndarray  # X^T Diag(wstar) X                 (K,K)
    min_w: float  # min wstar
    has_nan: bool


@dataclass
class StepStats:
    """Reductions over the candidate steps (primal dw and dual exp-form)."""

    alpha_raw: float  # min(−wstar/dw over dw<0); +inf when unblocked
    xt_dw: np.ndarray  # X^T dw                            (K,)
    dw_sq: float  # ‖dw‖²
    xt_wdual: np.ndarray  # X^T w_dual, w_dual = q·exp(X(λ+Δλ)) (K,)
    min_wdual: float
    has_nan: bool


class Kernel(Protocol):
    """N-dimensional compute surface for the unbounded Newton solver."""

    n: int
    k: int
    sum_w0: float

    def init_state(self, ratio_guess: np.ndarray | None) -> None:
        """Set wstar = q ∘ guess (guess defaults to 1)."""

    def stats(self, lam: np.ndarray) -> IterStats: ...

    def step_stats(self, lam: np.ndarray, dlam: np.ndarray) -> StepStats: ...

    def commit(self, choice: str, lam: np.ndarray, dlam: np.ndarray, alpha: float) -> None:
        """Advance wstar by the chosen candidate ('primal'|'dual')."""

    def new_weights(self):
        """Final weights in original scale: wstar·Σw0 (ndarray or DataFrame)."""

    def cleanup(self) -> None: ...
