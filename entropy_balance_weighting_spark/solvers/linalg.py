"""Driver-local K×K linear algebra (SURVEY §2.10 L1-L3) and the
block-diagonal large-K path.

scipy/PARDISO are not assumed in this environment; ``numpy.linalg`` handles
K up to a few thousand densely.  Beyond that, the reference's "hundreds of
thousands of constraints" regime (ref: README.md:8) is reached through
STRUCTURE, not a bigger factorization: group-specific moments never
co-occur in a row, so the Gram matrix is block-diagonal by construction
(SURVEY §7.2) — Σ k_b² storage instead of K², and B independent small
solves instead of one K×K solve.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class BlockStructure:
    """Partition of the K moments into Gram-independent blocks.

    Built from the data layer's ``moment_groups`` metadata (every moment
    carries its group label; moments of different groups never share a
    row).  Valid ONLY when every moment is grouped — one global moment
    (e.g. an intercept) couples all blocks and forces the dense path.
    """

    block_of: np.ndarray  # (K,) block id per moment
    members: list[np.ndarray]  # moment ids per block (id-ordered)
    local: np.ndarray  # (K,) index of each moment within its block
    sizes: np.ndarray  # (B,) block sizes
    flat_offsets: np.ndarray  # (B,) offsets into the flat Σk_b² buffer
    total_flat: int  # Σ k_b²

    @classmethod
    def from_groups(cls, moment_groups: list[str]) -> "BlockStructure | None":
        """None when the partition does not yield >1 all-grouped blocks."""
        if not moment_groups or any(g == "" for g in moment_groups):
            return None
        labels = sorted(set(moment_groups))
        if len(labels) < 2:
            return None
        lab_id = {g: i for i, g in enumerate(labels)}
        block_of = np.array([lab_id[g] for g in moment_groups], dtype=np.int64)
        members = [np.where(block_of == b)[0] for b in range(len(labels))]
        local = np.empty(len(moment_groups), dtype=np.int64)
        for mem in members:
            local[mem] = np.arange(len(mem))
        sizes = np.array([len(m) for m in members], dtype=np.int64)
        flat_offsets = np.concatenate([[0], np.cumsum(sizes**2)[:-1]])
        return cls(
            block_of=block_of,
            members=members,
            local=local,
            sizes=sizes,
            flat_offsets=flat_offsets,
            total_flat=int(np.sum(sizes**2)),
        )


@dataclass
class BlockGram:
    """Block-diagonal Gram: the flat per-block buffer + its structure.

    Carries the driver-side K×K algebra the solvers need (matvec, diagonal
    shifts, and the two solve shapes) so no solver ever materializes the
    dense K×K when the problem is block-structured."""

    structure: BlockStructure
    flat: np.ndarray  # (Σ k_b²,)

    def block(self, b: int) -> np.ndarray:
        s = int(self.structure.sizes[b])
        o = int(self.structure.flat_offsets[b])
        return self.flat[o : o + s * s].reshape(s, s)

    def matvec(self, v: np.ndarray) -> np.ndarray:
        out = np.empty_like(v)
        for b, mem in enumerate(self.structure.members):
            out[mem] = self.block(b) @ v[mem]
        return out

    def with_added_diag(self, d: np.ndarray) -> "BlockGram":
        """G + Diag(d) — block-diagonal plus diagonal stays block-diagonal."""
        out = BlockGram(structure=self.structure, flat=self.flat.copy())
        for b, mem in enumerate(self.structure.members):
            blk = out.block(b)
            blk[np.diag_indices_from(blk)] += d[mem]
        return out

    def solve_i_plus_g_diag(self, p: np.ndarray, rhs: np.ndarray) -> np.ndarray:
        """Solve (I + G·Diag(p)) x = rhs block-wise (the penalty Woodbury
        inner system — not symmetric, plain LU per block)."""
        out = np.empty_like(rhs)
        for b, mem in enumerate(self.structure.members):
            sz = len(mem)
            a = np.eye(sz) + self.block(b) * p[mem][None, :]
            out[mem] = np.linalg.solve(a, rhs[mem])
        return out


def tikhonov_penalty(residual_norm: float) -> float:
    """Adaptive regularization weight δ = max(1e-8, 1e-5·‖res‖^0.55).

    The collinearity defense (ref: ebw_routines.py:235-239): keeps the
    Newton system solvable when the Gram matrix is rank-deficient.
    """
    return max(1e-8, float(1e-5 * residual_norm**0.55))


def solve_regularized(
    lhs: np.ndarray,
    rhs: np.ndarray,
    penalty: float,
    *,
    max_escalations: int = 30,
    relative: bool = True,
) -> np.ndarray:
    """Solve (lhs + δI)x = rhs, escalating δ ×10 on numerical failure.

    Same retry semantics as the reference's dense path (ref:
    ebw_routines.py:247-257): require positive-definiteness (Cholesky
    check, the numpy analogue of ``assume_a='pos'``), escalate the
    Tikhonov term until the system factorizes and yields finite values.

    Documented deviation: with ``relative=True`` (default) the Tikhonov
    term is scaled by the mean Gram diagonal, making the damping
    SCALE-INVARIANT.  The reference's absolute δ silently over-damps
    problems whose Gram entries are far below 1 (e.g. thousands of group
    blocks over small-magnitude columns: entries ~1e-6 vs δ ~1e-4 turn
    quadratic Newton into a slow linear crawl).  On unit-scale problems —
    the reference's own regime — the behavior is essentially identical,
    and the collinearity defense is preserved exactly (a rank-deficient
    Gram still receives a strictly positive relative shift).
    """
    if isinstance(lhs, BlockGram):
        return solve_regularized_blocks(
            lhs, rhs, penalty, max_escalations=max_escalations, relative=relative
        )
    k = lhs.shape[0]
    eye = np.eye(k)
    if relative:
        scale = float(np.trace(lhs)) / max(k, 1)
        if scale > 0 and np.isfinite(scale):
            penalty = penalty * scale
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


def solve_regularized_blocks(
    gram: BlockGram,
    rhs: np.ndarray,
    penalty: float,
    *,
    max_escalations: int = 30,
    relative: bool = True,
) -> np.ndarray:
    """Block-diagonal solve: B independent regularized solves, each k_b×k_b.

    Exactly equivalent to the dense solve when the off-block entries are
    structurally zero (group moments, SURVEY A10/§7.2) — parity-tested —
    but costs Σ k_b³ instead of K³ and never materializes K².  The
    relative Tikhonov scaling applies PER BLOCK, so heterogeneous block
    magnitudes each get appropriately-sized damping."""
    st = gram.structure
    out = np.empty_like(rhs)
    for b, mem in enumerate(st.members):
        out[mem] = solve_regularized(
            gram.block(b),
            rhs[mem],
            penalty,
            max_escalations=max_escalations,
            relative=relative,
        )
    return out
