"""Sparse x_sample ingestion (SURVEY S1 / ref typing.py:12-14): the API
accepts scipy-like CSR/CSC matrices via duck-typing — real scipy.sparse
works when installed, but scipy is never imported, so the contract is
testable with structural fakes.  Dense/sparse consistency mirrors the
reference's test_sparse.py-vs-test_dense.py strategy."""

from __future__ import annotations

import numpy as np
import pytest

from entropy_balance_weighting_spark.solvers.api import entropy_balance


class FakeCSR:
    format = "csr"

    def __init__(self, dense):
        dense = np.asarray(dense, dtype=float)
        self.shape = dense.shape
        data, indices, indptr = [], [], [0]
        for row in dense:
            nz = np.nonzero(row)[0]
            indices.extend(nz.tolist())
            data.extend(row[nz].tolist())
            indptr.append(len(indices))
        self.data = np.array(data)
        self.indices = np.array(indices, dtype=np.int32)
        self.indptr = np.array(indptr, dtype=np.int32)


class FakeCSC:
    format = "csc"

    def __init__(self, dense):
        dense = np.asarray(dense, dtype=float)
        self.shape = dense.shape
        data, indices, indptr = [], [], [0]
        for col in dense.T:
            nz = np.nonzero(col)[0]
            indices.extend(nz.tolist())
            data.extend(col[nz].tolist())
            indptr.append(len(indices))
        self.data = np.array(data)
        self.indices = np.array(indices, dtype=np.int32)
        self.indptr = np.array(indptr, dtype=np.int32)


def _problem(n=200, k=4, seed=5):
    rng = np.random.default_rng(seed)
    x = rng.uniform(size=(n, k))
    x[rng.uniform(size=(n, k)) < 0.5] = 0.0  # make it genuinely sparse
    x[:, 0] = 1.0  # intercept keeps the problem well-posed
    w0 = rng.uniform(0.5, 2.0, size=n)
    m = (x * w0[:, None]).sum(axis=0) / w0.sum() * 1.02
    return x, w0, m


def test_csr_matches_dense_local():
    x, w0, m = _problem()
    dense = entropy_balance(mean_population_moments=m, x_sample=x, weights0=w0)
    sparse = entropy_balance(
        mean_population_moments=m, x_sample=FakeCSR(x), weights0=w0
    )
    assert dense.converged and sparse.converged
    np.testing.assert_allclose(sparse.new_weights, dense.new_weights, rtol=1e-12)


def test_csc_matches_dense_local():
    x, w0, m = _problem(seed=7)
    dense = entropy_balance(mean_population_moments=m, x_sample=x, weights0=w0)
    sparse = entropy_balance(
        mean_population_moments=m, x_sample=FakeCSC(x), weights0=w0
    )
    assert dense.converged and sparse.converged
    np.testing.assert_allclose(sparse.new_weights, dense.new_weights, rtol=1e-12)


def test_csr_distributed_path_matches_dense(spark):
    """force_distributed routes the sparse input through the long-COO
    ProblemTables conversion and the Spark kernel; weights must agree
    with the local dense solve to solver tolerance."""
    x, w0, m = _problem(n=150, seed=9)
    dense = entropy_balance(mean_population_moments=m, x_sample=x, weights0=w0)
    res = entropy_balance(
        mean_population_moments=m,
        x_sample=FakeCSR(x),
        weights0=w0,
        options={"force_distributed": True},
    )
    assert res.converged
    got = {r.row_id: r.new_weight for r in res.new_weights.collect()}
    w = np.array([got[i] for i in range(len(w0))])
    np.testing.assert_allclose(w, dense.new_weights, rtol=1e-6)


def test_csr_bounded_elastic_accepts_sparse():
    x, w0, m = _problem(seed=11)
    res = entropy_balance(
        mean_population_moments=m,
        x_sample=FakeCSR(x),
        weights0=w0,
        options={"bounds": (0.2, 5.0)},
    )
    assert res.converged


def test_nonfinite_sparse_data_rejected():
    x, w0, m = _problem(seed=13)
    x[3, 1] = np.nan if x[3, 1] != 0 else x[3, 1]
    x[3, 1] = np.nan
    with pytest.raises(ValueError):
        entropy_balance(
            mean_population_moments=m, x_sample=FakeCSR(x), weights0=w0
        )


def test_sparse_with_empty_rows_solves(spark):
    """A row with zero nonzeros (all-zero design row) must survive both
    the densified local path and the long-COO distributed path — the
    distributed packing fills empty arrays for rows absent from x_long."""
    x, w0, m = _problem(n=80, seed=17)
    x[5, 1:] = 0.0  # intercept-only row stays feasible but row 5 has
    x[9, 1:] = 0.0  # no entries beyond column 0 after sparsification
    sp = FakeCSR(x)
    local = entropy_balance(mean_population_moments=m, x_sample=sp, weights0=w0)
    assert local.converged
    dist = entropy_balance(
        mean_population_moments=m,
        x_sample=sp,
        weights0=w0,
        options={"force_distributed": True},
    )
    assert dist.converged
    got = {r.row_id: r.new_weight for r in dist.new_weights.collect()}
    assert len(got) == 80  # every row keeps a weight, including sparse ones
    import numpy as np

    w = np.array([got[i] for i in range(80)])
    np.testing.assert_allclose(w, local.new_weights, rtol=1e-6)


class NonCanonicalCOOishCSR(FakeCSR):
    """A CSR with duplicate (row, col) entries — non-canonical but legal
    scipy input; scipy sums duplicates on densify/matvec."""

    def __init__(self, dense, dup_row, dup_col, extra):
        super().__init__(dense)
        # append a duplicate entry at the end of dup_row's slice
        insert_at = int(self.indptr[dup_row + 1])
        self.data = np.insert(self.data, insert_at, extra)
        self.indices = np.insert(self.indices, insert_at, dup_col)
        self.indptr = self.indptr.copy()
        self.indptr[dup_row + 1 :] += 1


def test_duplicate_entries_sum_like_scipy():
    """Non-canonical sparse input with duplicate (row, col) entries must
    SUM duplicates in the densified local path (scipy semantics, and what
    the long-COO distributed groupBy-sum does) — not last-write-wins."""
    x, w0, m = _problem(n=120, seed=23)
    x[4, 2] = 0.7
    base = x.copy()
    base[4, 2] = x[4, 2] - 0.25  # dense equivalent after summing the dup
    sp = NonCanonicalCOOishCSR(base, dup_row=4, dup_col=2, extra=0.25)
    dense = entropy_balance(mean_population_moments=m, x_sample=x, weights0=w0)
    sparse = entropy_balance(mean_population_moments=m, x_sample=sp, weights0=w0)
    assert dense.converged and sparse.converged
    np.testing.assert_allclose(sparse.new_weights, dense.new_weights, rtol=1e-12)
