"""Problem-bundle roundtrip tests (S2/S3; mirrors ref test_dump.py:11-65:
re-solve after load gives identical convergence flag and weights; failure
dump written only on failure)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from entropy_balance_weighting_spark import entropy_balance
from entropy_balance_weighting_spark.sources import bundle


def _problem(n=200, k=3, seed=5):
    rng = np.random.default_rng(seed)
    x = rng.uniform(size=(n, k))
    w0 = rng.uniform(0.5, 2.0, size=n)
    m = x.T @ w0 / w0.sum() * 1.02
    return x, w0, m


def test_roundtrip_numpy_dump_load_resolve(spark, tmp_path):
    x, w0, m = _problem()
    path = str(tmp_path / "bundle")
    res1 = entropy_balance(
        mean_population_moments=m,
        x_sample=x,
        weights0=w0,
        options={"save_problem_data": path},
    )
    assert res1.converged
    assert os.path.exists(os.path.join(path, "x_long.parquet"))

    pt, targets = bundle.load_problem(spark, path)
    np.testing.assert_allclose(targets, m, rtol=1e-15)
    res2 = entropy_balance(mean_population_moments=targets, x_sample=pt)
    assert res2.converged == res1.converged
    w2 = {r["row_id"]: r["new_weight"] for r in res2.new_weights.collect()}
    got = np.array([w2[i] for i in range(len(w0))])
    np.testing.assert_allclose(got, res1.new_weights, rtol=1e-8)


def test_failure_dump_only_on_failure(tmp_path):
    x, w0, m = _problem()
    ok_path = str(tmp_path / "nofail")
    res = entropy_balance(
        mean_population_moments=m,
        x_sample=x,
        weights0=w0,
        options={"save_failure_data": ok_path},
    )
    assert res.converged
    assert not os.path.exists(ok_path)  # converged → nothing written

    fail_path = str(tmp_path / "fail")
    # provably infeasible: a negative target moment over nonnegative X
    # cannot be met by positive weights
    m_bad = m.copy()
    m_bad[0] = -1.0
    res_bad = entropy_balance(
        mean_population_moments=m_bad,
        x_sample=x,
        weights0=w0,
        options={"save_failure_data": fail_path},
    )
    assert not res_bad.converged
    assert os.path.exists(os.path.join(fail_path, "x_long.parquet"))
    # failure contract: original weights returned, attempt preserved
    np.testing.assert_allclose(res_bad.new_weights, w0)


def test_loaded_bundle_solves_distributed(spark, tmp_path):
    """A bundle-loaded ProblemTables has NO builder metadata (no known
    sums, no prepacked arrays, no nnz accounting) — the distributed kernel
    must fall back to the generic aggregation + groupBy packing and still
    match the local solve."""
    x, w0, m = _problem(n=150, seed=21)
    path = str(tmp_path / "generic")
    bundle.dump_problem(path, x, w0, m)
    pt, targets = bundle.load_problem(spark, path)
    assert pt.sum_w0 is None and pt.packed_arrays is None
    res_d = entropy_balance(
        mean_population_moments=targets,
        x_sample=pt,
        options={"force_distributed": True},
    )
    res_l = entropy_balance(mean_population_moments=m, x_sample=x, weights0=w0)
    assert res_d.converged and res_l.converged
    got = {r["row_id"]: r["new_weight"] for r in res_d.new_weights.collect()}
    np.testing.assert_allclose(
        [got[i] for i in range(len(w0))], res_l.new_weights, rtol=1e-6
    )


def test_roundtrip_problem_tables(spark, tmp_path):
    """Distributed dump path: ProblemTables → parquet bundle → reload."""
    import pandas as pd

    from entropy_balance_weighting_spark.plans import (
        MomentSpec,
        build_problem_tables,
    )

    x, w0, m = _problem(n=100, seed=9)
    pdf = pd.DataFrame(
        {"rid": np.arange(100), "w": w0, "x0": x[:, 0], "x1": x[:, 1], "x2": x[:, 2]}
    )
    spec = MomentSpec(weight_col="w", numeric=("x0", "x1", "x2"), row_key=("rid",))
    pt = build_problem_tables(spark.createDataFrame(pdf), spec)
    path = str(tmp_path / "ptb")
    res = entropy_balance(
        mean_population_moments=m,
        x_sample=pt,
        options={"save_problem_data": path},
    )
    assert res.converged
    pt2, targets = bundle.load_problem(spark, path)
    assert pt2.moment_names == ["x0", "x1", "x2"]
    res2 = entropy_balance(mean_population_moments=targets, x_sample=pt2)
    assert res2.converged
    w1 = {r["row_id"]: r["new_weight"] for r in res.new_weights.collect()}
    w2 = {r["row_id"]: r["new_weight"] for r in res2.new_weights.collect()}
    assert w1.keys() == w2.keys()
    np.testing.assert_allclose(
        [w2[k] for k in w1], [w1[k] for k in w1], rtol=1e-8
    )
