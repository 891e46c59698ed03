"""Embedding moments + PCA projection: the distributed one-pass
accumulator must equal local numpy, and the projection must be the
deterministic top-k eigenprojection."""

from __future__ import annotations

import numpy as np

from entropy_balance_weighting_spark.functions.similarity import (
    embedding_moments,
    pca_project,
)
from entropy_balance_weighting_spark.session import load_table
from tests.conftest import SF_SMOKE


def _local_embeddings(spark):
    df = load_table(spark, SF_SMOKE, "embeddings")
    x = np.array([r.embedding for r in df.collect()], dtype=np.float64)
    return df, x


def test_embedding_moments_match_numpy(spark):
    df, x = _local_embeddings(spark)
    n, mean, cov = embedding_moments(df)
    assert n == x.shape[0]
    assert np.allclose(mean, x.mean(axis=0), rtol=1e-10, atol=1e-12)
    assert np.allclose(cov, np.cov(x, rowvar=False), rtol=1e-8, atol=1e-10)


def test_pca_projection_matches_numpy(spark):
    df, x = _local_embeddings(spark)
    out, evr = pca_project(df, k=3)
    # explained variance: descending, in (0, 1], sums below 1 for k < D
    assert all(a >= b for a, b in zip(evr, evr[1:]))
    assert 0 < sum(evr) <= 1.0 + 1e-12

    cov = np.cov(x, rowvar=False)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:3]
    comps = vecs[:, order].T
    for i in range(3):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    expect = (x - x.mean(axis=0)) @ comps.T

    got = np.array(
        [r.pc for r in out.orderBy("vec_id").select("pc").collect()]
    )
    # align expectation by vec_id (x was collected in df order)
    ids = [r.vec_id for r in df.select("vec_id").collect()]
    expect_by_id = {i: e for i, e in zip(ids, expect)}
    expect_sorted = np.array([expect_by_id[i] for i in sorted(ids)])
    assert np.allclose(got, expect_sorted, rtol=1e-8, atol=1e-9)


def test_embedding_moments_small_input_raises(spark):
    import pytest

    one = spark.createDataFrame([([1.0, 2.0],)], "embedding array<double>")
    with pytest.raises(ValueError, match=">= 2 rows"):
        embedding_moments(one)
    empty = one.filter("embedding is null")
    with pytest.raises(ValueError, match=">= 2 rows"):
        embedding_moments(empty)
