"""Wide/Vector encoding adapter tests: a VectorAssembler pipeline output
feeds the solver through vector_to_problem_tables and gives the same
answer as the numpy path (SURVEY §1.1 encoding equivalence, the analogue
of the reference's dense↔sparse test pair)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.ml.feature import VectorAssembler
from pyspark.sql import functions as F

from entropy_balance_weighting_spark import entropy_balance
from entropy_balance_weighting_spark.plans.moment_spec import (
    vector_to_problem_tables,
)


def test_vector_encoding_matches_numpy_solve(spark):
    rng = np.random.default_rng(61)
    n = 300
    x = rng.uniform(size=(n, 3))
    x[x < 0.4] = 0.0  # sparsity → assembler may emit SparseVectors
    w0 = rng.uniform(0.5, 2.0, size=n)
    pdf = pd.DataFrame(
        {"rid": np.arange(n), "w": w0, "a": x[:, 0], "b": x[:, 1], "c": x[:, 2]}
    )
    df = spark.createDataFrame(pdf)
    assembled = VectorAssembler(
        inputCols=["a", "b", "c"], outputCol="features"
    ).transform(df)
    pt = vector_to_problem_tables(
        assembled,
        weight_col="w",
        row_key=("rid",),
        feature_names=["a", "b", "c"],
    )
    assert pt.moment_names == ["a", "b", "c"]
    assert pt.n == n
    assert pt.sum_w0 == pytest.approx(w0.sum())
    # sparse encoding: zero entries are absent
    nnz = pt.x_long.count()
    assert nnz == int((x != 0).sum())
    # packed arrays agree with x_long
    decoded = (
        pt.packed_arrays.select(
            "row_id", F.explode(F.arrays_zip("idx", "val")).alias("e")
        )
        .select("row_id", "e.idx", "e.val")
        .collect()
    )
    assert {(r["row_id"], r["idx"], r["val"]) for r in decoded} == {
        (r["row_id"], r["moment_id"], float(r["value"]))
        for r in pt.x_long.collect()
    }

    m = x.T @ w0 / w0.sum() * 1.02
    res_vec = entropy_balance(
        mean_population_moments=m,
        x_sample=pt,
        options={"force_distributed": True},
    )
    res_np = entropy_balance(mean_population_moments=m, x_sample=x, weights0=w0)
    assert res_vec.converged and res_np.converged
    got = {r["row_id"]: r["new_weight"] for r in res_vec.new_weights.collect()}
    hashed = {
        r["rid"]: r["h"]
        for r in spark.createDataFrame(pdf[["rid"]])
        .select("rid", F.xxhash64("rid").alias("h"))
        .collect()
    }
    np.testing.assert_allclose(
        [got[hashed[i]] for i in pdf["rid"]], res_np.new_weights, rtol=1e-6
    )


def test_vector_encoding_validates(spark):
    pdf = pd.DataFrame({"rid": [1, 1], "w": [1.0, 1.0], "a": [0.5, 0.6]})
    assembled = VectorAssembler(inputCols=["a"], outputCol="features").transform(
        spark.createDataFrame(pdf)
    )
    with pytest.raises(ValueError, match="not unique"):
        vector_to_problem_tables(assembled, weight_col="w", row_key=("rid",))
    with pytest.raises(ValueError, match="feature names"):
        vector_to_problem_tables(
            assembled.filter(F.col("rid") == 1).limit(1),
            weight_col="w",
            row_key=("rid",),
            feature_names=["x", "y"],
        )
