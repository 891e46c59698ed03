"""Property tests for the data layer: for random small frames, the built
problem tables must satisfy the structural invariants the solver relies
on — exact nnz-per-row, positive weights, consistent dictionary, packed
arrays decoding to x_long, and unique row ids."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.plans import MomentSpec, build_problem_tables


@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(5, 60),
    n_cat=st.integers(1, 4),
    intercept=st.booleans(),
    with_null=st.booleans(),
    with_nonpos=st.booleans(),
)
def test_builder_invariants(spark, seed, n, n_cat, intercept, with_null, with_nonpos):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "rid": np.arange(n),
            "w": rng.uniform(0.1, 3.0, size=n),
            "x0": rng.normal(size=n),
            "cat": rng.integers(0, n_cat, size=n).astype(str),
        }
    )
    if with_nonpos:
        pdf.loc[0, "w"] = -1.0  # dropped by V2
    if with_null and n > 2:
        pdf.loc[1, "x0"] = None  # dropped by V3
    df = spark.createDataFrame(pdf)
    spec = MomentSpec(
        weight_col="w",
        numeric=("x0",),
        onehot=("cat",),
        intercept=intercept,
        row_key=("rid",),
    )
    pt = build_problem_tables(df, spec)

    kept = pdf[(pdf.w > 0) & pdf.x0.notna()]
    assert pt.n == len(kept)
    assert pt.sum_w0 == pytest.approx(kept.w.sum())
    # exact nnz: every kept row emits numeric + intercept + one indicator
    per_row = 1 + int(intercept) + 1
    assert pt.nnz_per_row == per_row
    assert pt.x_long.count() == len(kept) * per_row
    # dictionary covers exactly the names present in the long table
    names_in_long = {
        r["moment_name"]
        for r in pt.x_long.join(pt.moments, "moment_id")
        .select("moment_name")
        .distinct()
        .collect()
    }
    assert names_in_long <= set(pt.moment_names)
    cats_present = set("cat=" + v for v in kept.cat.unique())
    expected = {"x0"} | cats_present | ({"_count"} if intercept else set())
    assert set(pt.moment_names) == expected
    # unique ids, positive weights
    w_rows = pt.w0.collect()
    assert len({r["row_id"] for r in w_rows}) == len(w_rows)
    assert all(r["w0"] > 0 for r in w_rows)
    # packed arrays decode to the long table exactly
    assert pt.packed_arrays is not None
    decoded = (
        pt.packed_arrays.select(
            "row_id", F.explode(F.arrays_zip("idx", "val")).alias("e")
        )
        .select("row_id", F.col("e.idx").alias("mid"), F.col("e.val").alias("v"))
        .collect()
    )
    long_rows = pt.x_long.collect()
    assert {(r["row_id"], r["mid"], r["v"]) for r in decoded} == {
        (r["row_id"], r["moment_id"], r["value"]) for r in long_rows
    }


def test_dedupe_row_key_path(spark):
    """Opt-in duplicate-key handling: every physical row keeps its own id."""
    pdf = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2],
            "w": [1.0, 2.0, 3.0, 4.0, 5.0],
            "x0": [0.1, 0.2, 0.3, 0.4, 0.5],
        }
    )
    df = spark.createDataFrame(pdf)
    spec = MomentSpec(
        weight_col="w", numeric=("x0",), row_key=("k",), dedupe_row_key=True
    )
    pt = build_problem_tables(df, spec)
    assert pt.n == 5
    ids = [r["row_id"] for r in pt.w0.collect()]
    assert len(set(ids)) == 5

    # without the opt-in, the duplicate key is rejected loudly
    with pytest.raises(ValueError, match="not unique"):
        build_problem_tables(
            df, MomentSpec(weight_col="w", numeric=("x0",), row_key=("k",))
        )


@settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(5, 50),
    n_cat=st.integers(1, 3),
)
def test_interaction_encoding_matches_dense_construction(spark, seed, n, n_cat):
    """Property (SURVEY §5 layer 4 style): for random frames, the long
    encoding of interaction moments must reproduce the design matrix a
    user would build densely (formulaic-style ``a:b`` columns), totals
    verified against plain numpy — and the packed arrays must decode to
    exactly the long rows."""
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "rid": np.arange(n),
            "w": rng.uniform(0.1, 3.0, size=n),
            "x0": rng.normal(size=n),
            "x1": rng.uniform(size=n),
            "cat": rng.integers(0, n_cat, size=n).astype(str),
        }
    )
    spec = MomentSpec(
        weight_col="w",
        numeric=("x0",),
        onehot=("cat",),
        interactions=(("x0", "x1"), ("x1", "cat"), ("cat", "cat")),
        row_key=("rid",),
    )
    pt = build_problem_tables(spark.createDataFrame(pdf), spec)

    # numpy-side expected totals per moment name
    expected = {"x0": float((pdf.x0 * pdf.w).sum())}
    expected["x0:x1"] = float((pdf.x0 * pdf.x1 * pdf.w).sum())
    for v in sorted(pdf.cat.unique()):
        mask = pdf.cat == v
        expected[f"cat={v}"] = float(pdf.w[mask].sum())
        expected[f"x1:cat={v}"] = float((pdf.x1 * pdf.w)[mask].sum())
        expected[f"cat={v}:cat={v}"] = float(pdf.w[mask].sum())

    got = {
        r["moment_name"]: r["t"]
        for r in pt.x_long.join(pt.w0, "row_id")
        .join(F.broadcast(pt.moments), "moment_id")
        .groupBy("moment_name")
        .agg(F.sum(F.col("value") * F.col("w0")).alias("t"))
        .collect()
    }
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert got[k] == pytest.approx(v), k

    # packed arrays decode to exactly the long rows
    packed = {
        (r["row_id"], i): v
        for r in pt.packed_arrays.collect()
        for i, v in zip(r["idx"], r["val"])
    }
    long_rows = {
        (r["row_id"], r["moment_id"]): r["value"] for r in pt.x_long.collect()
    }
    assert packed == long_rows
