"""Exact-value unit tests for the MomentSpec data layer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.plans import MomentSpec, build_problem_tables


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "CA", "a", 2.0, 10.0),
        (2, "CA", "b", 3.0, 20.0),
        (3, "NY", "a", 5.0, 30.0),
        (4, "NY", "a", -1.0, 40.0),  # dropped by the w>0 filter (V2)
        (5, None, "b", 1.0, 50.0),  # dropped by dropna (V3)
    ]
    return spark.createDataFrame(rows, ["id", "state", "cat", "w", "x"])


def test_builder_long_encoding_exact(tiny):
    spec = MomentSpec(
        weight_col="w",
        numeric=("x",),
        onehot=("cat",),
        intercept=True,
        row_key=("id",),
    )
    pt = build_problem_tables(tiny, spec)
    # moments: sorted names, dense int ids
    assert pt.moment_names == ["_count", "cat=a", "cat=b", "x"]
    assert pt.k == 4

    # row 4 dropped by w>0; row 5 kept (its null is in 'state', unused here —
    # dropna only considers columns the spec references)
    w0 = {r["row_id"]: r["w0"] for r in pt.w0.collect()}
    assert len(w0) == 4
    assert sorted(w0.values()) == [1.0, 2.0, 3.0, 5.0]

    # X^T w0 per moment, exact
    totals = {
        r["moment_id"]: r["total"]
        for r in pt.x_long.join(pt.w0, "row_id")
        .groupBy("moment_id")
        .agg(F.sum(F.col("value") * F.col("w0")).alias("total"))
        .collect()
    }
    # _count: 2+3+5+1; cat=a: 2+5; cat=b: 3+1; x: 2*10+3*20+5*30+1*50
    assert totals == {0: 11.0, 1: 7.0, 2: 4.0, 3: 280.0}


def test_group_normalized_weights_sum_to_one(tiny):
    spec = MomentSpec(
        weight_col="w",
        numeric=("x",),
        group=("state",),
        normalize_weights_within_group=True,
        row_key=("id",),
    )
    pt = build_problem_tables(tiny, spec)
    assert pt.moment_names == ["grp=CA|x", "grp=NY|x"]
    sums = {
        r["moment_id"]: r["s"]
        for r in pt.x_long.join(pt.w0, "row_id")
        .groupBy("moment_id")
        .agg(F.sum("w0").alias("s"))
        .collect()
    }
    # after V2/V3 filters NY has a single row with weight 5 → normalized 1.0
    assert sums[0] == pytest.approx(1.0)
    assert sums[1] == pytest.approx(1.0)


def test_no_moments_raises(tiny):
    with pytest.raises(ValueError):
        build_problem_tables(tiny, MomentSpec(weight_col="w", row_key=("id",)))
