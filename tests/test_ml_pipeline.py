"""MLlib pipeline-stage tests: the solver as Estimator/Model inside a real
``pyspark.ml.Pipeline`` (the repo's north-star packaging)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.ml import Pipeline
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.ml import (
    EntropyBalanceEstimator,
    EntropyBalanceModel,
)


@pytest.fixture(scope="module")
def households(spark):
    rng = np.random.default_rng(21)
    n = 500
    pdf = pd.DataFrame(
        {
            "serialno": np.arange(n),
            "wgtp": rng.uniform(0.5, 2.0, size=n),
            "bdsp": rng.uniform(1, 5, size=n),
            "hht": rng.integers(0, 3, size=n).astype(str),
        }
    )
    return spark.createDataFrame(pdf)


def test_estimator_fit_transform_appends_weights(spark, households):
    est = EntropyBalanceEstimator(
        weightCol="wgtp",
        numericCols=["bdsp"],
        onehotCols=["hht"],
        rowKeyCols=["serialno"],
        targetScale=1.02,
    )
    model = est.fit(households)
    assert isinstance(model, EntropyBalanceModel)
    assert model.results.converged

    out = model.transform(households)
    assert "new_weight" in out.columns
    assert out.filter(F.col("new_weight").isNull()).count() == 0

    # the defining postcondition: weighted means hit the 1.02-scaled targets
    row = out.agg(
        (F.sum(F.col("bdsp") * F.col("new_weight")) / F.sum("wgtp")).alias("a"),
        (F.sum(F.col("bdsp") * F.col("wgtp")) / F.sum("wgtp")).alias("b"),
    ).first()
    assert row["a"] == pytest.approx(row["b"] * 1.02, rel=1e-6)


def test_model_transform_unseen_rows_get_null(spark, households):
    est = EntropyBalanceEstimator(
        weightCol="wgtp",
        numericCols=["bdsp"],
        rowKeyCols=["serialno"],
        targetScale=1.01,
    )
    model = est.fit(households)
    extra = spark.createDataFrame(
        pd.DataFrame(
            {"serialno": [100000], "wgtp": [1.0], "bdsp": [2.0], "hht": ["0"]}
        )
    )
    out = model.transform(households.unionByName(extra))
    assert out.filter(F.col("new_weight").isNull()).count() == 1


def test_estimator_inside_pipeline(spark, households):
    """Composes with other stages in a plain pyspark.ml Pipeline."""
    est = EntropyBalanceEstimator(
        weightCol="wgtp",
        numericCols=["bdsp"],
        rowKeyCols=["serialno"],
        targetScale=1.01,
        outputCol="w_balanced",
    )
    pipe = Pipeline(stages=[est])
    pmodel = pipe.fit(households)
    out = pmodel.transform(households)
    assert "w_balanced" in out.columns


def test_estimator_bounded_mode(spark, households):
    est = EntropyBalanceEstimator(
        weightCol="wgtp",
        numericCols=["bdsp"],
        rowKeyCols=["serialno"],
        targetScale=1.05,
        lowerBound=0.8,
        upperBound=1.3,
    )
    model = est.fit(households)
    ratio = model.transform(households).select(
        (F.col("new_weight") / F.col("wgtp")).alias("r")
    )
    lo, hi = ratio.agg(F.min("r"), F.max("r")).first()
    assert lo >= 0.8 - 1e-6 and hi <= 1.3 + 1e-6


def test_model_summary_exposes_history_and_eta(spark, households, tmp_path):
    """MLlib-idiomatic model.summary (VERDICT r3 polish #9): the fit-time
    per-iteration trace and the elastic eta are data, not just log lines;
    loaded models report hasSummary=False and raise on .summary."""
    est = EntropyBalanceEstimator(
        weightCol="wgtp",
        numericCols=["bdsp"],
        rowKeyCols=["serialno"],
        targetScale=1.05,
        lowerBound=0.8,
        upperBound=1.3,
    )
    model = est.fit(households)
    assert model.hasSummary
    s = model.summary
    assert s.converged
    assert s.totalIterations >= 1
    # one entry per optimality evaluation: iterations + the starting point
    assert len(s.history) == s.totalIterations + 1
    assert s.objectiveHistory == [h["criterion"] for h in s.history]
    assert len(s.violationHistory) == s.totalIterations + 1
    # bounded fit runs the elastic solver: eta is the L1 price
    assert s.eta is not None and float(s.eta) > 0
    assert all("eta" in h and "mu_s" in h for h in s.history)

    # unbounded fit: eta is None but the trace is still there
    est_u = EntropyBalanceEstimator(
        weightCol="wgtp",
        numericCols=["bdsp"],
        rowKeyCols=["serialno"],
        targetScale=1.02,
    )
    s_u = est_u.fit(households).summary
    assert s_u.converged and s_u.eta is None
    assert len(s_u.history) == s_u.totalIterations + 1

    # persistence: summaries are fit-time artifacts
    path = str(tmp_path / "summary_model")
    model.save(path)
    loaded = EntropyBalanceModel.load(path)
    assert not loaded.hasSummary
    with pytest.raises(RuntimeError, match="hasSummary"):
        _ = loaded.summary


def test_estimator_validates_params(households):
    # a key-less estimator constructs (the persistence reader needs a bare
    # instance) but must fail loudly at fit time
    est = EntropyBalanceEstimator(weightCol="wgtp", numericCols=["bdsp"])
    with pytest.raises(ValueError, match="rowKeyCols"):
        est.fit(households)
    with pytest.raises(ValueError):
        EntropyBalanceEstimator(
            weightCol="wgtp", rowKeyCols=["serialno"], bogus=1
        )


def test_model_save_load_roundtrip(spark, households, tmp_path):
    """MLlib persistence: save the fitted model, load it in the same
    session (fresh object graph), and the loaded transformer must
    reproduce the weights exactly — the production Pipeline-shipping
    contract."""
    est = EntropyBalanceEstimator(
        weightCol="wgtp",
        numericCols=["bdsp"],
        rowKeyCols=["serialno"],
        targetScale=1.01,
        outputCol="w_star",
    )
    model = est.fit(households)
    path = str(tmp_path / "ebw_model")
    model.save(path)

    loaded = EntropyBalanceModel.load(path)
    assert loaded.getOrDefault(loaded.rowKeyCols) == ["serialno"]
    assert loaded.getOrDefault(loaded.outputCol) == "w_star"

    orig = {
        r["serialno"]: r["w_star"]
        for r in model.transform(households).select("serialno", "w_star").collect()
    }
    got = {
        r["serialno"]: r["w_star"]
        for r in loaded.transform(households).select("serialno", "w_star").collect()
    }
    assert got == pytest.approx(orig)

    # overwrite support via the MLWriter option surface
    model.write().overwrite().save(path)


def test_estimator_save_load_roundtrip(tmp_path):
    est = EntropyBalanceEstimator(
        weightCol="wgtp",
        numericCols=["bdsp"],
        onehotCols=["hht"],
        rowKeyCols=["serialno"],
        maxSteps=17,
    )
    path = str(tmp_path / "ebw_est")
    est.save(path)
    loaded = EntropyBalanceEstimator.load(path)
    assert loaded.getOrDefault(loaded.maxSteps) == 17
    assert loaded.getOrDefault(loaded.numericCols) == ["bdsp"]
    assert loaded.getOrDefault(loaded.rowKeyCols) == ["serialno"]


def test_estimator_query_matches_direct_api_query(spark):
    """r12 verdict item #3 companion: the registered
    ``ebw_estimator_match`` (fit → transform → achieved means from the
    TRANSFORMED rows) must produce row-identical output to
    ``ebw_solver_moment_match`` (direct entropy_balance API) — the two
    share one oracle, and this pins Estimator ≡ direct API inside the
    test suite too."""
    from entropy_balance_weighting_spark.queries.solver import (
        ebw_estimator_match,
        ebw_solver_moment_match,
    )
    from tests.conftest import SF_SMOKE

    a = ebw_estimator_match(spark, SF_SMOKE).collect()
    b = ebw_solver_moment_match(spark, SF_SMOKE).collect()
    got = [(r["moment_name"], r["achieved_wmean"], r["converged"]) for r in a]
    want = [(r["moment_name"], r["achieved_wmean"], r["converged"]) for r in b]
    assert got == want
