"""MLlib pipeline integration: the solver as an ``Estimator`` whose fitted
``Model`` is a ``Transformer`` that appends the balanced weight column —
the idiomatic Spark packaging of a sample-weighting algorithm (the repo's
north star: survey weighting as a pipeline stage among other stages).

Maps the reference's function-call surface (ref: ebw_routines.py:18-24 and
its options dict, ebw_routines.py:62-99) onto MLlib ``Params``:

    est = EntropyBalanceEstimator(
        weightCol="wgtp", numericCols=["bdsp"], onehotCols=["hht2"],
        rowKeyCols=["serialno"], lowerBound=0.2, upperBound=5.0,
    ).setTargets(targets_df)
    model = est.fit(households)          # runs the solver
    reweighted = model.transform(households)  # + 'new_weight' column

``rowKeyCols`` must identify rows uniquely: the fitted weights join back by
the deterministic key hash, so ``transform`` works on any DataFrame
carrying the same key columns (including the original input).  Targets are
a ``(moment_name, target)`` DataFrame (plain attribute, not a Param —
DataFrames aren't Param-serializable); when unset, the model calibrates to
the sample's own weighted means scaled by ``targetScale``.
"""

from __future__ import annotations

import os

from pyspark.ml import Estimator, Model
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import (
    DefaultParamsReadable,
    DefaultParamsReader,
    DefaultParamsWritable,
    DefaultParamsWriter,
    MLReadable,
    MLReader,
    MLWritable,
    MLWriter,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class _EBParams(Params):
    weightCol = Param(
        Params._dummy(), "weightCol", "survey weight column",
        typeConverter=TypeConverters.toString,
    )
    numericCols = Param(
        Params._dummy(), "numericCols", "numeric moment columns",
        typeConverter=TypeConverters.toListString,
    )
    onehotCols = Param(
        Params._dummy(), "onehotCols", "categorical one-hot moment columns",
        typeConverter=TypeConverters.toListString,
    )
    groupCols = Param(
        Params._dummy(), "groupCols", "group columns (block-diagonal moments)",
        typeConverter=TypeConverters.toListString,
    )
    rowKeyCols = Param(
        Params._dummy(), "rowKeyCols", "unique row key columns",
        typeConverter=TypeConverters.toListString,
    )
    intercept = Param(
        Params._dummy(), "intercept", "add a constant count moment",
        typeConverter=TypeConverters.toBoolean,
    )
    maxSteps = Param(
        Params._dummy(), "maxSteps", "iteration budget",
        typeConverter=TypeConverters.toInt,
    )
    optimalityTol = Param(
        Params._dummy(), "optimalityTol", "optimality violation tolerance",
        typeConverter=TypeConverters.toFloat,
    )
    lowerBound = Param(
        Params._dummy(), "lowerBound", "ratio lower bound (elastic mode)",
        typeConverter=TypeConverters.toFloat,
    )
    upperBound = Param(
        Params._dummy(), "upperBound", "ratio upper bound (elastic mode)",
        typeConverter=TypeConverters.toFloat,
    )
    targetScale = Param(
        Params._dummy(), "targetScale",
        "scale applied to self-calibrated targets when none are supplied",
        typeConverter=TypeConverters.toFloat,
    )
    outputCol = Param(
        Params._dummy(), "outputCol", "name of the appended weight column",
        typeConverter=TypeConverters.toString,
    )

    def _spec(self):
        from entropy_balance_weighting_spark.plans.moment_spec import MomentSpec

        return MomentSpec(
            weight_col=self.getOrDefault(self.weightCol),
            numeric=tuple(self.getOrDefault(self.numericCols)),
            onehot=tuple(self.getOrDefault(self.onehotCols)),
            group=tuple(self.getOrDefault(self.groupCols)),
            intercept=self.getOrDefault(self.intercept),
            row_key=tuple(self.getOrDefault(self.rowKeyCols)),
        )


class EntropyBalanceEstimator(
    Estimator, _EBParams, DefaultParamsWritable, DefaultParamsReadable
):
    """Fits entropy-balance weights; returns :class:`EntropyBalanceModel`.

    Persistence: ``est.save(path)`` / ``EntropyBalanceEstimator.load(path)``
    round-trips every Param (the targets DataFrame is NOT persisted — call
    ``setTargets`` again after loading, or rely on self-calibration)."""

    def __init__(self, **kwargs) -> None:
        super().__init__()
        self._setDefault(
            numericCols=[],
            onehotCols=[],
            groupCols=[],
            intercept=False,
            maxSteps=100,
            optimalityTol=1e-5,
            targetScale=1.0,
            outputCol="new_weight",
        )
        self._targets: DataFrame | None = None
        bad = set(kwargs) - {p.name for p in self.params}
        if bad:
            raise ValueError(f"unknown params: {sorted(bad)}")
        self._set(**kwargs)
        # rowKeyCols is validated in _fit, not here: the persistence reader
        # constructs a bare instance before restoring params

    def setTargets(self, targets: DataFrame) -> "EntropyBalanceEstimator":
        """``(moment_name, target)`` population targets."""
        self._targets = targets
        return self

    def _fit(self, dataset: DataFrame) -> "EntropyBalanceModel":
        from entropy_balance_weighting_spark import entropy_balance
        from entropy_balance_weighting_spark.plans.moment_spec import (
            build_problem_tables,
            targets_from_problem,
        )

        if not self.isSet(self.rowKeyCols):
            raise ValueError("rowKeyCols is required (weights join back by key)")
        spec = self._spec()
        pt = build_problem_tables(dataset, spec)
        targets = self._targets
        if targets is None:
            targets = targets_from_problem(
                pt, perturb=self.getOrDefault(self.targetScale) - 1.0
            )
        opts: dict = {
            "max_steps": self.getOrDefault(self.maxSteps),
            "optimality_violation": self.getOrDefault(self.optimalityTol),
        }
        if self.isSet(self.lowerBound) or self.isSet(self.upperBound):
            lb = (
                self.getOrDefault(self.lowerBound)
                if self.isSet(self.lowerBound)
                else 0.0
            )
            ub = (
                self.getOrDefault(self.upperBound)
                if self.isSet(self.upperBound)
                else None
            )
            opts["bounds"] = (lb, ub)
        res = entropy_balance(
            mean_population_moments=targets, x_sample=pt, options=opts
        )
        if not res.converged:
            raise RuntimeError(
                f"entropy balance did not converge: {res.error_message}"
            )
        weights = res.new_weights
        if not isinstance(weights, DataFrame):  # local kernel path
            raise AssertionError("ProblemTables input always yields a DataFrame")
        model = EntropyBalanceModel(
            weights=weights.localCheckpoint(eager=True), results=res
        )
        model._resetUid(self.uid)
        self._copyValues(model)
        return model


class EntropyBalanceSummary:
    """Training summary — the MLlib-idiomatic ``model.summary`` surface
    over :class:`results.EntropyBalanceResults`, exposing what
    ``setup_logging`` prints per iteration as data: the per-iteration
    history (criterion / residual norms / violations), convergence
    outcome, and the elastic L¹ price η for bounded fits."""

    def __init__(self, results) -> None:
        self._results = results

    @property
    def converged(self) -> bool:
        return bool(self._results.converged)

    @property
    def totalIterations(self) -> int:
        return int(self._results.n_iterations)

    @property
    def eta(self):
        """Final elastic L¹ price (None for unbounded/penalty fits)."""
        return self._results.eta

    @property
    def history(self) -> list[dict]:
        """Per-evaluation trace — one entry per optimality evaluation,
        i.e. ``totalIterations + 1`` entries including the starting
        point: dicts with ``iter``, ``criterion``, ``violation``
        (+ solver-specific keys: ``eta``/``mu_s`` elastic, ``min_w``
        unbounded)."""
        return list(self._results.diagnostics.get("history", []))

    @property
    def objectiveHistory(self) -> list[float]:
        """Entropy criterion per iteration (MLlib naming convention)."""
        return [h["criterion"] for h in self.history]

    @property
    def violationHistory(self) -> list[float]:
        """Optimality violation per iteration."""
        return [h["violation"] for h in self.history]

    @property
    def constraintViolations(self):
        return self._results.constraint_violations

    @property
    def errorMessage(self) -> str:
        return self._results.error_message


class EntropyBalanceModel(Model, _EBParams, MLWritable, MLReadable):
    """Transformer: left-joins the fitted weight onto any DataFrame carrying
    the row-key columns (rows unseen at fit time get a null weight).

    Persistence: ``model.save(path)`` writes the Params as MLlib metadata
    plus the fitted ``(row_id, new_weight)`` table as parquet (the same
    layout family as the S2/S3 problem bundle);
    ``EntropyBalanceModel.load(path).transform(df)`` reproduces the
    weights in a fresh session.  The in-memory ``results`` diagnostics are
    fit-time artifacts and are not persisted."""

    def __init__(self, weights: DataFrame | None = None, results=None) -> None:
        super().__init__()
        self.weights = weights  # (row_id, new_weight)
        self.results = results  # full EntropyBalanceResults

    @property
    def hasSummary(self) -> bool:
        """True when fit-time diagnostics are attached (False after
        ``load`` — summaries are fit-time artifacts, not persisted)."""
        return self.results is not None

    @property
    def summary(self) -> EntropyBalanceSummary:
        """Training summary (:class:`EntropyBalanceSummary`); raises on a
        loaded model, mirroring MLlib's ``hasSummary``/``summary``
        convention."""
        if self.results is None:
            raise RuntimeError(
                "No training summary available: this model was loaded from "
                "disk (summaries are fit-time artifacts and are not "
                "persisted); check model.hasSummary first"
            )
        return EntropyBalanceSummary(self.results)

    def _transform(self, dataset: DataFrame) -> DataFrame:
        keys = self.getOrDefault(self.rowKeyCols)
        out_col = self.getOrDefault(self.outputCol)
        keyed = dataset.withColumn("__ebw_row_id", F.xxhash64(*keys))
        w = self.weights.select(
            F.col("row_id").alias("__ebw_row_id"),
            F.col("new_weight").alias(out_col),
        )
        return keyed.join(w, "__ebw_row_id", "left").drop("__ebw_row_id")

    def write(self) -> "MLWriter":
        return _EntropyBalanceModelWriter(self)

    @classmethod
    def read(cls) -> "MLReader":
        return _EntropyBalanceModelReader()


class _EntropyBalanceModelWriter(MLWriter):
    def __init__(self, instance: EntropyBalanceModel) -> None:
        super().__init__()
        self.instance = instance

    def saveImpl(self, path: str) -> None:
        if self.instance.weights is None:
            raise ValueError("model has no fitted weights to save")
        DefaultParamsWriter.saveMetadata(self.instance, path, self.sc)
        mode = "overwrite" if self.shouldOverwrite else "errorifexists"
        self.instance.weights.write.mode(mode).parquet(
            os.path.join(path, "weights")
        )


class _EntropyBalanceModelReader(MLReader):
    def load(self, path: str) -> EntropyBalanceModel:
        metadata = DefaultParamsReader.loadMetadata(path, self.sc)
        weights = self.sparkSession.read.parquet(os.path.join(path, "weights"))
        model = EntropyBalanceModel(weights=weights)
        DefaultParamsReader.getAndSetParams(model, metadata)
        return model
