"""End-to-end survey reweighting example — the engine rendering of the
reference's ACS workflow (ref: examples/pums_example.py) over the testdata
star schema, treating ``lineitem`` as the household micro-data.

Run:  python examples/survey_reweighting.py [sf_dir]

Walks every layer a reference user touches:

1. relational prep: scan, broadcast dim join, filters, casts, one-hot;
2. the declarative MomentSpec → canonical problem tables;
3. target generation (population weighted means, here 2%-perturbed);
4. the three solvers: unbounded Newton, bounded elastic interior-point,
   quadratic penalty;
5. diagnostics: moment match, weight-change correlation, largest miss;
6. the MLlib pipeline stage appending the balanced weight column.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
from pyspark.sql import functions as F

from entropy_balance_weighting_spark import (
    entropy_balance,
    entropy_balance_penalty,
)
from entropy_balance_weighting_spark.ml import EntropyBalanceEstimator
from entropy_balance_weighting_spark.plans import MomentSpec, build_problem_tables
from entropy_balance_weighting_spark.plans.moment_spec import targets_from_problem
from entropy_balance_weighting_spark.session import get_spark, load_table


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None) -> dict:
    """Run the walkthrough; pass an existing SparkSession to reuse it (the
    CI test does — see tests/test_example.py), else one is created and
    stopped here.  Returns the headline results so tests can assert on
    them."""
    owns_session = spark is None
    if owns_session:
        spark = get_spark(app_name="survey_reweighting_example")

    # 1. relational prep — dim lookup via broadcast join (J1), the
    #    reference's state-code join analogue
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    households = li.join(
        F.broadcast(orders), li.l_orderkey == orders.o_orderkey, "left"
    )

    # 2. declarative moment spec: numeric + one-hot moments, survey weight
    spec = MomentSpec(
        weight_col="l_quantity",
        numeric=("l_discount", "l_tax"),
        onehot=("l_returnflag", "o_orderpriority"),
        intercept=True,
    )
    pt = build_problem_tables(households, spec)
    print(f"problem: n={pt.n} rows, K={pt.k} moments")

    # 3. targets: the population's weighted means, perturbed 2%
    targets = targets_from_problem(pt, perturb=0.02)

    # 4a. unbounded solve
    res = entropy_balance(mean_population_moments=targets, x_sample=pt)
    print(f"unbounded: converged={res.converged} iters={res.n_iterations}")

    # 4b. bounded elastic solve — ratios confined to [0.5, 2.0]
    res_b = entropy_balance(
        mean_population_moments=targets,
        x_sample=pt,
        options={"bounds": (0.5, 2.0)},
    )
    print(
        f"elastic:   converged={res_b.converged} iters={res_b.n_iterations} "
        f"eta={res_b.eta:.1f}"
    )

    # 4c. penalty solve — soft moment matching
    res_p = entropy_balance_penalty(targets, pt, penalty_parameter=5.0)
    print(f"penalty:   converged={res_p.converged} iters={res_p.n_iterations}")

    # 5. diagnostics: the defining postcondition X^T w = m·Σw0, and the
    #    weight-change correlation the reference example reports
    achieved = (
        pt.x_long.join(res.new_weights, "row_id")
        .groupBy("moment_id")
        .agg((F.sum(F.col("value") * F.col("new_weight")) / pt.sum_w0).alias("a"))
        .join(
            targets.join(pt.moments, "moment_name").select("moment_id", "target"),
            "moment_id",
        )
        .select(F.max(F.abs(F.col("a") - F.col("target"))).alias("worst"))
        .first()
    )
    print(f"largest moment miss (weighted-mean scale): {achieved['worst']:.2e}")
    corr = (
        res.new_weights.join(pt.w0, "row_id")
        .agg(F.corr("new_weight", "w0"))
        .first()[0]
    )
    print(f"corr(new_weights, weights0) = {corr:.4f}")
    viol = np.abs(res_b.constraint_violations).max() / pt.sum_w0
    print(f"elastic max violation (weighted-mean scale): {viol:.2e}")

    # 6. the same solve as an MLlib pipeline stage
    keyed = households.withColumn("hh_id", F.monotonically_increasing_id())
    keyed = keyed.localCheckpoint(eager=True)  # freeze the generated key
    est = EntropyBalanceEstimator(
        weightCol="l_quantity",
        numericCols=["l_discount", "l_tax"],
        onehotCols=["l_returnflag"],
        rowKeyCols=["hh_id"],
        targetScale=1.02,
    )
    reweighted = est.fit(keyed).transform(keyed)
    reweighted.select(
        "hh_id", "l_quantity", "new_weight"
    ).show(5, truncate=False)
    n_reweighted = reweighted.filter(F.col("new_weight").isNotNull()).count()

    if owns_session:
        spark.stop()
    return {
        "n": pt.n,
        "k": pt.k,
        "unbounded_converged": bool(res.converged),
        "elastic_converged": bool(res_b.converged),
        "penalty_converged": bool(res_p.converged),
        "worst_moment_miss": float(achieved["worst"]),
        "weight_corr": float(corr),
        "elastic_max_violation": float(viol),
        "n_reweighted": int(n_reweighted),
    }


if __name__ == "__main__":
    main(*sys.argv[1:2])
