"""Logical-plan layer: moment specifications → canonical problem tables."""

from entropy_balance_weighting_spark.plans.moment_spec import (
    MomentSpec,
    ProblemTables,
    build_problem_tables,
    targets_from_problem,
    targets_from_weighted_means,
    vector_to_problem_tables,
)

__all__ = [
    "MomentSpec",
    "ProblemTables",
    "build_problem_tables",
    "targets_from_problem",
    "targets_from_weighted_means",
    "vector_to_problem_tables",
]
