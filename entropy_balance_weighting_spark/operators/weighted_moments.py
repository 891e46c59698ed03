"""Weighted-moment aggregation operators (SURVEY §2.4: A1, A2, A9, A10).

These are the distributed renderings of the reference's numerical
primitives:

- A1 ``X^T w`` — weighted moment totals, an N→K reduction
  (ref: ebw_routines.py:211,266-267).
- A2 ``X λ`` — broadcast mat-vec, a K→N map (ref: ebw_routines.py:212).
- A9 grand totals / weighted means (ref: ebw_routines.py:180,
  pums_example.py:244-247).
- A10 grouped weighted totals — the composite ``(group, var)`` moment key
  that replaces the reference's block-diagonal stacking
  (ref: pums_example.py:226-231,289-296).

All N→K reductions are algebraic sums, so Spark's partial (map-side) →
shuffle → final aggregation applies natively; the shuffle moves only K rows
per upstream partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weighted_moment_totals(
    x_long: DataFrame,
    weights: DataFrame,
    *,
    weight_col: str = "w0",
) -> DataFrame:
    """A1: ``X^T w`` over the long encoding — one output row per moment.

    ``x_long`` is ``(row_id, moment_id, value)``; ``weights`` is
    ``(row_id, <weight_col>)``.  Co-partition both by ``row_id`` upstream
    (or keep weights packed into the x table) to make the join shuffle-free;
    the group-by then shuffles only K partial sums per partition.
    """
    joined = x_long.join(weights.select("row_id", weight_col), "row_id")
    return joined.groupBy("moment_id").agg(
        F.sum(F.col("value") * F.col(weight_col)).alias("total"),
        F.count(F.lit(1)).alias("nnz"),
    )


def broadcast_matvec(x_long: DataFrame, lam: DataFrame) -> DataFrame:
    """A2: ``X λ`` — join long X with a tiny broadcast λ table, reduce to rows.

    ``lam`` is ``(moment_id, lam)`` with K rows (driver-scale), so the join
    is a broadcast-hash join — no shuffle of X; the row-wise reduce reuses
    X's partitioning by ``row_id``.
    """
    return (
        x_long.join(F.broadcast(lam), "moment_id")
        .groupBy("row_id")
        .agg(F.sum(F.col("value") * F.col("lam")).alias("xlam"))
    )


def weighted_means(
    df: DataFrame,
    value_cols: list[str],
    *,
    weight_col: str,
    group_cols: list[str] | None = None,
    round_digits: int | None = None,
) -> DataFrame:
    """A9/A10: weighted means ``Σ x·w / Σ w`` per group (national when no group).

    This is the exact computation the reference's survey pipeline uses to
    build target moments (ref: pums_example.py:244-247,285-287); grouped form
    is the composite-moment-key rendering of block-diagonal X (A10).
    """
    aggs = [F.sum(F.col(weight_col)).alias("sum_w"), F.count(F.lit(1)).alias("n")]
    for c in value_cols:
        expr = F.sum(F.col(c) * F.col(weight_col)) / F.sum(F.col(weight_col))
        if round_digits is not None:
            expr = F.round(expr, round_digits)
        aggs.append(expr.alias(f"wmean_{c}"))
    grouped = df.groupBy(*group_cols) if group_cols else df.groupBy()
    out = grouped.agg(*aggs)
    if round_digits is not None:
        out = out.withColumn("sum_w", F.round(F.col("sum_w"), round_digits))
    return out


def moment_gap(totals: DataFrame, targets: DataFrame, sum_w0: float) -> DataFrame:
    """J2 + A1 epilogue: ``Ce = X^T w − m·Σw0`` via an explicit K-row equi join.

    Replaces the reference's positional moment alignment
    (ref: pums_example.py:225-247) with a keyed inner join of two K-row
    frames — both tiny, so Catalyst broadcasts.
    """
    return totals.join(targets, "moment_id").withColumn(
        "gap", F.col("total") - F.col("target") * F.lit(sum_w0)
    )
