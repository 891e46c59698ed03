"""SQL-checkable queries exercising the data layer (MomentSpec builder).

These run the REAL builder (``build_problem_tables``) and aggregate its
output so the result is row-id-free (row ids are engine-internal hashes);
the DuckDB oracle reconstructs the same long encoding in plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.plans import MomentSpec, build_problem_tables
from entropy_balance_weighting_spark.queries.registry import register
from entropy_balance_weighting_spark.session import load_table


@register(
    "m1_problem_table_stats",
    survey="E10,V2,V3,V5,V6,A1,U1,G1",
    bench=True,
    oracle="""
WITH long AS (
  SELECT 'l_extendedprice' AS moment_name, l_extendedprice AS value, l_quantity AS w0
  FROM lineitem WHERE l_quantity > 0
  UNION ALL SELECT 'l_discount', l_discount, l_quantity FROM lineitem WHERE l_quantity > 0
  UNION ALL SELECT '_count', 1.0, l_quantity FROM lineitem WHERE l_quantity > 0
  UNION ALL SELECT 'l_returnflag=' || l_returnflag, 1.0, l_quantity FROM lineitem WHERE l_quantity > 0
  UNION ALL SELECT 'l_linestatus=' || l_linestatus, 1.0, l_quantity FROM lineitem WHERE l_quantity > 0
), dict AS (
  SELECT moment_name, CAST(dense_rank() OVER (ORDER BY moment_name) - 1 AS INT) AS moment_id
  FROM (SELECT DISTINCT moment_name FROM long)
)
SELECT d.moment_id, l.moment_name, count(*) AS nnz,
       round(sum(l.value * l.w0) / sum(l.w0), 4) AS wmean
FROM long l JOIN dict d USING (moment_name)
GROUP BY d.moment_id, l.moment_name
ORDER BY d.moment_id
""",
)
def m1_problem_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data layer end-to-end: lineitem → (x_long, w0, moments) → per-moment stats.

    Exercises projection (V4), double casts (V5), the positive-weight filter
    (V2), null drop (V3), intercept moment (V6), one-hot-as-long-rows (E10),
    the union assembly (U1) and the broadcast moment-dictionary join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    spec = MomentSpec(
        weight_col="l_quantity",
        numeric=("l_extendedprice", "l_discount"),
        onehot=("l_returnflag", "l_linestatus"),
        intercept=True,
        # no unique natural key in the synthetic lineitem — use the default
        # shuffle-free monotonic id (safe: rows are checkpointed before fan-out)
    )
    pt = build_problem_tables(li, spec)
    # weight travels inline with the long table — per-moment weighted stats
    # need only the broadcast dictionary join, no row_id re-join shuffle
    joined = pt.x_long_w0.join(F.broadcast(pt.moments), "moment_id")
    return (
        joined.groupBy("moment_id", "moment_name")
        .agg(
            F.count(F.lit(1)).alias("nnz"),
            F.round(F.sum(F.col("value") * F.col("w0")) / F.sum("w0"), 4).alias(
                "wmean"
            ),
        )
        .orderBy("moment_id")
    )


@register(
    "m1_interaction_moments",
    survey="E10,V5,A1 (interactions)",
    oracle="""
WITH long AS (
  SELECT 'l_extendedprice' AS moment_name, l_extendedprice AS value, l_quantity AS w0
  FROM lineitem WHERE l_quantity > 0
  UNION ALL SELECT 'l_returnflag=' || l_returnflag, 1.0, l_quantity
  FROM lineitem WHERE l_quantity > 0
  UNION ALL SELECT 'l_extendedprice:l_returnflag=' || l_returnflag, l_extendedprice, l_quantity
  FROM lineitem WHERE l_quantity > 0
  UNION ALL SELECT 'l_discount:l_tax', l_discount * l_tax, l_quantity
  FROM lineitem WHERE l_quantity > 0
)
SELECT moment_name, count(*) AS nnz,
       round(sum(value * w0) / sum(w0), 6) AS wmean
FROM long GROUP BY moment_name ORDER BY moment_name
""",
)
def m1_interaction_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interaction (cross-term) moments — the R-formula ``a:b`` the
    reference's collinearity tests build via ``formulaic.model_matrix``
    (ref: test_colinear.py:66-78): numeric×one-hot per-category copies and
    a numeric×numeric product, encoded as long rows by the data layer."""
    li = load_table(spark, sf_dir, "lineitem")
    spec = MomentSpec(
        weight_col="l_quantity",
        numeric=("l_extendedprice",),
        onehot=("l_returnflag",),
        interactions=(
            ("l_extendedprice", "l_returnflag"),
            ("l_discount", "l_tax"),
        ),
    )
    pt = build_problem_tables(li, spec)
    joined = pt.x_long_w0.join(F.broadcast(pt.moments), "moment_id")
    return (
        joined.groupBy("moment_name")
        .agg(
            F.count(F.lit(1)).alias("nnz"),
            F.round(F.sum(F.col("value") * F.col("w0")) / F.sum("w0"), 6).alias(
                "wmean"
            ),
        )
        .orderBy("moment_name")
    )


@register(
    "m1_group_block_moments",
    survey="A10,W1,G1,V2",
    oracle="""
WITH base AS (
  SELECT l_returnflag,
         l_quantity / sum(l_quantity) OVER (PARTITION BY l_returnflag) AS w0,
         l_extendedprice
  FROM lineitem WHERE l_quantity > 0
)
SELECT 'grp=' || l_returnflag || '|extendedprice' AS moment_name,
       count(*) AS nnz,
       round(sum(w0), 6) AS sum_w,
       round(sum(l_extendedprice * w0) / sum(w0), 4) AS wmean
FROM base GROUP BY l_returnflag ORDER BY moment_name
""",
)
def m1_group_block_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-diagonal ("group-specific") moments with window-normalized weights.

    The composite `(group, var)` moment key replaces the reference's
    ``partition_by`` + ``block_diag`` construction (ref:
    pums_example.py:226-231,289-296), and the within-group weight
    normalization is W1's window total (ref: pums_example.py:277-281).
    Each group's normalized weights must sum to exactly 1.
    """
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_extendedprice", "extendedprice"
    )
    spec = MomentSpec(
        weight_col="l_quantity",
        numeric=("extendedprice",),
        group=("l_returnflag",),
        normalize_weights_within_group=True,
        # no unique natural key in the synthetic lineitem — use the default
        # shuffle-free monotonic id (safe: rows are checkpointed before fan-out)
    )
    pt = build_problem_tables(li, spec)
    joined = pt.x_long.join(pt.w0, "row_id").join(
        F.broadcast(pt.moments), "moment_id"
    )
    return (
        joined.groupBy("moment_name")
        .agg(
            F.count(F.lit(1)).alias("nnz"),
            F.round(F.sum("w0"), 6).alias("sum_w"),
            F.round(F.sum(F.col("value") * F.col("w0")) / F.sum("w0"), 4).alias(
                "wmean"
            ),
        )
        .orderBy("moment_name")
    )


@register(
    "m1_feasible_targets",
    survey="A9,J2",
    oracle="""
WITH base AS (
  SELECT l_returnflag, l_quantity FROM lineitem WHERE l_quantity > 0
), tot AS (
  SELECT sum(l_quantity) AS s FROM base
)
SELECT 'l_returnflag=' || l_returnflag AS moment_name,
       round(sum(l_quantity) / (SELECT s FROM tot) * 1.02, 8) AS target
FROM base GROUP BY l_returnflag ORDER BY moment_name
""",
)
def m1_feasible_targets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-moment generation: perturbed weighted means (feasible-ish targets).

    Mirrors the reference-test pattern of deriving targets from the data's
    own weighted means (ref: test_penalty.py:16, pums_example.py:244-247).
    One-hot targets are population shares — the weighted indicator total
    over the GLOBAL weight total — so they sum to (1+perturb), a feasible
    2% total-mass scaling.
    """
    from entropy_balance_weighting_spark.plans.moment_spec import (
        targets_from_weighted_means,
    )

    li = load_table(spark, sf_dir, "lineitem")
    spec = MomentSpec(
        weight_col="l_quantity",
        onehot=("l_returnflag",),
        # no unique natural key in the synthetic lineitem — use the default
        # shuffle-free monotonic id (safe: rows are checkpointed before fan-out)
    )
    t = targets_from_weighted_means(li, spec, perturb=0.02)
    return t.select(
        "moment_name", F.round("target", 8).alias("target")
    ).orderBy("moment_name")
