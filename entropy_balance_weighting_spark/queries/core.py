"""Core solver-shaped queries over the testdata star schema (SURVEY §2).

Each query is the SQL-checkable rendering of one engine operator, expressed
over ``lineitem`` as the households-analogue (FIXTURES.md §5): surrogate
``row_id = (l_orderkey, l_linenumber)``, weight ``w0 = l_quantity``, numeric
moments from price/discount/tax, one-hot moments from ``l_returnflag``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.queries.registry import register
from entropy_balance_weighting_spark.session import load_table


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem")


def lineitem_moments_long(li: DataFrame) -> DataFrame:
    """Long moment table from lineitem: 3 numeric + one-hot returnflag (E10, U1).

    One-hot as long rows — the key sparse-encoding trick: an indicator
    column is just rows ``(row_id, 'ret_'||val, 1.0)``
    (ref: pums_example.py:94 one-hot; SURVEY §2 E10).
    """
    # ONE stack emits numeric and one-hot rows from a single corpus scan —
    # the previous union's one-hot branch re-scanned lineitem (2 scans →
    # 1; r13 optimization, guide §2.4 — stack keys are expressions, so the
    # indicator name rides the same Generate)
    return li.selectExpr(
        "l_quantity AS w0",
        "stack(4, 'extendedprice', l_extendedprice, 'discount', l_discount,"
        " 'tax', l_tax, concat('ret_', l_returnflag), 1.0D)"
        " AS (moment, value)",
    )


@register(
    "a1_weighted_moment_totals",
    survey="A1,A9,E10,U1",
    bench=True,
    oracle="""
WITH long AS (
  SELECT l_quantity AS w0, 'extendedprice' AS moment, l_extendedprice AS value FROM lineitem
  UNION ALL SELECT l_quantity, 'discount', l_discount FROM lineitem
  UNION ALL SELECT l_quantity, 'tax', l_tax FROM lineitem
  UNION ALL SELECT l_quantity, 'ret_' || l_returnflag, 1.0 FROM lineitem
)
SELECT moment, count(*) AS n,
       round(sum(value * w0) / sum(w0), 4) AS wmean
FROM long GROUP BY moment ORDER BY moment
""",
)
def a1_weighted_moment_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (A1): weighted moment means ``X^T w / Σw`` per moment key
    (routed through the reusable :mod:`operators.weighted_moments` layer)."""
    from entropy_balance_weighting_spark.operators.weighted_moments import (
        weighted_means,
    )

    long = lineitem_moments_long(_lineitem(spark, sf_dir))
    return (
        weighted_means(long, ["value"], weight_col="w0", group_cols=["moment"])
        .select("moment", "n", F.round("wmean_value", 4).alias("wmean"))
        .orderBy("moment")
    )


@register(
    "a10_group_moments",
    survey="A10,G1",
    bench=True,
    oracle="""
SELECT l_returnflag AS grp, l_linestatus AS var, count(*) AS n,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wmean_price,
       round(sum(l_discount * l_quantity) / sum(l_quantity), 6) AS wmean_disc
FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY grp, var
""",
)
def a10_group_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: composite ``(group, var)`` moment keys — no block_diag needed.

    The reference builds block-diagonal X via ``partition_by`` + scipy
    ``block_diag`` (ref: pums_example.py:226-231,289-296); in Spark the group
    key simply joins the moment key.
    """
    from entropy_balance_weighting_spark.operators.weighted_moments import (
        weighted_means,
    )

    li = _lineitem(spark, sf_dir).select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_linestatus").alias("var"),
        "l_extendedprice",
        "l_discount",
        "l_quantity",
    )
    return (
        weighted_means(
            li,
            ["l_extendedprice", "l_discount"],
            weight_col="l_quantity",
            group_cols=["grp", "var"],
        )
        .select(
            "grp",
            "var",
            "n",
            F.round("wmean_l_extendedprice", 4).alias("wmean_price"),
            F.round("wmean_l_discount", 6).alias("wmean_disc"),
        )
        .orderBy("grp", "var")
    )


@register(
    "a2_broadcast_matvec",
    survey="A2",
    oracle="""
WITH base AS (
  SELECT md5(concat_ws('|', l_orderkey, l_linenumber, l_partkey, l_suppkey,
             l_quantity, l_extendedprice, l_discount, l_tax)) AS rid,
         l_discount, l_tax, l_returnflag, l_quantity
  FROM lineitem WHERE l_quantity > 0
), long AS (
  SELECT rid, 'l_discount' AS moment_name, l_discount AS value FROM base
  UNION ALL SELECT rid, 'l_tax', l_tax FROM base
  UNION ALL SELECT rid, 'l_returnflag=' || l_returnflag, 1.0 FROM base
), dict AS (
  SELECT moment_name,
         CAST(dense_rank() OVER (ORDER BY moment_name) - 1 AS INT) AS moment_id
  FROM (SELECT DISTINCT moment_name FROM long)
), lam AS (
  SELECT moment_id, 0.1 * (moment_id + 1) AS lam FROM dict
), per_row AS (
  SELECT l.rid, sum(l.value * lam.lam ORDER BY d.moment_id) AS xlam
  FROM long l JOIN dict d USING (moment_name) JOIN lam USING (moment_id)
  GROUP BY l.rid
)
SELECT count(*) AS n,
       round(sum(xlam), 4) AS xlam_sum,
       round(min(xlam), 6) AS xlam_min,
       round(max(xlam), 6) AS xlam_max
FROM per_row
""",
)
def a2_broadcast_matvec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 ``X·λ``: broadcast a K-row multiplier table against the long
    encoding, reduce per row — the K→N map every solver iteration performs
    (routed through :func:`operators.weighted_moments.broadcast_matvec`).
    λ is a fixed deterministic vector (0.1·(id+1)); per-row dots sum ≤3
    terms in id order, so min/max compare exactly."""
    from entropy_balance_weighting_spark.operators.weighted_moments import (
        broadcast_matvec,
    )
    from entropy_balance_weighting_spark.plans import build_problem_tables

    from entropy_balance_weighting_spark.queries.solver import _SPEC

    li = load_table(spark, sf_dir, "lineitem")
    pt = build_problem_tables(li, _SPEC)
    lam = pt.moments.select(
        "moment_id", (0.1 * (F.col("moment_id") + 1)).alias("lam")
    )
    xlam = broadcast_matvec(pt.x_long, lam)
    return xlam.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("xlam"), 4).alias("xlam_sum"),
        F.round(F.min("xlam"), 6).alias("xlam_min"),
        F.round(F.max("xlam"), 6).alias("xlam_max"),
    )


@register(
    "j1_broadcast_dim_join",
    survey="J1",
    bench=True,
    oracle="""
SELECT r.r_name AS region, count(*) AS n_customers,
       round(avg(c.c_acctbal), 4) AS avg_acctbal,
       round(min(c.c_acctbal), 4) AS min_acctbal,
       round(max(c.c_acctbal), 4) AS max_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name ORDER BY region
""",
)
def j1_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: dim-table lookup as an explicit broadcast-hash join chain.

    Mirrors the reference's state-code lookup (ref: pums_example.py:148-152);
    ``nation``/``region`` are tiny, so both joins broadcast — no shuffle of
    the fact side.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
            F.round(F.min("c_acctbal"), 4).alias("min_acctbal"),
            F.round(F.max("c_acctbal"), 4).alias("max_acctbal"),
        )
        .orderBy("region")
    )


@register(
    "w1_window_weight_share",
    survey="W1,T1,T2",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag,
       round(l_quantity / sum(l_quantity) OVER (PARTITION BY l_returnflag), 9)
         AS share
FROM lineitem
ORDER BY share DESC, l_orderkey, l_linenumber
LIMIT 10
""",
)
def w1_window_weight_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: per-group weight share via a window total, top-10 rows (T2).

    The only window in the reference: ``WGTP.sum().over(STATE)`` used for
    within-group weight normalization (ref: pums_example.py:277-281).
    """
    li = _lineitem(spark, sf_dir)
    w = Window.partitionBy("l_returnflag")
    return (
        li.withColumn(
            "share", F.round(F.col("l_quantity") / F.sum("l_quantity").over(w), 9)
        )
        .select("l_orderkey", "l_linenumber", "l_returnflag", "share")
        .orderBy(F.desc("share"), "l_orderkey", "l_linenumber")
        .limit(10)
    )


@register(
    "v1_validation_scan",
    survey="V1,V2,A11",
    oracle="""
SELECT count(*) AS n_rows,
       count(*) FILTER (WHERE l_discount <= 0) AS n_nonpos,
       count(*) FILTER (WHERE l_quantity IS NULL) AS n_null_w,
       count(*) FILTER (WHERE isnan(l_extendedprice)
                        OR l_extendedprice = 'Infinity'::DOUBLE
                        OR l_extendedprice = '-Infinity'::DOUBLE) AS n_bad
FROM lineitem
""",
)
def v1_validation_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1: the NaN/Inf/positivity input guard as one counting scan.

    Same predicate set as the reference's ``inputs_are_invalid``
    (ref: shared.py:105-133) — all exact integer outputs.
    """
    li = _lineitem(spark, sf_dir)
    bad = (
        F.isnan("l_extendedprice")
        | (F.col("l_extendedprice") == float("inf"))
        | (F.col("l_extendedprice") == float("-inf"))
    )
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("l_discount") <= 0).alias("n_nonpos"),
        F.count_if(F.col("l_quantity").isNull()).alias("n_null_w"),
        F.count_if(bad).alias("n_bad"),
    )


@register(
    "a6_fraction_to_boundary",
    survey="A6,V7",
    oracle="""
SELECT round(least(1.0, coalesce(
         min(-0.995 * l_quantity / (25.0 - l_quantity))
           FILTER (WHERE 25.0 - l_quantity < 0), 1.0)), 9) AS alpha,
       count(*) FILTER (WHERE 25.0 - l_quantity < 0) AS n_blocking
FROM lineitem
""",
)
def a6_fraction_to_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: fraction-to-boundary step length — a filtered-min reduce.

    ``min(−τ·point/step over step<0)`` clamped to 1.0 with τ=0.995
    (ref: shared.py:76-91, default ``initial=inf`` → coalesce 1.0); the
    synthetic step ``25 − quantity`` makes some steps negative.
    """
    li = _lineitem(spark, sf_dir)
    step = F.lit(25.0) - F.col("l_quantity")
    blocking = step < 0
    return li.agg(
        F.round(
            F.least(
                F.lit(1.0),
                F.coalesce(
                    F.min(F.when(blocking, -0.995 * F.col("l_quantity") / step)),
                    F.lit(1.0),
                ),
            ),
            9,
        ).alias("alpha"),
        F.count_if(blocking).alias("n_blocking"),
    )


@register(
    "a4_entropy_criterion",
    survey="A4,E1,E12",
    oracle="""
WITH r AS (SELECT l_quantity AS w0, (l_discount + 0.5) / 0.55 AS ratio FROM lineitem)
SELECT round(sum(w0 * (ratio * ln(ratio) - ratio + 1)), 6) AS criterion,
       count(*) AS n
FROM r
""",
)
def a4_entropy_criterion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/E1: the entropy objective ``Σ w0·(r·ln r − r + 1)`` as one fused scan.

    The reference fuses this elementwise kernel with numexpr
    (ref: ebw_routines.py:210); in Spark the whole expression sits inside one
    whole-stage-codegen projection + partial sum.
    """
    li = _lineitem(spark, sf_dir)
    ratio = (F.col("l_discount") + 0.5) / 0.55
    term = F.col("l_quantity") * (ratio * F.log(ratio) - ratio + 1)
    return li.agg(
        F.round(F.sum(term), 6).alias("criterion"), F.count(F.lit(1)).alias("n")
    )


@register(
    "a12_weight_correlation",
    survey="A12,A5",
    oracle="""
SELECT round(corr(l_quantity, l_extendedprice), 8) AS corr_qty_price,
       round(sqrt(sum(l_discount * l_discount)), 6) AS l2_discount,
       count(*) AS n
FROM lineitem
""",
)
def a12_weight_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12/A5: diagnostic correlation + L² norm reduces.

    Mirrors ``np.corrcoef(new_weights, weights0)``
    (ref: pums_example.py:257-258) and the residual-norm aggregates
    (ref: shared.py:66-73).
    """
    li = _lineitem(spark, sf_dir)
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 8).alias("corr_qty_price"),
        F.round(F.sqrt(F.sum(F.col("l_discount") * F.col("l_discount"))), 6).alias(
            "l2_discount"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "t2_largest_miss",
    survey="T2,A8,A10",
    oracle="""
WITH grp AS (
  SELECT l_returnflag AS grp,
         sum(l_extendedprice * l_quantity) / sum(l_quantity) AS grp_mean
  FROM lineitem GROUP BY l_returnflag
), nat AS (
  SELECT sum(l_extendedprice * l_quantity) / sum(l_quantity) AS nat_mean
  FROM lineitem
)
SELECT grp, round(abs(grp_mean - nat_mean), 4) AS abs_miss
FROM grp, nat
ORDER BY abs_miss DESC, grp LIMIT 1
""",
)
def t2_largest_miss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2/A8: argmax-|gap| diagnostic — 'which moment missed worst'.

    The reference reports the largest miss via argmax over |Ce|
    (ref: ebw_penalty.py:233-236); relationally it is ORDER BY ABS DESC
    LIMIT 1 over the K-row gap frame.
    """
    li = _lineitem(spark, sf_dir)
    # one corpus scan: the national mean re-derives from the K-row group
    # partials (Σ of per-group weighted sums) instead of a second full
    # aggregate over lineitem (r13 optimization, guide §2.4; float order
    # inside a Spark sum is partition-arbitrary either way)
    grp = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("__s"),
        F.sum("l_quantity").alias("__w"),
    ).persist()
    nat = grp.agg((F.sum("__s") / F.sum("__w")).alias("nat_mean"))
    grp = grp.select(
        "grp", (F.col("__s") / F.col("__w")).alias("grp_mean")
    )
    return (
        grp.crossJoin(F.broadcast(nat))
        .select(
            "grp", F.round(F.abs(F.col("grp_mean") - F.col("nat_mean")), 4).alias("abs_miss")
        )
        .orderBy(F.desc("abs_miss"), "grp")
        .limit(1)
    )
