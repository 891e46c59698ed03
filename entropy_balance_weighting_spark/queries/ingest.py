"""Ingest-path queries (S4): CSV scan + vertical concat — the reference's
actual examples ingest multiple CSV files and stacks them (ref:
pums_example.py:85-87 ``pl.scan_csv`` + ``pl.concat(how='vertical')``).

The engine side materializes a two-file CSV copy of the ``nation`` table
under the repo-local scratch dir, reads it back with ``spark.read.csv``
(header + explicit schema — schema inference is a full extra pass at
100 TB, so production paths always declare schemas), stacks with
``unionByName``, and aggregates; the oracle computes the same aggregate
from the original parquet.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.queries.registry import register
from entropy_balance_weighting_spark.session import load_table

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".scratch")


@register(
    "s4_csv_union_scan",
    survey="S4,U1,V5",
    oracle="""
SELECT n_regionkey, count(*) AS n_nations,
       CAST(sum(n_nationkey) AS BIGINT) AS key_sum
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
""",
)
def s4_csv_union_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source + vertical concat: split nation into two CSV files, read
    both with an explicit schema, ``unionByName``, aggregate."""
    nation = load_table(spark, sf_dir, "nation")
    scratch = os.path.join(_SCRATCH, "s4_csv")
    shutil.rmtree(scratch, ignore_errors=True)
    half_a = nation.filter(F.col("n_nationkey") % 2 == 0)
    half_b = nation.filter(F.col("n_nationkey") % 2 == 1)
    pa, pb = os.path.join(scratch, "a"), os.path.join(scratch, "b")
    half_a.write.mode("overwrite").option("header", True).csv(pa)
    half_b.write.mode("overwrite").option("header", True).csv(pb)
    schema = nation.schema
    df_a = spark.read.csv(pa, header=True, schema=schema)
    df_b = spark.read.csv(pb, header=True, schema=schema)
    stacked = df_a.unionByName(df_b)
    return (
        stacked.groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.sum("n_nationkey").alias("key_sum"),
        )
        .orderBy("n_regionkey")
    )


@register(
    "e9_string_prep",
    survey="E9,V4",
    oracle="""
SELECT substr(p_name, 1, strpos(p_name, ' ') - 1) AS adjective,
       count(*) AS n,
       CAST(sum(CASE WHEN substr(p_name, strpos(p_name, ' ') + 1) LIKE 'g%'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_g_noun
FROM part
WHERE strpos(p_name, ' ') > 0
GROUP BY adjective ORDER BY adjective
""",
)
def e9_string_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function data prep (E9): prefix tests + substring extraction —
    the reference's label-cleaning pattern (``str.starts_with``/``str.slice``,
    ref: pums_example.py:199-205) as Column expressions.  Splits the
    two-word ``p_name`` into adjective/noun via instr+substr and counts
    g-prefixed nouns per adjective."""
    part = load_table(spark, sf_dir, "part")
    head = F.expr("substr(p_name, 1, instr(p_name, ' ') - 1)")
    tail = F.expr("substr(p_name, instr(p_name, ' ') + 1)")
    return (
        part.filter(F.instr("p_name", " ") > 0)
        .select(
            head.alias("adjective"),
            tail.startswith("g").cast("int").alias("is_g"),
        )
        .groupBy("adjective")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("is_g").alias("n_g_noun"),
        )
        .orderBy("adjective")
    )
