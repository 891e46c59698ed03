"""Distributed exact global ranking (functions/ranking.py): equality
with the single-partition window across random data/partitionings,
plan shape (no single-partition global sort), empty input."""

from __future__ import annotations

import random

from pyspark.sql import Window, functions as F

from entropy_balance_weighting_spark.functions.ranking import global_rank


def test_global_rank_matches_window_row_number(spark):
    rng = random.Random(17)
    rows = [
        (i, round(rng.uniform(0, 3), 3), rng.randrange(5))
        for i in range(500)
    ]
    for parts in (1, 3, 11):
        df = spark.createDataFrame(
            rows, "id long, score double, grp long"
        ).repartition(parts)
        got = {
            r["id"]: r["rank"]
            for r in global_rank(
                df, order_by=("score", "id"), n_partitions=4
            ).collect()
        }
        w = Window.orderBy("score", "id")
        want = {
            r["id"]: r["rk"]
            for r in df.withColumn("rk", F.row_number().over(w)).collect()
        }
        assert got == want, parts


def test_global_rank_no_single_partition_sort(spark):
    """The point of the operator: the executed plan must contain a
    range repartitioning, and no global (single-partition) Sort — the
    shape a bare ORDER-BY window would produce."""
    df = spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, s double")
    out = global_rank(df, order_by=("s", "id"), n_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower(), plan[:1500]
    assert "Window" not in plan, plan[:1500]


def test_global_rank_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "id long, s double")
    assert global_rank(empty, order_by=("s", "id")).count() == 0
    one = spark.createDataFrame([(7, 1.0)], "id long, s double")
    rows = global_rank(one, order_by=("s", "id")).collect()
    assert [(r["id"], r["rank"]) for r in rows] == [(7, 1)]


def test_global_rank_ranks_are_a_permutation(spark):
    df = spark.createDataFrame(
        [(i, float(i % 13)) for i in range(200)], "id long, s double"
    ).repartition(7)
    ranks = [
        r["rank"]
        for r in global_rank(df, order_by=("s", "id"), n_partitions=5).collect()
    ]
    assert sorted(ranks) == list(range(1, 201))
