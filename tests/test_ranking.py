"""Distributed exact global ranking (functions/ranking.py): equality
with the single-partition window across random data/partitionings,
plan shape (no single-partition global sort), empty input."""

from __future__ import annotations

import random

from pyspark.sql import Window, functions as F

from entropy_balance_weighting_spark.functions.ranking import (
    global_rank,
    ranged_slice,
)


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
    """The point of the operator: the ranked slice must be produced by
    a range repartitioning (pinned on the pre-persist slice, since the
    outer plan reads it through an InMemoryTableScan), and the outer
    plan must contain no Window — the shape a bare ORDER-BY window
    would produce — and must read the persisted slice (the r12→r13
    determinism fix: one materialized boundary placement for both the
    counts job and the assignment job)."""
    df = spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, s double")
    slice_plan = (
        ranged_slice(df, ("s", "id"), 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in slice_plan.lower(), slice_plan[:1500]
    out = global_rank(df, order_by=("s", "id"), n_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan[:1500]
    assert "InMemoryTableScan" in plan, plan[:1500]


def test_global_rank_permutation_at_sampling_scale(spark):
    """r12 ADVICE repro: at ~200k rows the RangePartitioner's
    per-action resample moved boundaries between the counts job and
    the assignment job, yielding duplicate/missing ranks.  With the
    ranged slice persisted, ranks must be an exact permutation of
    1..N (checked distributively — no 200k-row driver collect)."""
    n = 200_000
    df = spark.range(n).select(
        F.col("id"),
        (F.pmod(F.hash("id"), F.lit(100_000)) / 7.0).alias("s"),
    )
    out = global_rank(df, order_by=("s", "id"), n_partitions=16)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("rank").alias("d"),
        F.min("rank").alias("lo"),
        F.max("rank").alias("hi"),
    ).collect()[0]
    assert (agg["n"], agg["d"], agg["lo"], agg["hi"]) == (n, n, 1, n)


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
