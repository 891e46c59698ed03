"""A/B: bucketed-table join vs plain parquet shuffle join at sf1 —
the measured payoff of `write_bucketed`'s amortized-shuffle layout
(orders ⋈ lineitem on orderkey, 6M lineitem / 1.5M orders, broadcast
disabled so both variants face the join the layout exists for).

Reports: one-time bucketed write cost, per-join wall for (a) plain
parquet scan + shuffle sort-merge join, (b) catalog-bucketed tables
(zero exchange on the join key), and the break-even join count.
Prints one JSON line.

Usage: python spikes/bucketed_join_ab.py   [SPARK_GRAFT_SF1=.scratch/sf1]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BUCKETS = 32


def main() -> None:
    from pyspark.sql import functions as F

    from entropy_balance_weighting_spark.session import get_spark
    from entropy_balance_weighting_spark.sources.layout import write_bucketed

    sf1 = os.environ.get(
        "SPARK_GRAFT_SF1",
        str(Path(__file__).resolve().parents[1] / ".scratch" / "sf1"),
    )
    spark = get_spark(app_name="bucketed_join_ab")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    orders = spark.read.parquet(os.path.join(sf1, "orders.parquet")).select(
        "o_orderkey", "o_orderpriority"
    )
    li = spark.read.parquet(os.path.join(sf1, "lineitem.parquet")).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )

    def join_agg(o, l):
        return (
            o.join(l, o["o_orderkey"] == l["l_orderkey"])
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("l_extendedprice").alias("s"),
            )
        )

    def timed(df):
        t0 = time.perf_counter()
        rows = df.collect()
        return time.perf_counter() - t0, rows

    # warmup (page cache, codegen) then best-of-3 each
    timed(join_agg(orders, li))
    plain = min(timed(join_agg(orders, li))[0] for _ in range(3))
    plain_plan = (
        join_agg(orders, li)._jdf.queryExecution().executedPlan().toString()
    )

    scratch = os.path.join(os.path.dirname(sf1), "bucket_ab")
    t0 = time.perf_counter()
    write_bucketed(
        orders, "ab_orders", buckets=BUCKETS, bucket_by="o_orderkey",
        sort_by="o_orderkey", path=os.path.join(scratch, "orders"),
    )
    write_bucketed(
        li, "ab_lineitem", buckets=BUCKETS, bucket_by="l_orderkey",
        sort_by="l_orderkey", path=os.path.join(scratch, "lineitem"),
    )
    write_cost = time.perf_counter() - t0

    bo, bl = spark.table("ab_orders"), spark.table("ab_lineitem")
    timed(join_agg(bo, bl))
    bucketed = min(timed(join_agg(bo, bl))[0] for _ in range(3))
    bplan = join_agg(bo, bl)._jdf.queryExecution().executedPlan().toString()

    # sanity: equal results (counts exact; float sums compared at 1e-9
    # RELATIVE tolerance — the two partitionings sum doubles in
    # different orders, a ulp-level difference that is not data loss)
    def canon(rows):
        return {r["o_orderpriority"]: (r["n"], r["s"]) for r in rows}
    ca, cb = canon(join_agg(orders, li).collect()), canon(join_agg(bo, bl).collect())
    results_equal = set(ca) == set(cb) and all(
        ca[k][0] == cb[k][0]
        and abs(ca[k][1] - cb[k][1]) <= 1e-9 * abs(ca[k][1])
        for k in ca
    )
    key_exchanges = [
        ln for ln in bplan.splitlines()
        if "Exchange" in ln and "orderkey" in ln
    ]
    saving = plain - bucketed
    print(json.dumps({
        "metric": "bucketed_join_ab_sf1",
        "buckets": BUCKETS,
        "n_orders": orders.count(),
        "n_lineitem": li.count(),
        "plain_join_s": round(plain, 3),
        "bucketed_join_s": round(bucketed, 3),
        "bucketed_write_cost_s": round(write_cost, 3),
        "join_speedup_x": round(plain / bucketed, 2),
        "breakeven_joins": (
            round(write_cost / saving, 1) if saving > 0 else None
        ),
        "results_equal": results_equal,
        "bucketed_plan_joinkey_exchanges": len(key_exchanges),
        "plain_plan_has_exchange": "Exchange hashpartitioning" in plain_plan,
        "loadavg": list(os.getloadavg()),
    }))
    for t in ("ab_orders", "ab_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.stop()


if __name__ == "__main__":
    main()
