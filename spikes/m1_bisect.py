"""Bisect the m1_problem_table_stats 32-core regression (r13 verdict item 1).

Runs m1 isolated with the noop-style bench action (persist+count+collect,
exactly the bench's timed region) under variants toggled by monkeypatch:

- base    : HEAD code path
- eager   : localCheckpoint(eager=True) instead of lazy
- nospread: skip the prepared-rows repartition spread
- nockpt  : no localCheckpoint at all (diagnostic only; ids unsafe)
- globagg : r12-style single global agg + collect_set combos instead of the
            combo-grouped aggregate (targets fast path unused by m1)

Usage: SPARK_GRAFT_CPUS=32 python spikes/m1_bisect.py [reps] [variants...]
Prints per-rep wall seconds and the per-variant min/median.
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from entropy_balance_weighting_spark.plans import moment_spec as ms  # noqa: E402
from entropy_balance_weighting_spark.queries import QUERIES  # noqa: E402
from entropy_balance_weighting_spark.session import get_spark  # noqa: E402

ORIG_CKPT = DataFrame.localCheckpoint
ORIG_REPART = DataFrame.repartition
ORIG_BUILD = ms.build_problem_tables


def build_globagg(df, spec):
    """r12-style counts: ONE global aggregate with collect_set combos, no
    per-combo weighted sums (m1 never reads pt.weighted_sums)."""
    rows = ms.prepared_rows(df, spec)
    ctx = df.sparkSession.sparkContext
    target = ctx.defaultParallelism
    if rows.rdd.getNumPartitions() < max(2, target // 2):
        rows = rows.repartition(target)
    rows = rows.localCheckpoint(eager=False)
    combo_cols = [*spec.group, *spec.onehot]
    agg_exprs = [F.count(F.lit(1)).alias("n"), F.sum("w0").alias("s")]
    if combo_cols:
        agg_exprs.append(
            F.collect_set(
                F.struct(*[F.col(c).cast("string").alias(c) for c in combo_cols])
            ).alias("combos")
        )
    counts = rows.agg(*agg_exprs).first()
    n = int(counts["n"])
    sum_w0 = float(counts["s"]) if counts["s"] is not None else None
    combos = [r.asDict() for r in counts["combos"]] if combo_cols else []

    long = ms.long_moments(rows, spec)
    names = ms._moment_names(spec, combos)
    spark = df.sparkSession
    from pyspark.sql import types as T

    moments = spark.createDataFrame(
        spark.sparkContext.parallelize(list(enumerate(names)), 1),
        T.StructType(
            [
                T.StructField("moment_id", T.IntegerType(), False),
                T.StructField("moment_name", T.StringType(), False),
            ]
        ),
    )
    x_long_w0 = long.join(F.broadcast(moments), "moment_name").select(
        "row_id", "moment_id", "value", "w0"
    )
    return ms.ProblemTables(
        x_long=x_long_w0.select("row_id", "moment_id", "value"),
        w0=rows.select("row_id", "w0"),
        moments=moments,
        moment_names=names,
        n=n,
        sum_w0=sum_w0,
        x_long_w0=x_long_w0,
    )


def apply_variant(variant: str, spark=None) -> None:
    DataFrame.localCheckpoint = ORIG_CKPT
    DataFrame.repartition = ORIG_REPART
    ms.build_problem_tables = ORIG_BUILD
    if spark is not None:
        spark.conf.unset("spark.ebw.spreadPartitionBytes")
    if variant == "eager":
        DataFrame.localCheckpoint = lambda self, eager=True: ORIG_CKPT(self, True)
    elif variant == "nockpt":
        DataFrame.localCheckpoint = lambda self, eager=True: self
    elif variant == "nospread":
        DataFrame.repartition = (
            lambda self, *a, **k: self
        )  # m1 path uses it only for the spread
    elif variant == "fullwidth":
        # r13 behavior: spread to defaultParallelism (conf <= 0 disables
        # the size-derived width)
        if spark is not None:
            spark.conf.set("spark.ebw.spreadPartitionBytes", "0")
    elif variant == "globagg":
        ms.build_problem_tables = build_globagg
    elif variant != "base":
        raise SystemExit(f"unknown variant {variant}")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    variants = sys.argv[2:] or ["base", "eager", "nospread", "nockpt", "globagg"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="m1_bisect")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    q = QUERIES["m1_problem_table_stats"]

    def timed_run():
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        df.persist()
        try:
            df.count()
            df.collect()
        finally:
            df.unpersist()
        return time.perf_counter() - t0

    # warmup at the small SF, like the bench
    apply_variant("base")
    q.fn(spark, "/root/testdata/sf0.001").count()

    # INTERLEAVED round-robin so box drift hits every variant equally
    results = {v: [] for v in variants}
    for _rep in range(reps):
        for v in variants:
            apply_variant(v, spark)
            spark.sparkContext.setJobDescription(f"m1:{v}")
            results[v].append(timed_run())
    for v, times in results.items():
        print(
            f"{v:9s} min={min(times):6.3f} med={statistics.median(times):6.3f} "
            f"all={[round(t, 2) for t in times]}",
            flush=True,
        )
    apply_variant("base", spark)
    spark.stop()


if __name__ == "__main__":
    main()
