"""Distributed EXACT global ranking — the scalable rendering of
``row_number() OVER (ORDER BY …)``.

A bare global-order window collapses the whole dataset into ONE
partition to rank it (Spark plans a single-partition sort): correct,
and a scale-killer at 100 TB.  This module uses the classic
two-pass range-partition pattern instead:

1. ``repartitionByRange(order_by)`` + ``sortWithinPartitions`` — every
   partition holds a contiguous, internally-sorted slice of the global
   order (P-way parallel sort);
2. a scalar job counts rows per partition (P numbers to the driver —
   the only driver inflow);
3. one Arrow map stage adds ``offset[pid] + local_index + 1`` — the
   exact global rank, no global shuffle of ranked rows anywhere.

The ranked relation is evaluated twice (once for counts, once for
assignment) — the same trade ``zipWithIndex`` makes; persist the input
upstream if recomputation is expensive.  Ranks are EXACT and
deterministic provided ``order_by`` is a total order (give it a unique
tiebreaker column, same discipline as every ORDER BY in this engine);
they do not depend on where the range sampler places partition
boundaries.

Reference parity: /root/reference sorts single-node (polars); this is
§7.5 extension surface for the curriculum-ordering / exact-percentile
shapes a training pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def global_rank(
    df: DataFrame,
    *,
    order_by: tuple[str, ...],
    rank_col: str = "rank",
    n_partitions: int | None = None,
) -> DataFrame:
    """Append 1-based exact global ``row_number`` rank under
    ``order_by`` (ascending, lexicographic) — see module docstring for
    the plan shape.  ``order_by`` must be a total order (include a
    unique tiebreaker)."""
    import pandas as pd

    spark = df.sparkSession
    p = int(
        n_partitions
        or spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    cols = [F.col(c) for c in order_by]
    ranged = df.repartitionByRange(p, *cols).sortWithinPartitions(*cols)

    sizes = {
        r["pid"]: r["n"]
        for r in ranged.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(max(sizes, default=-1) + 1):
        offsets[pid] = acc
        acc += sizes.get(pid, 0)
    bc = spark.sparkContext.broadcast(offsets)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{out_schema}, {rank_col} long"

    def assign(batches):
        taken = 0
        pid = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pid is None:
                pid = int(pdf["__pid"].iloc[0])
            base = bc.value.get(pid, 0) + taken
            pdf = pdf.drop(columns="__pid")
            pdf[rank_col] = pd.RangeIndex(base + 1, base + 1 + len(pdf))
            taken += len(pdf)
            yield pdf

    return ranged.withColumn("__pid", F.spark_partition_id()).mapInPandas(
        assign, out_schema
    )
