"""Storage-layout management: partitioned and bucketed parquet sinks.

At 100 TB the table LAYOUT is the query plan's first operator:

- **Hive-partitioned** writes (``partitionBy``) give partition PRUNING —
  a filter on the partition column skips whole directories at file-listing
  time (visible as ``PartitionFilters`` in the scan node, before any I/O).
- **Bucketed** writes (``bucketBy`` + ``saveAsTable``) pre-shuffle a table
  ONCE by its join/agg key; any later equi-join or groupBy on that key
  between same-bucketed tables runs with ZERO exchange — the shuffle is
  amortized across every downstream query.
- The ``repartition(partition_cols)`` before a partitioned write bounds
  the small-file explosion: without it every task writes a file into
  every partition directory (tasks × partitions files); with it each
  partition's rows land in one task (plus AQE coalescing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...],
    *,
    mode: str = "overwrite",
    coalesce_per_partition: bool = True,
) -> None:
    """Hive-style partitioned parquet write with small-file control."""
    out = df.repartition(*partition_by) if coalesce_per_partition else df
    out.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    buckets: int,
    bucket_by: str,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table (catalog-registered — bucketing metadata
    lives in the table catalog, not the files).  Join/groupBy on
    ``bucket_by`` between tables bucketed the same way is exchange-free;
    ``sort_by`` additionally removes the sort from sort-merge joins."""
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, bucket_by)
    if sort_by is not None:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)
