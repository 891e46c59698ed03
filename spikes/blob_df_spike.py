"""Spike: cache the packed blobs as a single-binary-column DataFrame
(JVM columnar cache) instead of a Python blob RDD.

Question: the r7 blob-RDD migration was motivated by the DF-cache
re-encode cost — but that cost was measured on the WIDE NESTED schema
(row_id, w0, idx:list, val:list, ...), where Tungsten->Arrow conversion
touches every list element.  A DF holding ONE pre-encoded binary blob
column should re-encode at memcpy speed, which would give:
  pack  = mapInArrow encode + localCheckpoint   (no javaToPython seam,
          no Python-side cache, no pickle)
  pass  = mapInArrow over the blob DF           (unpack + math)
vs the blob-RDD's
  pack  = mapInArrow encode + .rdd pickle seam + Python cache
  pass  = mapPartitions over the Python cache.

Run:  SPARK_GRAFT_SCALE_N=10000000 python spikes/blob_df_spike.py
"""
import os
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from entropy_balance_weighting_spark.kernels.spark import (
    PACKED_NAMES,
    _stats_pass,
    blob_payload_adapter,
    ipc_deser,
    ipc_ser,
)
from entropy_balance_weighting_spark.session import get_spark


def main() -> None:
    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", 10_000_000))
    k = 8
    spark = get_spark(app_name="blob_df_spike")
    n_parts = max(spark.sparkContext.defaultParallelism, n // 250_000)
    base = spark.range(0, n, 1, n_parts).select(
        F.col("id").alias("row_id"),
        (0.5 + F.pmod(F.hash("id"), F.lit(1000)) / 1000.0).alias("w0"),
        F.array(*[F.lit(j) for j in range(k)]).alias("idx"),
        F.array(
            F.lit(1.0),
            *[
                F.pmod(F.hash("id", F.lit(j)), F.lit(1000)) / 1000.0
                for j in range(1, k)
            ],
        ).alias("val"),
    )
    sum_w0 = float(n)  # close enough for a timing spike

    def to_blob(batches):
        for rb in batches:
            if not rb.num_rows:
                continue
            q = rb.column(1).to_numpy(zero_copy_only=False) / sum_w0
            out = pa.RecordBatch.from_arrays(
                [
                    *[rb.column(i) for i in range(4)],
                    pa.array(q, type=pa.float64()),
                    pa.array(q, type=pa.float64()),
                ],
                PACKED_NAMES,
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array([ipc_ser(out)], type=pa.binary())], ["payload"]
            )

    t0 = time.perf_counter()
    blob_df = base.mapInArrow(to_blob, "payload binary").localCheckpoint(
        eager=True
    )
    t_pack = time.perf_counter() - t0
    print(f"pack (blob-DF localCheckpoint): {t_pack:.2f}s", flush=True)

    pass_fn = _stats_pass(k, np.zeros(k), wprog=[("exp", np.zeros(k))])

    def df_pass(batches):
        def inner():
            for rb in batches:
                for blob in rb.column(0).to_pylist():
                    yield ipc_deser(blob)

        yield from pass_fn(inner())

    def run_df_pass():
        rows = blob_df.mapInArrow(df_pass, "sums binary, mins binary").collect()
        assert len(rows) >= 1

    run_df_pass()  # warm
    times = [None] * 3
    for i in range(3):
        t0 = time.perf_counter()
        run_df_pass()
        times[i] = time.perf_counter() - t0
    print(f"stats pass over blob-DF: min {min(times):.2f}s {times}", flush=True)

    # reference: the production blob-RDD pass on the same data
    from pyspark import StorageLevel

    from entropy_balance_weighting_spark.kernels.spark import BLOB_SER

    t0 = time.perf_counter()
    rdd = (
        blob_df.rdd.map(lambda r: bytes(r[0]))
        ._reserialize(BLOB_SER)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rdd.count()
    print(f"extra RDD seam on top: {time.perf_counter() - t0:.2f}s", flush=True)

    def run_rdd_pass():
        rows = rdd.mapPartitions(blob_payload_adapter(pass_fn)).collect()
        assert len(rows) >= 1

    run_rdd_pass()
    times = [None] * 3
    for i in range(3):
        t0 = time.perf_counter()
        run_rdd_pass()
        times[i] = time.perf_counter() - t0
    print(f"stats pass over blob-RDD: min {min(times):.2f}s {times}", flush=True)


if __name__ == "__main__":
    main()
