"""Spike (round-7 verdict item #1): can an RDD-zip split-state design beat
the packed single-table elastic kernel's per-iteration commit cost?

PLANS.md §"Elastic per-iteration anatomy" records that at 5M rows the
in-loop iteration costs ~3 s more than the no-commit pass pair because the
lazy commit rewrites the WHOLE packed cache — including the immutable
idx/val CSR columns (most of the bytes).  DataFrames cannot narrow-zip two
co-partitioned caches (the align is a join = a shuffle per iteration), but
the RDD API can: `rdd.zip(other)` is a narrow partition-wise pairing that
requires equal partition counts and per-partition element counts — which
holds by construction when the state RDD is derived 1:1 from the base RDD.

Design under test (path B):
  - base RDD: one element per Arrow batch, the IPC-serialized immutable
    columns (row_id, w0, idx, val); cached ONCE, never rewritten.
  - state RDD: IPC-serialized batches of the 5 mutable doubles
    (ratio, s_lo, s_hi, lm_lo, lm_hi), cached per commit (~40 B/row vs
    ~150 B/row for the full packed rows at K=8).
  - passes: base.zip(state).mapPartitions(fn) where fn reassembles the
    combined Arrow batch ZERO-COPY (same buffers, new RecordBatch) and
    calls the EXACT SAME _estats/_estep/_steps math as the production
    kernel, so the measured delta is pure data-plane cost.
  - commit: base.zip(state).mapPartitions(commit_fn) -> new state RDD,
    persisted lazily (materialized by the next stats pass) — the same
    2-jobs-per-iteration discipline as the production kernel.

Usage: SPARK_GRAFT_SPIKE_N=5000000 python spikes/zip_state_spike.py
Prints one JSON line with per-iteration wall for both paths.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark import StorageLevel
from pyspark.serializers import BatchedSerializer, CPickleSerializer
from pyspark.sql import functions as F

# Both zip sides must carry the IDENTICAL batched serializer: RDD.zip
# re-serializes BOTH rdds through an extra Python pass per job when the
# batch sizes differ (pyspark/rdd.py zip()), which silently turns every
# cached read into cache-read + re-pickle.  Pin batch size 1 (each element
# is already a multi-MB Arrow IPC blob) on the persisted form so zip pairs
# the JVM-cached byte streams directly.
_ZIP_SER = BatchedSerializer(CPickleSerializer(), 1)

from entropy_balance_weighting_spark.kernels.elastic_spark import (
    ElasticSparkKernel,
    _estats_pass,
    _estep_pass,
    _pieces,
    _steps_arrays,
)
from entropy_balance_weighting_spark.kernels.spark import _flatten_rb, _rb_col
from entropy_balance_weighting_spark.session import get_spark

BASE_NAMES = ["row_id", "w0", "idx", "val"]
STATE_NAMES = ["ratio", "s_lo", "s_hi", "lm_lo", "lm_hi"]


def ipc_ser(rb: pa.RecordBatch) -> bytes:
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, rb.schema) as w:
        w.write_batch(rb)
    return sink.getvalue().to_pybytes()


def ipc_deser(b: bytes) -> pa.RecordBatch:
    return pa.ipc.open_stream(pa.BufferReader(b)).read_next_batch()


def combine(base_rb: pa.RecordBatch, st_rb: pa.RecordBatch) -> pa.RecordBatch:
    # zero-copy reassembly: same buffers, one RecordBatch the production
    # pass functions can consume unchanged
    return pa.RecordBatch.from_arrays(
        list(base_rb.columns) + list(st_rb.columns), BASE_NAMES + STATE_NAMES
    )


def _combined_iter(pair_iter):
    for bb, sb in pair_iter:
        yield combine(ipc_deser(bytes(bb)), ipc_deser(bytes(sb)))


def make_stats_fn(k, lam, eta, mu_s, lb, ub, has_ub):
    pass_fn = _estats_pass(k, lam, eta, mu_s, lb, ub, has_ub, None)

    def fn(pair_iter):
        for out_rb in pass_fn(_combined_iter(pair_iter)):
            yield (
                out_rb.column(0).to_pylist()[0],
                out_rb.column(1).to_pylist()[0],
            )

    return fn


def make_step_fn(k, lam, dlam, eta, mu_s, lb, ub, has_ub):
    pass_fn = _estep_pass(k, lam, dlam, eta, mu_s, lb, ub, has_ub)

    def fn(pair_iter):
        for out_rb in pass_fn(_combined_iter(pair_iter)):
            yield (
                out_rb.column(0).to_pylist()[0],
                out_rb.column(1).to_pylist()[0],
            )

    return fn


def make_commit_fn(lam, dlam, eta, mu_s, alpha_p, alpha_d, lb, ub, has_ub):
    def fn(pair_iter):
        for bb, sb in pair_iter:
            rb = combine(ipc_deser(bytes(bb)), ipc_deser(bytes(sb)))
            flat_idx, flat_val, lens = _flatten_rb(rb)
            pieces = _pieces(
                rb, flat_idx, flat_val, lens, lam, eta, mu_s, lb, ub, has_ub
            )
            r_step, li_lo, li_hi, ss_lo, ss_hi = _steps_arrays(
                pieces, flat_idx, flat_val, lens, dlam, mu_s, has_ub
            )
            r = _rb_col(rb, "ratio")
            s_lo = _rb_col(rb, "s_lo")
            s_hi = _rb_col(rb, "s_hi")
            lm_lo = _rb_col(rb, "lm_lo")
            lm_hi = _rb_col(rb, "lm_hi")
            new = [
                r + alpha_p * r_step,
                s_lo + alpha_p * ss_lo,
                s_hi + (alpha_p * ss_hi if has_ub else 0.0),
                lm_lo + alpha_d * li_lo,
                lm_hi + (alpha_d * li_hi if has_ub else 0.0),
            ]
            yield ipc_ser(
                pa.RecordBatch.from_arrays(
                    [pa.array(a, type=pa.float64()) for a in new], STATE_NAMES
                )
            )

    return fn


def reduce_partials(parts):
    sums = None
    mins = None
    for sb, mb in parts:
        s = np.frombuffer(sb, dtype=np.float64)
        m = np.frombuffer(mb, dtype=np.float64)
        sums = s if sums is None else sums + s
        mins = m if mins is None else np.minimum(mins, m)
    return sums, mins


def main() -> None:
    n = int(os.environ.get("SPARK_GRAFT_SPIKE_N", 5_000_000))
    k = int(os.environ.get("SPARK_GRAFT_SPIKE_K", 8))
    iters = int(os.environ.get("SPARK_GRAFT_SPIKE_ITERS", 6))
    spark = get_spark(app_name="zip_state_spike")
    sc = spark.sparkContext
    cpus = sc.defaultParallelism
    n_parts = max(cpus, n // 250_000)

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

    lb, ub, has_ub = 0.2, 5.0, True
    eta, mu_s = 1.0, 0.05
    rng = np.random.default_rng(0)
    lam = rng.normal(0, 1e-3, k)
    dlam = rng.normal(0, 1e-3, k)
    alpha_p = alpha_d = 1e-3

    out: dict[str, float] = {}

    # ---- path A: production kernel (full-row lazy commit) -------------
    t0 = time.perf_counter()
    kern = ElasticSparkKernel.from_problem(
        None, None, k, bounds=(lb, ub), prepacked=base
    )
    out["A_pack"] = round(time.perf_counter() - t0, 3)

    st0 = kern.elastic_stats(lam, eta, mu_s)  # warm
    g1_init = st0.g1.copy()  # parity reference: initial-state g1
    t0 = time.perf_counter()
    kern.elastic_stats(lam, eta, mu_s)
    out["A_stats_nocommit"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    kern.elastic_step(lam, dlam, eta, mu_s)
    out["A_step"] = round(time.perf_counter() - t0, 3)

    a_iters = []
    for _ in range(iters):
        t0 = time.perf_counter()
        kern.elastic_commit(lam, dlam, eta, mu_s, alpha_p, alpha_d)
        kern.elastic_stats(lam, eta, mu_s)  # materializes the commit
        kern.elastic_step(lam, dlam, eta, mu_s)
        a_iters.append(time.perf_counter() - t0)
    out["A_iter_times"] = [round(t, 3) for t in a_iters]
    out["A_iter_min"] = round(min(a_iters), 3)

    # ---- path B: split state over RDD zip ------------------------------
    def to_payload(batches):
        for rb in batches:
            if rb.num_rows:
                yield pa.RecordBatch.from_arrays(
                    [pa.array([ipc_ser(rb)], type=pa.binary())], ["payload"]
                )

    # A's caches are gone before B builds, so neither path pays the
    # other's memory pressure; B re-derives the base from the same
    # deterministic plan
    kern.cleanup()
    t0 = time.perf_counter()
    base_rdd = (
        base.select(*BASE_NAMES)
        .mapInArrow(to_payload, "payload binary")
        .rdd.map(lambda r: bytes(r[0]))
        ._reserialize(_ZIP_SER)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_batches = base_rdd.count()

    def init_state(payloads):
        for b in payloads:
            rb = ipc_deser(bytes(b))
            nr = rb.num_rows
            ratio = np.ones(nr)
            arrs = [
                ratio,
                ratio - lb,
                ub - ratio,
                np.full(nr, 0.05),
                np.full(nr, 0.05),
            ]
            yield ipc_ser(
                pa.RecordBatch.from_arrays(
                    [pa.array(a, type=pa.float64()) for a in arrs], STATE_NAMES
                )
            )

    state_rdd = (
        base_rdd.mapPartitions(init_state, preservesPartitioning=True)
        ._reserialize(_ZIP_SER)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    state_rdd.count()
    out["B_build"] = round(time.perf_counter() - t0, 3)
    out["B_n_batches"] = n_batches

    def run_stats(st):
        parts = (
            base_rdd.zip(st)
            .mapPartitions(
                make_stats_fn(k, lam, eta, mu_s, lb, ub, has_ub),
                preservesPartitioning=True,
            )
            .collect()
        )
        return reduce_partials(parts)

    def run_step(st):
        parts = (
            base_rdd.zip(st)
            .mapPartitions(
                make_step_fn(k, lam, dlam, eta, mu_s, lb, ub, has_ub),
                preservesPartitioning=True,
            )
            .collect()
        )
        return reduce_partials(parts)

    sums_b, _ = run_stats(state_rdd)  # warm
    # parity: identical initial state => identical g1 (bitwise-same math,
    # so only batch/row misalignment in the zip could make these differ)
    g1_b = sums_b[9 : 9 + k]
    assert np.allclose(g1_b, g1_init, rtol=1e-12, atol=0), (g1_b, g1_init)
    out["parity_g1"] = "ok"
    t0 = time.perf_counter()
    sums_b, _ = run_stats(state_rdd)
    out["B_stats_nocommit"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    run_step(state_rdd)
    out["B_step"] = round(time.perf_counter() - t0, 3)

    b_iters = []
    prev = None
    for _ in range(iters):
        t0 = time.perf_counter()
        new_state = (
            base_rdd.zip(state_rdd)
            .mapPartitions(
                make_commit_fn(
                    lam, dlam, eta, mu_s, alpha_p, alpha_d, lb, ub, has_ub
                ),
                preservesPartitioning=True,
            )
            ._reserialize(_ZIP_SER)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        prev = state_rdd
        state_rdd = new_state
        run_stats(state_rdd)  # materializes the commit
        run_step(state_rdd)
        prev.unpersist()
        b_iters.append(time.perf_counter() - t0)
    out["B_iter_times"] = [round(t, 3) for t in b_iters]
    out["B_iter_min"] = round(min(b_iters), 3)

    out["n"] = n
    out["k"] = k
    out["partitions"] = n_parts
    out["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
