"""Structured-Streaming incremental reweighting test: a real
``readStream`` file source drained with AvailableNow triggers through
``foreachBatch``, warm-starting each re-solve from the previous solution
(SURVEY §7.5; C7 warm start)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from entropy_balance_weighting_spark.plans import MomentSpec
from entropy_balance_weighting_spark.streaming import IncrementalReweighter

SCHEMA = T.StructType(
    [
        T.StructField("rid", T.LongType()),
        T.StructField("w", T.DoubleType()),
        T.StructField("x0", T.DoubleType()),
        T.StructField("x1", T.DoubleType()),
    ]
)


def _chunk(rng, n, offset):
    return pd.DataFrame(
        {
            "rid": np.arange(offset, offset + n),
            "w": rng.uniform(0.5, 2.0, size=n),
            "x0": rng.uniform(size=n),
            "x1": rng.uniform(size=n),
        }
    )


def test_incremental_stream_matches_batch_solve(spark, tmp_path):
    rng = np.random.default_rng(3)
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    spec = MomentSpec(weight_col="w", numeric=("x0", "x1"), row_key=("rid",))

    def targets_fn(pt):
        from entropy_balance_weighting_spark.plans.moment_spec import (
            targets_from_problem,
        )

        return targets_from_problem(pt, perturb=0.01)

    rw = IncrementalReweighter(spec, targets_fn)
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))

    # batch 1 lands → drain
    chunk1 = _chunk(rng, 400, 0)
    spark.createDataFrame(chunk1).coalesce(1).write.mode("append").parquet(str(src))
    rw.run_available(stream, checkpoint_dir=ckpt)
    assert rw.history[-1]["converged"]
    assert rw.history[-1]["n_rows"] == 400

    # batch 2 lands → drain again; solve is warm-started
    chunk2 = _chunk(rng, 200, 400)
    spark.createDataFrame(chunk2).coalesce(1).write.mode("append").parquet(str(src))
    rw.run_available(stream, checkpoint_dir=ckpt)
    assert rw.history[-1]["converged"]
    assert rw.history[-1]["n_rows"] == 600
    assert len(rw.history) == 2

    # the incremental result equals a cold batch solve over all data
    from entropy_balance_weighting_spark import entropy_balance
    from entropy_balance_weighting_spark.plans import build_problem_tables
    from entropy_balance_weighting_spark.plans.moment_spec import (
        targets_from_problem,
    )

    full = spark.createDataFrame(pd.concat([chunk1, chunk2]))
    pt = build_problem_tables(full, spec)
    res = entropy_balance(
        mean_population_moments=targets_from_problem(pt, perturb=0.01),
        x_sample=pt,
    )
    assert res.converged
    w_batch = {
        r["row_id"]: r["new_weight"] for r in res.new_weights.collect()
    }
    w_stream = {
        r["row_id"]: r["new_weight"] for r in rw.last_weights.collect()
    }
    assert w_batch.keys() == w_stream.keys()
    diffs = [abs(w_stream[k] - w_batch[k]) / abs(w_batch[k]) for k in w_batch]
    assert max(diffs) < 1e-5

    # the weights sink persists the current solution as parquet
    from entropy_balance_weighting_spark.streaming.incremental import weights_sink

    out_dir = str(tmp_path / "weights_out")
    weights_sink(rw)(out_dir)
    reread = {
        r["row_id"]: r["new_weight"]
        for r in spark.read.parquet(out_dir).collect()
    }
    assert reread == w_stream


def test_warm_start_uses_previous_ratios(spark, tmp_path):
    """After the first solve, subsequent identical-data batches should
    converge immediately (ratio guess already optimal)."""
    rng = np.random.default_rng(9)
    src = tmp_path / "src2"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt2")
    spec = MomentSpec(weight_col="w", numeric=("x0", "x1"), row_key=("rid",))

    def targets_fn(pt):
        from entropy_balance_weighting_spark.plans.moment_spec import (
            targets_from_problem,
        )

        return targets_from_problem(pt, perturb=0.01)

    rw = IncrementalReweighter(spec, targets_fn)
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    spark.createDataFrame(_chunk(rng, 300, 0)).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    rw.run_available(stream, checkpoint_dir=ckpt)
    first_iters = rw.history[-1]["n_iterations"]

    # tiny second batch: warm start should need no more iterations than
    # the cold solve did
    spark.createDataFrame(_chunk(rng, 10, 300)).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    rw.run_available(stream, checkpoint_dir=ckpt)
    assert rw.history[-1]["n_iterations"] <= first_iters


def test_many_batches_match_batch_solve_no_drift(spark, tmp_path):
    """The documented drift bound (incremental.py module docstring): after
    N micro-batches the streamed weights equal a from-scratch solve on the
    union to within the solver optimality tolerance — deviation must NOT
    accumulate with N, because every batch re-solves the full accumulated
    problem and the warm start only seeds iterations."""
    rng = np.random.default_rng(21)
    src = tmp_path / "src_many"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_many")
    spec = MomentSpec(weight_col="w", numeric=("x0", "x1"), row_key=("rid",))

    def targets_fn(pt):
        from entropy_balance_weighting_spark.plans.moment_spec import (
            targets_from_problem,
        )

        return targets_from_problem(pt, perturb=0.01)

    rw = IncrementalReweighter(spec, targets_fn)
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))

    n_batches = 5
    chunks = []
    for b in range(n_batches):
        chunk = _chunk(rng, 150, 150 * b)
        chunks.append(chunk)
        spark.createDataFrame(chunk).coalesce(1).write.mode("append").parquet(
            str(src)
        )
        rw.run_available(stream, checkpoint_dir=ckpt)
        assert rw.history[-1]["converged"]
        assert rw.history[-1]["n_rows"] == 150 * (b + 1)
    assert len(rw.history) == n_batches

    from entropy_balance_weighting_spark import entropy_balance
    from entropy_balance_weighting_spark.plans import build_problem_tables
    from entropy_balance_weighting_spark.plans.moment_spec import (
        targets_from_problem,
    )

    full = spark.createDataFrame(pd.concat(chunks))
    pt = build_problem_tables(full, spec)
    res = entropy_balance(
        mean_population_moments=targets_from_problem(pt, perturb=0.01),
        x_sample=pt,
    )
    assert res.converged
    w_batch = {r["row_id"]: r["new_weight"] for r in res.new_weights.collect()}
    w_stream = {r["row_id"]: r["new_weight"] for r in rw.last_weights.collect()}
    assert w_batch.keys() == w_stream.keys()
    drift = max(
        abs(w_stream[k] - w_batch[k]) / abs(w_batch[k]) for k in w_batch
    )
    # the documented bound: optimality-tolerance-scale, independent of N
    assert drift < 1e-5, f"drift {drift:.2e} exceeds the tolerance bound"


def test_incremental_requires_row_key():
    """Without a declared row key, row_ids are re-assigned per batch
    rebuild and warm starts would silently pair ratios with arbitrary
    rows — constructing the reweighter must fail loudly."""
    spec = MomentSpec(weight_col="w", numeric=("x0", "x1"))
    with pytest.raises(ValueError, match="row_key"):
        IncrementalReweighter(spec, targets=None)


def test_replayed_batch_is_idempotent(spark):
    """foreachBatch is at-least-once: re-delivering a batch with the same
    batch_id (the post-restart replay) must not double-count rows or
    change the weights."""
    rng = np.random.default_rng(11)
    spec = MomentSpec(weight_col="w", numeric=("x0", "x1"), row_key=("rid",))

    def targets(pt):
        from entropy_balance_weighting_spark.queries.solver import (
            targets_from_problem,
        )

        return targets_from_problem(pt, perturb=0.01)

    rw = IncrementalReweighter(spec, targets)
    b0 = spark.createDataFrame(_chunk(rng, 60, 0), SCHEMA)
    b1 = spark.createDataFrame(_chunk(rng, 40, 60), SCHEMA)

    rw.process_batch(b0, 0)
    n_after_0 = rw.accumulated.count()
    w_after_0 = sorted((r.row_id, round(r.new_weight, 10))
                       for r in rw.last_weights.collect())

    # intra-run replay: same batch_id delivered again
    rw.process_batch(b0, 0)
    assert rw.accumulated.count() == n_after_0
    assert sorted((r.row_id, round(r.new_weight, 10))
                  for r in rw.last_weights.collect()) == w_after_0
    assert len(rw.history) == 1

    # cross-rebuild replay: a fresh reweighter state that already absorbed
    # batch 0's ROWS sees them again under a new batch_id — the row_key
    # dedup keeps the accumulation exact
    rw.process_batch(b1, 1)
    n_after_1 = rw.accumulated.count()
    assert n_after_1 == 100
    rw.process_batch(b0.unionByName(b1), 2)  # replayed rows, new id
    assert rw.accumulated.count() == n_after_1
    assert len(rw.history) == 3


def test_accumulated_snapshot_schema_is_clean(spark):
    """The public ``accumulated`` snapshot must carry exactly the input
    schema — no internal bookkeeping columns may leak (the round-6 ADVICE
    caught ``__ebw_batch_id`` leaking into it)."""
    rng = np.random.default_rng(5)
    spec = MomentSpec(weight_col="w", numeric=("x0", "x1"), row_key=("rid",))

    def targets(pt):
        from entropy_balance_weighting_spark.queries.solver import (
            targets_from_problem,
        )

        return targets_from_problem(pt, perturb=0.01)

    rw = IncrementalReweighter(spec, targets)
    rw.process_batch(spark.createDataFrame(_chunk(rng, 50, 0), SCHEMA), 0)
    assert rw.accumulated.columns == ["rid", "w", "x0", "x1"]
    rw.process_batch(spark.createDataFrame(_chunk(rng, 30, 50), SCHEMA), 1)
    assert rw.accumulated.columns == ["rid", "w", "x0", "x1"]


def test_batch_replay_keep_policy_is_deterministic(spark):
    """Keep policy: (1) a key replayed in a LATER batch with new values
    keeps the later row; (2) duplicate keys WITHIN one batch keep the
    lexicographically-smallest payload, not an arbitrary partition
    winner."""
    spec = MomentSpec(weight_col="w", numeric=("x0", "x1"), row_key=("rid",))

    def targets(pt):
        from entropy_balance_weighting_spark.queries.solver import (
            targets_from_problem,
        )

        return targets_from_problem(pt, perturb=0.01)

    rw = IncrementalReweighter(spec, targets)
    base = [(i, 1.0, 0.1 * i, 0.2 * i) for i in range(8)]
    # batch 0 carries rid=0 twice with different payloads
    b0 = spark.createDataFrame(
        base + [(0, 9.0, 9.0, 9.0)], SCHEMA
    ).repartition(4)
    rw.process_batch(b0, 0)
    kept = {r.rid: (r.w, r.x0, r.x1) for r in rw.accumulated.collect()}
    assert kept[0] == (1.0, 0.0, 0.0)  # smallest payload wins, every run

    # batch 1 re-delivers rid=3 with updated values → later batch wins
    b1 = spark.createDataFrame([(3, 2.0, 7.0, 7.0)], SCHEMA)
    rw.process_batch(b1, 1)
    kept = {r.rid: (r.w, r.x0, r.x1) for r in rw.accumulated.collect()}
    assert kept[3] == (2.0, 7.0, 7.0)
    assert rw.accumulated.count() == 8
