"""Seeded batch-equivalence fuzz sweeps for the streaming layer: each
streaming operator is drained over randomized multi-micro-batch input and
compared against the batch operator (or a batch aggregation) on the same
rows — the same streamed≡batch discipline the ``chunk_documents`` pin
established, extended to the three stateful operators that previously had
only hand-picked cases (VERDICT r6 #7).

Determinism notes baked into the generators:
- as-of: arrival order is commitment order for the streaming form, so the
  generator sorts globally by timestamp and splits into contiguous chunks
  (one file = one micro-batch via ``maxFilesPerTrigger=1``); timestamps
  are globally unique so tie-at-boundary arrival artifacts cannot fork
  the comparison.  Within-batch disorder IS exercised (the operator
  sorts each micro-batch itself).
- dedup: all timestamps sit far inside the watermark horizon, so no
  state eviction / re-admission — streamed kept-set must equal the batch
  distinct set exactly.
- running stats: the per-key row with the highest ``n_events`` across
  all update-mode emissions is the final state; it must equal the batch
  ``groupBy(key).agg(count, sum, max)``.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from entropy_balance_weighting_spark.streaming import (
    running_key_stats,
    streaming_asof_join,
    streaming_exact_dedup,
)

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)

ASOF_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("_side", T.IntegerType()),
    ]
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _chunks(rng, rows, n_chunks):
    """Split rows into n_chunks contiguous, non-empty-ish chunks."""
    if len(rows) <= n_chunks:
        return [rows]
    cuts = sorted(rng.choice(range(1, len(rows)), size=n_chunks - 1, replace=False))
    out = []
    prev = 0
    for c in [*cuts, len(rows)]:
        out.append(rows[prev:c])
        prev = c
    return [c for c in out if c]


def _drain(spark, src, schema, op, out_mode, tmp_path, name):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        op(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(out_mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@pytest.mark.parametrize("seed", [11, 29, 47])
def test_streamed_asof_matches_batch_on_inorder_arrival(spark, tmp_path, seed):
    from entropy_balance_weighting_spark.functions.events import asof_join

    rng = np.random.default_rng(seed)
    n = 40 + int(rng.integers(60))
    # globally unique timestamps (second granularity, sampled without
    # replacement) so chunk boundaries can never split a tie
    secs = rng.choice(range(0, 5000), size=n, replace=False)
    rows = []
    for i, s in enumerate(secs):
        rows.append(
            (
                int(i),
                int(rng.integers(4)),               # few keys → state reuse
                T0 + dt.timedelta(seconds=int(s)),
                round(float(rng.uniform(0, 100)), 3),
                int(rng.integers(3) == 0),          # ~1/3 left rows
            )
        )
    # right rows unique per (key, ts) holds: ts globally unique
    rows.sort(key=lambda r: r[2])  # arrival order == event-time order
    src = tmp_path / "src"
    src.mkdir()
    for chunk in _chunks(rng, rows, 3):
        pdf = pd.DataFrame(
            chunk, columns=["event_id", "user_id", "ts", "value", "_side"]
        )
        spark.createDataFrame(pdf, ASOF_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    got = _drain(
        spark, src, ASOF_SCHEMA, streaming_asof_join, "append", tmp_path,
        f"asof_fuzz_{seed}",
    )
    streamed = {
        r.event_id: (r.asof_value, r.asof_ts) for r in got.collect()
    }

    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value", "_side"])
    left = spark.createDataFrame(pdf[pdf["_side"] == 1], ASOF_SCHEMA).drop("_side")
    right = spark.createDataFrame(pdf[pdf["_side"] == 0], ASOF_SCHEMA).drop("_side")
    oracle = {
        r.event_id: (r.asof_value, r.asof_ts)
        for r in asof_join(
            left, right, on="user_id", ts_col="ts", right_cols=("value", "ts")
        )
        .withColumnRenamed("asof_ts", "asof_ts")
        .collect()
    }
    assert set(streamed) == set(oracle)
    for eid, (val, ts) in streamed.items():
        assert oracle[eid] == (val, ts), (eid, streamed[eid], oracle[eid])


@pytest.mark.parametrize("seed", [13, 31, 53])
def test_streamed_dedup_matches_batch_distinct(spark, tmp_path, seed):
    rng = np.random.default_rng(seed)
    vocab = [f"doc text {i}" for i in range(12)]
    n = 30 + int(rng.integers(50))
    rows = []
    for i in range(n):
        base = vocab[int(rng.integers(len(vocab)))]
        # case/whitespace variants must still collide (lower/trim norm)
        variant = int(rng.integers(3))
        text = base.upper() if variant == 1 else f"  {base} " if variant == 2 else base
        rows.append(
            (int(i), text, T0 + dt.timedelta(seconds=int(rng.integers(600))))
        )
    src = tmp_path / "src"
    src.mkdir()
    for chunk in _chunks(rng, rows, 3):
        pdf = pd.DataFrame(chunk, columns=["doc_id", "text", "ts"])
        spark.createDataFrame(pdf, DOC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    got = _drain(
        spark,
        src,
        DOC_SCHEMA,
        lambda s: streaming_exact_dedup(s, watermark_delay="2 hours"),
        "append",
        tmp_path,
        f"dedup_fuzz_{seed}",
    )
    kept = got.collect()
    kept_norms = sorted(r.text.strip().lower() for r in kept)
    oracle_norms = sorted(
        {t.strip().lower() for _, t, _ in rows}
    )
    # every distinct normalized text survives exactly once
    assert kept_norms == oracle_norms


@pytest.mark.parametrize("seed", [17, 37, 59])
def test_streamed_running_stats_match_batch_agg(spark, tmp_path, seed):
    rng = np.random.default_rng(seed)
    types = ["click", "view", "purchase", "error"]
    n = 30 + int(rng.integers(60))
    rows = [
        (
            types[int(rng.integers(len(types)))],
            T0 + dt.timedelta(seconds=int(rng.integers(3600))),
            round(float(rng.uniform(-5, 50)), 3),
        )
        for _ in range(n)
    ]
    src = tmp_path / "src"
    src.mkdir()
    for chunk in _chunks(rng, rows, 3):
        pdf = pd.DataFrame(chunk, columns=["event_type", "ts", "value"])
        spark.createDataFrame(pdf, EV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    got = _drain(
        spark, src, EV_SCHEMA, running_key_stats, "update", tmp_path,
        f"stats_fuzz_{seed}",
    )
    # final state per key = the update-mode emission with the highest
    # cumulative count
    final = {}
    for r in got.collect():
        if r.key not in final or r.n_events > final[r.key].n_events:
            final[r.key] = r

    pdf = pd.DataFrame(rows, columns=["event_type", "ts", "value"])
    oracle = (
        spark.createDataFrame(pdf, EV_SCHEMA)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
            F.max("ts").alias("max_ts"),
        )
        .collect()
    )
    assert {r.event_type for r in oracle} == set(final)
    for r in oracle:
        f = final[r.event_type]
        assert f.n_events == r.n_events
        assert f.value_sum == pytest.approx(r.value_sum, rel=1e-12)
        assert f.max_ts == r.max_ts


CDC_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@pytest.mark.parametrize("seed", [5, 23])
def test_streamed_cdc_compact_matches_batch_compact(spark, tmp_path, seed):
    """Streaming CDC compaction: out-of-order, multi-micro-batch
    changelog → the update-mode emission with the highest n_changes per
    key must equal the BATCH compact_changelog over the same rows
    (version ordering decides, never arrival order)."""
    from entropy_balance_weighting_spark.functions import events as ev
    from entropy_balance_weighting_spark.streaming import (
        streaming_cdc_compact,
    )

    rng = np.random.default_rng(seed)
    types = ["click", "view", "purchase", "error"]
    n = 40 + int(rng.integers(60))
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                # deliberately coarse timestamps: sub-second ties forced,
                # resolved by the event_id minor version
                T0 + dt.timedelta(seconds=int(rng.integers(20))),
                int(rng.integers(8)),
                types[int(rng.integers(len(types)))],
                round(float(rng.uniform(0, 50)), 3),
            )
        )
    rng.shuffle(rows := np.array(rows, dtype=object))  # out-of-order arrival
    rows = [tuple(r) for r in rows]
    src = tmp_path / "cdc_src"
    src.mkdir()
    for chunk in _chunks(rng, rows, 4):
        pdf = pd.DataFrame(
            chunk, columns=["event_id", "ts", "user_id", "event_type", "value"]
        )
        spark.createDataFrame(pdf, CDC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    got = _drain(
        spark, src, CDC_SCHEMA, streaming_cdc_compact, "update", tmp_path,
        f"cdc_fuzz_{seed}",
    )
    final = {}
    for r in got.collect():
        if r.key not in final or r.n_changes > final[r.key].n_changes:
            final[r.key] = r

    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    batch = {
        r["user_id"]: r
        for r in ev.compact_changelog(
            spark.createDataFrame(pdf, CDC_SCHEMA),
            keys=("user_id",),
            version=("ts", "event_id"),
        ).collect()
    }
    assert set(batch) == set(final)
    for k, b in batch.items():
        f = final[k]
        assert f.n_changes == b["n_changes"], k
        assert f.last_type == b["event_type"], k
        assert f.last_value == pytest.approx(b["value"], rel=1e-12), k


def test_streamed_cdc_compact_handles_timestamp_ntz(spark, tmp_path):
    """Parquet STREAM sources surface timestamp_ntz; the version column
    must still order at microsecond fidelity (a plain long-cast of NTZ
    is an AnalysisException — regression found by the cdc example)."""
    from entropy_balance_weighting_spark.streaming import (
        streaming_cdc_compact,
    )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    rows = [
        (0, T0, 1, "click", 1.0),
        # same second, later microsecond: must win
        (1, T0 + dt.timedelta(microseconds=500), 1, "view", 2.0),
        (2, T0 - dt.timedelta(seconds=5), 2, "purchase", 3.0),
    ]
    src = tmp_path / "ntz_src"
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    spark.createDataFrame(pdf, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    got = _drain(
        spark, src, schema, streaming_cdc_compact, "update", tmp_path,
        "cdc_ntz",
    )
    final = {r.key: (r.last_type, r.n_changes) for r in got.collect()}
    assert final == {1: ("view", 2), 2: ("purchase", 1)}


def test_streamed_cdc_compact_tolerates_null_records(spark, tmp_path):
    """r12 ADVICE: one malformed change record (NULL version or value)
    must not kill the streaming query.  NULL-version rows are skipped
    from latest-record selection (unorderable) but still counted in
    n_changes; a NULL value/op on the WINNING version surfaces as NULL
    in the snapshot — mirroring the batch compact_changelog's max_by
    tolerance."""
    from entropy_balance_weighting_spark.streaming import (
        streaming_cdc_compact,
    )

    rows = [
        (0, T0, 1, "click", 1.0),
        (None, T0 - dt.timedelta(seconds=9), 1, "view", 2.0),  # null minor
        (2, None, 1, "purchase", 3.0),                         # null major
        (3, T0 + dt.timedelta(seconds=1), 1, None, None),      # null payload
        (4, T0, 2, "view", 5.0),
    ]
    src = tmp_path / "nulls_src"
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    spark.createDataFrame(pdf, CDC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    got = _drain(
        spark, src, CDC_SCHEMA, streaming_cdc_compact, "update", tmp_path,
        "cdc_nulls",
    )
    final = {
        r.key: (r.last_type, r.last_value, r.n_changes)
        for r in got.collect()
    }
    # key 1: event 3 (T0+1s, id 3) is the latest ORDERABLE version —
    # its NULL payload wins through; 4 changes counted incl. malformed
    assert final[1] == (None, None, 4)
    assert final[2] == ("view", 5.0, 1)
