"""Streaming exact-dedup tests: duplicates across micro-batches are
dropped within the watermark horizon with bounded state."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import types as T

from entropy_balance_weighting_spark.streaming import streaming_exact_dedup

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _write(spark, src, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
    spark.createDataFrame(pdf, SCHEMA).coalesce(1).write.mode("append").parquet(
        str(src)
    )


def _drain(spark, src, ckpt, out_dir):
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    deduped = streaming_exact_dedup(stream, text_col="text", ts_col="ts")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", str(out_dir))
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_duplicates_dropped_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"

    # batch 1: two distinct texts plus an in-batch duplicate (case/space
    # variant — normalization must catch it)
    _write(
        spark,
        src,
        [
            (1, "alpha beta gamma", T0),
            (2, "delta epsilon zeta", T0 + dt.timedelta(seconds=10)),
            (3, "  Alpha Beta Gamma ", T0 + dt.timedelta(seconds=20)),
        ],
    )
    _drain(spark, src, ckpt, out)
    got = {r.doc_id for r in spark.read.parquet(str(out)).collect()}
    assert len(got) == 2
    assert 2 in got and (got & {1, 3})

    # batch 2: a cross-batch duplicate (within the watermark) and a new doc
    _write(
        spark,
        src,
        [
            (4, "alpha beta gamma", T0 + dt.timedelta(seconds=30)),
            (5, "eta theta iota", T0 + dt.timedelta(seconds=40)),
        ],
    )
    _drain(spark, src, ckpt, out)
    rows = spark.read.parquet(str(out)).collect()
    ids = {r.doc_id for r in rows}
    assert 5 in ids
    assert 4 not in ids, "cross-batch duplicate must be dropped"
    texts = [r.text.strip().lower() for r in rows]
    assert len(texts) == len(set(texts))


def test_batch_dataframe_rejected(spark):
    df = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError, match="streaming"):
        streaming_exact_dedup(df)


def test_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    """Sink exactness across restarts: re-running the query from the same
    checkpoint with no new data appends nothing; new data after a restart
    is processed once; the parquet sink's _spark_metadata commit log view
    never shows duplicate doc_ids."""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"

    _write(
        spark,
        src,
        [
            (1, "alpha beta gamma", T0),
            (2, "delta epsilon zeta", T0 + dt.timedelta(seconds=10)),
        ],
    )
    _drain(spark, src, ckpt, out)
    first = sorted(r.doc_id for r in spark.read.parquet(str(out)).collect())
    assert first == [1, 2]

    # restart 1: same checkpoint, no new data -> no-op
    _drain(spark, src, ckpt, out)
    _drain(spark, src, ckpt, out)
    assert sorted(r.doc_id for r in spark.read.parquet(str(out)).collect()) == [1, 2]

    # restart 2: new data (one dup of doc 1 within the watermark, one new)
    _write(
        spark,
        src,
        [
            (3, "alpha beta gamma", T0 + dt.timedelta(seconds=20)),
            (4, "eta theta iota", T0 + dt.timedelta(seconds=30)),
        ],
    )
    _drain(spark, src, ckpt, out)
    _drain(spark, src, ckpt, out)  # and replaying again stays exact
    rows = [r.doc_id for r in spark.read.parquet(str(out)).collect()]
    assert sorted(rows) == [1, 2, 4]
    assert len(rows) == len(set(rows))
