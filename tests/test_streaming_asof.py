"""Streaming as-of enrichment: state carries the latest right row per
key across micro-batches; on in-order data the result matches the batch
piecewise-merge operator exactly."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from entropy_balance_weighting_spark.streaming import streaming_asof_join

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("_side", T.IntegerType()),
    ]
)

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _t(s):
    return T0 + dt.timedelta(seconds=s)


def _write(spark, src, rows):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "value", "_side"]
    )
    spark.createDataFrame(pdf, SCHEMA).coalesce(1).write.mode("append").parquet(
        str(src)
    )


def _drain(spark, src, ckpt, out_dir):
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    joined = streaming_asof_join(stream)
    q = (
        joined.writeStream.format("parquet")
        .option("path", str(out_dir))
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_state_carries_latest_right_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"

    # batch 1: user 1 gets a right row then a left row (in-batch match);
    # user 2 has a left row with no prior right (null match); a tie at
    # t=30 must match (right sorts before left at equal ts)
    _write(
        spark,
        src,
        [
            (100, 1, _t(10), 5.0, 0),
            (101, 1, _t(20), 99.0, 1),
            (102, 2, _t(20), 42.0, 1),
            (103, 1, _t(30), 7.0, 0),
            (104, 1, _t(30), 88.0, 1),
        ],
    )
    _drain(spark, src, ckpt, out)
    got = {
        r.event_id: (r.asof_value, r.asof_ts)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got[101] == (5.0, _t(10))
    assert got[102] == (None, None)
    assert got[104] == (7.0, _t(30))  # equal-ts tie matches

    # batch 2: left rows must see batch 1's latest right via the state
    # store; a new right row then supersedes it for later lefts
    _write(
        spark,
        src,
        [
            (200, 1, _t(40), 77.0, 1),
            (201, 1, _t(50), 9.0, 0),
            (202, 1, _t(60), 66.0, 1),
        ],
    )
    _drain(spark, src, ckpt, out)
    got = {
        r.event_id: (r.asof_value, r.asof_ts)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got[200] == (7.0, _t(30)), "state must survive across batches"
    assert got[202] == (9.0, _t(50))


def test_streaming_matches_batch_asof_on_in_order_data(spark, tmp_path):
    """Single in-order batch → streaming result == batch asof_join."""
    from entropy_balance_weighting_spark.functions.events import asof_join

    rows = []
    eid = 0
    for s in range(40):
        user = s % 3
        side = 0 if s % 4 == 0 else 1
        rows.append((eid, user, _t(s), float(s), side))
        eid += 1

    src = tmp_path / "src"
    src.mkdir()
    _write(spark, src, rows)
    _drain(spark, src, tmp_path / "ckpt", tmp_path / "out")
    streamed = {
        r.event_id: (r.asof_value, r.asof_ts)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }

    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value", "_side"]),
        SCHEMA,
    )
    batch = asof_join(
        df.filter(F.col("_side") == 1),
        df.filter(F.col("_side") == 0).select("user_id", "ts", "value"),
        on="user_id",
        ts_col="ts",
    )
    expected = {
        r.event_id: (r.asof_value, r.asof_ts) for r in batch.collect()
    }
    assert streamed == expected


def test_batch_dataframe_rejected(spark):
    df = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError, match="streaming"):
        streaming_asof_join(df)


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    """Stream-static join: a streaming fact enriched against a static
    broadcast dimension — the third streaming join form next to the
    stateful as-of and the watermarked dedup.  The static side resolves
    per micro-batch with a broadcast hash join (no stream-side shuffle)."""
    from pyspark.sql import functions as F

    src = tmp_path / "src"
    src.mkdir()
    _write(
        spark,
        src,
        [
            (1, 10, _t(0), 5.0, 1),
            (2, 20, _t(1), 7.0, 1),
            (3, 99, _t(2), 9.0, 1),  # no dim row → left join keeps it
        ],
    )
    dim = spark.createDataFrame(
        [(10, "mobile"), (20, "web")], "user_id long, segment string"
    )
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    enriched = stream.join(F.broadcast(dim), "user_id", "left")
    q = (
        enriched.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.event_id: r.segment
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == {1: "mobile", 2: "web", 3: None}
