"""True Structured-Streaming window aggregation: the SAME tumbling-window
expression the batch query uses, run through ``readStream`` with a
watermark, must produce the batch answer once the stream is drained
(AvailableNow semantics)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from entropy_balance_weighting_spark.functions.events import tumbling_window_agg
from entropy_balance_weighting_spark.session import load_table
from tests.conftest import SF_SMOKE


def test_streamed_tumbling_windows_match_batch(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "events_src")
    ev.coalesce(2).write.mode("overwrite").parquet(src)

    # watermarks require TIMESTAMP (not TIMESTAMP_NTZ); the session tz is
    # pinned UTC so the cast is value-preserving
    stream = (
        spark.readStream.schema(ev.schema)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
    )
    agg = tumbling_window_agg(stream, width="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["value_sum"], 6))
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["value_sum"], 6))
        for r in tumbling_window_agg(ev, width="1 hour").collect()
    }
    assert streamed == batch
    shutil.rmtree(src, ignore_errors=True)


def test_stateful_running_stats_accumulate_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-key state across micro-batches:
    after draining two file drops, the cumulative stats equal the batch
    aggregate over all data."""
    import pandas as pd

    src = tmp_path / "ev_state_src"
    src.mkdir()
    ckpt = str(tmp_path / "ev_state_ckpt")

    full = load_table(spark, SF_SMOKE, "events")
    part1 = full.filter(F.col("event_id") % 2 == 0)
    part2 = full.filter(F.col("event_id") % 2 == 1)
    # two separate files → maxFilesPerTrigger=1 forces two micro-batches
    # within one AvailableNow run; the state store carries stats across them
    part1.coalesce(1).write.mode("append").parquet(str(src))
    part2.coalesce(1).write.mode("append").parquet(str(src))

    from entropy_balance_weighting_spark.streaming.stateful import (
        running_key_stats,
    )

    stream = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = running_key_stats(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("key_stats")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len(
        [p for p in q.recentProgress if p["numInputRows"] > 0]
    )
    assert n_batches >= 2  # the state genuinely crossed micro-batches

    # last emitted row per key = cumulative stats
    mem = spark.sql("SELECT * FROM key_stats").toPandas()
    last = mem.groupby("key").apply(lambda g: g.iloc[-1], include_groups=False)
    batch = (
        full.groupBy(F.col("event_type").alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
            F.max("ts").alias("max_ts"),
        )
        .toPandas()
        .set_index("key")
    )
    assert set(last.index) == set(batch.index)
    for key in batch.index:
        assert last.loc[key, "n_events"] == batch.loc[key, "n_events"]
        assert abs(last.loc[key, "value_sum"] - batch.loc[key, "value_sum"]) < 1e-6


def test_streamed_sessionization_matches_batch(spark, tmp_path):
    """``session_window`` is the stateful streaming-native sessionizer:
    drained with AvailableNow over two micro-batches, the per-user
    session stats must equal the batch rendering (sessions that SPAN the
    micro-batch boundary must merge in the state store, not split)."""
    from entropy_balance_weighting_spark.functions.events import (
        session_window_agg,
        session_windows,
    )

    full = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = tmp_path / "sess_src"
    src.mkdir()
    # time-split (not hash-split) so sessions genuinely straddle batches
    mid = full.agg(
        F.percentile_approx("ts", 0.5).cast("timestamp")
    ).first()[0]
    full.filter(F.col("ts") <= mid).coalesce(1).write.mode("append").parquet(str(src))
    full.filter(F.col("ts") > mid).coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "10 hours")
    )
    # ONE stateful operator in the stream (the session window itself);
    # the per-user rollup runs on the drained sink — stacking both in
    # the stream trips Spark's multiple-stateful-operator check
    agg = session_windows(stream, gap="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["user_id"], r["n_sessions"], r["n_events"])
        for r in spark.sql(
            """SELECT user_id, count(*) AS n_sessions, sum(n) AS n_events
               FROM sess_stream GROUP BY user_id"""
        ).collect()
    }
    batch = {
        (r["user_id"], r["n_sessions"], r["n_events"])
        for r in session_window_agg(full, gap="30 minutes").collect()
    }
    assert streamed == batch and len(batch) > 0


def test_watermark_drops_late_events(spark, tmp_path):
    """Watermark semantics pinned: once the watermark has PROPAGATED (it
    lags one micro-batch — batch N's filter uses the watermark computed
    from batch N-1), an event older than (max seen ts − delay) is
    dropped at the stateful operator and its already-emitted window is
    untouched — the property that bounds state at stream scale."""
    import datetime as dt
    import time as _time

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = "event_id long, ts timestamp, value double"
    src = tmp_path / "late_src"
    src.mkdir()
    batches = [
        [(1, t0 + dt.timedelta(hours=h), 1.0) for h in range(6)],
        # advances nothing new but lets the 04:00 watermark take effect
        [(2, t0 + dt.timedelta(hours=6), 1.0)],
        [(99, t0 + dt.timedelta(minutes=30), 100.0)],  # 5.5h late
    ]
    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        _time.sleep(1.1)  # file source orders micro-batches by mtime

    stream = (
        spark.readStream.schema(spark.createDataFrame([], schema).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "1 hour")
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .select(F.col("w.start").alias("ws"), "n", "v")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_agg")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "late_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in (p["stateOperators"] or [])
    )
    assert dropped == 1  # the late event, counted by the state operator
    rows = {r.ws: (r.n, r.v) for r in spark.sql("SELECT * FROM late_agg").collect()}
    assert rows.get(t0) == (1, 1.0)  # its window emitted WITHOUT the late 100
    assert all(v < 100.0 for _, v in rows.values())


def test_two_level_sliding_matches_native(spark):
    """sliding_window_agg_two_level == F.window(ts, width, slide) exactly
    (counts, sums, and the emitted window set) at slide << width."""
    from entropy_balance_weighting_spark.functions.events import (
        sliding_window_agg,
        sliding_window_agg_two_level,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    native = sliding_window_agg(
        ev, width="1 hour", slide="10 minutes"
    ).collect()
    composed = sliding_window_agg_two_level(
        ev, width="1 hour", slide="10 minutes"
    ).collect()
    key = lambda r: (r.window_start, r.event_type)
    n = {key(r): (r.n_events, round(r.value_sum, 6)) for r in native}
    c = {key(r): (r.n_events, round(r.value_sum, 6)) for r in composed}
    assert n == c
    assert len(n) > 10


def test_two_level_sliding_rejects_nondivisible(spark):
    import pytest

    from entropy_balance_weighting_spark.functions.events import (
        sliding_window_agg_two_level,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    with pytest.raises(ValueError, match="multiple of slide"):
        sliding_window_agg_two_level(ev, width="1 hour", slide="7 minutes")


def test_streamed_chunking_matches_batch(spark, tmp_path):
    """chunk_documents is stateless, so it runs unmodified under
    readStream; draining the stream must equal the batch run."""
    from entropy_balance_weighting_spark.functions.text import chunk_documents
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    rows = [(i, " ".join(f"d{i}t{j}" for j in range(120 + i))) for i in range(6)]
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
        str(src)
    )

    batch = chunk_documents(
        spark.read.parquet(str(src)), chunk_tokens=32, overlap_tokens=8
    ).collect()

    stream = spark.readStream.schema(schema).parquet(str(src))
    out = tmp_path / "out"
    q = (
        chunk_documents(stream, chunk_tokens=32, overlap_tokens=8)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.read.parquet(str(out)).collect()
    key = lambda r: (r.id, r.chunk_id, r.chunk_text, r.n_tok)
    assert sorted(map(key, streamed)) == sorted(map(key, batch))
    assert len(batch) > 6  # fan-out actually happened
