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
