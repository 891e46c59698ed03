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

    stream = spark.readStream.schema(ev.schema).parquet(src).withWatermark(
        "ts", "1 hour"
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
