"""Event-time operators over the ``events`` stream-shaped table.

Batch renderings here; the same expressions run under Structured Streaming
(``readStream`` + watermark) unchanged — ``F.window`` and
``F.session_window`` are the streaming-native operators, and
:mod:`streaming.incremental` drives micro-batch reweighting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    width: str = "1 hour",
    by: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling event-time windows: count + value sum per (window, keys)."""
    win = F.window(F.col(ts_col), width)
    return (
        events.groupBy(win.alias("w"), *by)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
        )
        .select(F.col("w.start").alias("window_start"), *by, "n_events", "value_sum")
    )


def sliding_window_agg(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "30 minutes",
    by: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Sliding (hopping) event-time windows: each event lands in
    ``width/slide`` overlapping windows.  ``F.window(ts, width, slide)``
    is the streaming-native operator — the fan-out happens inside the
    JVM generator, not as a Python explode.

    ``window_start`` is surfaced as epoch SECONDS (BIGINT): the slide
    grid is epoch-aligned on both engines, and an integer key sidesteps
    timestamp-zone stringification drift in cross-engine comparisons.
    The intermediate cast to TIMESTAMP handles TIMESTAMP_NTZ inputs
    (naive parquet timestamps) — NTZ has no direct cast to BIGINT, and
    the session timezone is pinned UTC so the epoch matches DuckDB's
    ``epoch()`` of the same naive value.
    """
    win = F.window(F.col(ts_col), width, slide)
    return (
        events.groupBy(win.alias("w"), *by)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
        )
        .select(
            F.col("w.start").cast("timestamp").cast("long").alias("window_start"),
            *by,
            "n_events",
            "value_sum",
        )
    )


def session_window_agg(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    by: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization per key: session count + event count.

    ``F.session_window`` is the streaming-native stateful operator; in
    batch it computes the same gaps-and-islands result the SQL oracle
    derives with lag/cumsum.
    """
    sess = events.groupBy(
        F.session_window(F.col(ts_col), gap).alias("sw"), F.col(by)
    ).agg(F.count(F.lit(1)).alias("n"))
    return sess.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n").alias("n_events"),
    )


def json_prop_int(events: DataFrame, prop: str, *, props_col: str = "props") -> DataFrame:
    """Extract an integer property from the JSON ``props`` column.

    Uses ``get_json_object`` (JVM JSON path) — regexp-free and
    streaming-safe."""
    return events.withColumn(
        f"prop_{prop}",
        F.get_json_object(F.col(props_col), f"$.{prop}").cast("int"),
    )
