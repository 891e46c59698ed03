"""Custom stateful streaming operator via ``applyInPandasWithState``:
running per-key statistics maintained in the state store across
micro-batches (the streaming-native way to keep arbitrary per-key state
when built-in windows can't express the semantics).

The operator keeps (n_events, value_sum, max_ts) per key and emits the
updated row every time the key appears in a micro-batch — the
incremental-metrics pattern a training-data pipeline uses to track
per-source document counts / quality totals as data lands.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events long, value_sum double, max_ts timestamp"
OUTPUT_SCHEMA = (
    "key string, n_events long, value_sum double, max_ts timestamp"
)


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (n, s, mx) = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        mx = batch_max if mx is None else max(mx, batch_max)
    state.update((n, s, mx))
    yield pd.DataFrame(
        {"key": [key[0]], "n_events": [n], "value_sum": [s], "max_ts": [mx]}
    )


def running_key_stats(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming DataFrame → running per-key stats via the state store.

    Apply to a ``readStream`` source and write with update output mode;
    each micro-batch emits the keys it touched with their cumulative
    statistics."""
    from pyspark.sql import functions as F

    shaped = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    )
    return shaped.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
