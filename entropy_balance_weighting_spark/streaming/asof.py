"""Streaming as-of enrichment via ``applyInPandasWithState``: each left
event picks up the latest prior right event for its key, with the
"latest right per key" carried in the state store across micro-batches.

This is the streaming-native counterpart of the batch piecewise-merge
:func:`functions.events.asof_join`: the batch form materializes the
carry-forward with one keyed window; the streaming form keeps exactly
one ``(ts, value)`` per key in state — O(#keys) state, independent of
stream length — and walks each micro-batch's rows for the key in
timestamp order.

Semantics note (the standard stream-enrichment approximation): rows are
matched in arrival order — a right event that arrives AFTER a left event
it precedes in event time cannot retro-match it (the left row was
already emitted).  Within a micro-batch this operator sorts by
timestamp, so only cross-batch disorder is subject to that caveat; the
batch operator is the exact-replay oracle.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "last_ts timestamp, last_value double"
OUTPUT_SCHEMA = (
    "key long, event_id long, ts timestamp, value double, "
    "asof_value double, asof_ts timestamp"
)


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    last_ts, last_val = state.get if state.exists else (None, None)
    out = []
    for pdf in pdfs:
        # event-time order inside the micro-batch; right rows (side=0)
        # sort before left rows at equal ts so ties match (the column is
        # renamed from ``side_col`` because itertuples mangles
        # underscore-prefixed names)
        pdf = pdf.sort_values(["ts", "side"], kind="mergesort")
        for row in pdf.itertuples(index=False):
            if row.side == 0:
                if last_ts is None or row.ts >= last_ts:
                    last_ts, last_val = row.ts, row.value
            else:
                out.append(
                    (key[0], row.event_id, row.ts, row.value, last_val, last_ts)
                )
    if last_ts is not None:
        state.update((last_ts, last_val))
    yield pd.DataFrame(
        out,
        columns=["key", "event_id", "ts", "value", "asof_value", "asof_ts"],
    )


def streaming_asof_join(
    tagged: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    side_col: str = "_side",
) -> DataFrame:
    """Streaming as-of enrichment over a tagged union stream.

    ``tagged`` must be a STREAMING DataFrame carrying both sides:
    ``side_col`` = 0 for right (state-updating) rows, 1 for left rows to
    enrich; plus ``event_id`` to identify left rows in the output.
    Emits one row per left event with the latest-prior right value/ts
    (nulls before any right row)."""
    if not tagged.isStreaming:
        raise ValueError("streaming_asof_join requires a streaming DataFrame")
    shaped = tagged.select(
        F.col(key_col).cast("long").alias("key"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("value"),
        F.col(side_col).cast("int").alias("side"),
    )
    return shaped.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
