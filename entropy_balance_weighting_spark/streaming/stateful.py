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


# ---------------------------------------------------------------------------
# Streaming heavy-hitter candidates — Misra–Gries summaries in the state
# store, sharded by item hash (the streaming front half of the two-pass
# plan in functions/heavy_hitters.py; a periodic batch verify pass over
# the emitted candidates gives exact counts)
# ---------------------------------------------------------------------------

HH_STATE_SCHEMA = "items array<string>, counts array<long>, n_seen long"
HH_OUTPUT_SCHEMA = "shard int, item string, est long, shard_seen long"


def _hh_update_factory(capacity: int):
    from entropy_balance_weighting_spark.functions.heavy_hitters import (
        _mg_update,
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            items, counts, n_seen = state.get
            counters = dict(zip(items, counts))
        else:
            counters, n_seen = {}, 0
        for pdf in pdfs:
            n_seen += len(pdf)
            for it in pdf["item"]:
                _mg_update(counters, it, 1, capacity)
        state.update(
            (list(counters.keys()), list(counters.values()), n_seen)
        )
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(counters),
                "item": list(counters.keys()),
                "est": list(counters.values()),
                "shard_seen": [n_seen] * len(counters),
            }
        )

    return update


def streaming_heavy_hitter_candidates(
    stream: DataFrame,
    items,
    *,
    n_shards: int = 8,
    capacity: int = 64,
) -> DataFrame:
    """Streaming candidate generation for heavy hitters: explode the
    ``items`` array column, shard each item by hash (an item lives in
    exactly ONE shard, so per-shard Misra–Gries of capacity ``c``
    guarantees any item with cumulative count > shard_seen/c is among
    that shard's counters — no false negatives at that threshold, ever,
    regardless of arrival order), and keep one MG summary per shard in
    the state store.  Each micro-batch emits every touched shard's
    current counters with the shard's cumulative item count, so the
    consumer can evaluate the guarantee threshold per shard and run
    the EXACT verify pass (functions/heavy_hitters.py pass 2) over the
    union whenever it wants exact numbers.

    State per shard is ≤ ``capacity`` (item, count) pairs — the state
    store holds n_shards × capacity entries TOTAL, independent of the
    stream's distinct-item cardinality (the reason to sketch at all:
    a raw streaming groupBy(item) state grows with the vocabulary)."""
    from pyspark.sql import functions as F

    c = F.col(items) if isinstance(items, str) else items
    shaped = stream.select(F.explode(c).alias("item")).select(
        "item",
        F.pmod(F.xxhash64("item"), F.lit(n_shards)).cast("int").alias(
            "shard"
        ),
    )
    return shaped.groupBy("shard").applyInPandasWithState(
        _hh_update_factory(capacity),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming CDC compaction — the stateful sibling of
# functions/events.compact_changelog: the state store holds ONE row per
# key (the latest record under the version ordering), so state is
# bounded by the key space regardless of how much changelog streams
# through; each micro-batch emits the keys it touched with their new
# latest record (update output mode = the live snapshot delta)
# ---------------------------------------------------------------------------

CDC_STATE_SCHEMA = (
    "ver_major long, ver_minor long, last_type string, last_value double, "
    "n_changes long"
)
CDC_OUTPUT_SCHEMA = (
    "key long, last_type string, last_value double, n_changes long"
)


def _cdc_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    if state.exists:
        vmaj, vmin, ltype, lval, n = state.get
    else:
        vmaj, vmin, ltype, lval, n = None, None, None, None, 0
    for pdf in pdfs:
        n += len(pdf)
        # vectorized composite-version argmax (no per-row Python loop):
        # max ver_major, then idxmax of ver_minor within that slice.
        # Rows with a NULL version component are unorderable — skipped
        # from latest-record selection (still counted in n_changes),
        # mirroring the batch sibling's max_by NULL tolerance instead
        # of killing the stream on one malformed change record.
        valid = pdf.dropna(subset=["ver_major", "ver_minor"])
        if len(valid) == 0:
            continue
        top_major = valid["ver_major"].max()
        sub = valid[valid["ver_major"] == top_major]
        row = sub.loc[sub["ver_minor"].idxmax()]
        maj, mnr = int(row["ver_major"]), int(row["ver_minor"])
        if vmaj is None or (maj, mnr) > (vmaj, vmin):
            typ, val = row["op_type"], row["value"]
            vmaj, vmin = maj, mnr
            ltype = None if pd.isna(typ) else str(typ)
            lval = None if pd.isna(val) else float(val)
    state.update((vmaj, vmin, ltype, lval, n))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "last_type": [ltype],
            "last_value": [lval],
            "n_changes": [n],
        }
    )


def streaming_cdc_compact(
    changes: DataFrame,
    *,
    key_col: str = "user_id",
    ver_major_col: str = "ts",
    ver_minor_col: str = "event_id",
    op_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Streaming MERGE-to-snapshot: per-key latest record maintained in
    the state store across micro-batches.  State is ONE tuple per key
    (version, latest payload, change count) — bounded by the key space,
    never by changelog volume; out-of-order arrivals are handled by the
    version comparison, not arrival order, so the result equals the
    batch :func:`functions.events.compact_changelog` over the same
    records (pinned by the streamed≡batch fuzz test).  Write with
    update output mode: each micro-batch emits the live snapshot delta
    (keys touched, with their new latest record).  Tombstone semantics
    stay a downstream filter, same as the batch operator."""
    from pyspark.sql import functions as F

    # timestamps order at MICROSECOND fidelity (cast-to-long would
    # truncate to seconds and silently re-order sub-second versions);
    # covers timestamp_ntz too — parquet STREAM sources surface NTZ
    # (session tz is pinned UTC, so the NTZ→TZ cast is deterministic),
    # and a plain long-cast of NTZ is an AnalysisException
    dtypes = dict(changes.dtypes)
    maj = F.col(ver_major_col)
    maj = (
        F.unix_micros(maj.cast("timestamp"))
        if dtypes.get(ver_major_col, "").startswith("timestamp")
        else maj.cast("long")
    )
    shaped = changes.select(
        F.col(key_col).cast("long").alias("key"),
        maj.alias("ver_major"),
        F.col(ver_minor_col).cast("long").alias("ver_minor"),
        F.col(op_col).cast("string").alias("op_type"),
        F.col(value_col).cast("double").alias("value"),
    )
    return shaped.groupBy("key").applyInPandasWithState(
        _cdc_update,
        outputStructType=CDC_OUTPUT_SCHEMA,
        stateStructType=CDC_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
