"""Property test: sliding_window_agg_two_level == F.window native form for
random event sets and random (slide, overlap) geometry — the composition
must be exact for every decomposable aggregate regardless of where events
fall relative to pane/window boundaries (including exactly-on-boundary
timestamps, empty panes, and single-event windows)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from entropy_balance_weighting_spark.functions.events import (
    sliding_window_agg,
    sliding_window_agg_two_level,
)

T0 = dt.datetime(2026, 3, 1, 0, 0, 0)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(1, 120),
    slide_min=st.sampled_from([1, 2, 5]),
    overlap=st.integers(2, 6),
    on_boundary=st.booleans(),
)
def test_two_level_equals_native(spark, seed, n, slide_min, overlap, on_boundary):
    rng = np.random.default_rng(seed)
    span = slide_min * overlap * 60 * 4  # ~4 windows worth of seconds
    secs = rng.integers(0, span, size=n)
    if on_boundary:
        # force some timestamps exactly onto pane boundaries
        secs[: max(1, n // 3)] = (
            secs[: max(1, n // 3)] // (slide_min * 60)
        ) * (slide_min * 60)
    pdf = pd.DataFrame(
        {
            "ts": [T0 + dt.timedelta(seconds=int(s)) for s in secs],
            "event_type": rng.integers(0, 3, size=n).astype(str),
            "value": rng.uniform(-5, 5, size=n).round(3),
        }
    )
    ev = spark.createDataFrame(pdf)
    width = f"{slide_min * overlap} minutes"
    slide = f"{slide_min} minutes"
    native = sliding_window_agg(ev, width=width, slide=slide).collect()
    two = sliding_window_agg_two_level(ev, width=width, slide=slide).collect()
    key = lambda r: (r.window_start, r.event_type)
    a = {key(r): (r.n_events, round(r.value_sum, 6)) for r in native}
    b = {key(r): (r.n_events, round(r.value_sum, 6)) for r in two}
    assert a == b
