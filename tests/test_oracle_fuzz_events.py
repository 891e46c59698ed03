"""Fuzzed oracle parity over the EVENT queries: random event streams
with timestamps deliberately planted on window/session/day boundaries —
tumbling/sliding window assignment, session-gap closure, funnel
strictly-after semantics, and retention day-offsets are exactly where
two engines' timestamp arithmetic can silently fork."""

from __future__ import annotations

import datetime as dt
import shutil

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_SMOKE

FUZZ_QUERIES = [
    "ev_tumbling_windows",
    "ev_sliding_windows",
    "ev_sessionization",
    "ev_time_rollup",
    "ev_type_pivot",
    "ev_funnel_steps",
    "ev_retention_cohorts",
    "ev_asof_join",
    "ev_range_join",
    "ev_user_type_cube",
]

TYPES = ["signup", "click", "error", "view", "purchase"]
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _rows(seed):
    import numpy as np

    rng = np.random.default_rng(seed)

    def nxt(n):
        return int(rng.integers(n))

    n_ev = 20 + nxt(60)
    rows = []
    for i in range(n_ev):
        # spread over ~4 days; 1-in-3 events land EXACTLY on an hour or
        # 30-minute boundary (window edges), some on midnight (day edges)
        sec = nxt(4 * 86400)
        kind = nxt(6)
        if kind == 0:
            sec = (sec // 3600) * 3600            # exact hour boundary
        elif kind == 1:
            sec = (sec // 1800) * 1800            # exact slide boundary
        elif kind == 2:
            sec = (sec // 86400) * 86400          # exact midnight
        micro = 0 if kind < 3 else nxt(1_000_000)
        rows.append(
            (
                i,
                T0 + dt.timedelta(seconds=sec, microseconds=micro),
                nxt(8),
                TYPES[nxt(len(TYPES))],
                round(nxt(100000) / 100.0, 2),
                '{"k": %d}' % nxt(100),
            )
        )
    return rows


@settings(max_examples=3, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 10**9))
def test_event_queries_match_oracle_on_random_streams(
    spark, tmp_path_factory, seed
):
    from entropy_balance_weighting_spark.queries import QUERIES

    tmp = tmp_path_factory.mktemp("fuzz_ev")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"]:
        shutil.copy(f"{SF_SMOKE}/{t}.parquet", tmp / f"{t}.parquet")
    pdf = pd.DataFrame(
        _rows(seed),
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf.to_parquet(tmp / "events.parquet", index=False)

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{tmp}/{t}.parquet'")

    for name in FUZZ_QUERIES:
        q = QUERIES[name]
        srows = sorted(
            tuple(f"{v:.9g}" if isinstance(v, float) else repr(v) for v in r)
            for r in q.fn(spark, str(tmp)).collect()
        )
        orows = sorted(
            tuple(f"{v:.9g}" if isinstance(v, float) else repr(v) for v in r)
            for r in con.execute(q.oracle).fetchall()
        )
        assert srows == orows, (name, srows[:3], orows[:3])
    con.close()
