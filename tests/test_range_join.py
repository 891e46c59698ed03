"""Semantics + plan tests for the bucketed range (interval) join.

The operator's contract: exact half-open ``[start, end)`` membership,
each matching (point, interval) pair exactly once, optional equi-keys,
and a physical plan that is a hash equi-join — never a nested loop.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from entropy_balance_weighting_spark.functions.events import range_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def _points(spark, rows):
    return spark.createDataFrame(rows, "pid long, ts timestamp")


def _intervals(spark, rows):
    return spark.createDataFrame(rows, "iid long, s timestamp, e timestamp")


def _pairs(df):
    return sorted((r.pid, r.iid) for r in df.collect())


def test_half_open_boundaries(spark):
    """ts == start is IN, ts == end is OUT — exactly, not approximately."""
    pts = _points(spark, [(1, _ts(0)), (2, _ts(30)), (3, _ts(29.999))])
    iv = _intervals(spark, [(10, _ts(0), _ts(30))])
    out = range_join(pts, iv, ts_col="ts", start_col="s", end_col="e",
                     bucket_seconds=600)
    assert _pairs(out) == [(1, 10), (3, 10)]


def test_interval_spanning_many_buckets_yields_each_pair_once(spark):
    """An interval covering many buckets must not duplicate pairs, and
    points anywhere inside it (including far from its start) must match."""
    pts = _points(spark, [(1, _ts(1)), (2, _ts(59)), (3, _ts(119)),
                          (4, _ts(121))])
    iv = _intervals(spark, [(10, _ts(0), _ts(120))])
    # 120-minute interval, 10-minute buckets -> 12 exploded rows
    out = range_join(pts, iv, ts_col="ts", start_col="s", end_col="e",
                     bucket_seconds=600)
    assert _pairs(out) == [(1, 10), (2, 10), (3, 10)]


def test_overlapping_intervals_multi_match(spark):
    pts = _points(spark, [(1, _ts(15))])
    iv = _intervals(spark, [(10, _ts(0), _ts(30)), (11, _ts(10), _ts(20)),
                            (12, _ts(16), _ts(40))])
    out = range_join(pts, iv, ts_col="ts", start_col="s", end_col="e",
                     bucket_seconds=60)
    assert _pairs(out) == [(1, 10), (1, 11)]


def test_empty_interval_dropped(spark):
    """end <= start is empty under the half-open convention (and must not
    crash the bucket sequence, which would otherwise run descending)."""
    pts = _points(spark, [(1, _ts(5))])
    iv = _intervals(spark, [(10, _ts(5), _ts(5)), (11, _ts(7), _ts(3))])
    out = range_join(pts, iv, ts_col="ts", start_col="s", end_col="e",
                     bucket_seconds=600)
    assert _pairs(out) == []


def test_equi_keys_restrict_matches(spark):
    pts = spark.createDataFrame(
        [(1, "a", _ts(10)), (2, "b", _ts(10))], "pid long, k string, ts timestamp"
    )
    iv = spark.createDataFrame(
        [(10, "a", _ts(0), _ts(30))], "iid long, k string, s timestamp, e timestamp"
    )
    out = range_join(pts, iv, ts_col="ts", start_col="s", end_col="e",
                     on=("k",), bucket_seconds=600)
    assert _pairs(out) == [(1, 10)]


def test_matches_naive_inequality_join(spark):
    """Randomized cross-check vs the naive O(N·M) definition."""
    import random

    rng = random.Random(7)
    pts_rows = [(i, _ts(rng.uniform(0, 600))) for i in range(200)]
    iv_rows = []
    for j in range(40):
        s = rng.uniform(0, 600)
        iv_rows.append((j, _ts(s), _ts(s + rng.uniform(0.1, 90))))
    expected = sorted(
        (pid, iid)
        for pid, ts in pts_rows
        for iid, s, e in iv_rows
        if s <= ts < e
    )
    out = range_join(
        _points(spark, pts_rows), _intervals(spark, iv_rows),
        ts_col="ts", start_col="s", end_col="e", bucket_seconds=1234,
    )
    assert _pairs(out) == expected


def test_salted_equivalent_to_unsalted(spark):
    """n_salts>1 must change the partitioning only, never the pairs —
    including with identical timestamps (the skew being cured) and with
    equi-keys in play."""
    pts_rows = [(i, "a" if i % 2 else "b", _ts(10)) for i in range(50)]
    pts_rows += [(100 + i, "a", _ts(i * 7.3)) for i in range(30)]
    pts = spark.createDataFrame(pts_rows, "pid long, k string, ts timestamp")
    iv = spark.createDataFrame(
        [(1, "a", _ts(0), _ts(60)), (2, "b", _ts(5), _ts(12)),
         (3, "a", _ts(100), _ts(250))],
        "iid long, k string, s timestamp, e timestamp",
    )
    kw = dict(ts_col="ts", start_col="s", end_col="e", on=("k",),
              bucket_seconds=600)
    plain = _pairs(range_join(pts, iv, **kw))
    salted = _pairs(range_join(pts, iv, n_salts=4, **kw))
    assert salted == plain and len(plain) > 0


def test_stream_static_range_join_matches_batch(spark, tmp_path):
    """The operator is streaming-native on the points side: bucket
    derivation + stream-static inner equi-join + residual filter are all
    stateless, so a point stream range-joins against a static interval
    table with no watermark or state store.  Drained with availableNow,
    the stream must reproduce the batch pairs exactly."""
    import random

    rng = random.Random(11)
    pts_rows = [(i, _ts(rng.uniform(0, 300))) for i in range(120)]
    iv_rows = [(j, _ts(j * 11.0), _ts(j * 11.0 + 25)) for j in range(25)]
    pts = _points(spark, pts_rows)
    iv = _intervals(spark, iv_rows)
    kw = dict(ts_col="ts", start_col="s", end_col="e", bucket_seconds=900)
    expected = _pairs(range_join(pts, iv, **kw))

    src = str(tmp_path / "pts_src")
    pts.coalesce(2).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(pts.schema).parquet(src)
    q = (
        range_join(stream, iv, **kw)
        .writeStream.format("memory")
        .queryName("rj_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.pid, r.iid) for r in spark.sql("SELECT * FROM rj_stream").collect()
    )
    assert got == expected and len(expected) > 0


def test_plan_is_hash_join_not_nested_loop(spark):
    pts = _points(spark, [(1, _ts(0))])
    iv = _intervals(spark, [(10, _ts(0), _ts(30))])
    out = range_join(pts, iv, ts_col="ts", start_col="s", end_col="e",
                     bucket_seconds=600)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_left_join_keeps_unmatched_points(spark):
    """how='left': points in a matched bucket whose range check fails
    must still appear (nulls) — the trap a naive left-join-then-filter
    plan falls into — and matched points must not duplicate."""
    pts = _points(spark, [(1, _ts(5)), (2, _ts(25)), (3, _ts(500))])
    iv = _intervals(spark, [(10, _ts(0), _ts(10)), (11, _ts(0), _ts(10))])
    out = range_join(
        pts, iv, ts_col="ts", start_col="s", end_col="e",
        bucket_seconds=1800, how="left", point_id="pid",
    )
    rows = sorted((r.pid, r.iid) for r in out.collect())
    # pid=1 matches both intervals; pid=2 shares the bucket but fails the
    # range; pid=3 has no interval bucket at all
    assert rows == [(1, 10), (1, 11), (2, None), (3, None)]


def test_left_join_requires_point_id(spark):
    import pytest as _pytest

    pts = _points(spark, [(1, _ts(5))])
    iv = _intervals(spark, [(10, _ts(0), _ts(10))])
    with _pytest.raises(ValueError, match="point_id"):
        range_join(pts, iv, ts_col="ts", start_col="s", end_col="e",
                   how="left")
