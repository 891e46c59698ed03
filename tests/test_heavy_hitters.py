"""Two-pass heavy hitters (functions/heavy_hitters.py): MG update
semantics, the no-false-negative candidate guarantee, exact output vs
brute force (including under hypothesis-random data), capacity bound."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.functions import heavy_hitters as hh


def test_mg_update_classic_sequence():
    """The textbook MG property on a hand trace: a counter set of
    capacity c never exceeds c entries, and any item with freq > n/(c+1)
    survives the stream."""
    stream = list("aabacadaeafaga")  # 'a' 7 of 14, others 1 each
    counters: dict = {}
    for it in stream:
        hh._mg_update(counters, it, 1, 2)
    assert len(counters) <= 2
    assert "a" in counters  # freq 7 > 14/3


def test_exact_output_matches_brute_force(spark):
    rows = []
    words = (["hot"] * 40 + ["warm"] * 12 + ["cool"] * 3
             + [f"rare{i}" for i in range(60)])
    for i in range(0, len(words), 5):
        rows.append((i, words[i : i + 5]))
    df = spark.createDataFrame(rows, "doc_id long, toks array<string>")

    got = {
        r["item"]: r["count"]
        for r in hh.heavy_hitters(df, "toks", min_count=10).collect()
    }
    truth = Counter(w for _, ws in rows for w in ws)
    want = {w: n for w, n in truth.items() if n >= 10}
    assert got == want  # exact counts, no false pos/neg

    # min_frac form agrees with its own arithmetic
    import math

    total = sum(truth.values())
    thr = max(1, math.ceil(total * 0.08))
    got_f = {
        r["item"]: r["count"]
        for r in hh.heavy_hitters(df, "toks", min_frac=0.08).collect()
    }
    assert got_f == {w: n for w, n in truth.items() if n >= thr}


@settings(max_examples=15, deadline=None)
@given(
    data=st.lists(
        st.lists(
            st.sampled_from([f"w{i}" for i in range(12)]),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=25,
    ),
    min_count=st.integers(min_value=1, max_value=8),
)
def test_heavy_hitters_exact_fuzz(spark, data, min_count):
    """Random multisets across random partitioning: output is always
    exactly the brute-force filter — the two-pass plan can neither
    miss a heavy item nor report a wrong count."""
    df = spark.createDataFrame(
        [(i, ws) for i, ws in enumerate(data)],
        "doc_id long, toks array<string>",
    ).repartition(3)
    got = {
        r["item"]: r["count"]
        for r in hh.heavy_hitters(df, "toks", min_count=min_count).collect()
    }
    truth = Counter(w for ws in data for w in ws)
    assert got == {w: n for w, n in truth.items() if n >= min_count}


def test_null_arrays_and_requires_threshold(spark):
    df = spark.createDataFrame(
        [(0, ["x", "x"]), (1, None)], "doc_id long, toks array<string>"
    )
    got = hh.heavy_hitters(df, "toks", min_count=2).collect()
    assert [(r["item"], r["count"]) for r in got] == [("x", 2)]
    with pytest.raises(ValueError, match="min_count or min_frac"):
        hh.heavy_hitters(df, "toks")


def test_candidate_superset_guarantee_tight_capacity(spark):
    """With the DEFAULT capacity the candidate union provably contains
    every item at the threshold even under adversarial partitioning —
    pinned by skew: one partition all-heavy, others all-noise."""
    heavy = [(i, ["hub"] * 6) for i in range(10)]  # 60 occurrences
    noise = [(100 + i, [f"n{i}_{j}" for j in range(6)]) for i in range(40)]
    df = spark.createDataFrame(
        heavy + noise, "doc_id long, toks array<string>"
    ).repartition(8)
    out = hh.heavy_hitters(df, "toks", min_count=60).collect()
    assert [(r["item"], r["count"]) for r in out] == [("hub", 60)]
