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


def test_exactly_two_corpus_scans_with_callable_threshold(spark, tmp_path):
    """The txt_heavy_hitters shape — callable min_count + explicit
    capacity — evaluates the source exactly TWICE (pass 1 sketch with
    ride-along totals, pass 2 verify): pinned by a side-effect counter
    stage under the operator (r11 verdict task: no scan before pass 1)."""
    import os

    marker = tmp_path / "scans"

    def count_scans(batches):
        with open(marker, "a") as f:
            f.write("p\n")
            f.flush()
        for pdf in batches:
            yield pdf

    rows = [(i, ["hot"] * 10 + [f"r{i}"]) for i in range(20)]
    df = (
        spark.createDataFrame(rows, "doc_id long, toks array<string>")
        .repartition(4)
        .mapInPandas(count_scans, "doc_id long, toks array<string>")
    )
    got = {
        r["item"]: r["count"]
        for r in hh.heavy_hitters(
            df, "toks", min_count=lambda n: max(1, n // 4), capacity=64
        ).collect()
    }
    assert got == {"hot": 200}  # threshold = 220//4 = 55
    passes = len(marker.read_text().splitlines()) / 4  # 4 partitions
    assert passes == 2, passes


def test_callable_min_count_matches_int_form(spark):
    rows = [(i, ["hot"] * 3 + ["cold"]) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    a = hh.heavy_hitters(df, "toks", min_count=10).collect()
    b = hh.heavy_hitters(
        df, "toks", min_count=lambda n: 10, capacity=32
    ).collect()
    c = hh.heavy_hitters(df, "toks", min_count=10, total=40).collect()
    assert (
        [(r["item"], r["count"]) for r in a]
        == [(r["item"], r["count"]) for r in b]
        == [(r["item"], r["count"]) for r in c]
        == [("hot", 30), ("cold", 10)]
    )


def test_capacity_clamp_warns(spark):
    df = spark.createDataFrame(
        [(0, ["x", "x", "y"])], "doc_id long, toks array<string>"
    )
    with pytest.warns(UserWarning, match="clamped"):
        got = hh.heavy_hitters(df, "toks", min_frac=1e-9).collect()
    assert {(r["item"], r["count"]) for r in got} == {("x", 2), ("y", 1)}
    # explicit over-cap capacity clamps too
    with pytest.warns(UserWarning, match="clamped"):
        got2 = hh.heavy_hitters(
            df, "toks", min_count=1, capacity=10_000_000
        ).collect()
    assert {(r["item"], r["count"]) for r in got2} == {("x", 2), ("y", 1)}


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


def test_streaming_candidates_guarantee_and_exact_verify(spark, tmp_path):
    """Streaming MG candidates across ≥2 micro-batches: the per-shard
    guarantee holds (every item with count > shard_seen/capacity is
    among the final candidates), estimates never exceed truth, and the
    batch verify pass over the emitted union reproduces the exact
    brute-force heavy set — the full streaming→verify pipeline."""
    from collections import Counter

    from pyspark.sql import functions as F

    from entropy_balance_weighting_spark.streaming import (
        streaming_heavy_hitter_candidates,
    )

    rows = []
    words = ["hub"] * 30 + ["spoke"] * 9 + [f"r{i}" for i in range(50)]
    for i in range(0, len(words), 4):
        rows.append((i, words[i : i + 4]))
    full = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    src = tmp_path / "hh_src"
    src.mkdir()
    full.filter(F.col("doc_id") % 8 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    full.filter(F.col("doc_id") % 8 != 0).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    stream = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = streaming_heavy_hitter_candidates(
        stream, "toks", n_shards=4, capacity=8
    )
    q = (
        out.writeStream.format("memory")
        .queryName("hh_cand")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hh_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert (
        len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 2
    )

    mem = spark.sql("SELECT * FROM hh_cand").toPandas()
    # last emission per (shard, item) = final MG state of that shard
    fin = mem.groupby(["shard", "item"]).last().reset_index()
    truth = Counter(w for _, ws in rows for w in ws)
    shard_seen = fin.groupby("shard")["shard_seen"].max()
    for _, r in fin.iterrows():
        assert r["est"] <= truth[r["item"]]  # MG never overestimates
    # guarantee: count > shard_seen/capacity => candidate present
    cand = set(fin["item"])
    from pyspark.sql import functions as F2

    shard_of = {
        r["item"]: r["shard"]
        for r in spark.createDataFrame(
            [(w,) for w in truth], "item string"
        ).select(
            "item",
            F2.pmod(F2.xxhash64("item"), F2.lit(4)).cast("int").alias("shard"),
        ).collect()
    }
    for w, n in truth.items():
        s = shard_of[w]
        if s in shard_seen.index and n > shard_seen[s] / 8:
            assert w in cand, (w, n)

    # exact verify over the emitted union == brute-force heavy set
    from entropy_balance_weighting_spark.functions.heavy_hitters import (
        heavy_hitters,
    )

    exact = {
        r["item"]: r["count"]
        for r in heavy_hitters(full, "toks", min_count=9).collect()
    }
    assert exact == {w: n for w, n in truth.items() if n >= 9}
    assert set(exact) <= cand  # the streaming union carried them all
