"""Winnowing fingerprint guarantees: shared runs produce shared
fingerprints, short documents degrade to empty, and the scheme is
position-robust (unlike the whole-document fingerprint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from entropy_balance_weighting_spark.functions.text import winnow_fingerprints

K, W = 4, 5
GUARANTEE = K + W - 1  # any shared token run this long shares a fingerprint


def _fps(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    rows = df.select(
        "id", winnow_fingerprints(F.col("text"), k=K, window=W).alias("f")
    ).collect()
    return {r.id: set(r.f) for r in rows}

def test_shared_run_guarantees_shared_fingerprint(spark):
    run = " ".join(f"shared{i}" for i in range(GUARANTEE))
    a = "alpha beta gamma " + run + " delta epsilon"
    b = "zeta eta " + run + " theta iota kappa lam"
    fps = _fps(spark, [a, b])
    assert fps[0] & fps[1], "a shared k+w-1 run must share a fingerprint"


def test_disjoint_texts_share_nothing(spark):
    a = " ".join(f"left{i}" for i in range(30))
    b = " ".join(f"right{i}" for i in range(30))
    fps = _fps(spark, [a, b])
    assert not (fps[0] & fps[1])


def test_short_and_empty_docs_are_empty_not_crash(spark):
    fps = _fps(spark, ["", "one two three", " ".join(["x"] * (K + W - 2))])
    assert fps[0] == set()
    assert fps[1] == set()  # shorter than one full window of k-grams
    # exactly one window -> exactly one fingerprint
    one = _fps(spark, [" ".join(f"t{i}" for i in range(GUARANTEE))])
    assert len(one[0]) == 1


def test_position_shift_preserves_fingerprints(spark):
    body = " ".join(f"core{i}" for i in range(40))
    shifted = "pre1 pre2 pre3 " + body
    fps = _fps(spark, [body, shifted])
    # winnowing selects by local minima, so most of body's fingerprints
    # survive an offset — a rolling whole-doc hash would share nothing
    assert len(fps[0] & fps[1]) >= len(fps[0]) * 3 // 4
