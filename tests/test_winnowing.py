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


def test_max_fp_df_caps_hot_fingerprints_keeps_exact_counts(spark):
    """The skew cap: a boilerplate passage shared by MANY docs must not
    generate candidates (df > max_fp_df), while a rare overlap still
    pairs — and the surviving pair's n_shared stays EXACT (recounted
    against the full fingerprint table, boilerplate included)."""
    from entropy_balance_weighting_spark.functions.dedup import (
        winnow_near_dup_pairs,
    )

    boiler = " ".join(f"tpl{i}" for i in range(30))
    rare = " ".join(f"sec{i}" for i in range(30))
    texts = [f"{boiler} u{j}a u{j}b u{j}c" for j in range(8)]
    # docs 100/101 share the rare passage AND the boilerplate
    texts += [f"{boiler} {rare} x1 x2", f"{boiler} {rare} y1 y2"]
    df = spark.createDataFrame(
        [(i if i < 8 else 92 + i, t) for i, t in enumerate(texts)],
        "id long, text string",
    )

    exact = winnow_near_dup_pairs(df, "id", "text", k=K, window=W, min_shared=3)
    exact_pairs = {(r.id_a, r.id_b): r.n_shared for r in exact.collect()}
    # boilerplate alone pairs everything with everything
    assert len(exact_pairs) == 45  # C(10,2)

    capped = winnow_near_dup_pairs(
        df, "id", "text", k=K, window=W, min_shared=3, max_fp_df=4
    )
    capped_pairs = {(r.id_a, r.id_b): r.n_shared for r in capped.collect()}
    # the hot boilerplate fingerprints no longer drive candidate volume
    # (a few junction windows can still select doc-correlated minima, so
    # a stray low-df pair is legitimate) and the rare-overlap pair survives
    assert (100, 101) in capped_pairs
    assert len(capped_pairs) <= 5  # vs 45 uncapped
    # and its count matches the exact mode (full-table recount)
    assert capped_pairs[(100, 101)] == exact_pairs[(100, 101)]
