"""CDC changelog compaction (functions/events.compact_changelog) and
cross-table fuzzy join (functions/dedup.fuzzy_join_jaccard): brute-force
equivalence, plan shape (aggregate not window), skew-cap contract."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from entropy_balance_weighting_spark.functions import dedup, events


def test_compact_changelog_matches_bruteforce(spark):
    rng = random.Random(11)
    rows = []
    for i in range(300):
        key = rng.randrange(25)
        rows.append((i, key, rng.choice("abcd"), rng.random()))
    df = spark.createDataFrame(
        rows, "seq long, key long, op string, val double"
    ).repartition(5)
    out = {
        r["key"]: (r["seq"], r["op"], r["n_changes"])
        for r in events.compact_changelog(
            df, keys=("key",), version=("seq",)
        ).collect()
    }
    # brute force: max seq per key
    want: dict = {}
    counts: dict = {}
    for seq, key, op, _v in rows:
        counts[key] = counts.get(key, 0) + 1
        if key not in want or seq > want[key][0]:
            want[key] = (seq, op)
    assert out == {k: (s, o, counts[k]) for k, (s, o) in want.items()}


def test_compact_changelog_plan_is_aggregate_not_window(spark):
    """The scale contract: latest-per-key plans as a partial-merge
    aggregate (map-side pre-compaction), NOT a window sort over every
    change record."""
    df = spark.createDataFrame(
        [(0, 1, "a"), (1, 1, "b")], "seq long, key long, op string"
    )
    out = events.compact_changelog(df, keys=("key",), version=("seq",))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "max_by" in plan
    assert "Window" not in plan, plan[:1500]
    # partial + final aggregate pair around the exchange
    assert plan.count("Aggregate") >= 2, plan[:1500]


def test_compact_changelog_multi_column_version_and_keys(spark):
    df = spark.createDataFrame(
        [
            (1, 10, 1, 0, "old"),
            (1, 10, 1, 1, "new"),   # same ts, higher seq wins
            (1, 10, 2, 0, "newer"),  # higher ts wins over seq
            (2, 10, 1, 9, "other-key"),
        ],
        "a long, b long, ts long, seq long, tag string",
    )
    out = {
        (r["a"], r["b"]): (r["tag"], r["n_changes"])
        for r in events.compact_changelog(
            df, keys=("a", "b"), version=("ts", "seq")
        ).collect()
    }
    assert out == {(1, 10): ("newer", 3), (2, 10): ("other-key", 1)}


def _brute_jaccard(lrows, rrows, threshold):
    def toks(t):
        return set(t.lower().split())

    out = set()
    for lid, lt in lrows:
        for rid, rt in rrows:
            a, b = toks(lt), toks(rt)
            if not a | b:
                continue
            j = round(len(a & b) / len(a | b), 6)
            if j >= threshold:
                out.add((lid, rid, j))
    return out


def test_fuzzy_join_matches_bruteforce(spark):
    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(30)]
    lrows = [
        (i, " ".join(rng.choices(vocab, k=rng.randrange(3, 12))))
        for i in range(40)
    ]
    rrows = [
        (100 + i, " ".join(rng.choices(vocab, k=rng.randrange(1, 8))))
        for i in range(15)
    ] + [(999, "")]  # empty probe: must never match / never crash
    left = spark.createDataFrame(lrows, "lid long, ltext string")
    right = spark.createDataFrame(rrows, "rid long, rtext string")
    got = {
        (r["lid"], r["rid"], r["jaccard"])
        for r in dedup.fuzzy_join_jaccard(
            left, right,
            left_id="lid", left_text="ltext",
            right_id="rid", right_text="rtext",
            threshold=0.4,
        ).collect()
    }
    assert got == _brute_jaccard(lrows, rrows, 0.4)


def test_fuzzy_join_max_token_df_contract(spark):
    """The skew cap drops candidates whose shared tokens are ALL hot;
    pairs sharing at least one rare token keep their EXACT jaccard."""
    left = spark.createDataFrame(
        [(1, "hot rare1 x"), (2, "hot y"), (3, "hot z"), (4, "hot w")],
        "lid long, ltext string",
    )
    right = spark.createDataFrame(
        [(10, "hot rare1 x")], "rid long, rtext string"
    )
    full = {
        (r["lid"], r["rid"])
        for r in dedup.fuzzy_join_jaccard(
            left, right, left_id="lid", left_text="ltext",
            right_id="rid", right_text="rtext", threshold=0.01,
        ).collect()
    }
    assert full == {(1, 10), (2, 10), (3, 10), (4, 10)}
    capped = {
        (r["lid"], r["rid"]): r["jaccard"]
        for r in dedup.fuzzy_join_jaccard(
            left, right, left_id="lid", left_text="ltext",
            right_id="rid", right_text="rtext", threshold=0.01,
            max_token_df=2,
        ).collect()
    }
    # 'hot' (df 4) is blocked: only the rare1/x-sharing pair survives,
    # with its exact (uncapped) jaccard of 1.0
    assert set(capped) == {(1, 10)}
    assert capped[(1, 10)] == 1.0


def test_fuzzy_join_prefix_blocking_starves_stopword_block(spark):
    """The r12→r13 skew fix, pinned on candidate VOLUME: a stopword
    shared by EVERY doc on both sides must not drive the candidate
    join to |L|·|R|.  With rarest-k prefix blocking the stopword sorts
    last in the global df order and never enters a prefix (every doc
    here has n=4 distinct tokens, t=0.8 → prefix length 1 = its rarest
    token), so candidates collapse to the true near-matches instead of
    the 60·20 cross block a share-any-token scheme generates."""
    n_l, n_r = 60, 20
    lrows = [(i, f"the la{i} lb{i} lc{i}") for i in range(n_l)]
    # right probe r matches left doc r exactly (plus the stopword)
    rrows = [(1000 + i, f"the la{i} lb{i} lc{i}") for i in range(n_r)]
    left = spark.createDataFrame(lrows, "lid long, ltext string")
    right = spark.createDataFrame(rrows, "rid long, rtext string")
    lt = left.select(
        F.col("lid").alias("__lid"),
        dedup._fuzzy_tokset("ltext").alias("__ltoks"),
    )
    rt = right.select(
        F.col("rid").alias("__rid"),
        dedup._fuzzy_tokset("rtext").alias("__rtoks"),
    )
    cand = dedup.fuzzy_join_candidates(lt, rt, threshold=0.8).collect()
    got = {(r["__lid"], r["__rid"]) for r in cand}
    # exactly the 20 true pairs — the 1200-pair stopword block is gone
    assert got == {(i, 1000 + i) for i in range(n_r)}
    # and the end-to-end join still finds every true pair (completeness)
    full = {
        (r["lid"], r["rid"])
        for r in dedup.fuzzy_join_jaccard(
            left, right, left_id="lid", left_text="ltext",
            right_id="rid", right_text="rtext", threshold=0.8,
        ).collect()
    }
    assert full == {(i, 1000 + i) for i in range(n_r)}


def test_fuzzy_join_prefix_complete_across_thresholds(spark):
    """Prefix blocking must stay COMPLETE (identical result set to the
    brute force) across thresholds — the lemma's ⌊(1−t)·n⌋+1 prefix
    length, including the float-rounding nudge at t where (1−t)·n
    lands on an integer in exact arithmetic."""
    rng = random.Random(29)
    vocab = [f"w{i}" for i in range(25)]
    lrows = [
        (i, " ".join(rng.choices(vocab, k=rng.randrange(2, 10))))
        for i in range(35)
    ]
    rrows = [
        (100 + i, " ".join(rng.choices(vocab, k=rng.randrange(1, 10))))
        for i in range(12)
    ]
    left = spark.createDataFrame(lrows, "lid long, ltext string")
    right = spark.createDataFrame(rrows, "rid long, rtext string")
    for t in (0.2, 0.25, 0.5, 0.8, 1.0):
        got = {
            (r["lid"], r["rid"], r["jaccard"])
            for r in dedup.fuzzy_join_jaccard(
                left, right, left_id="lid", left_text="ltext",
                right_id="rid", right_text="rtext", threshold=t,
                broadcast_right=(t < 0.5),  # exercise both verify paths
            ).collect()
        }
        assert got == _brute_jaccard(lrows, rrows, t), t


def test_fuzzy_join_rejects_bad_threshold(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a")], "id long, t string")
    df2 = spark.createDataFrame([(1, "a")], "id2 long, t string")
    for t in (0.0, -0.1, 1.5):
        with _pytest.raises(ValueError, match="threshold"):
            dedup.fuzzy_join_jaccard(
                df, df2, left_id="id", left_text="t",
                right_id="id2", right_text="t", threshold=t,
            ).collect()


def test_fuzzy_join_rejects_same_id_names(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a")], "id long, t string")
    with _pytest.raises(ValueError, match="must differ"):
        dedup.fuzzy_join_jaccard(
            df, df, left_id="id", left_text="t",
            right_id="id", right_text="t",
        )


def test_fuzzy_join_blocking_modes_agree(spark):
    """`blocking="any"` (the dense-corpus escape hatch) must produce the
    identical result set as the default prefix blocking — both are
    complete; they differ only in candidate volume."""
    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(30)]
    lrows = [
        (i, " ".join(rng.choices(vocab, k=rng.randrange(2, 9))))
        for i in range(30)
    ]
    rrows = [
        (100 + i, " ".join(rng.choices(vocab, k=rng.randrange(1, 9))))
        for i in range(10)
    ]
    left = spark.createDataFrame(lrows, "lid long, ltext string")
    right = spark.createDataFrame(rrows, "rid long, rtext string")
    kw = dict(
        left_id="lid", left_text="ltext", right_id="rid",
        right_text="rtext", threshold=0.5,
    )
    a = {
        (r["lid"], r["rid"], r["jaccard"])
        for r in dedup.fuzzy_join_jaccard(left, right, **kw).collect()
    }
    b = {
        (r["lid"], r["rid"], r["jaccard"])
        for r in dedup.fuzzy_join_jaccard(
            left, right, blocking="any", **kw
        ).collect()
    }
    assert a == b == _brute_jaccard(lrows, rrows, 0.5)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="blocking"):
        dedup.fuzzy_join_jaccard(left, right, blocking="xor", **kw)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    seed=st.integers(0, 10**9),
    threshold=st.sampled_from([0.15, 0.34, 0.5, 0.67, 0.99, 1.0]),
)
def test_fuzzy_join_prefix_completeness_fuzz(spark, seed, threshold):
    """Property: prefix blocking NEVER loses a pair the brute force
    finds, for random corpora (1-token docs, duplicate docs, universal
    stopwords, empty-ish probes) and thresholds including the exact-1.0
    edge where the prefix collapses to a single token per doc."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(rng.randrange(5, 40))] + ["the", "of"]
    def doc():
        base = rng.choices(vocab, k=rng.randrange(1, 12))
        if rng.random() < 0.7:
            base += ["the"]  # universal-ish stopword
        return " ".join(base)
    lrows = [(i, doc()) for i in range(rng.randrange(5, 30))]
    rrows = [(1000 + i, doc()) for i in range(rng.randrange(1, 12))]
    left = spark.createDataFrame(lrows, "lid long, ltext string")
    right = spark.createDataFrame(rrows, "rid long, rtext string")
    got = {
        (r["lid"], r["rid"])
        for r in dedup.fuzzy_join_jaccard(
            left, right, left_id="lid", left_text="ltext",
            right_id="rid", right_text="rtext", threshold=threshold,
        ).collect()
    }
    want = {(l, r) for l, r, _j in _brute_jaccard(lrows, rrows, threshold)}
    assert got == want
