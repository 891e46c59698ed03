"""Connected-components dedup clustering: topology cases the registered
query (dense LSH cliques) does not exercise."""

from __future__ import annotations

import random

from entropy_balance_weighting_spark.functions.dedup import (
    connected_components,
    label_propagation_components,
    star_components,
)


def _clusters(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    rows = connected_components(df).collect()
    return {r.id: r.cluster_id for r in rows}


def test_chain_graph_transitive(spark):
    # 1-2, 2-3, 3-4: transitivity must collapse the whole chain even though
    # (1,4) never appears as a pair — needs multiple propagation rounds
    got = _clusters(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_multiple_components(spark):
    got = _clusters(spark, [(10, 11), (11, 12), (20, 21), (30, 31)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30}


def test_label_flows_against_edge_direction(spark):
    # min id appears on the RIGHT of its pair: label must flow both ways
    got = _clusters(spark, [(5, 1), (5, 9)])
    assert got == {1: 1, 5: 1, 9: 1}


def test_long_chain_converges(spark):
    n = 12
    got = _clusters(spark, [(i, i + 1) for i in range(n)])
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_only_paired_nodes_appear(spark):
    got = _clusters(spark, [(3, 7)])
    assert got == {3: 3, 7: 3}


def test_chain_diameter_much_larger_than_rounds(spark):
    # The worst case for label propagation: a 64-node chain (diameter 63)
    # shuffled so edge order carries no signal.  Large-star/small-star must
    # close it in O(log² n) rounds — far fewer than the diameter.
    n = 64
    pairs = [(i, i + 1) for i in range(n - 1)]
    random.Random(7).shuffle(pairs)
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    labels, rounds = star_components(df, max_rounds=25)
    got = {r.id: r.cluster_id for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    # 63 propagation rounds would be needed; the star alternation takes ~log n
    assert rounds <= 10, f"expected O(log² n) rounds, took {rounds}"


def test_star_matches_label_propagation_random_graph(spark):
    # Independent-implementation parity on a random multi-component graph.
    rng = random.Random(42)
    nodes = list(range(200))
    pairs = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(150)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    star = {r.id: r.cluster_id for r in connected_components(df).collect()}
    prop = {
        r.id: r.cluster_id for r in label_propagation_components(df).collect()
    }
    assert star == prop


def test_remove_boilerplate_lines_newline_mode(spark):
    """Literal-newline corpus: the shared footer line is removed from
    every doc, unique lines survive in order, and a doc that is ALL
    boilerplate comes back empty (still one output row)."""
    import pandas as pd

    from entropy_balance_weighting_spark.functions.dedup import (
        remove_boilerplate_lines,
    )

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "alpha one\ncookie banner\nbeta two",
                "gamma three\ncookie banner",
                "cookie banner",
                "delta four\nepsilon five",
            ],
        }
    )
    out = {
        r["id"]: r
        for r in remove_boilerplate_lines(
            spark.createDataFrame(docs), min_doc_count=3
        ).collect()
    }
    assert out[1]["clean_text"] == "alpha one\nbeta two"
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 2)
    assert out[2]["clean_text"] == "gamma three"
    assert out[3]["clean_text"] == "" and out[3]["n_kept"] == 0
    assert out[4]["clean_text"] == "delta four\nepsilon five"
    assert out[4]["n_kept"] == 2


def test_remove_boilerplate_lines_word_segment_mode(spark):
    """line_words mode: segmentation boundaries, ragged tails, and the
    threshold are all honored; nothing is removed below min_doc_count."""
    import pandas as pd

    from entropy_balance_weighting_spark.functions.dedup import (
        doc_lines,
        remove_boilerplate_lines,
    )

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["a b c d e", "a b x"],
        }
    )
    df = spark.createDataFrame(docs)
    lines = {
        (r["id"], r["pos"]): r["line"]
        for r in doc_lines(df, line_words=2).collect()
    }
    assert lines[(1, 0)] == "a b" and lines[(1, 1)] == "c d"
    assert lines[(1, 2)] == "e"  # ragged tail keeps the remainder
    assert lines[(2, 1)] == "x"
    out = {
        r["id"]: r
        for r in remove_boilerplate_lines(
            df, min_doc_count=2, line_words=2
        ).collect()
    }
    # "a b" occurs in both docs -> removed; everything else unique -> kept
    assert out[1]["clean_text"] == "c d e"
    assert out[2]["clean_text"] == "x"
    strict = remove_boilerplate_lines(df, min_doc_count=3, line_words=2)
    assert {r["id"]: r["clean_text"] for r in strict.collect()} == {
        1: "a b c d e",
        2: "a b x",
    }


def test_duplicated_span_profile_overlap_merge(spark):
    """A shared 8-token span with k=6 yields 3 gram occurrences per doc
    but only 8 covered positions (overlapping grams merge); a doc with
    no cross-doc span is absent from the output."""
    from entropy_balance_weighting_spark.functions.dedup import (
        duplicated_span_profile,
    )

    span = "q w e r t y u i"  # 8 tokens, shared verbatim by docs 1 and 2
    docs = spark.createDataFrame(
        [
            (1, span + " aa bb"),
            (2, "cc dd " + span),
            (3, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r
        for r in duplicated_span_profile(docs, k=6, min_df=2).collect()
    }
    assert set(out) == {1, 2}
    for did, n_tok in [(1, 10), (2, 10)]:
        assert out[did]["n_tokens"] == n_tok
        assert out[did]["n_dup_grams"] == 3  # positions 0,1,2 of the span
        assert out[did]["n_covered"] == 8  # merged, not 3*6
        assert abs(out[did]["coverage"] - 0.8) < 1e-9


def test_duplicated_span_profile_within_doc_repeat_not_flagged(spark):
    """Document frequency counts DISTINCT docs: a 6-gram repeated twice
    inside ONE document is not a cross-doc duplicated span (within-doc
    repetition is txt_repetition's job)."""
    from entropy_balance_weighting_spark.functions.dedup import (
        duplicated_span_profile,
    )

    rep = "a b c d e f"
    docs = spark.createDataFrame(
        [(1, rep + " zz " + rep), (2, "totally different words here now ok")],
        "doc_id long, text string",
    )
    assert duplicated_span_profile(docs, k=6, min_df=2).count() == 0


def test_duplicated_span_profile_short_docs_skipped(spark):
    """Documents shorter than k tokens produce no grams and no rows —
    and no sequence() error for negative bounds."""
    from entropy_balance_weighting_spark.functions.dedup import (
        duplicated_span_profile,
    )

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "x")], "doc_id long, text string"
    )
    assert duplicated_span_profile(docs, k=6, min_df=2).count() == 0


def test_duplicated_span_profile_nocache_mode_identical(spark):
    """cache=False (the flat-memory recompute mode) and an explicit
    storage level must produce exactly the cached default's rows."""
    from pyspark import StorageLevel

    from entropy_balance_weighting_spark.functions.dedup import (
        duplicated_span_profile,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "x a b c d e f g y z"),
            (3, "p q r s t u v w aa bb"),
        ],
        "doc_id long, text string",
    )
    want = sorted(
        map(tuple, duplicated_span_profile(docs, k=6, min_df=2).collect())
    )
    got_nc = sorted(
        map(
            tuple,
            duplicated_span_profile(docs, k=6, min_df=2, cache=False).collect(),
        )
    )
    got_disk = sorted(
        map(
            tuple,
            duplicated_span_profile(
                docs, k=6, min_df=2, storage_level=StorageLevel.DISK_ONLY
            ).collect(),
        )
    )
    assert want == got_nc == got_disk
    assert len(want) == 2  # docs 1 and 2 share the 6-gram "a b c d e f"


def test_semantic_dedup_assignments_geometry(spark):
    """Two orthogonal seed cells; near-parallel vectors land in the same
    cell and every one except the lowest id is removed; an opposite-sign
    vector in the other cell survives."""
    import math

    from entropy_balance_weighting_spark.functions.similarity import (
        semantic_dedup_assignments,
    )

    def unit(theta):
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    rows = [
        (0, unit(0.0)),          # seed cell 0
        (1, unit(math.pi / 2)),  # seed cell 1
        (2, unit(0.05)),         # cell 0, cos(2,0)=0.9988 -> removed
        (3, unit(0.10)),         # cell 0, cos(3,2)=0.9988 -> removed
        (4, unit(math.pi / 2 + 0.05)),  # cell 1, near seed 1 -> removed
        (5, unit(math.pi / 4 + 0.02)),  # cell 1 (closer to 90deg side)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = {
        r["id"]: (r["cell_id"], r["removed"])
        for r in semantic_dedup_assignments(
            emb, n_cells=2, threshold=0.95
        ).collect()
    }
    assert out[0] == (0, 0)  # seeds keep themselves
    assert out[1] == (1, 0)
    assert out[2] == (0, 1)
    assert out[3] == (0, 1)
    assert out[4] == (1, 1)
    # 45deg+0.02 -> cell 1 (barely), but cos to seed1 ~= 0.72 < 0.95: kept
    assert out[5] == (1, 0)


def test_semantic_dedup_blas_mode_matches_pairs_mode(spark):
    """The BLAS scale path (per-cell applyInPandas gram + vectorized
    argmax assignment) must produce exactly the JVM pair-join mode's
    assignments and removals — same centers, same rounding, same
    lowest-cell-id tie-break — for both seed-mode and explicit k-means
    centers."""
    import numpy as np

    from entropy_balance_weighting_spark.functions.similarity import (
        semantic_dedup_assignments,
    )

    rng = np.random.default_rng(17)
    n = 120
    vecs = rng.normal(size=(n, 8))
    for i in range(0, n, 6):  # planted near-parallel copies
        vecs[(i + 3) % n] = vecs[i] + rng.normal(scale=0.02, size=8)
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    centers = vecs[:5] + 0.1  # explicit centroid array (k-means stand-in)
    a = sorted(
        (r["id"], r["cell_id"], r["removed"])
        for r in semantic_dedup_assignments(
            emb, threshold=0.9, centers=centers, method="pairs"
        ).collect()
    )
    b = sorted(
        (r["id"], r["cell_id"], r["removed"])
        for r in semantic_dedup_assignments(
            emb, threshold=0.9, centers=centers, method="blas"
        ).collect()
    )
    assert a == b
    assert sum(r[2] for r in a) > 0  # removals actually fired
    # seed mode: blas falls back to the JVM assignment + pandas dedup
    c = sorted(
        (r["id"], r["cell_id"], r["removed"])
        for r in semantic_dedup_assignments(
            emb, n_cells=4, threshold=0.9, method="blas"
        ).collect()
    )
    d = sorted(
        (r["id"], r["cell_id"], r["removed"])
        for r in semantic_dedup_assignments(
            emb, n_cells=4, threshold=0.9, method="pairs"
        ).collect()
    )
    assert c == d
    from entropy_balance_weighting_spark.functions.similarity import (
        fit_ivf_quantizer,
    )

    # r9: the sampled/minibatch quantizer fit feeds the same invariance —
    # blas and pairs modes must agree exactly on ITS centers too (the
    # centers differ from the full fit's, the mode-equivalence must not)
    mb = sorted(
        (r["id"], r["cell_id"], r["removed"])
        for r in semantic_dedup_assignments(
            emb,
            threshold=0.9,
            centers=fit_ivf_quantizer(emb, n_cells=5, method="minibatch"),
            method="blas",
        ).collect()
    )
    mb_pairs = sorted(
        (r["id"], r["cell_id"], r["removed"])
        for r in semantic_dedup_assignments(
            emb,
            threshold=0.9,
            centers=fit_ivf_quantizer(emb, n_cells=5, method="minibatch"),
            method="pairs",
        ).collect()
    )
    assert mb == mb_pairs
    assert sum(r[2] for r in mb) > 0


def test_semantic_dedup_greedy_rule_keeps_chain_tail(spark):
    """rule='greedy' is the paper's kept-set greedy: in a chain A~B, B~C
    with A not~ C, B is removed (near kept A) but C survives (its only
    near lower-id mate, B, was removed). The default any_lower rule
    removes both. greedy requires method='blas' (named error otherwise)."""
    import math

    import pytest

    from entropy_balance_weighting_spark.functions.similarity import (
        semantic_dedup_assignments,
    )

    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    # one cell (single centroid); thresholds tuned so cos(A,B) and
    # cos(B,C) pass but cos(A,C) fails: angles 0, 0.25, 0.5 with
    # threshold cos(0.3) ~ 0.9553
    rows = [(0, unit(0.0)), (1, unit(0.25)), (2, unit(0.5))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    import numpy as np

    centers = np.array([[1.0, 0.0]])
    thr = math.cos(0.3)
    greedy = {
        r["id"]: r["removed"]
        for r in semantic_dedup_assignments(
            emb, threshold=thr, centers=centers, method="blas", rule="greedy"
        ).collect()
    }
    assert greedy == {0: 0, 1: 1, 2: 0}
    any_lower = {
        r["id"]: r["removed"]
        for r in semantic_dedup_assignments(
            emb, threshold=thr, centers=centers, method="blas"
        ).collect()
    }
    assert any_lower == {0: 0, 1: 1, 2: 1}
    with pytest.raises(ValueError, match="blas"):
        semantic_dedup_assignments(
            emb, threshold=thr, centers=centers, method="pairs", rule="greedy"
        )


def test_bloom_membership_no_false_negatives(spark):
    """Every true duplicate flags (Bloom guarantees no false negatives);
    FPP stays near the designed rate at m=10n, k=5; the empty-overlap
    case passes docs through unflagged."""
    corpus = spark.createDataFrame(
        [(i, f"historical document number {i}") for i in range(500)],
        "doc_id long, text string",
    )
    from entropy_balance_weighting_spark.functions.dedup import (
        bloom_build,
        bloom_check,
    )

    m, k = 5000 * 10, 5
    bits = bloom_build(corpus, m_bits=m, k=k).cache()
    n_bits = bits.count()
    assert 0 < n_bits <= min(m, 500 * k)
    new = spark.createDataFrame(
        # 100 true dups (ids 0..99) + 400 fresh docs
        [(i, f"historical document number {i}") for i in range(100)]
        + [(1000 + i, f"brand new content {i}") for i in range(400)],
        "doc_id long, text string",
    )
    out = {r["id"]: r["might_exist"] for r in bloom_check(
        new, bits, m_bits=m, k=k
    ).collect()}
    assert all(out[i] == 1 for i in range(100)), "false negative!"
    fp = sum(out[1000 + i] for i in range(400))
    assert fp <= 20  # designed FPP ~0.9% at n=500, m=10*5000; generous cap
    # normalization: case/whitespace variants of archived docs still flag
    variant = spark.createDataFrame(
        [(5, "  HISTORICAL document NUMBER 5  ")], "doc_id long, text string"
    )
    assert bloom_check(variant, bits, m_bits=m, k=k).first()["might_exist"] == 1


def test_remove_duplicated_spans_keeps_canonical_copy(spark):
    """Lee et al. removal action: the duplicated 6-token span survives in
    the LOWEST doc id and is excised from every other holder; unique
    text is untouched; untouched docs pass through verbatim."""
    from entropy_balance_weighting_spark.functions.dedup import (
        remove_duplicated_spans,
    )

    span = "b1 b2 b3 b4 b5 b6 b7"  # 7 tokens -> two overlapping 6-grams
    docs = spark.createDataFrame(
        [
            (1, f"u1 u2 {span} u3 u4"),
            (2, f"v1 {span} v2 v3 v4 v5"),
            (3, f"w1 w2 w3 {span}"),
            (4, "x1 x2 x3 x4 x5 x6 x7 x8"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r
        for r in remove_duplicated_spans(docs, k=6, min_df=2).collect()
    }
    # canonical holder (doc 1) keeps the span verbatim
    assert out[1]["clean_text"] == f"u1 u2 {span} u3 u4"
    assert out[1]["n_removed_tokens"] == 0
    # non-canonical holders lose exactly the 7 span tokens, order kept
    assert out[2]["clean_text"] == "v1 v2 v3 v4 v5"
    assert out[2]["n_removed_tokens"] == 7
    assert out[3]["clean_text"] == "w1 w2 w3"
    assert out[3]["n_removed_tokens"] == 7
    # untouched doc passes through
    assert out[4]["clean_text"] == "x1 x2 x3 x4 x5 x6 x7 x8"
    assert out[4]["n_removed_tokens"] == 0
    assert out[2]["n_tokens"] == 12 and out[4]["n_tokens"] == 8


def test_remove_duplicated_spans_profile_consistency(spark):
    """Cross-check vs duplicated_span_profile: for every document the
    removal count equals the profile's n_covered (same position-set
    semantics) EXCEPT the canonical holder, which removes nothing; and
    re-profiling the cleaned corpus finds no duplicated spans left
    (every span now has exactly one holder)."""
    from entropy_balance_weighting_spark.functions.dedup import (
        duplicated_span_profile,
        remove_duplicated_spans,
    )

    import random

    rng = random.Random(5)
    vocab = [f"t{i}" for i in range(40)]
    boiler = " ".join(f"b{i}" for i in range(9))
    rows = []
    for did in range(30):
        body = " ".join(rng.choice(vocab) for _ in range(25))
        if did % 4 == 0:
            body = body + " " + boiler
        rows.append((did, body))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    prof = {
        r["id"]: r for r in duplicated_span_profile(docs, k=6, min_df=2).collect()
    }
    cleaned = remove_duplicated_spans(docs, k=6, min_df=2)
    out = {r["id"]: r for r in cleaned.collect()}
    assert set(out) == set(range(30))
    canon = min(i for i in prof)  # lowest doc carrying a duplicated span
    assert out[canon]["n_removed_tokens"] == 0  # canonical for all its grams
    for did, p in prof.items():
        # removal is covered-minus-protected: never more than the
        # profile's position count, and 0 for unprofiled docs
        assert out[did]["n_removed_tokens"] <= p["n_covered"]
    for did in set(out) - set(prof):
        assert out[did]["n_removed_tokens"] == 0
    # at least one non-canonical boiler holder loses its full boiler span
    assert any(
        out[did]["n_removed_tokens"] >= 9 for did in prof if did != canon
    )
    # the boiler text survives verbatim in the canonical doc
    assert boiler in out[canon]["clean_text"]
    # idempotence: no duplicated spans remain after removal
    from pyspark.sql import functions as F

    redocs = cleaned.select(
        F.col("id").alias("doc_id"), F.col("clean_text").alias("text")
    )
    assert duplicated_span_profile(redocs, k=6, min_df=2).count() == 0


def test_remove_duplicated_spans_full_excision_keeps_row(spark):
    """A document whose every position is excised (exact duplicate of a
    lower-id doc) must still emit its output row: clean_text='' and
    n_removed_tokens == n_tokens (one-row-per-input-document contract)."""
    from entropy_balance_weighting_spark.functions.dedup import (
        remove_duplicated_spans,
    )

    body = "d1 d2 d3 d4 d5 d6 d7 d8"
    docs = spark.createDataFrame(
        [(1, body), (2, body), (3, "q1 q2 q3 q4 q5 q6 q7")],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r
        for r in remove_duplicated_spans(docs, k=6, min_df=2).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["clean_text"] == body and out[1]["n_removed_tokens"] == 0
    assert out[2]["clean_text"] == "" and out[2]["n_removed_tokens"] == 8
    assert out[2]["n_tokens"] == 8
    assert out[3]["n_removed_tokens"] == 0


def test_remove_duplicated_spans_canonical_protection(spark):
    """Overlapping duplicated grams with DIFFERENT canonical holders:
    gram Y (docs {1,2}, canon 1) overlaps gram X (docs {2,3}, canon 2)
    inside doc 2.  Doc 2 must keep X's full text (it is X's canonical
    holder) and lose only the Y-only prefix; X's text must survive
    SOMEWHERE in the cleaned corpus."""
    from entropy_balance_weighting_spark.functions.dedup import (
        remove_duplicated_spans,
    )

    y = "y1 y2 y3 y4 y5 y6"          # gram Y
    x = "y2 y3 y4 y5 y6 z"           # gram X, overlaps Y by 5 tokens
    docs = spark.createDataFrame(
        [(1, y), (2, f"y1 {x}"), (3, x)],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r
        for r in remove_duplicated_spans(docs, k=6, min_df=2).collect()
    }
    # doc 1 is canonical for Y -> untouched
    assert out[1]["clean_text"] == y and out[1]["n_removed_tokens"] == 0
    # doc 2 is canonical for X: protection keeps X intact; only the
    # Y-only position (the leading y1) is excised
    assert out[2]["clean_text"] == x
    assert out[2]["n_removed_tokens"] == 1
    # doc 3 (non-canonical for X) is fully excised but keeps its row
    assert out[3]["clean_text"] == "" and out[3]["n_removed_tokens"] == 6
