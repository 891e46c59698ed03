"""Unigram-LM tokenizer (functions/unigram.py): fit determinism and
coverage, Viterbi optimality, distributed-encode ≡ reference-encode,
detokenize inverse, compression vs char baseline, persistence."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.functions import unigram as ug


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "low low low low low"),
        (1, "lower lower newest newest"),
        (2, "newest newest newest newest widest widest"),
        (3, "the newest and the widest and the lowest"),
        (4, "low lower lowest wide wider widest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fit_deterministic_and_covers_all_chars(corpus):
    m1 = ug.fit_unigram(corpus, vocab_size=60)
    m2 = ug.fit_unigram(corpus, vocab_size=60)
    assert m1 == m2
    assert 0 < len(m1) <= 60
    # every single character of the marked corpus is a piece, so ANY
    # word over this alphabet segments (coverage invariant)
    seen = set(ug.WORD_MARK + "".join(
        r["text"].lower().replace(" ", "") for r in corpus.collect()
    ))
    assert seen <= set(p for p in m1 if len(p) == 1)
    # probabilities normalize
    assert abs(sum(math.exp(lp) for lp in m1.values()) - 1.0) < 1e-9
    # frequent whole words become single pieces
    assert (ug.WORD_MARK + "newest") in m1


def test_viterbi_picks_max_prob_segmentation():
    logp = {
        "▁": math.log(0.05),
        "a": math.log(0.05),
        "b": math.log(0.05),
        "ab": math.log(0.4),
        "▁a": math.log(0.45),
    }
    # ▁ab: [▁a, b] = log(.45*.05)  vs [▁, ab] = log(.05*.4) -> ▁a + b
    assert ug._viterbi("▁ab", logp, 2) == ["▁a", "b"]
    # exhaustive check on a longer string against brute force
    import itertools

    word = "▁abab"

    def brute(w):
        best, best_lp = None, -math.inf
        n = len(w)
        for cuts in itertools.product([0, 1], repeat=n - 1):
            pos = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
            pieces = [w[pos[i] : pos[i + 1]] for i in range(len(pos) - 1)]
            if any(p not in logp for p in pieces):
                continue
            lp = sum(logp[p] for p in pieces)
            if lp > best_lp:
                best, best_lp = pieces, lp
        return best, best_lp

    got = ug._viterbi(word, logp, 2)
    want, want_lp = brute(word)
    assert sum(logp[p] for p in got) == pytest.approx(want_lp)


def test_distributed_encode_matches_reference(corpus):
    model = ug.fit_unigram(corpus, vocab_size=50)
    max_len = max(len(p) for p in model)
    got = {
        r["doc_id"]: (list(r["pieces"]), r["n_pieces"])
        for r in ug.unigram_encode(corpus, model).collect()
    }
    for row in corpus.collect():
        want = []
        for w in row["text"].lower().split():
            want.extend(ug._viterbi(ug.WORD_MARK + w, model, max_len))
        assert got[row["doc_id"]] == (want, len(want))


def test_detokenize_inverts_encode(corpus):
    model = ug.fit_unigram(corpus, vocab_size=40)
    enc = ug.unigram_encode(corpus, model)
    back = enc.join(corpus, "doc_id").select(
        "doc_id",
        ug.unigram_detokenize("pieces").alias("rt"),
        F.lower(F.col("text")).alias("orig"),
    )
    for r in back.collect():
        assert r["rt"] == r["orig"]


def test_bigger_vocab_compresses_vs_char_baseline(corpus):
    def total(v):
        m = ug.fit_unigram(corpus, vocab_size=v)
        return (
            ug.unigram_encode(corpus, m).agg(F.sum("n_pieces")).first()[0]
        )

    # character baseline: every piece is one char
    chars = sum(
        len(ug.WORD_MARK + w)
        for r in corpus.collect()
        for w in r["text"].lower().split()
    )
    t_small, t_big = total(30), total(80)
    assert t_big <= t_small <= chars
    assert t_big < chars  # learned pieces actually compress


def test_single_char_model_is_identity_count(corpus):
    """With a singles-only model, n_pieces = marked char count — the
    arithmetic identity the registered query's oracle replays."""
    full = ug.fit_unigram(corpus, vocab_size=10_000, max_piece_len=1)
    assert all(len(p) == 1 for p in full)
    got = {
        r["doc_id"]: r["n_pieces"]
        for r in ug.unigram_encode(corpus, full).collect()
    }
    for row in corpus.collect():
        words = row["text"].lower().split()
        want = sum(len(w) + 1 for w in words)  # +1 per word marker
        assert got[row["doc_id"]] == want


def test_unknown_char_word_is_one_oov_piece(corpus, spark):
    """Coverage only guarantees characters the fit SAW; a word with an
    unseen char comes back as ONE out-of-vocabulary piece (explicit
    SentencePiece-style UNK convention), never a crash or a silent
    drop — curation should charset-filter or refit."""
    model = ug.fit_unigram(corpus, vocab_size=50)
    assert ug._viterbi("▁l¤w", model, 4) == ["▁l¤w"]
    df = spark.createDataFrame(
        [(0, "low ¤¤¤ widest")], "doc_id long, text string"
    )
    out = ug.unigram_encode(df, model).first()
    pieces = list(out["pieces"])
    assert (ug.WORD_MARK + "¤¤¤") in pieces  # the OOV word, whole
    assert "".join(pieces) == "▁low▁¤¤¤▁widest"  # nothing lost


def test_persistence_roundtrip(corpus, tmp_path):
    model = ug.fit_unigram(corpus, vocab_size=45)
    p = str(tmp_path / "unigram.json")
    ug.save_unigram(model, p)
    assert ug.load_unigram(p) == model


def test_empty_corpus_raises(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="no words"):
        ug.fit_unigram(empty)


def test_expected_counts_hand_case():
    """Forward-backward on a 2-char word with pieces {a, b, ab}: two
    segmentations [a,b] (p_a·p_b) and [ab] (p_ab); posteriors must be
    the normalized products exactly."""
    import math

    logp = {"a": math.log(0.4), "b": math.log(0.4), "ab": math.log(0.2)}
    ec, total = ug._expected_counts("ab", logp, max_len=2)
    p_split = 0.4 * 0.4
    p_whole = 0.2
    z = p_split + p_whole
    assert math.isclose(math.exp(total), z)
    assert math.isclose(ec["a"], p_split / z)
    assert math.isclose(ec["b"], p_split / z)
    assert math.isclose(ec["ab"], p_whole / z)


def test_full_em_diverges_from_hard_but_stays_consistent(corpus):
    """em='full' (forward-backward) must (1) be deterministic, (2)
    produce a model whose encode→detokenize stays an identity, and
    (3) DIVERGE from hard-EM in piece probabilities — the documented
    deviation, pinned (r11 verdict task #7)."""
    hard = ug.fit_unigram(corpus, vocab_size=60, em="hard")
    full1 = ug.fit_unigram(corpus, vocab_size=60, em="full")
    full2 = ug.fit_unigram(corpus, vocab_size=60, em="full")
    assert full1 == full2  # deterministic
    shared = set(hard) & set(full1)
    assert shared  # same piece universe largely survives
    max_div = max(abs(hard[p] - full1[p]) for p in shared)
    assert max_div > 1e-6, "full-EM unexpectedly identical to hard-EM"

    enc = ug.unigram_encode(corpus, full1)
    back = enc.select(
        "doc_id", ug.unigram_detokenize("pieces").alias("t")
    )
    orig = {r["doc_id"]: r["text"] for r in corpus.collect()}
    for r in back.collect():
        assert r["t"] == orig[r["doc_id"]]


def test_fit_em_rejects_unknown_mode(corpus):
    with pytest.raises(ValueError, match="em must be"):
        ug.fit_unigram(corpus, vocab_size=60, em="soft")
