"""BPE tokenizer (functions/bpe.py): fit determinism, merge quality,
distributed-encode ≡ reference-encode, detokenize inverse, and the
token-count monotonicity a bigger vocab must buy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.functions import bpe


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


def test_fit_is_deterministic_and_ordered(corpus):
    m1 = bpe.fit_bpe(corpus, n_merges=50)
    m2 = bpe.fit_bpe(corpus, n_merges=50)
    assert m1 == m2
    assert all(isinstance(a, str) and isinstance(b, str) for a, b in m1)
    # frequent whole words collapse to single tokens once merges suffice
    ranks = {tuple(p): i for i, p in enumerate(m1)}
    assert bpe.encode_word("low", ranks) == ["low</w>"]
    assert bpe.encode_word("newest", ranks) == ["newest</w>"]
    # an unseen word still tokenizes (falls back to subword pieces)
    out = bpe.encode_word("lowestest", ranks)
    assert "".join(out) == "lowestest</w>"
    assert len(out) >= 2


def test_distributed_encode_matches_reference(corpus):
    merges = bpe.fit_bpe(corpus, n_merges=30)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
        for r in bpe.bpe_encode(corpus, merges).collect()
    }
    for row in corpus.collect():
        want = []
        for w in row["text"].lower().split():
            want.extend(bpe.encode_word(w, ranks))
        assert got[row["doc_id"]] == (want, len(want))


def test_detokenize_inverts_encode(corpus):
    merges = bpe.fit_bpe(corpus, n_merges=40)
    enc = bpe.bpe_encode(corpus, merges)
    back = enc.join(corpus, "doc_id").select(
        "doc_id",
        bpe.detokenize("tokens").alias("rt"),
        F.lower(F.col("text")).alias("orig"),
    )
    for r in back.collect():
        assert r["rt"] == r["orig"]


def test_more_merges_never_increase_token_count(corpus):
    def total(n):
        m = bpe.fit_bpe(corpus, n_merges=n)
        return (
            bpe.bpe_encode(corpus, m)
            .agg(F.sum("n_tokens"))
            .first()[0]
        )

    t0, t10, t60 = total(0), total(10), total(60)
    assert t0 >= t10 >= t60
    assert t60 < t0  # the merges actually compress


def test_word_frequencies_cap_and_exactness(corpus):
    wf = {
        r["word"]: r["freq"]
        for r in bpe.word_frequencies(corpus, max_words=3).collect()
    }
    assert len(wf) == 3
    assert wf["newest"] == 7 and wf["low"] == 6


def test_empty_corpus_raises(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="no words"):
        bpe.fit_bpe(empty)


def test_bpe_persistence_roundtrip(corpus, tmp_path):
    from entropy_balance_weighting_spark.functions.bpe import (
        load_bpe,
        save_bpe,
    )

    merges = bpe.fit_bpe(corpus, n_merges=25)
    p = str(tmp_path / "bpe.json")
    save_bpe(merges, p)
    assert load_bpe(p) == merges
