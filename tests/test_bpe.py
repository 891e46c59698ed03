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


# --- byte-level alphabet (GPT-2 lineage) ------------------------------------


@pytest.fixture(scope="module")
def byte_corpus(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat can't sit on the mat today"),
        (2, "naïve café résumé — déjà vu"),
        (3, "tabs\tand\nnewlines   and runs of spaces"),
        (4, "emoji \U0001F600 and CJK 你好世界 mix in"),
        (5, "numbers 12345 and punct!!! and snake_case_ids"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_byte_table_is_a_bijection():
    enc = bpe._BYTE_ENC
    assert len(enc) == 256 and len(set(enc.values())) == 256
    assert all(len(v) == 1 for v in enc.values())
    # round trip through the translate-args strings byte-for-byte
    assert [bpe._BYTE_DEC[ch] for ch in bpe._BYTE_SRC] == list(range(256))
    assert bpe._BYTE_DST == "".join(chr(b) for b in range(256))


def test_byte_fit_deterministic_and_matches_reference(byte_corpus):
    m1 = bpe.fit_bpe(byte_corpus, n_merges=40, alphabet="byte", lowercase=False)
    m2 = bpe.fit_bpe(byte_corpus, n_merges=40, alphabet="byte", lowercase=False)
    assert m1 == m2 and len(m1) > 0
    # no merge product contains the </w> marker — byte mode has none
    assert all("</w>" not in a + b for a, b in m1)

    # distributed encode == reference rank-greedy encode over pretokens
    ranks = {tuple(p): i for i, p in enumerate(m1)}
    got = {
        r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
        for r in bpe.bpe_encode(
            byte_corpus, m1, alphabet="byte", lowercase=False
        ).collect()
    }
    for row in byte_corpus.collect():
        want = []
        for piece in bpe.pretokenize(row["text"]):
            want.extend(bpe.encode_word(piece, ranks, alphabet="byte"))
        assert got[row["doc_id"]] == (want, len(want))


def test_byte_detokenize_exact_inverse(byte_corpus):
    """Byte mode's detokenize (translate -> ISO-8859-1 -> UTF-8, all JVM
    expressions) is an EXACT inverse for arbitrary text — tabs, runs of
    spaces, emoji, CJK — where word mode is only whitespace-normal
    exact."""
    merges = bpe.fit_bpe(
        byte_corpus, n_merges=30, alphabet="byte", lowercase=False
    )
    enc = bpe.bpe_encode(byte_corpus, merges, alphabet="byte", lowercase=False)
    back = enc.join(byte_corpus, "doc_id").select(
        "doc_id", bpe.detokenize("tokens", alphabet="byte").alias("rt"), "text"
    )
    for r in back.collect():
        assert r["rt"] == r["text"], r["doc_id"]


def test_byte_zero_merges_is_raw_bytes(byte_corpus):
    """With no merges every token is one stand-in char, so n_tokens ==
    UTF-8 byte length of the pretokens' concatenation == the document."""
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe.bpe_encode(
            byte_corpus, [], alphabet="byte", lowercase=False
        ).collect()
    }
    for row in byte_corpus.collect():
        assert got[row["doc_id"]] == len(row["text"].encode("utf-8"))


def test_byte_pretokenizer_shapes():
    assert bpe.pretokenize("the cat") == ["the", " cat"]
    assert bpe.pretokenize("can't go") == ["can", "'t", " go"]
    assert bpe.pretokenize("a  b") == ["a", " ", " b"]  # run keeps in-band
    assert bpe.pretokenize("x123!y") == ["x", "123", "!", "y"]
    assert "".join(bpe.pretokenize("weird   \t mix 12x_3")) == "weird   \t mix 12x_3"


def test_byte_vocab_ids_closed(byte_corpus):
    merges = bpe.fit_bpe(
        byte_corpus, n_merges=20, alphabet="byte", lowercase=False
    )
    vocab = bpe.bpe_vocab(merges)
    # deduplicated: distinct merges may share a product string
    assert 256 < len(vocab) <= 256 + len(merges)
    assert len(set(vocab)) == len(vocab)
    ids = {t: i for i, t in enumerate(vocab)}
    # duplicate products collapse to the first rank's id
    assert bpe.bpe_vocab([("a", "bc"), ("ab", "c")])[256:] == ["abc"]
    # every emitted token has an id (closed alphabet)
    toks = (
        bpe.bpe_encode(byte_corpus, merges, alphabet="byte", lowercase=False)
        .select(F.explode("tokens").alias("t"))
        .distinct()
        .collect()
    )
    assert all(r["t"] in ids for r in toks)
    with pytest.raises(ValueError, match="byte alphabet"):
        bpe.bpe_vocab(merges, alphabet="word")


def test_byte_persistence_keeps_alphabet(byte_corpus, tmp_path):
    merges = bpe.fit_bpe(
        byte_corpus, n_merges=15, alphabet="byte", lowercase=False
    )
    p = str(tmp_path / "bpe_byte.json")
    bpe.save_bpe(merges, p, alphabet="byte")
    got_m, got_a = bpe.load_bpe_full(p)
    assert got_m == merges and got_a == "byte"
    assert bpe.load_bpe(p) == merges  # legacy accessor still works
