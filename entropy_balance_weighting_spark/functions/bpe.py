"""Byte-pair encoding (Sennrich et al. 2016) — a REAL subword
tokenizer for the training-export path, replacing proxy token counts
(whitespace / BPE-ish regex) with the actual merge algorithm training
stacks use.

Scale split, same shape as the IVF/PQ quantizers in
:mod:`.similarity`:

- **Fit is model-sized.**  The merge loop is inherently sequential
  (each merge depends on the last), so it runs DRIVER-SIDE over a
  word-frequency table — but that table is built DISTRIBUTED (split →
  explode → groupBy → count, one shuffle) and capped to the top-K
  words, which at any corpus size bounds driver memory while covering
  the mass of the distribution (Zipf: the top 50k words carry almost
  all occurrences; rarer words still tokenize fine through the learned
  merges).
- **Apply is corpus-sized.**  Encoding is one Arrow ``mapInPandas``
  map stage; the merges table rides along as a closure constant
  (model-sized: ``vocab_size`` pairs).  Per word, the classic
  rank-greedy merge loop, memoized per batch (crawl text repeats words
  heavily).

Two alphabets (``alphabet=`` on fit/encode/detokenize):

- ``"word"`` (default, Sennrich et al. 2016): whitespace words,
  characters as base symbols, ``</w>`` end-of-word marker on each
  word's final symbol — detokenization is a plain concat+replace.
- ``"byte"`` (GPT-2 lineage, Radford et al. 2019): a regex
  pretokenizer splits text into space-prefixed pieces, each piece's
  UTF-8 BYTES map through the published GPT-2 byte↔unicode table to
  printable stand-in characters, and merges run over those — no
  marker needed (spaces are in-band), no out-of-alphabet token is
  possible, and token boundaries track what a modern trainer sees on
  non-ASCII/whitespace-heavy text, with one known divergence: the
  stdlib-``re`` approximation of GPT-2's pretokenizer classifies
  Unicode No/Nl characters ('²', '½', roman numerals) as letters
  (``[^\\W\\d_]``) where GPT-2's ``\\p{N}`` groups them with digits,
  shifting piece boundaries when such characters abut letters or
  digits.  Fit and apply share ``pretokenize()``, so the tokenizer
  stays self-consistent either way.  Detokenize stays a JVM
  expression: ``translate`` (256-char stand-in → latin-1) →
  ``encode(ISO-8859-1)`` → ``decode(UTF-8)``.

Reference parity: /root/reference has no tokenizer surface — §7.5
extension scope (training-data export).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

_EOW = "</w>"


def _bytes_to_unicode() -> dict[int, str]:
    """The GPT-2 byte→unicode stand-in table (public encoder.py
    algorithm): printable bytes map to themselves, the rest to
    codepoints 256+ — a bijection so byte-level merges operate on
    ordinary strings."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


_BYTE_ENC = _bytes_to_unicode()
_BYTE_DEC = {v: k for k, v in _BYTE_ENC.items()}
# translate() args for the expression-level byte-mode detokenizer:
# stand-in char at position i ↔ the latin-1 char of byte i
_BYTE_SRC = "".join(_BYTE_ENC[b] for b in range(256))
_BYTE_DST = "".join(chr(b) for b in range(256))

# GPT-2's pretokenizer re-expressed in stdlib ``re`` (the published
# pattern uses \p{L}/\p{N} from the third-party ``regex`` module):
# [^\W\d_] is unicode-letters PLUS the non-decimal numeric categories
# No/Nl ('²', '½', 'Ⅳ') that \p{N} would group with digits — a known
# boundary divergence from GPT-2 when such characters abut letters or
# digits; \d is unicode-decimal-digits, the punct
# class adds back the underscore \w steals.  Contractions, the
# leading-space convention, and the trailing-whitespace lookahead are
# verbatim.  Used IDENTICALLY at fit (freq-table map stage) and apply,
# so the two can never disagree on a boundary.
_PRETOK = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+(?!\S)|\s+"
)


def pretokenize(text: str) -> list[str]:
    """GPT-2-style pretokens of ``text`` (byte alphabet's word units:
    space-prefixed pieces, contractions split, whitespace runs kept)."""
    return _PRETOK.findall(text)


def _byte_syms(piece: str) -> list[str]:
    """Base symbols of one pretoken in the byte alphabet: its UTF-8
    bytes through the stand-in table (never fails — every byte maps)."""
    return [_BYTE_ENC[b] for b in piece.encode("utf-8")]


def word_frequencies(
    df: DataFrame,
    *,
    text_col: str = "text",
    max_words: int = 50_000,
    lowercase: bool = True,
    alphabet: str = "word",
) -> DataFrame:
    """Distributed word-frequency table ``(word, freq)``, capped to the
    ``max_words`` most frequent (the fit's bounded input).  One
    explode + one groupBy shuffle; the cap is a driver-memory bound,
    not a sampling step — counts are exact for the words kept.

    ``alphabet="byte"`` counts GPT-2 pretokens instead of whitespace
    words, produced by the SAME Python :func:`pretokenize` the encode
    path uses (an Arrow map stage rather than a JVM split — fit-time
    only, and boundary-identical to apply by construction)."""
    if alphabet == "byte":
        import pandas as pd

        def gen(batches):
            for pdf in batches:
                out: list[str] = []
                for t in pdf[text_col]:
                    if t is None or (isinstance(t, float) and pd.isna(t)):
                        continue  # NULL text contributes no pretokens
                        # (the word-mode JVM path drops nulls the same
                        # way via explode(split(null)))
                    t = str(t)
                    out.extend(pretokenize(t.lower() if lowercase else t))
                yield pd.DataFrame({"word": pd.Series(out, dtype="object")})

        words = df.select(text_col).mapInPandas(gen, "word string")
    else:
        c = F.col(text_col)
        if lowercase:
            c = F.lower(c)
        words = df.select(
            F.explode(F.split(F.trim(c), r"\s+")).alias("word")
        ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "word")
        .limit(max_words)
    )


def fit_bpe(
    df: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 500,
    max_words: int = 50_000,
    lowercase: bool = True,
    alphabet: str = "word",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus and return them in
    rank order (the model artifact — persist it like the PQ/IVF
    codebooks).  The word-frequency table is built distributed
    (:func:`word_frequencies`); the sequential merge loop runs on the
    driver with an incrementally-maintained pair-count index (only the
    words containing the merged pair are re-counted per step — the
    standard fit optimization, O(affected words) per merge, not
    O(vocabulary)).  ``alphabet="byte"`` learns byte-level merges over
    GPT-2 pretokens (stand-in-character base symbols, no ``</w>``)."""
    if alphabet not in ("word", "byte"):
        raise ValueError(f"unknown BPE alphabet {alphabet!r}")
    rows = word_frequencies(
        df,
        text_col=text_col,
        max_words=max_words,
        lowercase=lowercase,
        alphabet=alphabet,
    ).collect()
    if not rows:
        raise ValueError("cannot fit BPE: corpus has no words")
    # word -> (symbol list, freq); word mode marks the last symbol with
    # </w>, byte mode maps UTF-8 bytes through the stand-in table
    vocab: dict[int, tuple[list[str], int]] = {}
    for i, r in enumerate(rows):
        if alphabet == "byte":
            syms = _byte_syms(r["word"])
        else:
            syms = list(r["word"])
            syms[-1] = syms[-1] + _EOW
        if not syms:
            continue
        vocab[i] = (syms, int(r["freq"]))

    from collections import defaultdict

    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wid, (syms, freq) in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += freq
            pair_words[(a, b)].add(wid)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # deterministic argmax: count desc, then lexicographic
        best = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0]))
        (a, b), cnt = best
        if cnt <= 1:
            break  # nothing left that actually repeats
        merges.append((a, b))
        merged = a + b
        for wid in list(pair_words[(a, b)]):
            syms, freq = vocab[wid]
            # remove this word's old pair contributions
            for pa, pb in zip(syms, syms[1:]):
                pair_counts[(pa, pb)] -= freq
                if pair_counts[(pa, pb)] <= 0:
                    del pair_counts[(pa, pb)]
                pair_words[(pa, pb)].discard(wid)
            # apply the merge left-to-right
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[wid] = (out, freq)
            for pa, pb in zip(out, out[1:]):
                pair_counts[(pa, pb)] += freq
                pair_words[(pa, pb)].add(wid)
    return merges


def encode_word(
    word: str,
    ranks: dict[tuple[str, str], int],
    *,
    alphabet: str = "word",
) -> list[str]:
    """Encode ONE word (word mode: no whitespace; byte mode: one
    pretoken) with rank-greedy BPE: repeatedly merge the lowest-rank
    adjacent pair.  Reference implementation for the distributed path
    and the tests."""
    if alphabet == "byte":
        syms = _byte_syms(word)
    else:
        syms = list(word)
        if syms:
            syms[-1] = syms[-1] + _EOW
    if not syms:
        return []
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "tokens",
    lowercase: bool = True,
    alphabet: str = "word",
) -> DataFrame:
    """Tokenize the corpus: ``(id_col, out_col array<string>, n_tokens)``
    via one Arrow ``mapInPandas`` stage.  Words (word mode) or GPT-2
    pretokens (byte mode) are encoded through a per-batch memo (crawl
    text repeats them heavily, so the amortized cost per occurrence is
    a dict hit); documents are the concatenation of their pieces'
    tokens."""
    import pandas as pd

    if alphabet not in ("word", "byte"):
        raise ValueError(f"unknown BPE alphabet {alphabet!r}")
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    schema = f"{id_col} long, {out_col} array<string>, n_tokens int"

    def gen(batches):
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            ids, toks, counts = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                if t is None or (isinstance(t, float) and pd.isna(t)):
                    t = ""  # NULL text tokenizes to zero tokens
                t = str(t).lower() if lowercase else str(t)
                pieces = pretokenize(t) if alphabet == "byte" else t.split()
                doc: list[str] = []
                for w in pieces:
                    enc = memo.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks, alphabet=alphabet)
                        memo[w] = enc
                    doc.extend(enc)
                ids.append(int(i))
                toks.append(doc)
                counts.append(len(doc))
            yield pd.DataFrame(
                {id_col: ids, out_col: toks, "n_tokens": counts}
            )

    return df.select(id_col, text_col).mapInPandas(gen, schema)


def detokenize(tokens: Column | str, *, alphabet: str = "word") -> Column:
    """Tokens → text, still a JVM expression in BOTH modes.  Word mode:
    concat everything, each ``</w>`` marker back to a space.  Byte
    mode: concat, 256-char ``translate`` (stand-in → latin-1), encode
    ISO-8859-1 (char i → byte i, exact), decode UTF-8 — the inverse of
    the byte→stand-in mapping, EXACT for any valid-UTF-8 input (word
    mode is exact only for whitespace-normalized input).  Pinned by
    test in both modes."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    joined = F.concat_ws("", c)
    if alphabet == "byte":
        return F.decode(
            F.encode(
                F.translate(joined, _BYTE_SRC, _BYTE_DST), "ISO-8859-1"
            ),
            "UTF-8",
        )
    return F.trim(F.replace(joined, F.lit(_EOW), F.lit(" ")))


def bpe_vocab(
    merges: list[tuple[str, str]], *, alphabet: str = "byte"
) -> list[str]:
    """Token-string → id table: the 256 byte stand-ins (ids 0–255, the
    GPT-2 convention) followed by each merge's product in rank order,
    DEDUPLICATED keeping the first (lowest-rank) occurrence — two
    distinct merges can yield the same product string (e.g. ('a','bc')
    and ('ab','c')), and an id table must map each token string once.
    Byte mode only — its alphabet is closed, so EVERY token a
    :func:`bpe_encode` run emits has an id (word mode's base alphabet
    is open-ended; hash ids there instead)."""
    if alphabet != "byte":
        raise ValueError("bpe_vocab is defined for the byte alphabet only")
    vocab = [_BYTE_ENC[b] for b in range(256)]
    seen = set(vocab)
    for a, b in merges:
        tok = a + b
        if tok not in seen:
            seen.add(tok)
            vocab.append(tok)
    return vocab


def save_bpe(
    merges: list[tuple[str, str]], path: str, *, alphabet: str = "word"
) -> None:
    """Persist the merge list as JSON in rank order (engine-portable,
    no pickle) — same model-artifact discipline as
    :func:`similarity.save_quantizer`."""
    import json

    with open(path, "w") as f:
        json.dump(
            {
                "version": 2,
                "alphabet": alphabet,
                "merges": [list(p) for p in merges],
            },
            f,
        )


def load_bpe(path: str) -> list[tuple[str, str]]:
    import json

    with open(path) as f:
        d = json.load(f)
    return [tuple(p) for p in d["merges"]]


def load_bpe_full(path: str) -> tuple[list[tuple[str, str]], str]:
    """(merges, alphabet) — version-1 files predate the alphabet field
    and were always word-mode."""
    import json

    with open(path) as f:
        d = json.load(f)
    return [tuple(p) for p in d["merges"]], d.get("alphabet", "word")
