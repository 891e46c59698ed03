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

Vocabulary convention: word-internal tokens are plain strings and the
end-of-word marker is ``</w>`` appended to each word's final symbol —
the original paper's convention, which makes detokenization a plain
concat+split.

Reference parity: /root/reference has no tokenizer surface — §7.5
extension scope (training-data export).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_EOW = "</w>"


def word_frequencies(
    df: DataFrame,
    *,
    text_col: str = "text",
    max_words: int = 50_000,
    lowercase: bool = True,
) -> DataFrame:
    """Distributed word-frequency table ``(word, freq)``, capped to the
    ``max_words`` most frequent (the fit's bounded input).  One
    explode + one groupBy shuffle; the cap is a driver-memory bound,
    not a sampling step — counts are exact for the words kept."""
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
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus and return them in
    rank order (the model artifact — persist it like the PQ/IVF
    codebooks).  The word-frequency table is built distributed
    (:func:`word_frequencies`); the sequential merge loop runs on the
    driver with an incrementally-maintained pair-count index (only the
    words containing the merged pair are re-counted per step — the
    standard fit optimization, O(affected words) per merge, not
    O(vocabulary))."""
    rows = word_frequencies(
        df, text_col=text_col, max_words=max_words, lowercase=lowercase
    ).collect()
    if not rows:
        raise ValueError("cannot fit BPE: corpus has no words")
    # word -> (symbol tuple, freq); last symbol carries the </w> marker
    vocab: dict[int, tuple[list[str], int]] = {}
    for i, r in enumerate(rows):
        syms = list(r["word"])
        syms[-1] = syms[-1] + _EOW
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


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE word (no whitespace) with rank-greedy BPE: repeatedly
    merge the lowest-rank adjacent pair.  Reference implementation for
    the distributed path and the tests."""
    syms = list(word)
    if not syms:
        return []
    syms[-1] = syms[-1] + _EOW
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
) -> DataFrame:
    """Tokenize the corpus: ``(id_col, out_col array<string>, n_tokens)``
    via one Arrow ``mapInPandas`` stage.  Words are encoded through a
    per-batch memo (crawl text repeats words heavily, so the amortized
    cost per occurrence is a dict hit), documents are the concatenation
    of their words' tokens."""
    import pandas as pd

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    schema = f"{id_col} long, {out_col} array<string>, n_tokens int"

    def gen(batches):
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            ids, toks, counts = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                t = str(t).lower() if lowercase else str(t)
                doc: list[str] = []
                for w in t.split():
                    enc = memo.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        memo[w] = enc
                    doc.extend(enc)
                ids.append(int(i))
                toks.append(doc)
                counts.append(len(doc))
            yield pd.DataFrame(
                {id_col: ids, out_col: toks, "n_tokens": counts}
            )

    return df.select(id_col, text_col).mapInPandas(gen, schema)


def detokenize(tokens: Column | str) -> Column:
    """Tokens → text (JVM expression): concat everything, then turn
    each ``</w>`` marker back into a space.  Exact inverse of the
    encode for whitespace-normalized input — pinned by test."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.trim(F.replace(F.concat_ws("", c), F.lit(_EOW), F.lit(" ")))


def save_bpe(merges: list[tuple[str, str]], path: str) -> None:
    """Persist the merge list as JSON in rank order (engine-portable,
    no pickle) — same model-artifact discipline as
    :func:`similarity.save_quantizer`."""
    import json

    with open(path, "w") as f:
        json.dump({"version": 1, "merges": [list(p) for p in merges]}, f)


def load_bpe(path: str) -> list[tuple[str, str]]:
    import json

    with open(path) as f:
        d = json.load(f)
    return [tuple(p) for p in d["merges"]]
