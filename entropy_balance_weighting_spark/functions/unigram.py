"""Unigram-LM subword tokenizer (Kudo 2018, the SentencePiece family) —
the second real tokenizer next to BPE (:mod:`.bpe`), because modern
training stacks split between the two lineages (GPT-2/byte-BPE vs
LLaMA/T5-SentencePiece) and an export path should speak both.

Same scale split as the BPE fit (and the PQ/IVF codebooks):

- **Fit is model-sized.**  The word-frequency table is built
  DISTRIBUTED (one explode + one groupBy, capped to the top-K words —
  exact counts for the words kept, Zipf covers the mass), then the
  EM + prune loop runs driver-side over that bounded table.
- **Apply is corpus-sized.**  Viterbi segmentation is one Arrow
  ``mapInPandas`` map stage; the piece table rides as a closure
  constant, segmentations are memoized per batch.

The E-step is selectable (``em=`` on :func:`fit_unigram`): the default
``"hard"`` uses VITERBI counts — the standard hard-EM simplification,
deterministic and an order of magnitude simpler — while ``"full"`` runs
true forward-backward over the segmentation lattice (posterior-weighted
expected piece counts, log-space), matching Kudo 2018's E-step proper.
The two agree on which pieces matter but diverge in piece
probabilities (and occasionally segmentations) — the divergence is
pinned by test; a training export that must match an external
SentencePiece model should fit with ``em="full"``.  The pruning
objective (drop the pieces whose removal costs the least total
log-likelihood) is the same in both modes.

FINAL pruning-parity scope (r13): SentencePiece's reference trainer
prunes by re-Viterbi-ing each candidate's alternative segmentation and
shrinks the pool by a fixed 25% per outer round
(``shrinking_factor=0.75``, Kudo 2018 §3.2); this implementation
prunes by each piece's direct loss contribution with a
caller-controlled schedule.  Both satisfy the same invariants (every
single-char piece kept, any text stays tokenizable, least-loss-first
order) but can retain different multi-char tails for the same corpus —
so a fitted model is NOT guaranteed piece-for-piece identical to a
SentencePiece binary's, and no such bound is claimed.  This is
recorded as final: the container has no sentencepiece build to pin a
fixture against, and the engine's contract is the tokenizer's OWN
fit→apply→detokenize round trip (oracle-verified), not binary model
interchange.
Pieces use the SentencePiece ``▁`` (U+2581) word-boundary convention:
each whitespace word is prefixed with ``▁``, so detokenization is a
pure JVM expression (concat → replace ``▁`` with space → trim), exactly
like the BPE ``</w>`` path.

Reference parity: /root/reference has no tokenizer surface — §7.5
extension scope (training-data export).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

WORD_MARK = "▁"  # SentencePiece word-boundary marker


def _viterbi(word: str, logp: dict[str, float], max_len: int) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs — O(n·L).
    The fit keeps every single character IT SAW, so words over the
    fit's charset always segment; a word containing a character the
    fit never saw (outside the capped frequency table) is UNSEGMENTABLE
    and is returned as ONE out-of-vocabulary piece — the SentencePiece
    UNK convention, made explicit here rather than left to backpointer
    defaults.  Curation pipelines should charset-filter or refit."""
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                continue
            cand = best[j] + lp
            if cand > best[i]:
                best[i] = cand
                back[i] = j
    if best[n] == -math.inf:
        return [word]  # explicit OOV: one unsegmentable piece
    out = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def _logsumexp(terms: list[float]) -> float:
    if not terms:
        return -math.inf
    m = max(terms)
    if m == -math.inf:
        return m
    return m + math.log(sum(math.exp(t - m) for t in terms))


def _expected_counts(
    word: str, logp: dict[str, float], max_len: int
) -> tuple[dict[str, float], float] | None:
    """Forward-backward over the segmentation lattice: posterior
    expected count of every piece occurrence in ``word`` plus the
    word's total log-likelihood (the full-EM E-step, Kudo 2018 §3.2).
    Log-space throughout — words are short, so the O(n·L) lattice is
    tiny.  Returns None when the word is unsegmentable under the
    current pieces (same contract as Viterbi's OOV path)."""
    n = len(word)
    NEG = -math.inf
    arcs: list[tuple[int, int, str, float]] = []
    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        terms = []
        for j in range(max(0, i - max_len), i):
            lp = logp.get(word[j:i])
            if lp is None:
                continue
            arcs.append((j, i, word[j:i], lp))
            if alpha[j] != NEG:
                terms.append(alpha[j] + lp)
        alpha[i] = _logsumexp(terms)
    total = alpha[n]
    if total == NEG:
        return None
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for j in range(n - 1, -1, -1):
        beta[j] = _logsumexp(
            [lp + beta[i] for (jj, i, _p, lp) in arcs if jj == j and beta[i] != NEG]
        )
    exp_counts: dict[str, float] = {}
    for j, i, piece, lp in arcs:
        if alpha[j] == NEG or beta[i] == NEG:
            continue
        post = math.exp(alpha[j] + lp + beta[i] - total)
        exp_counts[piece] = exp_counts.get(piece, 0.0) + post
    return exp_counts, total


def fit_unigram(
    df: DataFrame,
    *,
    text_col: str = "text",
    vocab_size: int = 1000,
    max_piece_len: int = 8,
    max_words: int = 50_000,
    n_em_iters: int = 3,
    seed_size_factor: int = 4,
    lowercase: bool = True,
    em: str = "hard",
) -> dict[str, float]:
    """Learn a unigram piece table ``{piece: log_prob}`` of (at most)
    ``vocab_size`` pieces.  Seed = every substring of the marked words
    up to ``max_piece_len`` chars, kept to the ``seed_size_factor ×
    vocab_size`` most frequent; then ``n_em_iters`` rounds of EM
    (``em="hard"``: Viterbi counts — the default, bit-for-bit the
    historical behavior; ``em="full"``: forward-backward expected
    counts, SentencePiece's E-step proper) with a prune to
    ``vocab_size`` after the last round.  Single characters are NEVER
    pruned (any text stays tokenizable).  Deterministic: ties break
    lexicographically everywhere."""
    if em not in ("hard", "full"):
        raise ValueError(f"em must be 'hard' or 'full', got {em!r}")
    from entropy_balance_weighting_spark.functions.bpe import (
        word_frequencies,
    )

    rows = word_frequencies(
        df, text_col=text_col, max_words=max_words, lowercase=lowercase
    ).collect()
    if not rows:
        raise ValueError("cannot fit unigram LM: corpus has no words")
    words = [(WORD_MARK + r["word"], int(r["freq"])) for r in rows]

    # seed: substring counts (weighted by word freq), capped
    from collections import defaultdict

    sub_counts: dict[str, int] = defaultdict(int)
    chars: set[str] = set()
    for w, f in words:
        chars.update(w)
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                sub_counts[w[i:j]] += f
    singles = {c: sub_counts[c] for c in chars}
    multis = sorted(
        ((p, c) for p, c in sub_counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: seed_size_factor * vocab_size]
    counts = dict(multis) | singles

    def to_logp(cnt: dict[str, int | float]) -> dict[str, float]:
        total = sum(cnt.values())
        return {p: math.log(c / total) for p, c in cnt.items() if c > 0}

    logp = to_logp(counts)
    for _ in range(n_em_iters):
        new_counts: dict[str, float] = defaultdict(float)
        if em == "hard":
            # hard E-step: Viterbi counts over the (bounded) word table
            for w, f in words:
                for piece in _viterbi(w, logp, max_piece_len):
                    new_counts[piece] += f
        else:
            # full E-step: posterior expected counts (forward-backward)
            for w, f in words:
                ec = _expected_counts(w, logp, max_piece_len)
                if ec is None:
                    continue  # unsegmentable under current pieces
                for piece, c in ec[0].items():
                    new_counts[piece] += f * c
        # coverage floor: unused single chars survive with count 0+
        for c in chars:
            new_counts[c] += 1e-9
        logp = to_logp(new_counts)

    if len(logp) > vocab_size:
        # prune: keep singles unconditionally, then the highest-prob
        # multi-char pieces up to the budget (approximate least-loss
        # prune — a piece's Viterbi count IS its loss contribution here)
        singles_set = {p for p in logp if len(p) == 1}
        budget = max(vocab_size - len(singles_set), 0)
        keep = sorted(
            ((p, lp) for p, lp in logp.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )[:budget]
        kept = {p: math.exp(lp) for p, lp in keep}
        kept |= {p: math.exp(logp[p]) for p in singles_set}
        logp = to_logp(kept)
    return dict(sorted(logp.items()))


def unigram_encode(
    df: DataFrame,
    model: dict[str, float],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "pieces",
    lowercase: bool = True,
) -> DataFrame:
    """Viterbi-segment the corpus: ``(id_col, out_col array<string>,
    n_pieces)`` in one Arrow map stage, memoized per batch (same shape
    as :func:`bpe.bpe_encode`)."""
    import pandas as pd

    max_len = max((len(p) for p in model), default=1)
    schema = f"{id_col} long, {out_col} array<string>, n_pieces int"

    def gen(batches):
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            ids, out, counts = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                t = str(t).lower() if lowercase else str(t)
                doc: list[str] = []
                for w in t.split():
                    mw = WORD_MARK + w
                    enc = memo.get(mw)
                    if enc is None:
                        enc = _viterbi(mw, model, max_len)
                        memo[mw] = enc
                    doc.extend(enc)
                ids.append(int(i))
                out.append(doc)
                counts.append(len(doc))
            yield pd.DataFrame(
                {id_col: ids, out_col: out, "n_pieces": counts}
            )

    return df.select(id_col, text_col).mapInPandas(gen, schema)


def unigram_detokenize(pieces: Column | str) -> Column:
    """Pieces → text (JVM expression): concat, ``▁`` back to space,
    trim — exact inverse for whitespace-normalized input (same contract
    as :func:`bpe.detokenize` word mode)."""
    c = F.col(pieces) if isinstance(pieces, str) else pieces
    return F.trim(
        F.replace(F.concat_ws("", c), F.lit(WORD_MARK), F.lit(" "))
    )


def save_unigram(model: dict[str, float], path: str) -> None:
    """JSON persistence in sorted-piece order (engine-portable, no
    pickle) — the same model-artifact discipline as ``save_bpe`` and
    the PQ codebooks."""
    import json

    with open(path, "w") as f:
        json.dump(
            {
                "version": 1,
                "pieces": [[p, lp] for p, lp in sorted(model.items())],
            },
            f,
        )


def load_unigram(path: str) -> dict[str, float]:
    import json

    with open(path) as f:
        d = json.load(f)
    return {p: float(lp) for p, lp in d["pieces"]}
