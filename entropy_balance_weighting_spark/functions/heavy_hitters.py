"""Heavy hitters (frequent items) as the canonical two-pass plan:
Misra–Gries candidate generation per partition, then an EXACT verify
pass over the (tiny) candidate set — the only shape that finds hot
terms / hot URLs / hot n-grams in a 100 TB corpus without a full
groupBy over every distinct item.

Why two passes (the scale argument):

- A direct ``groupBy(item)`` shuffles EVERY occurrence of EVERY
  distinct item — at crawl scale that is billions of group keys for a
  query whose answer is a handful of rows.
- Pass 1 runs a Misra–Gries summary of capacity ``c`` inside each
  partition (an Arrow ``mapInPandas`` stage — items never shuffle).
  MG's guarantee per partition p: for every item,
  ``true_p − n_p/c ≤ est_p ≤ true_p``.  Summing over partitions, any
  item with GLOBAL count > N/c has a positive estimate in at least one
  partition, so the UNION of partition sketch items (≤ c × partitions
  rows — driver-broadcastable) is a SUPERSET of every global heavy
  hitter at threshold N/c.  No false negatives, ever; false positives
  are harmless because of pass 2.
- Pass 2 re-counts ONLY the candidates exactly (broadcast semi-join →
  partial-agg groupBy over candidate rows alone) and filters by the
  true threshold.  The output is therefore EXACT and deterministic —
  order-independent, engine-replayable by a plain SQL aggregate —
  while the shuffle carries candidate occurrences only.

Sketch accuracy is a CANDIDATE-SET size knob, not a correctness knob.

Public algorithm: Misra & Gries 1982; merge bound per Agarwal et al.
2013 (mergeable summaries).  Reference parity: /root/reference has no
sketch surface — §7.5 extension scope.
"""

from __future__ import annotations

import warnings
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F

# Per-partition MG dict cap: beyond this the sketch itself becomes the
# memory problem (a ~10⁶-entry Python dict per partition, and a candidate
# union that may no longer be broadcast-sized).  When the guarantee-derived
# capacity exceeds it we clamp + warn: output stays EXACT for every item
# that reaches the candidate set, but items with global count ≤ N/cap may
# be missed — at that point the caller is asking for near-full-vocabulary
# output and should use a plain groupBy instead.
CAPACITY_CAP = 1_000_000


def _mg_update(counters: dict, item, inc: int, capacity: int) -> None:
    """One Misra–Gries step: count if tracked or room; else decrement
    ALL (the classic simultaneous-decrement, amortized via min)."""
    if item in counters:
        counters[item] += inc
    elif len(counters) < capacity:
        counters[item] = inc
    else:
        # decrement everyone by the smallest amount that frees a slot
        dec = min(inc, min(counters.values()))
        dead = []
        for k in counters:
            counters[k] -= dec
            if counters[k] <= 0:
                dead.append(k)
        for k in dead:
            del counters[k]
        if inc > dec:
            counters[item] = inc - dec


def _resolve_capacity(capacity: int) -> int:
    capacity = max(16, int(capacity))
    if capacity > CAPACITY_CAP:
        warnings.warn(
            f"heavy_hitters capacity {capacity} clamped to {CAPACITY_CAP}: "
            "the MG superset guarantee now only covers items with global "
            f"count > N/{CAPACITY_CAP}; for a threshold below that, a plain "
            "groupBy over all items is the right plan",
            stacklevel=3,
        )
        capacity = CAPACITY_CAP
    return capacity


def heavy_hitters(
    df: DataFrame,
    items: Column | str,
    *,
    min_count: int | Callable[[int], int] | None = None,
    min_frac: float | None = None,
    capacity: int | None = None,
    total: int | None = None,
) -> DataFrame:
    """Exact counts of every item whose global count meets the
    threshold (``min_count``, or ``ceil(min_frac · N)``), found with
    the two-pass MG-candidates → exact-verify plan.  ``items`` is an
    ``array<string>`` column (e.g. the word split of a text column) —
    tokenization happens INSIDE pass 1's map stage, so no exploded
    row ever shuffles except verified-candidate occurrences.

    **Corpus scans.**  Pass 1's map stage also emits per-partition
    occurrence totals (one sentinel row per partition), so the corpus
    total N never needs its own scan: ``min_frac`` mode and a CALLABLE
    ``min_count`` (called with N after pass 1 — e.g. ``lambda n:
    max(1, n // 500)``, keeping threshold arithmetic exact) both run
    in exactly TWO corpus scans.  The only shape that costs a third
    scan is an INT ``min_count`` with neither ``capacity`` nor
    ``total`` supplied, because the guarantee-sized capacity must be
    known before pass 1; pass ``total=`` (if the caller already
    aggregated it) or an explicit ``capacity`` to avoid it.

    ``capacity`` defaults to a size that makes the MG superset
    guarantee unconditional for the requested threshold
    (``N/threshold + 1`` per partition; ``⌈1/min_frac⌉ + 1`` in
    fraction mode — N-free); it is clamped at :data:`CAPACITY_CAP`
    with a warning.  Set it lower to trade candidate-set size for a
    probabilistic pass 1 (pass 2 keeps the OUTPUT exact either way,
    but too-low capacity can drop a true heavy item from the
    candidate set).  The candidate union (≤ capacity × partitions
    rows) is collected to the driver — the one bounded inflow — and
    re-broadcast for the verify join.

    Returns ``(item, count)``, count exact, ordered (count desc, item).
    """
    import math

    if min_count is None and min_frac is None:
        raise ValueError("pass min_count or min_frac")

    c = F.col(items) if isinstance(items, str) else items
    exploded_src = df.select(c.alias("__items"))

    if capacity is None:
        if min_frac is not None:
            # N-free: threshold f·N needs only c > 1/f for the guarantee
            capacity = math.ceil(1.0 / min_frac) + 1
        else:
            if total is None:
                # fallback third scan — documented; avoided by passing
                # total= or capacity=, or using a callable min_count
                # with explicit capacity / min_frac
                total = int(
                    exploded_src.agg(
                        F.sum(F.size("__items")).alias("n")
                    ).first()["n"]
                    or 0
                )
            mc = min_count(total) if callable(min_count) else min_count
            capacity = total // max(int(mc), 1) + 1
    cap = _resolve_capacity(capacity)

    def sketch(batches):
        import pandas as pd

        counters: dict = {}
        n = 0
        for pdf in batches:
            for arr in pdf["__items"]:
                if arr is None:
                    continue
                for it in arr:
                    if it is None:
                        continue
                    n += 1
                    _mg_update(counters, it, 1, cap)
        # sentinel row (item NULL) carries the partition's total so the
        # driver learns N from pass 1 itself — no separate corpus scan
        yield pd.DataFrame(
            {
                "item": list(counters.keys()) + [None],
                "n": [0] * len(counters) + [n],
            }
        )

    pass1 = exploded_src.mapInPandas(sketch, "item string, n long").collect()
    cand_items = sorted({r["item"] for r in pass1 if r["item"] is not None})
    if total is None:
        total = sum(r["n"] for r in pass1 if r["item"] is None)
    total = int(total)

    if min_count is None:
        min_count = max(1, math.ceil(total * min_frac))
    elif callable(min_count):
        min_count = min_count(total)
    min_count = int(min_count)

    candidates = df.sparkSession.createDataFrame(
        [(it,) for it in cand_items], "item string"
    )
    # pass 2: exact recount of candidate occurrences only
    occurrences = exploded_src.select(
        F.explode("__items").alias("item")
    ).join(F.broadcast(candidates), "item")
    return (
        occurrences.groupBy("item")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
        .orderBy(F.col("count").desc(), "item")
    )
