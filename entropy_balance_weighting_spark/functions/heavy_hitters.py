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

from pyspark.sql import Column, DataFrame, functions as F


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


def heavy_hitters(
    df: DataFrame,
    items: Column | str,
    *,
    min_count: int | None = None,
    min_frac: float | None = None,
    capacity: int | None = None,
) -> DataFrame:
    """Exact counts of every item whose global count meets the
    threshold (``min_count``, or ``ceil(min_frac · N)``), found with
    the two-pass MG-candidates → exact-verify plan.  ``items`` is an
    ``array<string>`` column (e.g. the word split of a text column) —
    tokenization happens INSIDE pass 1's map stage, so no exploded
    row ever shuffles except verified-candidate occurrences.

    ``capacity`` defaults to a size that makes the MG superset
    guarantee unconditional for the requested threshold
    (``N/threshold + 1`` per partition — see module docstring); set it
    lower only to trade candidate-set size for a probabilistic pass 1
    (pass 2 keeps the OUTPUT exact either way, but too-low capacity
    can drop a true heavy item from the candidate set).

    Returns ``(item, count)``, count exact, ordered (count desc, item).
    """
    c = F.col(items) if isinstance(items, str) else items
    exploded_src = df.select(c.alias("__items"))

    total = exploded_src.agg(
        F.sum(F.size("__items")).alias("n")
    ).first()["n"]
    total = int(total or 0)
    if min_count is None:
        if min_frac is None:
            raise ValueError("pass min_count or min_frac")
        import math

        min_count = max(1, math.ceil(total * min_frac))
    min_count = int(min_count)
    if capacity is None:
        # unconditional superset guarantee at this threshold
        capacity = max(16, total // max(min_count, 1) + 1)

    cap = int(capacity)

    def sketch(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for arr in pdf["__items"]:
                if arr is None:
                    continue
                for it in arr:
                    _mg_update(counters, it, 1, cap)
        yield pd.DataFrame({"item": list(counters.keys())})

    candidates = (
        exploded_src.mapInPandas(sketch, "item string")
        .distinct()
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
