"""Audit every registered query's plan for duplicate corpus scans
(optimization r13): walk the analyzed/optimized logical plan and count
LogicalRelation nodes per parquet table, EXCLUDING subtrees that sit under
an InMemoryRelation (a cache's stored build plan is display/bookkeeping,
not a runtime scan).  A table counted more than once means the query
recomputes a shared subtree — the class fixed in bm25/tfidf/unigram/bigram.

Usage: python spikes/scan_multiplicity.py [sf_dir] [name ...]
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.001"


def scan_counts(jplan, seen_caches: set | None = None) -> Counter:
    """Count relation leaves per table path in a JVM logical plan,
    skipping InMemoryRelation subtrees (cached — built once), deduping
    repeated references to the SAME cache (a cache referenced N times is
    still built once)."""
    if seen_caches is None:
        seen_caches = set()
    out: Counter = Counter()
    cls = jplan.getClass().getSimpleName()
    if cls == "InMemoryRelation":
        key = jplan.cacheBuilder().hashCode()
        if key in seen_caches:
            return out
        seen_caches.add(key)
        # one cache build = one scan per table, charged once
        for tbl, n in scan_counts(jplan.cachedPlan(), seen_caches).items():
            out[tbl] += 1 if n else 0
        return out
    if cls in ("LogicalRelation", "FileSourceScanExec"):
        path = None
        try:
            roots = jplan.relation().location().rootPaths()
            if roots.length() > 0:
                path = roots.apply(0).toString()
        except Exception:
            pass
        if path is None:
            m = re.search(r"\[file:([^\]]+)\]", jplan.simpleString(2000))
            path = m.group(1) if m else jplan.simpleString(80)
        out[Path(path).name] += 1
        return out
    it = jplan.children().iterator()
    while it.hasNext():
        out += scan_counts(it.next(), seen_caches)
    # subqueries (broadcast scalar subqueries etc.)
    sit = jplan.subqueries().iterator() if hasattr(jplan, "subqueries") else None
    if sit is not None:
        while sit.hasNext():
            out += scan_counts(sit.next(), seen_caches)
    return out


def main() -> None:
    global SF_DIR
    args = sys.argv[1:]
    if args and "/" in args[0]:
        SF_DIR = args[0]
        args = args[1:]

    from entropy_balance_weighting_spark.queries import QUERIES
    from entropy_balance_weighting_spark.session import get_spark

    spark = get_spark(app_name="scan_multiplicity")
    names = args or list(QUERIES)
    for name in names:
        q = QUERIES[name]
        try:
            df = q.fn(spark, SF_DIR)
            jplan = df._jdf.queryExecution().optimizedPlan()
            counts = scan_counts(jplan)
        except Exception as exc:
            print(f"{name}: ERROR {exc!r}"[:160])
            continue
        dups = {t: n for t, n in counts.items() if n > 1}
        if dups:
            print(f"{name}: DUPLICATE {dups}")
        else:
            print(f"{name}: ok {dict(counts)}")
    spark.stop()


if __name__ == "__main__":
    main()
