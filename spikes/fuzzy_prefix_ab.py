"""A/B: rarest-k prefix blocking (r13 default) vs the r12
share-any-token candidate scheme for the cross-table fuzzy join —
measured candidate volume + wall time on the sf0.1 documents corpus
with its natural token skew.

The old scheme is reproduced inline (explode both sides fully, join on
the token, distinct) — exactly `fuzzy_join_jaccard`'s r12 candidate
stage with `max_token_df=None`.  Candidate volume for it is
Σ_token df_L·df_R; for prefix blocking it is Σ over PREFIX tokens only.
Prints one JSON line with both candidate counts, the Σ df_L·df_R
arithmetic check, end-to-end wall for both variants, and the verified
result-set equality (completeness: prefix blocking must lose nothing).

Usage: python spikes/fuzzy_prefix_ab.py  [SPARK_GRAFT_SF_DIR=...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

THRESHOLD = 0.8


def _zipf_corpus(spark, n_docs: int, vocab: int, doc_len: int, seed: int):
    """Natural-language-shaped corpus: zipfian token draws over a large
    vocabulary plus three universal stopwords per doc — the df profile
    (few ubiquitous tokens, long rare tail) where prefix blocking's win
    lives; the sf0.1 documents fixture has a tiny templated vocabulary
    and cannot show it (measured below: candidates there are dominated
    by TRUE near-pairs, which no complete blocking can shrink)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    # zipf(1.1) truncated to the vocab → heavy head, long tail
    draws = rng.zipf(1.1, size=(n_docs, doc_len)) % vocab
    texts = [
        "the of and " + " ".join(f"w{t}" for t in row) for row in draws
    ]
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(n_docs), "text": texts})
    )


def main() -> None:
    from pyspark.sql import functions as F

    from entropy_balance_weighting_spark.functions import dedup
    from entropy_balance_weighting_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="fuzzy_prefix_ab")

    if os.environ.get("FUZZY_AB_ZIPF"):
        n_docs = int(os.environ.get("FUZZY_AB_N", 20000))
        docs = _zipf_corpus(spark, n_docs, vocab=100_000, doc_len=60, seed=7)
    else:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    left = docs.select("doc_id", "text")
    # probe side: every 5th doc's first 40 words (the dd_fuzzy_join shape)
    right = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select(
            (F.col("doc_id") + 1_000_000).alias("q_id"),
            F.array_join(
                F.slice(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 1, 40),
                " ",
            ).alias("q_text"),
        )
    )

    lt = left.select(
        F.col("doc_id").alias("__lid"),
        dedup._fuzzy_tokset("text").alias("__ltoks"),
    ).persist()
    rt = right.select(
        F.col("q_id").alias("__rid"),
        dedup._fuzzy_tokset("q_text").alias("__rtoks"),
    ).persist()
    n_l, n_r = lt.count(), rt.count()

    # --- NEW: rarest-k prefix blocking ---------------------------------
    t0 = time.perf_counter()
    cand_new = dedup.fuzzy_join_candidates(lt, rt, threshold=THRESHOLD)
    n_cand_new = cand_new.count()
    wall_cand_new = time.perf_counter() - t0

    # --- OLD (r12): share-any-token ------------------------------------
    lx = lt.select("__lid", F.explode("__ltoks").alias("__tok"))
    rx = rt.select("__rid", F.explode("__rtoks").alias("__tok"))
    t0 = time.perf_counter()
    cand_old = lx.join(rx, "__tok").select("__lid", "__rid").distinct()
    n_cand_old = cand_old.count()
    wall_cand_old = time.perf_counter() - t0

    # pre-distinct join volume the old scheme shuffles: Σ df_L·df_R
    ldf = lx.groupBy("__tok").agg(F.count(F.lit(1)).alias("dl"))
    rdf = rx.groupBy("__tok").agg(F.count(F.lit(1)).alias("dr"))
    join_volume_old = (
        ldf.join(rdf, "__tok")
        .agg(F.sum(F.col("dl") * F.col("dr")))
        .first()[0]
    )

    # --- end-to-end walls + completeness check -------------------------
    def run_join(**kw):
        t0 = time.perf_counter()
        out = dedup.fuzzy_join_jaccard(
            left, right, left_id="doc_id", left_text="text",
            right_id="q_id", right_text="q_text", threshold=THRESHOLD, **kw
        )
        rows = {(r["doc_id"], r["q_id"]) for r in out.collect()}
        return rows, time.perf_counter() - t0

    pairs_new, wall_new = run_join()
    # old end-to-end = verify every share-any-token candidate
    t0 = time.perf_counter()
    jac = F.size(F.array_intersect("__ltoks", "__rtoks")) / F.size(
        F.array_union("__ltoks", "__rtoks")
    )
    old_out = (
        cand_old.join(lt, "__lid").join(F.broadcast(rt), "__rid")
        .withColumn("j", jac)
        .filter(F.col("j") >= THRESHOLD)
        .select("__lid", "__rid")
    )
    pairs_old = {(r["__lid"], r["__rid"]) for r in old_out.collect()}
    wall_old = time.perf_counter() - t0 + wall_cand_old

    print(json.dumps({
        "metric": "fuzzy_join_prefix_ab",
        "fixture": "zipf_synthetic" if os.environ.get("FUZZY_AB_ZIPF")
                   else "sf_documents",
        "sf_dir": sf_dir,
        "threshold": THRESHOLD,
        "n_left": n_l,
        "n_right": n_r,
        "candidates_prefix": n_cand_new,
        "candidates_share_any_token": n_cand_old,
        "join_volume_share_any_token": int(join_volume_old),
        "candidate_reduction_x": round(n_cand_old / max(n_cand_new, 1), 2),
        "wall_candidates_prefix_s": round(wall_cand_new, 3),
        "wall_candidates_old_s": round(wall_cand_old, 3),
        "wall_e2e_prefix_s": round(wall_new, 3),
        "wall_e2e_old_s": round(wall_old, 3),
        "result_sets_equal": pairs_new == pairs_old,
        "n_matched_pairs": len(pairs_new),
        "loadavg": list(os.getloadavg()),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
