"""BM25 candidate-cut A/B under SELECTIVE queries (r13 verdict item 6).

The r13 restructure broadcasts the query terms FIRST so the dl/df joins
move candidate-sized relations instead of the corpus.  On the bench
fixture (probe = first 6 tokens of docs 0-4, templated text) candidates
≈ corpus, so the bench delta was plan-shape only.  This A/B builds
probes from RARE tokens (df ≤ rare_df) so candidates ≪ corpus — the
regime the restructure targets — and times:

  A (HEAD): functions.text.bm25_topk (query-term cut before any join)
  B (r12 shape): identical math, but tf joins dl and df corpus-wide
    BEFORE the query-term join (reconstructed inline)

Both arms share one session; reps interleave round-robin; noop sink;
rank parity between arms is asserted every rep.  Writes
bm25_selective_ab_r14.json.

Usage: python spikes/bm25_selective_ab.py [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from entropy_balance_weighting_spark.functions import text  # noqa: E402
from entropy_balance_weighting_spark.functions.text import (  # noqa: E402
    _bm25_contrib,
    tokens,
)
from entropy_balance_weighting_spark.session import (  # noqa: E402
    get_spark,
    load_table,
)


def bm25_topk_r12_shape(docs, queries, *, k=5, k1=1.2, b=0.75, quant=10**6):
    """The pre-r13 join order: corpus-wide tf→dl and tf→df joins, query
    terms joined LAST.  Same math, same quantization, same tie-break."""
    from pyspark.storagelevel import StorageLevel

    n_docs = docs.count()
    toks = docs.select(
        F.col("doc_id"), F.explode(tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    tf = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    tot = dl.agg(F.sum("dl").alias("s"), F.count(F.lit(1)).alias("c")).first()
    avgdl = float(tot["s"]) / float(tot["c"])
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    qtoks = (
        queries.select(
            "query_id", F.explode(tokens(F.col("qtext"))).alias("tok")
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    contrib = _bm25_contrib(n_docs, avgdl, k1=k1, b=b, quant=quant)
    scored = (
        tf.join(dl, "doc_id")          # corpus-wide join 1
        .join(dfreq, "tok")            # corpus-wide join 2
        .join(F.broadcast(qtoks), "tok")  # the cut, LAST
        .groupBy("query_id", "doc_id")
        .agg(F.sum(contrib).alias("score_q"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_q").desc(), F.col("doc_id")
    )
    out = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            "doc_id",
            (F.col("score_q") / F.lit(float(quant))).alias("score"),
            "rk",
        )
    )
    tf.unpersist()
    return out


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rare_df = int(os.environ.get("BM25_RARE_DF", "3"))
    spark = get_spark(app_name="bm25_selective_ab")
    docs = load_table(spark, sf_dir, "documents")

    # Build selective probes: 20 queries of 3 rare tokens each (df <=
    # rare_df), deterministic order.  Candidates per query <= 3*rare_df.
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    rare = (
        toks.groupBy("tok")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") <= rare_df)
        .orderBy("tok")
        .limit(60)
        .collect()
    )
    assert len(rare) >= 9, f"corpus has only {len(rare)} rare tokens"
    terms = [r["tok"] for r in rare]
    n_q = min(20, len(terms) // 3)
    probes = [
        (q, " ".join(terms[3 * q : 3 * q + 3])) for q in range(n_q)
    ]
    queries = spark.createDataFrame(
        spark.sparkContext.parallelize(probes, 1), "query_id int, qtext string"
    )
    n_corpus = docs.count()
    print(f"probes: {n_q} queries x 3 rare tokens (df<={rare_df}); corpus {n_corpus} docs")

    def run(arm: str) -> tuple[float, list]:
        fn = text.bm25_topk if arm == "A_head" else bm25_topk_r12_shape
        t0 = time.perf_counter()
        out = fn(docs, queries, k=5)
        rows = sorted(
            (r["query_id"], r["rk"], r["doc_id"], round(r["score"], 6))
            for r in out.collect()
        )
        return time.perf_counter() - t0, rows

    # warmup both arms once
    _, ref_a = run("A_head")
    _, ref_b = run("B_r12")
    assert ref_a == ref_b, "arms disagree on ranks/scores"

    times: dict[str, list[float]] = {"A_head": [], "B_r12": []}
    for _ in range(reps):
        for arm in ("A_head", "B_r12"):
            dt, rows = run(arm)
            assert rows == ref_a, f"{arm} drifted"
            times[arm].append(dt)

    result = {
        "sf_dir": sf_dir,
        "n_queries": n_q,
        "rare_df": rare_df,
        "corpus_docs": n_corpus,
        "reps": reps,
        "rank_parity": True,
        "A_head": {
            "min": round(min(times["A_head"]), 4),
            "med": round(statistics.median(times["A_head"]), 4),
            "all": [round(t, 3) for t in times["A_head"]],
        },
        "B_r12_shape": {
            "min": round(min(times["B_r12"]), 4),
            "med": round(statistics.median(times["B_r12"]), 4),
            "all": [round(t, 3) for t in times["B_r12"]],
        },
    }
    out_path = Path(__file__).resolve().parents[1] / "bm25_selective_ab_r14.json"
    out_path.write_text(json.dumps(result, indent=2))
    print(json.dumps(result, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
