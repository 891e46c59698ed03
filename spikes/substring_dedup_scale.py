"""Spike: duplicated_span_profile (Lee et al. substring dedup signal) at
corpus scale.

Question: the registered query runs at 500-5,000 docs; does the
gram-DF relational plan hold when the gram table is ~50M rows?  Build
N synthetic docs (~55 tokens each, 20% carrying a planted 12-token
boilerplate span, plus organic collisions from a small vocab), run the
operator at k=6, report wall + intermediate cardinalities.

Run:  SPARK_GRAFT_SCALE_N=1000000 python spikes/substring_dedup_scale.py
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from entropy_balance_weighting_spark.functions.dedup import (
    duplicated_span_profile,
)
from entropy_balance_weighting_spark.session import get_spark

N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "1000000"))

spark = get_spark(master="local[32]", shuffle_partitions=64)

# synthetic corpus, all JVM-side: ~55 tokens/doc from a 5k-word vocab;
# docs with id % 5 == 0 embed the SAME 12-token boilerplate span, so
# ~20% of the corpus carries a guaranteed cross-doc duplicated span.
boiler = " ".join(f"b{i}" for i in range(12))
docs = (
    spark.range(N)
    .select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(42) + (F.col("id") % 13).cast("int")),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(F.col("id") * 1000 + i), F.lit(5000)),
                ),
            ),
        ).alias("body"),
    )
    .select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.concat_ws(" ", F.col("body"), F.lit(boiler)))
        .otherwise(F.col("body"))
        .alias("text"),
    )
)
docs = docs.persist()
n_docs = docs.count()

t0 = time.time()
prof = duplicated_span_profile(docs, id_col="doc_id", text_col="text", k=6, min_df=2)
rows = prof.count()
wall = time.time() - t0

agg = prof.agg(
    F.sum("n_dup_grams").alias("dup_grams"),
    F.avg("coverage").alias("avg_cov"),
).collect()[0]

# r9: the no-cache recompute mode (flat memory profile — the gram table
# is never persisted, the posexplode scan runs once per consumer); its
# wall-vs-memory trade is the r8 verdict's watch item #3.
t1 = time.time()
prof_nc = duplicated_span_profile(
    docs, id_col="doc_id", text_col="text", k=6, min_df=2, cache=False
)
rows_nc = prof_nc.count()
wall_nc = time.time() - t1

out = {
    "metric": "substring_span_profile_wall",
    "value": round(wall, 2),
    "unit": "sec",
    "n_docs": n_docs,
    "docs_with_dup_spans": rows,
    "total_dup_gram_occurrences": int(agg["dup_grams"]),
    "avg_coverage": round(float(agg["avg_cov"]), 4),
    "docs_per_sec": round(n_docs / wall, 1),
    "k": 6,
    "nocache_wall_sec": round(wall_nc, 2),
    "nocache_rows_equal": rows_nc == rows,
}
print(json.dumps(out))
spark.stop()
