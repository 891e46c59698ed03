"""Training-context assembly: deterministic sharding + sequence packing.

LLM training consumes fixed-length contexts, not documents: the corpus is
laid out as a set of shards, each an ordered tape of documents, and the
tape is cut into ``budget``-token contexts.  The operators here make that
layout a pure function of the data:

- **shard** = portable hash of the doc key, mod ``n_shards`` — stable
  under repartitioning, re-runs, and engine (the DuckDB oracle replicates
  it bit-for-bit), so the same corpus always produces the same shards;
- **context** = position of the document's first token on the shard tape,
  integer-divided by the budget (sequential fill: a document that
  straddles a boundary belongs to the context where it starts — the
  drop-nothing semantics of a streaming packer).

Scale shape: ONE shuffle (hash partition by shard) and a within-shard
sort — the same cost as any keyed window.  ``n_shards`` is the
parallelism knob; at 100 TB you pick it for a target shard size (e.g.
~1 GB of tokens), and no global sort ever happens.  The assignment is a
window cumulative sum, fully expressible in SQL — greedy bin packing
(close a context when the next doc would overflow) is NOT expressible as
a window and would need a sequential scan per shard; the boundary-
straddle variant is the standard scalable compromise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.functions.text import portable_hash32, token_count


def shard_of(key: Column | str, n_shards: int, salt: str = "") -> Column:
    """Deterministic shard id in [0, n_shards) from a stable row key."""
    k = F.col(key) if isinstance(key, str) else key
    return portable_hash32(F.concat(F.lit(salt), k.cast("string"))) % n_shards


def pack_sequences(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    n_shards: int = 8,
    salt: str = "pk",
) -> DataFrame:
    """Assign each document a ``(shard, context_id)`` for fixed-budget
    context packing.  Returns ``id_col, shard, n_tokens, cum_tokens,
    context_id`` — ``context_id`` is the budget-quotient of the document's
    starting token offset within its shard (docs ordered by ``id_col``)."""
    d = docs.select(
        F.col(id_col),
        shard_of(id_col, n_shards, salt).alias("shard"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return d.withColumn(
        "context_id",
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / budget).cast("long"),
    )
