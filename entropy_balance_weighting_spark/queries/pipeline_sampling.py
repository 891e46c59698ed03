"""Sampling queries: stratified, shuffle-order, domain-mix,
fixed-k-per-stratum, score-weighted.

Split from the former monolithic pipeline.py (round-7 verdict item #6);
registration names unchanged.  Hash-sensitive stages use the
engine-portable md5-prefix hash so the DuckDB oracles replicate them
bit-for-bit; float aggregates are rounded identically on both sides.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.functions import dedup, events, similarity
from entropy_balance_weighting_spark.functions import multimodal, packing, sampling, text
from entropy_balance_weighting_spark.queries.registry import register
from entropy_balance_weighting_spark.session import load_table


@register(
    "samp_stratified",
    bench=True,
    survey="ext:sampling-stratified",
    oracle="""
WITH s AS (
  SELECT source, n_chars,
         ('0x'||substr(md5('s3' || CAST(doc_id AS VARCHAR)),1,8))::BIGINT
           % 1000000 AS b
  FROM documents
)
SELECT source, count(*) AS n_sampled,
       CAST(sum(n_chars) AS BIGINT) AS chars_sum
FROM s
WHERE b < CASE source WHEN 'src0' THEN 500000
                      WHEN 'src1' THEN 250000
                      ELSE 100000 END
GROUP BY source ORDER BY source
""",
)
def samp_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (reproducible ``sampleBy``):
    keep-rate 50% for src0, 25% for src1, 10% elsewhere, with membership a
    pure function of (salt, doc_id) via the portable hash — stable under
    repartitioning and re-runs, zero-shuffle map-side filter
    (:func:`functions.sampling.stratified_sample`)."""
    docs = load_table(spark, sf_dir, "documents")
    sampled = sampling.stratified_sample(
        docs,
        key="doc_id",
        strata_col="source",
        rates={"src0": 0.5, "src1": 0.25},
        default_rate=0.1,
        salt="s3",
    )
    return (
        sampled.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("long").alias("chars_sum"),
        )
        .orderBy("source")
    )


@register(
    "samp_shuffle_order",
    survey="ext:sampling-shuffle",
    oracle="""
SELECT doc_id,
       ('0x'||substr(md5('ep0'||CAST(doc_id AS VARCHAR)),1,8))::BIGINT
         AS shuffle_key
FROM documents ORDER BY shuffle_key, doc_id LIMIT 20
""",
)
def samp_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: order by the portable
    hash of (epoch-salt, doc_id).  Reproducible across runs/engines (same
    seed → same order), re-seedable per epoch by changing the salt, and
    scalable — Spark executes orderBy+limit as a distributed top-k
    (TakeOrderedAndProject), and a full-epoch write would be
    ``df.repartitionByRange(shuffle_key).sortWithinPartitions`` (range
    sort, no single-partition window)."""
    docs = load_table(spark, sf_dir, "documents")
    key = text.portable_hash32(
        F.concat(F.lit("ep0"), F.col("doc_id").cast("string"))
    )
    return (
        docs.select("doc_id", key.alias("shuffle_key"))
        .orderBy("shuffle_key", "doc_id")
        .limit(20)
    )


@register(
    "samp_domain_mix",
    survey="ext:sampling-domain-mix",
    oracle="""
WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
m AS (SELECT min(n) AS mn FROM c),
r AS (SELECT source,
             CAST(floor(1000000.0 * (SELECT mn FROM m) / n) AS BIGINT) AS thr
      FROM c)
SELECT d.source,
       count(*) AS n_kept,
       CAST(max(r.thr) AS BIGINT) AS thr
FROM documents d JOIN r USING (source)
WHERE ('0x'||substr(md5('mix'||CAST(d.doc_id AS VARCHAR)),1,8))::BIGINT
        % 1000000 < r.thr
GROUP BY d.source ORDER BY d.source
""",
)
def samp_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling to an EQUAL source mix
    (:func:`functions.sampling.resample_to_mix`): every source
    downsamples toward the smallest source's count via the deterministic
    hash sampler, so for equal shares the per-source threshold reduces
    to ``floor(1e6·n_min/n_s)`` — which is exactly what the oracle
    recomputes in SQL, membership bit-for-bit.  Driver-side rate
    arithmetic is exact-rational so integral thresholds can't float one
    ulp low."""
    docs = load_table(spark, sf_dir, "documents")
    # ONE group-cardinality-sized aggregate job yields both the source
    # list and the per-source counts (r5 verdict item #6: was two jobs)
    counts = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sources = sorted(counts)
    shares = {s: 1.0 / len(sources) for s in sources}
    mixed = sampling.resample_to_mix(
        docs, "doc_id", "source", shares, salt="mix", stratum_counts=counts
    )
    # surface the applied threshold per source so the oracle checks the
    # RATE derivation, not just the row membership
    from fractions import Fraction

    mn = min(counts.values())
    thr = {s: int(Fraction(1_000_000 * mn, counts[s])) for s in sources}
    thr_col = F.lit(None).cast("long")
    for s in sorted(sources):
        thr_col = F.when(F.col("source") == s, F.lit(thr[s])).otherwise(thr_col)
    return (
        mixed.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .withColumn("thr", thr_col)
        .orderBy("source")
    )


@register(
    "samp_fixed_per_stratum",
    survey="ext:sampling-fixed-k",
    oracle="""
WITH ranked AS (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5(doc_id::VARCHAR || 'ev'), 1, 8))::BIGINT,
                    doc_id
         ) AS rk
  FROM documents
)
SELECT source, doc_id FROM ranked WHERE rk <= 3
ORDER BY source, doc_id
""",
)
def samp_fixed_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-3-docs-per-source deterministic sample
    (:func:`functions.sampling.sample_fixed_per_stratum`) — the eval-set
    construction pattern where output SIZE must be exact, membership
    re-derivable from (key, salt), and no ``rand()`` in sight.  One hash
    exchange + within-stratum row_number, no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.sample_fixed_per_stratum(
        docs, "doc_id", "source", 3, salt="ev"
    ).select("source", "doc_id").orderBy("source", "doc_id")


@register(
    "samp_quality_weighted",
    survey="ext:sampling-score-weighted",
    oracle="""
WITH kept AS (
  SELECT source, n_chars FROM documents
  WHERE ('0x' || substr(md5('qw' || doc_id::VARCHAR), 1, 8))::BIGINT % 1000000
        < least(n_chars * 2000, 1000000)
)
SELECT source, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS kept_chars
FROM kept GROUP BY source ORDER BY source
""",
)
def samp_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-proportional deterministic sampling
    (:func:`functions.sampling.score_weighted_sample`): keep-probability
    min(1, n_chars/500) — longer (higher-quality-proxy) documents kept at
    higher rates, the quality-weighted curation stage of corpus prep.
    Integer per-1e6 thresholds keep membership engine-exact; the filter
    is a zero-shuffle projection."""
    docs = load_table(spark, sf_dir, "documents")
    thr = F.least(F.col("n_chars") * 2000, F.lit(1_000_000))
    kept = sampling.score_weighted_sample(docs, "doc_id", thr, salt="qw")
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("long").alias("kept_chars"),
        )
        .orderBy("source")
    )


