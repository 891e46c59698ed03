"""Text-analysis queries: quality scoring, lang-ID, token counting,
fingerprinting, TF-IDF, LM surprise, percentile/vocab sketches, RAG
chunking, sequence packing, blocklists.

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
    "txt_repetition",
    bench=True,
    survey="ext:text-repetition",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 3
), g AS (
  SELECT doc_id,
         [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
          FOR i IN range(1, len(t) - 1)] AS grams
  FROM toks
)
SELECT doc_id, len(grams) AS n_grams,
       round(1.0 - len(list_distinct(grams)) * 1.0 / len(grams), 4)
         AS repetition
FROM g ORDER BY doc_id
""",
)
def txt_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition ratio — the classic boilerplate/spam
    quality signal (fraction of a doc's 3-grams that are repeats):
    1 − distinct/total over the gram multiset.  Pure JVM array
    expressions (``transform``/``array_distinct``), zero shuffle, zero
    Python — the per-row quality-stats shape."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", text.tokens(F.col("text")).alias("t")
    ).filter(F.size("t") >= 3)
    t = F.col("t")
    idx = F.sequence(F.lit(0), F.size(t) - 3)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(3)]
        ),
    )
    return (
        toks.select("doc_id", grams.alias("grams"))
        .select(
            "doc_id",
            F.size("grams").cast("long").alias("n_grams"),
            F.round(
                1.0
                - F.size(F.array_distinct("grams"))
                / F.size("grams").cast("double"),
                4,
            ).alias("repetition"),
        )
        .orderBy("doc_id")
    )


@register(
    "txt_fingerprint_dups",
    survey="ext:text-fingerprint",
    oracle="""
WITH fp AS (
  SELECT source,
    list_reduce(list_prepend(0::BIGINT,
      list_transform(string_split(text, ' '),
        t -> (('0x' || substr(md5(t),1,8))::BIGINT % 2147483647))),
      (acc, x) -> (acc * 31 + x) % 2147483647) AS fp
  FROM documents
)
SELECT source, count(*) AS n_docs,
       count(DISTINCT fp) AS n_fp,
       count(*) - count(DISTINCT fp) AS n_dup,
       CAST(sum(fp) AS BIGINT) AS fp_sum
FROM fp GROUP BY source ORDER BY source
""",
)
def txt_fingerprint_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: polynomial rolling hash (Rabin–Karp) over
    the token-hash stream, folded JVM-side by ``F.aggregate`` — per-source
    duplicate detection by whole-content fingerprint.  ``fp_sum`` pins the
    fingerprint values bit-for-bit against the DuckDB replica."""
    from entropy_balance_weighting_spark.functions.text import (
        rolling_fingerprint,
    )

    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select("source", rolling_fingerprint("text").alias("fp"))
    return (
        fp.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_fp"),
            (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_dup"),
            F.sum("fp").cast("long").alias("fp_sum"),
        )
        .orderBy("source")
    )


@register(
    "txt_tfidf_topterms",
    survey="ext:text-tfidf",
    bench=True,
    oracle="""
WITH toks AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok FROM documents
), tf AS (
  SELECT doc_id, source, tok, count(*) AS tf
  FROM toks WHERE tok <> '' GROUP BY 1, 2, 3
), dfreq AS (
  SELECT tok, count(*) AS df FROM tf GROUP BY tok
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT f.source, f.tok,
         round(sum(f.tf * ln(n.n_docs / d.df)), 4) AS score
  FROM tf f JOIN dfreq d USING (tok) CROSS JOIN n
  GROUP BY 1, 2
), ranked AS (
  SELECT *, CAST(row_number() OVER
      (PARTITION BY source ORDER BY score DESC, tok) AS INT) AS rk
  FROM scored
)
SELECT source, tok, score, rk FROM ranked WHERE rk <= 5
ORDER BY source, rk
""",
)
def txt_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus TF-IDF, top-5 terms per source: tf from one explode+groupBy,
    document frequency counted off the tf table (no ``countDistinct``
    corpus pass), idf = ln(N/df), score rounded BEFORE the per-group
    rank — all JVM-side (:func:`functions.text.tfidf_top_terms`)."""
    docs = load_table(spark, sf_dir, "documents")
    out = text.tfidf_top_terms(docs, top_k=5, round_digits=4)
    return out.orderBy("source", "rk")


@register(
    "txt_quality_stats",
    survey="ext:text-analysis",
    bench=True,
    oracle="""
WITH t AS (
  SELECT source, lang, string_split(text, ' ') AS toks, text FROM documents
), per_doc AS (
  SELECT source, lang,
    len(toks) AS n_tok,
    len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_retok,
    len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it')))
        * 1.0 / len(toks) AS swr,
    list_sum(list_transform(toks, x -> length(x))) * 1.0 / len(toks) AS mtl
  FROM t
), scored AS (
  SELECT source, lang, n_tok, n_retok, swr,
    0.4 * least(n_tok / 100.0, 1.0) + 0.3 * least(swr / 0.3, 1.0)
      + 0.3 * least(mtl / 8.0, 1.0) AS q,
    CASE WHEN swr > 0.02 THEN 1 ELSE 0 END AS is_en
  FROM per_doc
)
SELECT source, lang, count(*) AS n_docs,
       round(avg(n_tok), 4) AS avg_tokens,
       round(avg(n_retok), 4) AS avg_regex_tokens,
       round(avg(q), 4) AS avg_quality,
       CAST(sum(is_en) AS BIGINT) AS n_pred_en
FROM scored GROUP BY source, lang ORDER BY source, lang
""",
)
def txt_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis per (source, lang): token counts (whitespace + a
    BPE-ish regex), composite quality score, language-ID heuristic — all
    pure Column expressions inside one codegen'd projection."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = text.annotate_token_stats(docs).select(
        "source",
        "lang",
        "n_tok",
        F.size(F.expr(r"regexp_extract_all(text, '\\w+|[^\\w\\s]', 0)")).alias(
            "n_retok"
        ),
        "q",
        "is_en",
    )
    return (
        per_doc.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
            F.round(F.avg("n_retok"), 4).alias("avg_regex_tokens"),
            F.round(F.avg("q"), 4).alias("avg_quality"),
            F.sum("is_en").alias("n_pred_en"),
        )
        .orderBy("source", "lang")
    )


@register(
    "txt_curation_funnel",
    survey="ext:text-analysis (curation funnel)",
    oracle="""
WITH t AS (
  SELECT string_split(text, ' ') AS toks, text FROM documents
), per_doc AS (
  SELECT len(toks) AS n_tok,
    len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it')))
        * 1.0 / len(toks) AS swr,
    list_sum(list_transform(toks, x -> length(x))) * 1.0 / len(toks) AS mtl
  FROM t
), g AS (
  SELECT n_tok, mtl,
    0.4 * least(n_tok / 100.0, 1.0) + 0.3 * least(swr / 0.3, 1.0)
      + 0.3 * least(mtl / 8.0, 1.0) AS q,
    (swr > 0.02) AS is_en
  FROM per_doc
), gates AS (
  SELECT q,
    (n_tok >= 20) AS g1,
    (n_tok >= 20 AND is_en) AS g2,
    (n_tok >= 20 AND is_en AND mtl BETWEEN 3.0 AND 12.0) AS g3,
    (n_tok >= 20 AND is_en AND mtl BETWEEN 3.0 AND 12.0 AND q >= 0.5) AS g4
  FROM g
)
SELECT 0 AS stage_id, 'raw' AS stage, count(*) AS n_docs,
       round(avg(q), 4) AS avg_quality FROM gates
UNION ALL SELECT 1, 'min_length', CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT),
       round(avg(CASE WHEN g1 THEN q END), 4) FROM gates
UNION ALL SELECT 2, 'lang_en', CAST(sum(CASE WHEN g2 THEN 1 ELSE 0 END) AS BIGINT),
       round(avg(CASE WHEN g2 THEN q END), 4) FROM gates
UNION ALL SELECT 3, 'token_shape', CAST(sum(CASE WHEN g3 THEN 1 ELSE 0 END) AS BIGINT),
       round(avg(CASE WHEN g3 THEN q END), 4) FROM gates
UNION ALL SELECT 4, 'quality', CAST(sum(CASE WHEN g4 THEN 1 ELSE 0 END) AS BIGINT),
       round(avg(CASE WHEN g4 THEN q END), 4) FROM gates
ORDER BY stage_id
""",
)
def txt_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-curation funnel: survivors + mean quality after each
    cumulative filter gate (length → language → token shape → quality
    score).  ONE scan of the corpus — every stage is a conditional
    aggregate over the same annotated projection (map-side partials, no
    per-stage re-filtering), then a 5-row ``stack`` unpivot.  At 100 TB
    this is the curation dashboard query: cost is one pass regardless of
    how many gates stack."""
    docs = text.annotate_token_stats(load_table(spark, sf_dir, "documents"))
    g1 = F.col("n_tok") >= 20
    g2 = g1 & (F.col("is_en") == 1)
    g3 = g2 & F.col("mtl").between(3.0, 12.0)
    g4 = g3 & (F.col("q") >= 0.5)
    q = F.col("q")
    aggs = [
        F.count(F.lit(1)).alias("n0"),
        F.round(F.avg(q), 4).alias("q0"),
    ]
    for i, gate in enumerate((g1, g2, g3, g4), start=1):
        aggs.append(F.sum(gate.cast("long")).alias(f"n{i}"))
        aggs.append(F.round(F.avg(F.when(gate, q)), 4).alias(f"q{i}"))
    wide = docs.agg(*aggs)
    stages = ["raw", "min_length", "lang_en", "token_shape", "quality"]
    stack_args = ", ".join(
        f"{i}, '{nm}', n{i}, q{i}" for i, nm in enumerate(stages)
    )
    return wide.select(
        F.expr(
            f"stack(5, {stack_args}) AS (stage_id, stage, n_docs, avg_quality)"
        )
    ).orderBy("stage_id")


@register(
    "txt_source_lang_rollup",
    survey="ext:olap-rollup",
    oracle="""
SELECT coalesce(source, 'ALL') AS source, coalesce(lang, 'ALL') AS lang,
       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars_sum
FROM documents GROUP BY ROLLUP (source, lang)
ORDER BY source, lang
""",
)
def txt_source_lang_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical corpus stats via ROLLUP grouping sets — per
    (source, lang), per source, and grand total in ONE pass (Spark
    expands the grouping sets inside the aggregate; no self-union of
    scans).  Null grouping keys render as 'ALL' on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.rollup("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars_sum"),
        )
        .select(
            F.coalesce("source", F.lit("ALL")).alias("source"),
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            "n_docs",
            "chars_sum",
        )
        .orderBy("source", "lang")
    )


@register(
    "txt_blocklist_filter",
    survey="ext:text-policy",
    oracle="""
WITH d AS (
  SELECT source,
         len(string_split(text, ' ')) AS n_tok,
         len(list_filter(string_split(text, ' '),
                         x -> x IN ('slow', 'error'))) AS hits
  FROM documents
)
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN hits * 1.0 / n_tok > 0.05 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_blocked,
       CAST(sum(hits) AS BIGINT) AS total_hits,
       round(avg(hits * 1.0 / n_tok), 4) AS avg_hit_ratio
FROM d GROUP BY source ORDER BY source
""",
)
def txt_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-policy screening: per-source count of documents whose
    blocklist-token density exceeds 5% (:func:`functions.text.
    blocklist_hits`) — a pure-projection gate, the filter itself is
    zero-shuffle and pushes to the scan."""
    docs = load_table(spark, sf_dir, "documents")
    hits = text.blocklist_hits("text", ("slow", "error"))
    ratio = hits.cast("double") / text.token_count("text")
    per_doc = docs.select(
        "source",
        hits.alias("hits"),
        ratio.alias("hit_ratio"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("hit_ratio") > 0.05).cast("long")).alias("n_blocked"),
            F.sum("hits").cast("long").alias("total_hits"),
            F.round(F.avg("hit_ratio"), 4).alias("avg_hit_ratio"),
        )
        .orderBy("source")
    )


@register(
    "txt_seq_packing",
    survey="ext:packing",
    bench=True,
    oracle="""
WITH d AS (
  SELECT doc_id,
         ('0x'||substr(md5('pk'||CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 8
           AS shard,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
), c AS (
  SELECT shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
)
SELECT shard, CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS context_id,
       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS context_tokens
FROM c GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def txt_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-context packing: deterministic hash-sharding + sequential
    fill of 512-token contexts (:func:`functions.packing.pack_sequences`).
    One shuffle (hash by shard) + within-shard window cumsum — no global
    sort; the oracle replays the identical shard hash and tape layout."""
    docs = load_table(spark, sf_dir, "documents")
    packed = packing.pack_sequences(
        docs, budget=512, n_shards=8, salt="pk"
    )
    return (
        packed.groupBy("shard", "context_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("context_tokens"),
        )
        .orderBy("shard", "context_id")
    )


@register(
    "txt_bpe_token_count",
    survey="ext:text-tokens",
    # interpolate the shared pattern constant so Spark and DuckDB can never
    # drift (engine \s classes differ: Java includes \x0B, RE2 does not)
    oracle=f"""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
       CAST(sum(len(regexp_extract_all(text, '{text.BPE_ISH_PATTERN}')))
            AS BIGINT) AS bpe_tokens,
       round(avg(len(regexp_extract_all(text, '{text.BPE_ISH_PATTERN}'))), 4)
         AS avg_bpe_per_doc
FROM documents GROUP BY source ORDER BY source
""",
)
def txt_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token budgets under BOTH counting conventions per source:
    whitespace tokens and the BPE-ish pretokenizer count
    (:func:`functions.text.bpe_token_count` — letter runs / single
    digits / punctuation runs, the lookahead-free GPT-2 pretokenizer
    shape).  ``regexp_count`` is pure whole-stage-codegen arithmetic —
    one scan, one shuffle; the identical regex runs on DuckDB's RE2."""
    docs = load_table(spark, sf_dir, "documents")
    bpe = text.bpe_token_count(F.col("text"))
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(text.token_count(F.col("text"))).cast("long").alias("ws_tokens"),
            F.sum(bpe).cast("long").alias("bpe_tokens"),
            F.round(F.avg(bpe), 4).alias("avg_bpe_per_doc"),
        )
        .orderBy("source")
    )


@register(
    "txt_unigram_logprob",
    survey="ext:text-lm-quality",
    oracle="""
WITH tok AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS t
  FROM documents
), tok_f AS (SELECT * FROM tok WHERE t <> ''),
freq AS (SELECT t, count(*) AS n FROM tok_f GROUP BY t),
tot AS (SELECT CAST(sum(n) AS DOUBLE) + count(*) AS denom FROM freq),
doc AS (
  SELECT k.doc_id, k.source, avg(ln((freq.n + 1.0) / tot.denom)) AS lp
  FROM tok_f k JOIN freq ON k.t = freq.t, tot
  GROUP BY k.doc_id, k.source
)
SELECT source,
       count(*) AS n_docs,
       round(avg(lp), 4) AS avg_logprob,
       round(min(lp), 4) AS min_logprob
FROM doc GROUP BY source ORDER BY source
""",
)
def txt_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-surprise quality scoring: the corpus's own add-one-smoothed
    unigram model scores each document's mean token log-probability
    (:func:`functions.text.unigram_doc_logprob` — explode + frequency
    groupBy + token join + per-doc mean; corpus scalars folded in as
    driver literals, no keyless cross join), rolled up per source."""
    docs = load_table(spark, sf_dir, "documents")
    scored = text.unigram_doc_logprob(docs)
    return (
        scored.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("logprob"), 4).alias("avg_logprob"),
            F.round(F.min("logprob"), 4).alias("min_logprob"),
        )
        .orderBy("source")
    )


@register(
    "txt_winnow_fingerprints",
    survey="ext:text-winnowing",
    oracle="""
WITH t AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
), th AS (
  SELECT doc_id, source,
         list_transform(
           toks, t -> ('0x'||substr(md5(t),1,8))::BIGINT % 2147483647
         ) AS h
  FROM t
), kg AS (
  SELECT doc_id, source,
         list_transform(
           generate_series(1, greatest(len(h) - 3, 0)),
           i -> (h[i]*29791 + h[i+1]*961 + h[i+2]*31 + h[i+3]) % 2147483647
         ) AS kh
  FROM th
), w AS (
  SELECT doc_id, source,
         list_distinct(list_transform(
           generate_series(1, greatest(len(kh) - 4, 0)),
           j -> least(kh[j], kh[j+1], kh[j+2], kh[j+3], kh[j+4])
         )) AS fps
  FROM kg
), ex AS (
  SELECT DISTINCT doc_id, source, unnest(fps) AS fp FROM w
), byfp AS (
  SELECT source, fp, count(*) AS nd FROM ex GROUP BY source, fp
)
SELECT source,
       count(*) AS n_fps,
       CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
FROM byfp GROUP BY source ORDER BY source
""",
)
def txt_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint stats per source: distinct local
    fingerprints and how many are SHARED across ≥2 documents — the
    partial-overlap dup signal a whole-document fingerprint cannot give
    (any shared run of ≥ k+window−1 tokens guarantees a shared
    fingerprint).  :func:`functions.text.winnow_fingerprints` is pure
    array expressions; the rollup is one explode + two groupBys with
    map-side partials.  At corpus scale the fingerprint inverted index
    (the `ex` table) is the same skew story as the shingle join — cap
    hot fingerprints the same way."""
    docs = load_table(spark, sf_dir, "documents")
    fps = docs.select(
        "doc_id",
        "source",
        F.explode(
            text.winnow_fingerprints(F.col("text"), k=4, window=5)
        ).alias("fp"),
    ).distinct()
    byfp = fps.groupBy("source", "fp").agg(F.count(F.lit(1)).alias("nd"))
    return (
        byfp.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_fps"),
            F.sum((F.col("nd") >= 2).cast("long")).alias("n_shared"),
        )
        .orderBy("source")
    )


@register(
    "txt_rag_chunks",
    survey="ext:text-chunking",
    bench=True,
    oracle="""
WITH t AS (
  SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents
), c AS (
  SELECT doc_id, source, tk,
         greatest(CAST(ceil((len(tk) - 16) / 48.0) AS BIGINT), 1) AS nc
  FROM t
), x AS (
  SELECT doc_id, source,
         len(list_slice(tk, i * 48 + 1, i * 48 + 64)) AS n_tok
  FROM c, unnest(range(0, nc)) AS r(i)
)
SELECT source,
       count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_chunks,
       CAST(sum(n_tok) AS BIGINT) AS chunk_tokens,
       CAST(max(n_tok) AS BIGINT) AS max_chunk_tokens
FROM x GROUP BY source ORDER BY source
""",
)
def txt_rag_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunking rollup (:func:`functions.text.chunk_documents`):
    64-token chunks with 16-token overlap per document, per-source chunk
    counts and token budgets (chunk_tokens exceeds corpus tokens by the
    overlap replication — the storage-cost number a RAG index build
    needs).  Tokenize-once + per-chunk ``slice`` + one generator explode;
    row fan-out ≈ n_tokens/stride, shuffle-free until the rollup."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = text.chunk_documents(
        docs, chunk_tokens=64, overlap_tokens=16, keep_cols=("source",)
    )
    return (
        chunks.groupBy("source")
        .agg(
            F.countDistinct("id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tok").cast("long").alias("chunk_tokens"),
            F.max("n_tok").cast("long").alias("max_chunk_tokens"),
        )
        .orderBy("source")
    )


@register(
    "txt_bigram_logprob",
    survey="ext:text-lm-bigram",
    oracle="""
WITH t AS (
  SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents
), bg AS (
  SELECT doc_id, source, tk[i-1] AS prev, tk[i] AS cur
  FROM t, unnest(range(2, len(tk) + 1)) AS r(i)
), c2 AS (
  SELECT prev, cur, count(*) AS n2 FROM bg GROUP BY prev, cur
), c1 AS (
  SELECT prev, count(*) AS n1 FROM bg GROUP BY prev
), vct AS (
  SELECT CAST(count(DISTINCT cur) AS DOUBLE) AS v FROM bg
), doc AS (
  SELECT bg.doc_id, bg.source,
         avg(ln((c2.n2 + 1.0) / (c1.n1 + vct.v))) AS lp
  FROM bg JOIN c2 ON c2.prev = bg.prev AND c2.cur = bg.cur
          JOIN c1 ON c1.prev = bg.prev, vct
  GROUP BY bg.doc_id, bg.source
)
SELECT source,
       count(*) AS n_docs,
       round(avg(lp), 4) AS avg_logprob,
       round(min(lp), 4) AS min_logprob
FROM doc GROUP BY source ORDER BY source
""",
)
def txt_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM-surprise quality scoring
    (:func:`functions.text.bigram_doc_logprob`): the corpus's own
    add-one-smoothed TRANSITION model scores each document's mean
    conditional log-probability — catches scrambled/template-stitched
    text whose unigram profile looks fluent — rolled up per source."""
    docs = load_table(spark, sf_dir, "documents")
    scored = text.bigram_doc_logprob(docs)
    return (
        scored.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("logprob"), 4).alias("avg_logprob"),
            F.round(F.min("logprob"), 4).alias("min_logprob"),
        )
        .orderBy("source")
    )


@register(
    "txt_langid_confusion",
    survey="ext:text-langid-eval",
    oracle="""
WITH scored AS (
  SELECT lang,
         CASE WHEN (
           len(list_filter(string_split(text, ' '),
                           t -> t IN ('the','a','of','and','to','in','is','it')))
           / CAST(len(string_split(text, ' ')) AS DOUBLE)
         ) > 0.02 THEN 1 ELSE 0 END AS pred_en
  FROM documents
)
SELECT lang, pred_en, count(*) AS n
FROM scored GROUP BY lang, pred_en ORDER BY lang, pred_en
""",
)
def txt_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation harness: confusion counts of the stopword
    heuristic (:func:`functions.text.langid_en_score`) against the
    table's labeled ``lang`` column — the quality-measurement loop every
    classifier-gated curation stage needs (precision/recall derive from
    these counts).  One scan, one grouped count."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", text.langid_en_score(F.col("text")).alias("pred_en"))
        .groupBy("lang", "pred_en")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "pred_en")
    )


@register(
    "txt_langid_nb_confusion",
    survey="ext:text-langid-fit",
    oracle="""
WITH d AS (
  SELECT doc_id, lang, substr(lower(text), 1, 200) AS t FROM documents
), g AS (
  SELECT doc_id, lang,
         unnest(list_transform(generate_series(1, length(t) - 1),
                               i -> substr(t, i, 2))) AS g
  FROM d WHERE length(t) >= 2
), cnt AS (
  SELECT lang AS mlang, g, count(*) AS c FROM g GROUP BY 1, 2
), vocab AS (
  SELECT DISTINCT g FROM (
    SELECT mlang, g,
           row_number() OVER (PARTITION BY mlang ORDER BY c DESC, g) AS rk
    FROM cnt
  ) WHERE rk <= 64
), nv AS (SELECT count(*) AS nv FROM vocab),
langs AS (SELECT lang AS mlang, count(*) AS n_docs FROM d GROUP BY 1),
tot AS (SELECT count(*) AS n FROM d),
vc AS (
  SELECT l.mlang, v.g, coalesce(c.c, 0) AS c
  FROM langs l CROSS JOIN vocab v
  LEFT JOIN cnt c ON c.mlang = l.mlang AND c.g = v.g
), denom AS (
  SELECT mlang, sum(c) + (SELECT nv FROM nv) AS dn FROM vc GROUP BY mlang
), model AS (
  SELECT vc.mlang, vc.g,
         CAST(round(ln((vc.c + 1) / CAST(dn.dn AS DOUBLE)) * 1000000)
              AS BIGINT) AS q
  FROM vc JOIN denom dn USING (mlang)
), prior AS (
  SELECT mlang,
         CAST(round(ln(n_docs / CAST((SELECT n FROM tot) AS DOUBLE))
                    * 1000000) AS BIGINT) AS pq
  FROM langs
), scores AS (
  SELECT g.doc_id, g.lang, m.mlang,
         sum(m.q) + any_value(p.pq) AS score
  FROM g JOIN model m USING (g) JOIN prior p ON p.mlang = m.mlang
  GROUP BY g.doc_id, g.lang, m.mlang
), best AS (
  SELECT doc_id, mlang AS pred,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, mlang) AS rk
  FROM scores
), labeled AS (
  SELECT d.lang, coalesce(b.pred, 'und') AS pred
  FROM d LEFT JOIN (SELECT doc_id, pred FROM best WHERE rk = 1) b
  USING (doc_id)
)
SELECT lang, pred, count(*) AS n
FROM labeled GROUP BY lang, pred ORDER BY lang, pred
""",
)
def txt_langid_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FITTED language ID (r11 verdict task #5): a multinomial Naive
    Bayes over char bigrams is fit from the table's labeled ``lang``
    column (:func:`functions.langid_nb.fit_langid` — capped distributed
    freq fit, driver model, quantized integer log-probs), applied back
    relationally (:func:`predict_langid`: explode → broadcast model
    join → integer sum → deterministic argmax), and evaluated as a
    confusion matrix against the labels.  The oracle replays the ENTIRE
    fit+score arithmetic in SQL — same top-64-per-lang vocabulary
    window (count desc, gram asc), same Laplace smoothing, same
    ``round(ln(p)·10⁶)`` quantization, same tie-break — so a drift
    anywhere in the pipeline (vocab selection, smoothing, prior,
    argmax) fails the hash.  Note the fixture's labels are synthetic
    noise (every doc is the same word distribution), so the LEARNED
    accuracy is chance — the classifier's discriminative power is
    proven on a controlled multilingual fixture in
    ``tests/test_langid_nb.py``; THIS query proves the distributed
    fit/apply machinery exactly.  100 TB shape: fit collects only
    model-sized tables; scoring is one broadcast hash join over a
    prefix-bounded explode with map-side partial aggregation."""
    from entropy_balance_weighting_spark.functions.langid_nb import (
        fit_langid,
        predict_langid,
    )

    docs = load_table(spark, sf_dir, "documents")
    model = fit_langid(
        docs, text_col="text", label_col="lang", n=2, k_per_lang=64,
        prefix=200,
    )
    pred = predict_langid(docs, model, text_col="text", id_col="doc_id")
    return (
        pred.groupBy("lang", F.col("pred_lang").alias("pred"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "pred")
    )




@register(
    "txt_pii_scan",
    survey="ext:text-pii",
    oracle="""
WITH seeded AS (
  SELECT doc_id, source,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || doc_id || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' call ' || (100 + doc_id % 900) || '-555-'
                      || (1000 + doc_id % 9000) ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' ssn ' || (100 + doc_id % 900) || '-'
                      || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-'
                      || (1000 + doc_id % 9000) ELSE '' END
         || CASE WHEN doc_id % 4 = 0
                 THEN ' from ' || (doc_id % 256) || '.' || (doc_id * 7 % 256)
                      || '.' || (doc_id * 13 % 256) || '.'
                      || (doc_id % 200 + 1) ELSE '' END
           AS text2
  FROM documents
), scanned AS (
  SELECT doc_id, source, text2,
         len(regexp_extract_all(text2,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS emails,
         len(regexp_extract_all(text2,
             '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b')) AS phones,
         len(regexp_extract_all(text2,
             '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS ssns,
         len(regexp_extract_all(text2,
             '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS ipv4s,
         length(text2) - length(
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             text2,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[PII]', 'g'),
             '\\b\\d{3}-\\d{2}-\\d{4}\\b', '[PII]', 'g'),
             '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '[PII]', 'g'),
             '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '[PII]', 'g')
         ) AS chars_removed
  FROM seeded
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(emails) AS BIGINT) AS emails,
       CAST(sum(phones) AS BIGINT) AS phones,
       CAST(sum(ssns) AS BIGINT) AS ssns,
       CAST(sum(ipv4s) AS BIGINT) AS ipv4s,
       CAST(sum(CASE WHEN emails + phones + ssns + ipv4s > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS docs_with_pii,
       CAST(sum(chars_removed) AS BIGINT) AS chars_removed
FROM scanned GROUP BY source ORDER BY source
""",
)
def txt_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan + redaction (the privacy-scrub stage of corpus prep):
    deterministic synthetic PII (emails, dashed phone numbers, SSNs,
    IPv4s — seeded by ``doc_id`` arithmetic, the testdata itself carries
    none) is appended to each document, then counted with
    :func:`functions.text.pii_counts` (JVM ``regexp_count``, one pattern
    per type) and redacted with :func:`functions.text.redact_pii`
    (chained all-occurrence ``regexp_replace``).  The PII_PATTERNS are
    RE2-compatible by design, so the DuckDB oracle runs the IDENTICAL
    pattern strings over the identically-seeded text — a regex-dialect
    divergence, wrong redaction order (SSNs must go before the
    permissive IPv4 pattern), or miscount fails the hash on
    ``chars_removed``/per-type counts."""
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    seeded = docs.withColumn(
        "text2",
        F.concat(
            F.col("text"),
            F.when(
                d % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    d.cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                d % 5 == 0,
                F.concat(
                    F.lit(" call "),
                    (d % 900 + 100).cast("string"),
                    F.lit("-555-"),
                    (d % 9000 + 1000).cast("string"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                d % 7 == 0,
                F.concat(
                    F.lit(" ssn "),
                    (d % 900 + 100).cast("string"),
                    F.lit("-"),
                    F.lpad((d % 100).cast("string"), 2, "0"),
                    F.lit("-"),
                    (d % 9000 + 1000).cast("string"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                d % 4 == 0,
                F.concat(
                    F.lit(" from "),
                    (d % 256).cast("string"),
                    F.lit("."),
                    (d * 7 % 256).cast("string"),
                    F.lit("."),
                    (d * 13 % 256).cast("string"),
                    F.lit("."),
                    (d % 200 + 1).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ),
    )
    counts = text.pii_counts("text2")
    scanned = seeded.select(
        "source",
        counts["email"].alias("emails"),
        counts["phone"].alias("phones"),
        counts["ssn"].alias("ssns"),
        counts["ipv4"].alias("ipv4s"),
        (F.length("text2") - F.length(text.redact_pii("text2"))).alias(
            "chars_removed"
        ),
    )
    return (
        scanned.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("emails").alias("emails"),
            F.sum("phones").alias("phones"),
            F.sum("ssns").alias("ssns"),
            F.sum("ipv4s").alias("ipv4s"),
            F.sum(
                (
                    F.col("emails") + F.col("phones") + F.col("ssns")
                    + F.col("ipv4s")
                    > 0
                ).cast("long")
            ).alias("docs_with_pii"),
            F.sum("chars_removed").alias("chars_removed"),
        )
        .orderBy("source")
    )


def _sql_strip_html(expr: str) -> str:
    """Render functions.web's strip chain as nested DuckDB SQL over
    ``expr`` — the SAME pattern strings (RE2-safe by design, see
    functions/web.py) so the oracle replays the engine bit-for-bit."""
    from entropy_balance_weighting_spark.functions import web

    for pat, rep in web._STRIP_CHAIN:
        rep_sql = "e'\\n'" if rep == "\n" else f"'{rep}'"
        expr = f"regexp_replace({expr}, '{pat}', {rep_sql}, 'g')"
    expr = web.sql_decode_charrefs(expr)
    for ent, ch in web._ENTITIES:
        ch_sql = ch.replace("'", "''")
        expr = f"replace({expr}, '{ent}', '{ch_sql}')"
    for pat, rep in web._WS_CHAIN:
        rep_sql = "e'\\n'" if rep == "\n" else f"'{rep}'"
        expr = f"regexp_replace({expr}, '{pat}', {rep_sql}, 'g')"
    return expr


_HTML_SYNTH_SQL = (
    "'<html><head><title>Doc ' || doc_id || ' &amp; notes</title>"
    "<style>p {color:red}</style></head>"
    "<body><script>var x = \"<p>not text</p>\";</script>"
    "<h1>' || source || '</h1><p>' || text || '</p>"
    # numeric character references: decimal (π), hex (emoji, astral
    # plane), double-escaped (&amp;#960; must stay literal '&#960;'),
    # and an out-of-range ref that must stay literal
    "<p>pi &#960; grin &#x1F600; amp-esc &amp;#960; bad &#1114112;</p>"
    "<div>footer&nbsp;' || doc_id || '</div>"
    "<a href=\"https://ex.example/d' || doc_id || '\">more ' || doc_id "
    "|| '</a></body></html>'"
)

_TITLE_SQL = (
    "trim(regexp_replace("
    + "replace(regexp_extract("
    + _HTML_SYNTH_SQL
    + ", '(?is)<title[^>]*>(.*?)</title>', 1), '&amp;', '&')"
    + ", '\\s+', ' ', 'g'))"
)


@register(
    "txt_html_extract",
    survey="ext:web-extraction",
    oracle=f"""
WITH ex AS (
  SELECT doc_id, source,
         {_sql_strip_html(_HTML_SYNTH_SQL)} AS txt,
         {_TITLE_SQL} AS title,
         len(regexp_extract_all({_HTML_SYNTH_SQL},
             '(?is)<a\\s[^>]*href="([^"]*)"', 1)) AS n_links
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_links) AS BIGINT) AS total_links,
       CAST(sum(length(txt)) AS BIGINT) AS total_text_chars,
       CAST(sum(length(title)) AS BIGINT) AS total_title_chars,
       CAST(sum(CASE WHEN title LIKE '% & %' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_amp_titles
FROM ex GROUP BY source ORDER BY source
""",
)
def txt_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → text extraction (the first stage of a crawl-corpus
    pipeline) as pure JVM column expressions — no UDF anywhere
    (:mod:`functions.web`): each document is wrapped in a synthetic
    HTML shell (head/title/style/script/anchors — all the parts an
    extractor must DROP or DECODE), then :func:`web.strip_html` /
    :func:`web.html_title` / :func:`web.extract_links` recover the
    visible text, title, and link targets; the oracle replays the
    identical RE2-safe regex chain in SQL.  A wrong strip order, a
    greedy quantifier, or a missed entity shifts the per-source char
    totals and fails the hash.  100 TB shape: one linear scan per
    document, whole-stage codegen, no shuffle before the final
    aggregate."""
    from entropy_balance_weighting_spark.functions import web

    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><head><title>Doc "), did,
        F.lit(" &amp; notes</title><style>p {color:red}</style></head>"
              '<body><script>var x = "<p>not text</p>";</script><h1>'),
        F.col("source"),
        F.lit("</h1><p>"), F.col("text"),
        F.lit("</p><p>pi &#960; grin &#x1F600; amp-esc &amp;#960;"
              " bad &#1114112;</p><div>footer&nbsp;"), did,
        F.lit('</div><a href="https://ex.example/d'), did,
        F.lit('">more '), did, F.lit("</a></body></html>"),
    )
    ex = docs.select(
        "source",
        web.strip_html(html).alias("txt"),
        web.html_title(html).alias("title"),
        F.size(web.extract_links(html)).alias("n_links"),
    )
    return (
        ex.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_links").cast("long").alias("total_links"),
            F.sum(F.length("txt")).cast("long").alias("total_text_chars"),
            F.sum(F.length("title")).cast("long").alias("total_title_chars"),
            F.sum(
                F.when(F.col("title").like("% & %"), 1).otherwise(0)
            ).cast("long").alias("n_amp_titles"),
        )
        .orderBy("source")
    )


@register(
    "txt_subtitle_extract",
    survey="ext:subtitle-extraction",
    oracle="""
WITH ex AS (
  SELECT doc_id, source, n_chars,
         translate(text,
                   chr(10)||chr(13)||chr(9)||chr(11)||chr(12),
                   '     ') AS clean
  FROM documents
), per AS (
  SELECT source,
         CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 0 END AS n_seq,
         3 * ((doc_id % 3600) * 1000) + 42000 AS sum_start,
         2700 + (n_chars % 100) * 6 AS span,
         length(rtrim(substr(clean, 1, 25), ' '))
           + length(rtrim(substr(clean, 26, 25), ' '))
           + length(rtrim(substr(clean, 51, 25), ' ')) AS chars
  FROM ex
)
SELECT source,
       count(*) AS n_docs,
       CAST(3 * count(*) AS BIGINT) AS n_cues,
       CAST(sum(n_seq) AS BIGINT) AS n_srt_cues,
       CAST(sum(sum_start) AS BIGINT) AS sum_start_ms,
       CAST(sum(span) AS BIGINT) AS span_ms,
       CAST(sum(chars) AS BIGINT) AS text_chars
FROM per GROUP BY source ORDER BY source
""",
)
def txt_subtitle_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtitle/caption extraction (SRT + WebVTT) as pure JVM
    expressions (:mod:`functions.subtitles`): each document becomes a
    deterministic 3-cue caption file — SRT for even doc ids, WebVTT
    (header, identifier lines, cue settings) for odd — then
    :func:`subtitles.subtitle_cues` sniffs the format and recovers
    every cue, and the per-source aggregate checks cue counts, summed
    start timestamps, on-screen span, and text chars against the SQL
    derivation from the base table.  A timestamp-arithmetic slip, a
    mis-skipped VTT identifier line, or a lost cue shifts a total and
    fails the hash.  100 TB shape: one codegen'd map per document, no
    shuffle before the final aggregate."""
    from entropy_balance_weighting_spark.functions import subtitles as sub

    docs = load_table(spark, sf_dir, "documents")
    clean = F.translate(F.col("text"), "\n\r\t\x0b\x0c", "     ")
    did = F.col("doc_id")
    base = (did % 3600) * 1000

    def seg(k: int):
        return F.substring(clean, (k - 1) * 25 + 1, 25)

    def times(k: int):
        start = base + k * 7000
        end = start + 900 + (F.col("n_chars") % 100) * k
        return start, end

    def srt_block(k: int):
        start, end = times(k)
        return F.concat(
            F.lit(f"{k}\n"),
            sub.format_srt_timestamp(start),
            F.lit(" --> "),
            sub.format_srt_timestamp(end),
            F.lit("\n"),
            seg(k),
        )

    def vtt_block(k: int):
        start, end = times(k)
        settings = " align:start position:0%" if k == 1 else ""
        return F.concat(
            F.lit(f"cue-{k}\n"),  # identifier line: not cue text
            F.translate(sub.format_srt_timestamp(start), ",", "."),
            F.lit(" --> "),
            F.translate(sub.format_srt_timestamp(end), ",", "."),
            F.lit(settings + "\n"),
            seg(k),
        )

    srt_doc = F.concat_ws("\n\n", *[srt_block(k) for k in (1, 2, 3)])
    vtt_doc = F.concat(
        F.lit("WEBVTT\n\nNOTE\nsynthetic caption fixture\n\n"),
        F.concat_ws("\n\n", *[vtt_block(k) for k in (1, 2, 3)]),
    )
    payload = F.when(did % 2 == 0, srt_doc).otherwise(vtt_doc)
    ex = docs.select(
        "source", sub.subtitle_cues(payload).alias("cues")
    ).select("source", F.explode("cues").alias("c"))
    return (
        ex.groupBy("source")
        .agg(
            (F.count(F.lit(1)) / 3).cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_cues"),
            F.sum(
                F.when(F.col("c.seq").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("n_srt_cues"),
            F.sum("c.start_ms").cast("long").alias("sum_start_ms"),
            F.sum(F.col("c.end_ms") - F.col("c.start_ms"))
            .cast("long")
            .alias("span_ms"),
            F.sum(F.length("c.text")).cast("long").alias("text_chars"),
        )
        .orderBy("source")
    )


@register(
    "txt_mime_sniff",
    survey="ext:web-mime-sniff",
    oracle="""
SELECT source,
       CASE doc_id % 8
         WHEN 0 THEN 'application/pdf'
         WHEN 1 THEN 'image/png'
         WHEN 2 THEN 'image/jpeg'
         WHEN 3 THEN 'image/gif'
         WHEN 4 THEN 'audio/wav'
         WHEN 5 THEN 'text/html'
         WHEN 6 THEN 'video/mp4'
         ELSE 'application/octet-stream'
       END AS mime,
       count(*) AS n_docs
FROM documents
GROUP BY source, mime ORDER BY source, mime
""",
)
def txt_mime_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte content-type sniffing (:func:`web.sniff_mime`) — the
    triage step between WARC ingest (Content-Type headers lie or are
    absent) and the typed decode pipelines.  Each document becomes a
    payload whose real type is fixed by ``doc_id % 8`` (seven magic
    prefixes + one unmarked byte stream); the sniff must recover every
    type from prefix bytes alone, first-match ``when`` chain, no UDF.
    The oracle derives the expected type from the id arithmetic — any
    magic-table slip or when-chain ordering bug shifts a count and
    fails the hash."""
    from entropy_balance_weighting_spark.functions.web import sniff_mime

    docs = load_table(spark, sf_dir, "documents")
    body = F.encode(F.col("text"), "UTF-8")
    magics = [
        F.lit(b"%PDF-1.7\n"),
        F.lit(b"\x89PNG\r\n\x1a\n"),
        F.lit(b"\xff\xd8\xff\xe0"),
        F.lit(b"GIF89a"),
        F.lit(b"RIFF0000WAVE"),
        F.encode(F.lit("<!DOCTYPE html><body>"), "UTF-8"),
        F.lit(b"\x00\x00\x00\x18ftypisom"),
        F.lit(b"\x00"),  # unmarked: must fall through to octet-stream
    ]
    sel = F.col("doc_id") % 8
    prefix = F.when(sel == 0, magics[0])
    for i in range(1, 7):
        prefix = prefix.when(sel == i, magics[i])
    prefix = prefix.otherwise(magics[7])
    payload = F.concat(prefix, body)
    return (
        docs.select("source", sniff_mime(payload).alias("mime"))
        .groupBy("source", "mime")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source", "mime")
    )


from entropy_balance_weighting_spark.functions.markdown import (
    sql_strip_chain as _md_sql_chain,
)

# synthetic Markdown shell (SQL form); the Spark side builds the same
# string with F.concat — every construct the strip chain must handle
_MD_SYNTH_SQL = (
    "'# Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) || "
    "'**' || source || '** intro with a [link here](http://ex.com/' || "
    "CAST(doc_id AS VARCHAR) || ') and ![an image](img.png).' || "
    "chr(10) || chr(10) || '- first ' || substr(text, 1, 30) || chr(10) || "
    "'- second item' || chr(10) || chr(10) || '> quote ' || "
    "substr(text, 31, 30) || chr(10) || chr(10) || '`code span` end'"
)

# oracle rendered at import time from the SAME chain the Spark side
# runs (sql_strip_chain translates only the replacement dialect) — one
# source of truth, no hand-copied regex text to drift
_MD_ORACLE = f"""
WITH m AS (
  SELECT doc_id, source, {_MD_SYNTH_SQL} AS md
  FROM documents
), ex AS (
  SELECT source,
         {_md_sql_chain("m.md")} AS txt,
         len(regexp_extract_all(m.md,
             '\\[[^\\]]*\\]\\([^)]*\\)')) AS n_all,
         len(regexp_extract_all(m.md,
             '!\\[[^\\]]*\\]\\([^)]*\\)')) AS n_img
  FROM m
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(length(txt)) AS BIGINT) AS text_chars,
       CAST(sum(n_all - n_img) AS BIGINT) AS total_links,
       CAST(sum(n_img) AS BIGINT) AS total_images
FROM ex GROUP BY source ORDER BY source
"""


@register(
    "txt_markdown_extract",
    survey="ext:markdown-extraction",
    oracle=_MD_ORACLE,
)
def txt_markdown_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markdown -> text extraction (:mod:`functions.markdown`) as pure
    JVM regexp chains: each document is wrapped in a synthetic Markdown
    shell (header, bold, link, image, list, blockquote, code span --
    every construct the strip chain must handle), then
    :func:`markdown.strip_markdown` recovers the visible text and
    :func:`markdown.md_stats`-style counts recover link/image totals;
    the oracle replays the IDENTICAL RE2-safe chain in SQL (rendered by
    :func:`markdown.sql_strip_chain` -- replacement-dialect translation
    only), so a pattern slip on either side fails the hash.  100 TB
    shape: one linear codegen scan per document, no shuffle before the
    final aggregate."""
    from entropy_balance_weighting_spark.functions import markdown as mdf

    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    mdoc = F.concat(
        F.lit("# Doc "), did, F.lit("\n\n**"),
        F.col("source"),
        F.lit("** intro with a [link here](http://ex.com/"), did,
        F.lit(") and ![an image](img.png).\n\n- first "),
        F.substring("text", 1, 30),
        F.lit("\n- second item\n\n> quote "),
        F.substring("text", 31, 30),
        F.lit("\n\n`code span` end"),
    )
    n_all = F.regexp_count(mdoc, F.lit(r"\[[^\]]*\]\([^)]*\)"))
    n_img = F.regexp_count(mdoc, F.lit(r"!\[[^\]]*\]\([^)]*\)"))
    ex = docs.select(
        "source",
        mdf.strip_markdown(mdoc).alias("txt"),
        (n_all - n_img).alias("n_links"),
        n_img.alias("n_images"),
    )
    return (
        ex.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("txt")).cast("long").alias("text_chars"),
            F.sum("n_links").cast("long").alias("total_links"),
            F.sum("n_images").cast("long").alias("total_images"),
        )
        .orderBy("source")
    )


@register(
    "txt_license_scan",
    survey="ext:license-detection",
    oracle="""
SELECT source,
       CASE doc_id % 7
         WHEN 0 THEN 'MPL-2.0'
         WHEN 1 THEN 'MIT'
         WHEN 2 THEN 'Apache-2.0'
         WHEN 3 THEN 'GPL-3.0'
         WHEN 4 THEN 'LGPL'
         WHEN 5 THEN 'CC-BY'
         ELSE 'unknown'
       END AS license,
       count(*) AS n_docs
FROM documents
GROUP BY source, license ORDER BY source, license
""",
)
def txt_license_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """License identification (:func:`text.detect_license`) — the
    compliance gate a code/document corpus runs first.  Each document
    gets a license header fixed by ``doc_id % 7`` (an SPDX tag, five
    canonical phrases, one unlicensed); the detector must recover every
    one (SPDX verbatim first, then the phrase chain with LGPL before
    the generic GPL).  The oracle derives the expected license from the
    id arithmetic — a phrase-pattern slip or a when-chain ordering bug
    shifts a count and fails the hash."""
    from entropy_balance_weighting_spark.functions.text import (
        detect_license,
    )

    docs = load_table(spark, sf_dir, "documents")
    heads = [
        "SPDX-License-Identifier: MPL-2.0\n",
        "Permission is hereby granted, free of charge, to any person. ",
        "Licensed under the Apache License, Version 2.0 (the License). ",
        "Under the GNU General Public License, either version 3 of it. ",
        "Under the GNU Lesser General Public License v2.1 terms. ",
        "Licensed under a Creative Commons Attribution 4.0 License. ",
        "",
    ]
    sel = F.col("doc_id") % 7
    prefix = F.when(sel == 0, heads[0])
    for i in range(1, 6):
        prefix = prefix.when(sel == i, heads[i])
    prefix = prefix.otherwise(heads[6])
    payload = F.concat(prefix, F.col("text"))
    return (
        docs.select("source", detect_license(payload).alias("license"))
        .groupBy("source", "license")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source", "license")
    )


@register(
    "txt_robots_filter",
    survey="ext:web-robots",
    oracle="""
SELECT source,
       CAST(sum(CASE WHEN doc_id % 4 <> 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_allowed,
       CAST(sum(CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_denied
FROM documents GROUP BY source ORDER BY source
""",
)
def txt_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt crawl-politeness filtering (:func:`web.robots_rules` /
    :func:`web.robots_allows`, RFC 9309): each document carries a URL
    path whose allowed-ness under a fixture robots file is fixed by
    ``doc_id % 4`` (public path, disallowed prefix, the Allow override
    inside it, root), and the expression-level fold + longest-match
    evaluation must reproduce exactly the id arithmetic the oracle
    computes.  Production shape note: rules are parsed once per
    distinct host (groupBy host → parse → broadcast join back), not
    per row; the per-row parse here exists so the oracle sees one
    self-contained expression."""
    from entropy_balance_weighting_spark.functions import web

    docs = load_table(spark, sf_dir, "documents")
    robots = F.lit(
        "User-agent: crawler\n"
        "Disallow: /private/\n"
        "Allow: /private/ok\n\n"
        "User-agent: *\n"
        "Disallow: /\n"
    )
    pid = F.col("doc_id").cast("string")
    sel = F.col("doc_id") % 4
    path = (
        F.when(sel == 0, F.concat(F.lit("/public/"), pid))
        .when(sel == 1, F.concat(F.lit("/private/"), pid))
        .when(sel == 2, F.concat(F.lit("/private/ok"), pid))
        .otherwise(F.lit("/"))
    )
    allowed = web.robots_allows(web.robots_rules(robots, "crawler"), path)
    return (
        docs.select("source", allowed.alias("ok"))
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("ok"), 1).otherwise(0))
            .cast("long")
            .alias("n_allowed"),
            F.sum(F.when(F.col("ok"), 0).otherwise(1))
            .cast("long")
            .alias("n_denied"),
        )
        .orderBy("source")
    )


_GOPHER_SW_SQL = "['the','a','of','and','to','in','is','it']"

_GOPHER_ORACLE = f"""
WITH ex AS (
  SELECT source,
         string_split_regex(trim(text), '\\s+') AS tk,
         string_split(text, chr(10)) AS lines,
         text
  FROM documents
), m AS (
  SELECT source,
         len(tk) AS n,
         list_sum(list_transform(tk, t -> length(t)))
           / greatest(len(tk), 1) AS mean_wl,
         (length(text) - length(replace(text, '#', ''))
          + len(regexp_extract_all(text, '\\.\\.\\.|…')))
           / greatest(CAST(len(tk) AS DOUBLE), 1) AS sym_ratio,
         len(list_filter(lines,
             l -> regexp_matches(ltrim(l), '^([-*•]|\\d+\\.)')))
           / greatest(CAST(len(lines) AS DOUBLE), 1) AS bullet_frac,
         len(list_filter(lines,
             l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$')))
           / greatest(CAST(len(lines) AS DOUBLE), 1) AS ellipsis_frac,
         len(list_filter(tk, t -> regexp_matches(t, '[A-Za-z]')))
           / greatest(CAST(len(tk) AS DOUBLE), 1) AS alpha_frac,
         len(list_distinct(list_filter(tk,
             t -> list_contains({_GOPHER_SW_SQL}, t)))) AS stop_hits
  FROM ex
), f AS (
  SELECT source,
         CASE WHEN n BETWEEN 30 AND 100000 THEN 1 ELSE 0 END AS g_word_count,
         CASE WHEN mean_wl BETWEEN 3.0 AND 10.0 THEN 1 ELSE 0 END
             AS g_mean_word_len,
         CASE WHEN sym_ratio <= 0.1 THEN 1 ELSE 0 END AS g_symbol_ratio,
         CASE WHEN bullet_frac <= 0.9 THEN 1 ELSE 0 END AS g_bullet_lines,
         CASE WHEN ellipsis_frac <= 0.3 THEN 1 ELSE 0 END
             AS g_ellipsis_lines,
         CASE WHEN alpha_frac >= 0.8 THEN 1 ELSE 0 END AS g_alpha_words,
         CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS g_stopwords
  FROM m
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(g_word_count) AS BIGINT) AS n_word_count,
       CAST(sum(g_mean_word_len) AS BIGINT) AS n_mean_word_len,
       CAST(sum(g_symbol_ratio) AS BIGINT) AS n_symbol_ratio,
       CAST(sum(g_bullet_lines) AS BIGINT) AS n_bullet_lines,
       CAST(sum(g_ellipsis_lines) AS BIGINT) AS n_ellipsis_lines,
       CAST(sum(g_alpha_words) AS BIGINT) AS n_alpha_words,
       CAST(sum(g_stopwords) AS BIGINT) AS n_stopwords,
       CAST(sum(g_word_count * g_mean_word_len * g_symbol_ratio
                * g_bullet_lines * g_ellipsis_lines * g_alpha_words
                * g_stopwords) AS BIGINT) AS n_pass
FROM f GROUP BY source ORDER BY source
"""


@register(
    "txt_gopher_flags",
    survey="ext:quality-gopher",
    oracle=_GOPHER_ORACLE,
)
def txt_gopher_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher document-quality rule bundle (Rae et al. 2021
    Appendix A) — per-rule pass counts per source
    (:func:`text.gopher_quality_flags`: word count, mean word length,
    symbol ratio, bullet/ellipsis line fractions, alphabetic-word
    fraction, stopword hits — ONE codegen'd scan, one token split,
    conditional counts, no UDF).  The oracle replays every rule in
    SQL over the same token/line splits; a threshold slip or a
    mis-counted conditional shifts a per-rule total and fails the
    hash."""
    from entropy_balance_weighting_spark.functions.text import (
        gopher_quality_flags,
    )

    docs = load_table(spark, sf_dir, "documents")
    flagged = gopher_quality_flags(docs, min_words=30)
    rules = [
        "g_word_count", "g_mean_word_len", "g_symbol_ratio",
        "g_bullet_lines", "g_ellipsis_lines", "g_alpha_words",
        "g_stopwords",
    ]
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for r in rules:
        aggs.append(
            F.sum(F.when(F.col(r), 1).otherwise(0))
            .cast("long")
            .alias("n" + r[1:])
        )
    aggs.append(
        F.sum(F.when(F.col("gopher_pass"), 1).otherwise(0))
        .cast("long")
        .alias("n_pass")
    )
    return flagged.groupBy("source").agg(*aggs).orderBy("source")


_C4_SYNTH_SQL = """
'Alpha one two three four.'
|| CASE WHEN doc_id % 3 <> 0
        THEN ' Beta five six seven eight! Gamma nine ten eleven twelve?'
        ELSE '' END
|| chr(10)
|| CASE WHEN doc_id % 5 = 0
        THEN 'delta bad line no punct words'
        ELSE 'epsilon good line ends here.' END
|| CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'see Lorem Ipsum text.'
        ELSE '' END
|| CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'x{y.' ELSE '' END
"""

_C4_ORACLE = f"""
WITH p AS (
  SELECT source, ({_C4_SYNTH_SQL}) AS t FROM documents
), f AS (
  SELECT source,
         CASE WHEN len(regexp_extract_all(t, '[^.!?]+[.!?]')) >= 3
              THEN 1 ELSE 0 END AS c4_sentences,
         CASE WHEN len(list_filter(string_split(t, chr(10)),
                  l -> len(string_split_regex(trim(l), '\\s+')) >= 5
                       AND NOT regexp_matches(rtrim(l), '[.!?"'']$')
              )) = 0 THEN 1 ELSE 0 END AS c4_terminal_lines,
         CASE WHEN NOT (contains(lower(t), 'lorem ipsum')
                        OR contains(lower(t), 'terms of use')
                        OR contains(lower(t), 'privacy policy')
                        OR contains(lower(t), 'cookie policy'))
              THEN 1 ELSE 0 END AS c4_no_blocked,
         CASE WHEN NOT contains(t, '{{') THEN 1 ELSE 0 END AS c4_no_brace
  FROM p
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(c4_sentences) AS BIGINT) AS n_sentences,
       CAST(sum(c4_terminal_lines) AS BIGINT) AS n_terminal_lines,
       CAST(sum(c4_no_blocked) AS BIGINT) AS n_no_blocked,
       CAST(sum(c4_no_brace) AS BIGINT) AS n_no_brace,
       CAST(sum(c4_sentences * c4_terminal_lines * c4_no_blocked
                * c4_no_brace) AS BIGINT) AS n_pass
FROM f GROUP BY source ORDER BY source
"""


@register(
    "txt_c4_flags",
    survey="ext:quality-c4",
    oracle=_C4_ORACLE,
)
def txt_c4_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 cleaning heuristics (Raffel et al. 2020 §2.2,
    :func:`text.c4_quality_flags`) — the structural filter bundle next
    to Gopher's statistical one.  Each document gets a deterministic
    fixture exercising every rule independently (sentence count by
    ``id%3``, a non-terminal ≥5-word line by ``id%5``, a blocked
    boilerplate phrase by ``id%7``, a brace by ``id%11``); the oracle
    REPLAYS each rule in SQL over the same synthesized payload (same
    RE2-safe patterns), so a pattern or threshold slip on either side
    fails the hash."""
    from entropy_balance_weighting_spark.functions.text import (
        c4_quality_flags,
    )

    docs = load_table(spark, sf_dir, "documents")
    payload = F.concat(
        F.lit("Alpha one two three four."),
        F.when(
            F.col("doc_id") % 3 != 0,
            F.lit(" Beta five six seven eight! Gamma nine ten eleven twelve?"),
        ).otherwise(F.lit("")),
        F.lit("\n"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit("delta bad line no punct words"),
        ).otherwise(F.lit("epsilon good line ends here.")),
        F.when(
            F.col("doc_id") % 7 == 0, F.lit("\nsee Lorem Ipsum text.")
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0, F.lit("\nx{y.")).otherwise(
            F.lit("")
        ),
    )
    flagged = c4_quality_flags(
        docs.select("source", payload.alias("text"))
    )
    rules = ["c4_sentences", "c4_terminal_lines", "c4_no_blocked",
             "c4_no_brace"]
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for r in rules:
        aggs.append(
            F.sum(F.when(F.col(r), 1).otherwise(0))
            .cast("long")
            .alias("n" + r[2:])
        )
    aggs.append(
        F.sum(F.when(F.col("c4_pass"), 1).otherwise(0))
        .cast("long")
        .alias("n_pass")
    )
    return flagged.groupBy("source").agg(*aggs).orderBy("source")


def _pagerank_oracle_sql(n_iters: int = 4, damping: float = 0.85) -> str:
    """DuckDB replay of :func:`web.pagerank` with the iteration loop
    UNROLLED into chained CTEs (recursive CTEs cannot reference the
    working table twice — the dangling-mass leg needs a second read),
    generated from the same (n_iters, damping) the Spark query passes —
    the shared-chain discipline, applied to an iterative operator.
    Literals are cast to DOUBLE so DuckDB's DECIMAL inference never
    enters the arithmetic."""
    d = f"CAST({damping} AS DOUBLE)"
    sql = """
WITH e AS (
  SELECT DISTINCT doc_id % 97 AS src, (doc_id * 7 + 1) % 97 AS dst
  FROM documents WHERE doc_id % 97 < 90
), nodes AS (
  SELECT src AS id FROM e UNION SELECT dst FROM e
), outdeg AS (
  SELECT src, count(*) AS deg FROM e GROUP BY src
), nn AS (SELECT count(*) AS c FROM nodes),
pr0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM nodes)"""
    for i in range(1, n_iters + 1):
        sql += f""",
inf{i} AS (
  SELECT e.dst AS id, sum(p.rank / od.deg) AS s
  FROM e JOIN pr{i - 1} p ON p.id = e.src
  JOIN outdeg od ON od.src = e.src
  GROUP BY e.dst
), dang{i} AS (
  SELECT COALESCE(sum(p.rank), CAST(0 AS DOUBLE)) AS dm FROM pr{i - 1} p
  LEFT JOIN outdeg od ON od.src = p.id WHERE od.src IS NULL
), pr{i} AS (
  SELECT n.id,
         (1 - {d}) + {d} * dang{i}.dm / nn.c
         + {d} * COALESCE(inf{i}.s, CAST(0 AS DOUBLE)) AS rank
  FROM nodes n
  LEFT JOIN inf{i} ON inf{i}.id = n.id
  CROSS JOIN dang{i} CROSS JOIN nn
)"""
    return (
        sql
        + f"""
SELECT id, round(rank, 6) AS rank FROM pr{n_iters} ORDER BY id"""
    )


@register(
    "web_pagerank",
    survey="ext:web-pagerank",
    oracle=_pagerank_oracle_sql(),
)
def web_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over a deterministic link graph derived from doc_id
    arithmetic (97 nodes; residues 90–96 never link out, so the
    dangling-mass redistribution leg is exercised), fixed 4 iterations
    (``tol=None``) so the oracle — the SAME recurrence unrolled into
    chained SQL CTEs — replays it exactly.  Per-node ranks to 6
    decimals: a slip in damping, dangling handling, out-degree
    weighting, or iteration count shifts a rank and fails the hash.
    100 TB shape (:func:`web.pagerank`): per iteration one stable-key
    join + one groupBy plus a scalar dangling agg; rank vector never
    collects to the driver."""
    from entropy_balance_weighting_spark.functions import web

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    edges = docs.select(
        (did % 97).alias("src"), ((did * 7 + 1) % 97).alias("dst")
    ).filter(F.col("src") < 90)
    ranks = web.pagerank(edges, n_iters=4, tol=None)
    return ranks.select(
        "id", F.round("rank", 6).alias("rank")
    ).orderBy("id")


@register(
    "txt_byte_bpe_identity",
    survey="ext:tokenizer-bpe-byte",
    oracle="""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS utf8_bytes,
       count(*) AS n_roundtrip
FROM documents GROUP BY source ORDER BY source
""",
)
def txt_byte_bpe_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level BPE plumbing under an EXACT arithmetic oracle: with
    zero merges every token is one byte stand-in, so the distributed
    encode's token count must equal each document's UTF-8 byte length
    (``octet_length`` in the oracle) — any pretokenizer character loss,
    stand-in table slip, or Arrow batching bug breaks the equality —
    and the expression-level byte detokenizer (translate → ISO-8859-1 →
    UTF-8) must round-trip every document exactly (``n_roundtrip`` =
    ``n_docs``).  The learned-merge path is pytest-proven
    (tests/test_bpe.py: fit determinism, distributed == reference,
    exact inverse); this query pins the distributed alphabet layer the
    merges sit on.  100 TB shape: one Arrow map stage + one rollup, the
    merges table is a closure constant."""
    from entropy_balance_weighting_spark.functions import bpe

    docs = load_table(spark, sf_dir, "documents")
    enc = bpe.bpe_encode(docs, [], alphabet="byte", lowercase=False)
    joined = enc.join(docs.select("doc_id", "source", "text"), "doc_id")
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("utf8_bytes"),
            F.sum(
                F.when(
                    bpe.detokenize("tokens", alphabet="byte")
                    == F.col("text"),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_roundtrip"),
        )
        .orderBy("source")
    )


@register(
    "txt_unigram_identity",
    survey="ext:tokenizer-unigram",
    oracle="""
WITH w AS (
  SELECT source,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     x -> x <> '') AS ws
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(list_sum(list_transform(ws, x -> length(x) + 1)))
            AS BIGINT) AS marked_chars,
       count(*) AS n_roundtrip
FROM w GROUP BY source ORDER BY source
""",
)
def txt_unigram_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer plumbing under an EXACT arithmetic oracle:
    a singles-only piece table (``max_piece_len=1``) makes the Viterbi
    segmentation the character sequence, so the distributed encode's
    piece count must equal Σ(word length + 1 boundary marker) per
    document — any lattice, marker, or Arrow-batching slip breaks the
    equality — and the expression-level detokenizer must recover the
    whitespace-normalized text for every document (``n_roundtrip`` =
    ``n_docs``).  The learned-piece path (hard-EM fit, pruning,
    compression) is pytest-proven (tests/test_unigram.py: Viterbi ==
    brute force, distributed == reference, fit determinism); this
    query pins the distributed layer the model sits on.  100 TB
    shape: fit collects only the capped word-frequency table; apply
    is one Arrow map stage + rollup."""
    from entropy_balance_weighting_spark.functions import unigram as ug

    docs = load_table(spark, sf_dir, "documents")
    # max_words above any sf's distinct-word count: the singles fit must
    # see EVERY character or the identity breaks on the missing ones
    model = ug.fit_unigram(
        docs, vocab_size=1_000_000, max_piece_len=1, max_words=2_000_000
    )
    enc = ug.unigram_encode(docs, model)
    joined = enc.join(docs.select("doc_id", "source", "text"), "doc_id")
    normalized = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_pieces").cast("long").alias("marked_chars"),
            F.sum(
                F.when(
                    ug.unigram_detokenize("pieces") == normalized, 1
                ).otherwise(0)
            ).cast("long").alias("n_roundtrip"),
        )
        .orderBy("source")
    )


@register(
    "txt_domain_reweight",
    survey="ext:mixing-entropy-balance (C4,A10,G1 composition)",
    oracle="""
WITH f AS (
  SELECT source,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                              x -> x <> '')) AS DOUBLE) AS n_words
  FROM documents
), tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS s FROM f
), long AS (
  SELECT 'grp=' || source || '|n_chars' AS moment_name, n_chars AS value,
         source FROM f
  UNION ALL
  SELECT 'grp=' || source || '|n_words', n_words, source FROM f
)
SELECT moment_name,
       round(sum(value) / (SELECT s FROM tot)
             * CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                    THEN 1.02 ELSE 0.98 END, 6) AS achieved_wmean,
       1 AS converged
FROM long GROUP BY moment_name, source ORDER BY moment_name
""",
)
def txt_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data DOMAIN MIXING via the entropy-balance solver — the
    engine's two halves composed: per-source document moments (mean
    chars and words per doc, ``group=source`` → block-diagonal K=40)
    are driven to a target mix (+2% for even-numbered sources, −2% for
    odd — the DoReMi-style 'reweight domains toward a target
    distribution' move, done as exact moment matching with minimum-KL
    weight change and production bounds 0.2–5×).  The oracle computes
    the TARGETS arithmetically from the raw table; a converged bounded
    elastic solve reproduces them to ~1e-9 relative, so the rounded
    achieved means hash-match — the full chain (feature prep → grouped
    MomentSpec → packing → elastic IP → weights → achieved moments)
    under one oracle.  100 TB shape: this is exactly the reference's
    production regime (bounded + grouped) applied to corpus curation;
    everything scales as the solver does (2 map-only jobs/iteration,
    Σk_b² gram tiles)."""
    from entropy_balance_weighting_spark import entropy_balance
    from entropy_balance_weighting_spark.plans import (
        MomentSpec,
        build_problem_tables,
        targets_from_problem,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.lit(1.0).alias("w"),
        F.length("text").cast("double").alias("n_chars"),
        F.size(
            F.filter(
                F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != ""
            )
        ).cast("double").alias("n_words"),
    )
    spec = MomentSpec(
        weight_col="w",
        numeric=("n_chars", "n_words"),
        group=("source",),
        row_key=("doc_id",),
    )
    pt = build_problem_tables(docs, spec)
    factor = F.when(
        F.regexp_extract(F.col("moment_name"), r"grp=src(\d+)\|", 1)
        .cast("int") % 2 == 0,
        F.lit(1.02),
    ).otherwise(F.lit(0.98))
    targets = targets_from_problem(pt).withColumn(
        "target", F.col("target") * factor
    )
    res = entropy_balance(
        mean_population_moments=targets,
        x_sample=pt,
        options={"bounds": (0.2, 5.0), "force_distributed": True},
    )
    from entropy_balance_weighting_spark.operators.weighted_moments import (
        weighted_moment_totals,
    )

    achieved = weighted_moment_totals(
        pt.x_long, res.new_weights, weight_col="new_weight"
    ).join(F.broadcast(pt.moments), "moment_id")
    sum_w0 = pt.w0.agg(F.sum("w0")).first()[0]
    return (
        achieved.select(
            "moment_name",
            F.round(F.col("total") / F.lit(sum_w0), 6).alias(
                "achieved_wmean"
            ),
            F.lit(1 if res.converged else 0).alias("converged"),
        )
        .orderBy("moment_name")
    )


@register(
    "txt_heavy_hitters",
    survey="ext:sketch-heavy-hitters",
    bench=True,  # r12: tracks the 2-scan rework round over round
    oracle="""
WITH w AS (
  SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                            x -> x <> '')) AS item
  FROM documents
), thr AS (
  SELECT greatest(1, CAST(count(*) // 500 AS BIGINT)) AS t FROM w
)
SELECT item, count(*) AS n_occurrences
FROM w GROUP BY item
HAVING count(*) >= (SELECT t FROM thr)
ORDER BY n_occurrences DESC, item
""",
)
def txt_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent corpus terms via the two-pass heavy-hitter plan
    (:func:`heavy_hitters.heavy_hitters`): Misra–Gries candidate
    sketches per partition (tokenization INSIDE the map stage — no
    exploded row shuffles in pass 1), then an exact verify pass over
    the broadcast candidate set; threshold = total words / 500
    (integer floor, identical arithmetic in the oracle — the callable
    ``min_count`` receives the corpus total that pass 1's sentinel
    rows carried, so no separate total scan runs).  Output is
    EXACT — the sketch only bounds the candidate set — so the plain
    SQL aggregate replays it; a candidate-guarantee break (a missed
    heavy item) would show as a missing row and fail the hash.
    100 TB shape: exactly TWO corpus scans (pinned by test) — pass 1
    map-only (totals ride along as sentinel rows), pass 2 shuffles
    candidate occurrences only — never a groupBy over every distinct
    term.  capacity=2048 > N/max(1,⌊N/500⌋) for EVERY N (the ratio
    peaks at 999, at N=999), so the MG superset guarantee holds
    unconditionally at this threshold."""
    from entropy_balance_weighting_spark.functions.heavy_hitters import (
        heavy_hitters,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda x: x != "",
    )
    tok_df = docs.select(toks.alias("toks"))
    out = heavy_hitters(
        tok_df,
        "toks",
        min_count=lambda n: max(1, n // 500),
        capacity=2048,
    )
    return out.select(
        "item", F.col("count").alias("n_occurrences")
    ).orderBy(F.col("n_occurrences").desc(), "item")


@register(
    "txt_quality_deciles",
    survey="ext:ranking-curriculum",
    oracle="""
WITH t AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
), per_doc AS (
  SELECT doc_id, source,
    len(toks) AS n_tok,
    len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it')))
        * 1.0 / len(toks) AS swr,
    list_sum(list_transform(toks, x -> length(x))) * 1.0 / len(toks) AS mtl
  FROM t
), scored AS (
  SELECT doc_id, source,
    round(0.4 * least(n_tok / 100.0, 1.0) + 0.3 * least(swr / 0.3, 1.0)
          + 0.3 * least(mtl / 8.0, 1.0), 6) AS q
  FROM per_doc
), ranked AS (
  SELECT source, q,
         row_number() OVER (ORDER BY q, doc_id) AS rk,
         count(*) OVER () AS n
  FROM scored
)
SELECT source, CAST((rk - 1) * 10 // n + 1 AS BIGINT) AS decile,
       count(*) AS n_docs,
       round(min(q), 6) AS min_q, round(max(q), 6) AS max_q
FROM ranked GROUP BY source, decile ORDER BY source, decile
""",
)
def txt_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-ordering deciles by quality score via DISTRIBUTED
    EXACT GLOBAL RANKING (:func:`functions.ranking.global_rank`): the
    corpus ranks under (rounded quality, doc_id) with the two-pass
    range-partition pattern — P-way parallel sort, partition-offset
    cumsum, one Arrow stage adds offsets — where the oracle's
    ``row_number() OVER (ORDER BY …)`` rendering would collapse 100 TB
    into ONE partition to sort it (fine for DuckDB's single node; the
    exact scale bug this operator exists to avoid).  Decile is integer
    arithmetic over the exact rank (``(rk−1)·10 // n + 1``), so the
    bucketing is engine-replayable with no float cut-point discipline;
    ranking keys are the ROUNDED scores (6 dp) with doc_id tiebreak.
    N comes from one parquet-footer count.  Output: per (source,
    decile) doc counts with min/max score — the curriculum
    data-ordering table a staged training run consumes."""
    from entropy_balance_weighting_spark.functions.ranking import (
        global_rank,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = text.annotate_token_stats(docs).select(
        "doc_id", "source", F.round("q", 6).alias("q")
    )
    n = docs.count()
    ranked = global_rank(scored, order_by=("q", "doc_id"))
    return (
        ranked.select(
            "source",
            "q",
            ((F.col("rank") - 1) * 10 / F.lit(n)).cast("long").alias(
                "decile0"
            ),
        )
        .select("source", "q", (F.col("decile0") + 1).alias("decile"))
        .groupBy("source", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.min("q"), 6).alias("min_q"),
            F.round(F.max("q"), 6).alias("max_q"),
        )
        .orderBy("source", "decile")
    )




def _bm25_probes(docs):
    """The 5 fixed document-prefix probes both BM25 queries retrieve
    with (first 6 tokens of documents 0-4) — one derivation so the
    from-scratch and index-path queries can never drift apart."""
    return docs.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(text.tokens(F.col("text")), 1, 6), " ").alias(
            "qtext"
        ),
    )


@register(
    "txt_bm25_topk",
    survey="ext:text-bm25-retrieval",
    bench=True,
    oracle="""
WITH q AS (
  SELECT doc_id AS query_id,
         array_to_string(string_split(text, ' ')[1:6], ' ') AS qtext
  FROM documents WHERE doc_id < 5
), toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks WHERE tok <> '' GROUP BY 1, 2
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks WHERE tok <> '' GROUP BY 1
), stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(dl) * 1.0 / count(*) FROM dl) AS avgdl
), dfreq AS (
  SELECT tok, count(*) AS df FROM tf GROUP BY tok
), qt AS (
  SELECT DISTINCT query_id, tok FROM (
    SELECT query_id, unnest(string_split(qtext, ' ')) AS tok FROM q
  ) WHERE tok <> ''
), contrib AS (
  SELECT qt.query_id, tf.doc_id,
         CAST(round((ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
              * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))))
              * 1000000.0) AS BIGINT) AS c
  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (tok)
       JOIN qt ON qt.tok = tf.tok CROSS JOIN stats
), scored AS (
  SELECT query_id, doc_id, sum(c) AS score_q FROM contrib GROUP BY 1, 2
), ranked AS (
  SELECT *, CAST(row_number() OVER
      (PARTITION BY query_id ORDER BY score_q DESC, doc_id) AS INT) AS rk
  FROM scored
)
SELECT query_id, doc_id, score_q / 1000000.0 AS score, rk
FROM ranked WHERE rk <= 5 ORDER BY query_id, rk
""",
)
def txt_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-5 retrieval (:func:`functions.text.bm25_topk` — the
    SPARSE retrieval sibling of the embedding ANN family; Robertson &
    Zaragoza 2009 with Lucene's +1 idf floor): 5 probe queries — the
    first 6 tokens of documents 0–4, the canonical
    find-the-source-of-this-snippet shape — retrieve over the full
    corpus via an inverted-index broadcast join.  Each (query, doc,
    term) contribution is QUANTIZED to round(x·10⁶) BIGINT before the
    per-doc sum, so ranking is exact integer arithmetic (float
    summation order can't flip it — same discipline as the quantized
    NB lang-ID) and the DuckDB oracle replays score and rank
    bit-for-bit.  100 TB: postings/df/dl are partial-agg shuffles on
    the term and doc keys; the query-term table broadcasts, so only
    docs sharing a query term are scored; top-k plans a partial
    WindowGroupLimit."""
    docs = load_table(spark, sf_dir, "documents")
    queries = _bm25_probes(docs)
    out = text.bm25_topk(docs, queries, k=5)
    return out.orderBy("query_id", "rk")


@register(
    "txt_bm25_index_roundtrip",
    survey="ext:text-bm25-index-sink",
    oracle="""
WITH q AS (
  SELECT doc_id AS query_id,
         array_to_string(string_split(text, ' ')[1:6], ' ') AS qtext
  FROM documents WHERE doc_id < 5
), toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks WHERE tok <> '' GROUP BY 1, 2
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks WHERE tok <> '' GROUP BY 1
), stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(dl) * 1.0 / count(*) FROM dl) AS avgdl
), dfreq AS (
  SELECT tok, count(*) AS df FROM tf GROUP BY tok
), qt AS (
  SELECT DISTINCT query_id, tok FROM (
    SELECT query_id, unnest(string_split(qtext, ' ')) AS tok FROM q
  ) WHERE tok <> ''
), contrib AS (
  SELECT qt.query_id, tf.doc_id,
         CAST(round((ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
              * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))))
              * 1000000.0) AS BIGINT) AS c
  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (tok)
       JOIN qt ON qt.tok = tf.tok CROSS JOIN stats
), scored AS (
  SELECT query_id, doc_id, sum(c) AS score_q FROM contrib GROUP BY 1, 2
), ranked AS (
  SELECT *, CAST(row_number() OVER
      (PARTITION BY query_id ORDER BY score_q DESC, doc_id) AS INT) AS rk
  FROM scored
)
SELECT query_id, doc_id, score_q / 1000000.0 AS score, rk
FROM ranked WHERE rk <= 5 ORDER BY query_id, rk
""",
)
def txt_bm25_index_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 INDEX SINK roundtrip (:func:`functions.text.build_bm25_index`
    → :func:`bm25_query_index`): the build-once/query-many layout — the
    inverted index materializes as shard-partitioned parquet postings
    (df and dl denormalized onto the posting row; probe-term shards
    computed driver-side and pushed as a PARTITION filter, so the scan
    lists only the probe terms' directories), and the SAME 5
    document-prefix probes as ``txt_bm25_topk`` retrieve through it.
    The oracle is IDENTICAL to ``txt_bm25_topk``'s from-scratch SQL
    replay — the two queries hashing equal pins sink→scan→score
    end-to-end: a posting lost by the write, a stats-float drift, or a
    shard mis-route all fail the hash."""
    import os
    import shutil

    docs = load_table(spark, sf_dir, "documents")
    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        ".scratch", "bm25_index",
    )
    shutil.rmtree(scratch, ignore_errors=True)
    text.build_bm25_index(docs, scratch)
    queries = _bm25_probes(docs)
    out = text.bm25_query_index(spark, scratch, queries, k=5)
    return out.orderBy("query_id", "rk")
