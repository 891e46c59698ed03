"""Deduplication queries: exact, MinHash+LSH, SimHash, n-gram Jaccard,
winnowing, connected components, decontamination, incremental anti-join,
cluster representatives.

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
    "dd_exact_dedup",
    survey="ext:dedup-exact",
    bench=True,
    oracle="""
SELECT source,
       count(*) AS n_rows,
       count(DISTINCT lower(trim(text))) AS n_distinct,
       count(*) - count(DISTINCT lower(trim(text))) AS n_dup_rows
FROM documents GROUP BY source ORDER BY source
""",
)
def dd_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized text — one shuffle with
    map-side partial aggregation, never row-vs-row comparison."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_dup_stats(docs, "text", "source").orderBy("source")


# CTE chain shared by the minhash-pair and dup-cluster oracles: everything
# up to the jaccard-verified duplicate pairs.
_MINHASH_PAIR_CTES = """toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), shingles AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
  FROM toks, unnest(range(1, len(t) - 1)) AS r(i)
), hashed AS (
  SELECT doc_id, ('0x' || substr(md5(sh),1,8))::BIGINT % 2147483647 AS h
  FROM shingles
), params AS (
  SELECT i, (123456789 * i + 987654321) % 2147483647 AS a,
         (362436069 * i + 521288629) % 2147483647 AS b
  FROM unnest(range(1, 9)) AS r(i)
), mh AS (
  SELECT doc_id, p.i, min((p.a * h + p.b) % 2147483647) AS mh
  FROM hashed, params p GROUP BY doc_id, p.i
), bands AS (
  SELECT doc_id, (i-1)//2 AS band,
         string_agg(mh::VARCHAR, ',' ORDER BY i) AS sig
  FROM mh GROUP BY doc_id, (i-1)//2
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
), counts AS (
  SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id
), inter AS (
  SELECT p.id_a, p.id_b, count(*) AS n_inter
  FROM pairs p
  JOIN shingles sa ON sa.doc_id = p.id_a
  JOIN shingles sb ON sb.doc_id = p.id_b AND sb.sh = sa.sh
  GROUP BY p.id_a, p.id_b
), dups AS (
  SELECT i.id_a, i.id_b,
         round(n_inter * 1.0 / (ca.n_sh + cb.n_sh - n_inter), 4) AS jaccard
  FROM inter i
  JOIN counts ca ON ca.doc_id = i.id_a
  JOIN counts cb ON cb.doc_id = i.id_b
  WHERE n_inter * 1.0 / (ca.n_sh + cb.n_sh - n_inter) >= 0.8
)"""

_MINHASH_ORACLE = f"""
WITH {_MINHASH_PAIR_CTES}
SELECT id_a, id_b, jaccard FROM dups ORDER BY id_a, id_b
"""

_DUP_CLUSTER_ORACLE = f"""
WITH RECURSIVE {_MINHASH_PAIR_CTES}, edges AS (
  SELECT id_a AS src, id_b AS dst FROM dups
  UNION
  SELECT id_b, id_a FROM dups
), reach AS (
  SELECT src AS id, src AS lbl FROM edges
  UNION
  SELECT e.dst AS id, r.lbl FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS doc_id, min(lbl) AS cluster_id,
       CAST(CASE WHEN min(lbl) = id THEN 1 ELSE 0 END AS INT) AS is_keep
FROM reach GROUP BY id ORDER BY cluster_id, doc_id
"""


@register(
    "dd_minhash_near_dups",
    survey="ext:dedup-minhash-lsh",
    bench=True,
    oracle=_MINHASH_ORACLE,
)
def dd_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, Jaccard-verified.

    Banded signatures → (band, sig) bucket-join → candidates only → exact
    3-gram Jaccard ≥ 0.8.  Never all-pairs: candidate volume scales with
    true duplicate volume, not N².
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.verified_near_dups(docs, "doc_id", "text", threshold=0.8)
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 4).alias("jaccard")
    ).orderBy("id_a", "id_b")


@register(
    "dd_dup_clusters",
    survey="ext:dedup-clusters",
    oracle=_DUP_CLUSTER_ORACLE,
)
def dd_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS from the MinHash pair graph: alternating
    large-star/small-star components (:func:`functions.dedup.
    connected_components`, O(log²) rounds worst-case) collapse verified
    pairs into disjoint components; the min doc_id is the kept canonical
    representative (``is_keep``).  The oracle computes the same
    transitive closure with a recursive CTE over the identical pair SQL."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.verified_near_dups(docs, "doc_id", "text", threshold=0.8)
    cc = dedup.connected_components(pairs)
    return cc.select(
        F.col("id").alias("doc_id"),
        "cluster_id",
        (F.col("id") == F.col("cluster_id")).cast("int").alias("is_keep"),
    ).orderBy("cluster_id", "doc_id")


@register(
    "dd_ngram_jaccard",
    survey="ext:dedup-ngram-jaccard",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), shingles AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
  FROM toks, unnest(range(1, len(t) - 1)) AS r(i)
), counts AS (
  SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id
), inter AS (
  SELECT sa.doc_id AS id_a, sb.doc_id AS id_b, count(*) AS n_inter
  FROM shingles sa JOIN shingles sb ON sb.sh = sa.sh AND sa.doc_id < sb.doc_id
  GROUP BY sa.doc_id, sb.doc_id
)
SELECT i.id_a, i.id_b,
       round(n_inter * 1.0 / (ca.n_sh + cb.n_sh - n_inter), 4) AS jaccard
FROM inter i
JOIN counts ca ON ca.doc_id = i.id_a
JOIN counts cb ON cb.doc_id = i.id_b
WHERE n_inter * 1.0 / (ca.n_sh + cb.n_sh - n_inter) >= 0.6
ORDER BY id_a, id_b
""",
)
def dd_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 3-gram Jaccard near-dup pairs (threshold 0.6) via the
    inverted-index bucket join — candidates are pairs sharing a shingle,
    complete at any threshold; the exact counterpart to the MinHash
    pipeline for when recall must be 1 or the threshold sits below LSH's
    useful selectivity range."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.6)
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 4).alias("jaccard")
    ).orderBy("id_a", "id_b")


@register(
    "dd_decontaminate",
    bench=True,
    survey="ext:dedup-decontaminate",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), shingles AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
  FROM toks, unnest(range(1, len(t) - 1)) AS r(i)
), bench AS (
  SELECT DISTINCT sh FROM shingles WHERE doc_id < 20
)
SELECT s.doc_id, count(*) AS n_hits
FROM shingles s JOIN bench b ON b.sh = s.sh
WHERE s.doc_id >= 20
GROUP BY s.doc_id ORDER BY s.doc_id
""",
)
def dd_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (train-set hygiene): training docs
    (doc_id ≥ 20) sharing any 3-gram with the held-out 'benchmark' slice
    (doc_id < 20) are flagged with their contaminated-shingle count.
    The benchmark gram set broadcasts — the corpus is scanned once
    (:func:`functions.dedup.decontaminate`)."""
    docs = load_table(spark, sf_dir, "documents")
    hits = dedup.decontaminate(
        docs.filter(F.col("doc_id") >= 20), docs.filter(F.col("doc_id") < 20)
    )
    return hits.select(F.col("id").alias("doc_id"), "n_hits").orderBy("doc_id")


@register(
    "dd_simhash_clusters",
    survey="ext:dedup-simhash",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents
), th AS (
  SELECT doc_id, tok, ('0x'||substr(md5(tok),1,8))::BIGINT AS h,
         count(*) AS cnt
  FROM toks GROUP BY doc_id, tok
), bits AS (
  SELECT doc_id, b.i AS bit,
         sum(CASE WHEN (h >> b.i::INT) & 1 = 1 THEN cnt ELSE -cnt END) AS s
  FROM th, unnest(range(0,16)) AS b(i) GROUP BY doc_id, b.i
), sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit::INT) ELSE 0 END)
              AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
)
SELECT simhash, count(*) AS n_docs FROM sh
GROUP BY simhash HAVING count(*) > 1 ORDER BY simhash
""",
)
def dd_simhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup clusters: 16-bit token-vote signatures; documents
    sharing a signature are cluster candidates (groupBy, no pairs)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.simhash16(docs, "doc_id", "text")
    return (
        sh.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .orderBy("simhash")
    )


@register(
    "dd_simhash_near_dups",
    survey="ext:dedup-simhash",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents
), th AS (
  SELECT doc_id, tok, ('0x'||substr(md5(tok),1,8))::BIGINT AS h,
         count(*) AS cnt
  FROM toks GROUP BY doc_id, tok
), bits AS (
  SELECT doc_id, b.i AS bit,
         sum(CASE WHEN (h >> b.i::INT) & 1 = 1 THEN cnt ELSE -cnt END) AS s
  FROM th, unnest(range(0,16)) AS b(i) GROUP BY doc_id, b.i
), sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit::INT) ELSE 0 END)
              AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
ORDER BY id_a, id_b
""",
)
def dd_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within hamming radius 2 via banded buckets
    + exact bit_count verify (:func:`functions.dedup.
    simhash_near_dup_pairs`).  The oracle is the ALL-PAIRS hamming join —
    small-scale-only, but it independently re-proves the pigeonhole
    completeness of the banding (4 bands cover any radius ≤ 3)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.simhash_near_dup_pairs(
        docs, "doc_id", "text", n_bits=16, n_bands=4, max_hamming=2
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    ).orderBy("id_a", "id_b")


@register(
    "dd_embedding_near_dups",
    survey="ext:dedup-embedding-cosine",
    oracle="""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), n AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 5) AS cos
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.45
ORDER BY id_a, id_b
""",
)
def dd_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via IVF cell-pair pruning: EXACT
    output (angular-triangle-inequality completeness bound prunes cell
    pairs, exact cosine verifies within candidates) with no corpus×corpus
    theta-join in the plan.  The all-pairs form stays as the test-side
    oracle (:func:`functions.similarity.cosine_near_dup_pairs`)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.cosine_near_dup_pairs_bucketed(emb, 0.45)
    return pairs.select(
        "id_a", "id_b", F.round("cos", 5).alias("cos")
    ).orderBy("id_a", "id_b")


@register(
    "dd_winnow_near_dups",
    survey="ext:dedup-winnowing",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), th AS (
  SELECT doc_id,
         list_transform(
           toks, t -> ('0x'||substr(md5(t),1,8))::BIGINT % 2147483647
         ) AS h
  FROM t
), kg AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, greatest(len(h) - 3, 0)),
           i -> (h[i]*29791 + h[i+1]*961 + h[i+2]*31 + h[i+3]) % 2147483647
         ) AS kh
  FROM th
), w AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(kh) - 4, 0)),
           j -> least(kh[j], kh[j+1], kh[j+2], kh[j+3], kh[j+4])
         )) AS fps
  FROM kg
), ex AS (
  SELECT DISTINCT doc_id, unnest(fps) AS fp FROM w
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
FROM ex a JOIN ex b ON b.fp = a.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= 3
ORDER BY id_a, id_b
""",
)
def dd_winnow_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-overlap near-dup pairs: documents sharing ≥3 winnowing
    fingerprints — catches documents that EMBED a common passage
    (boilerplate, quoted blocks, template headers) even when the rest of
    the text is unrelated, which whole-document and MinHash-over-
    whole-doc dedup both miss.  :func:`functions.dedup.winnow_near_dup_pairs`
    — the fingerprint inverted-index self-join (same as the shingle join;
    candidate volume Σ_fp n_fp², governed by the winnowing density
    2/(window+1)); registered exact (``max_fp_df=None``), with the
    hot-fingerprint skew cap available for boilerplate-heavy corpora."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.winnow_near_dup_pairs(
        docs, "doc_id", "text", k=4, window=5, min_shared=3
    ).orderBy("id_a", "id_b")


@register(
    "dd_incremental_new_docs",
    survey="ext:dedup-incremental",
    bench=True,
    oracle="""
WITH corpus AS (
  SELECT * FROM documents WHERE doc_id < 400
), arrivals AS (
  SELECT doc_id + 10000 AS doc_id, text, source
  FROM documents WHERE doc_id < 100        -- re-crawled duplicates
  UNION ALL
  SELECT doc_id, text, source
  FROM documents WHERE doc_id >= 400       -- genuinely new
)
SELECT a.doc_id, a.source FROM arrivals a
WHERE NOT EXISTS (
  SELECT 1 FROM corpus c
  WHERE md5(lower(trim(c.text))) = md5(lower(trim(a.text))))
ORDER BY a.doc_id
""",
)
def dd_incremental_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time dedup of a NEW batch against the EXISTING corpus
    (:func:`functions.dedup.incremental_dedup`): only arrivals whose
    normalized text is unseen are admitted.  The production shape for
    continuously-arriving data — one anti-join against a maintained
    md5-key table per batch, never a corpus re-scan.  The arriving batch
    mixes RE-CRAWLED duplicates (texts of doc_id < 100 under fresh ids —
    every one must be rejected) with genuinely new docs (doc_id >= 400 —
    every one must be admitted), so a broken join direction or key
    normalization cannot silently pass."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    arrivals = (
        docs.filter(F.col("doc_id") < 100)
        .select((F.col("doc_id") + 10000).alias("doc_id"), "text", "source")
        .unionByName(
            docs.filter(F.col("doc_id") >= 400).select("doc_id", "text", "source")
        )
    )
    return (
        dedup.incremental_dedup(arrivals, corpus)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


_CLUSTER_REP_ORACLE = f"""
WITH RECURSIVE {_MINHASH_PAIR_CTES}, edges AS (
  SELECT id_a AS src, id_b AS dst FROM dups
  UNION
  SELECT id_b, id_a FROM dups
), reach AS (
  SELECT src AS id, src AS lbl FROM edges
  UNION
  SELECT e.dst AS id, r.lbl FROM reach r JOIN edges e ON e.src = r.id
), cc AS (
  SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id
), ranked AS (
  SELECT cc.id, cc.cluster_id,
         row_number() OVER (
           PARTITION BY cc.cluster_id ORDER BY d.n_chars DESC, cc.id
         ) AS rk
  FROM cc JOIN documents d ON d.doc_id = cc.id
)
SELECT id AS doc_id, cluster_id,
       CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS INT) AS is_keep
FROM ranked ORDER BY cluster_id, doc_id
"""


@register(
    "dd_cluster_keep_longest",
    survey="ext:dedup-cluster-policy",
    oracle=_CLUSTER_REP_ORACLE,
)
def dd_cluster_keep_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-based cluster representative selection
    (:func:`functions.dedup.cluster_representatives`): within each
    near-dup cluster the LONGEST member survives (ties → lowest id) —
    the production policy when clusters mix a full document with
    truncated variants, vs the min-id convention of ``dd_dup_clusters``.
    argmax is one ``max(struct(score, −id))`` aggregate (map-side
    combinable, no per-cluster window sort)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.verified_near_dups(docs, "doc_id", "text", threshold=0.8)
    cc = dedup.connected_components(pairs)
    scores = docs.select(F.col("doc_id").alias("id"), F.col("n_chars").alias("score"))
    reps = dedup.cluster_representatives(cc, scores, score_col="score")
    return reps.select(
        F.col("id").alias("doc_id"), "cluster_id", "is_keep"
    ).orderBy("cluster_id", "doc_id")




@register(
    "dd_boilerplate_lines",
    survey="ext:dedup-boilerplate-lines",
    oracle="""
WITH words AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
), lines AS (
  SELECT doc_id, source, i.i AS pos,
         array_to_string(w[i.i * 2 + 1 : i.i * 2 + 2], ' ') AS line
  FROM words,
       unnest(range(0, CAST(ceil(len(w) / 2.0) AS BIGINT))) AS i(i)
), hot AS (
  SELECT line FROM lines GROUP BY line
  HAVING count(DISTINCT doc_id) >= 15
), kept AS (
  SELECT l.* FROM lines l ANTI JOIN hot h ON l.line = h.line
), rebuilt AS (
  SELECT doc_id,
         string_agg(line, ' ' ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
), per_doc AS (
  SELECT t.doc_id, t.source, t.n_lines,
         coalesce(r.n_kept, 0) AS n_kept,
         length(coalesce(r.clean_text, '')) AS clean_chars  -- length = CHARACTERS (strlen is bytes; Spark length is chars)
  FROM (
    SELECT doc_id, source, count(*) AS n_lines FROM lines
    GROUP BY doc_id, source
  ) t LEFT JOIN rebuilt r USING (doc_id)
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_lines) AS BIGINT) AS n_lines,
       CAST(sum(n_lines - n_kept) AS BIGINT) AS n_removed,
       CAST(sum(clean_chars) AS BIGINT) AS clean_chars,
       round(sum(n_kept) / CAST(sum(n_lines) AS DOUBLE), 6) AS keep_ratio
FROM per_doc GROUP BY source ORDER BY source
""",
)
def dd_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/RefinedWeb-style line-level boilerplate removal: segment each
    document into 2-word lines (the testdata carries no literal newlines;
    the operator's ``line_words`` mode keeps the derivation a pure column
    expression), drop every line that occurs in ≥15 distinct documents
    (nav-bar/footer analogue), reassemble survivors in order, and
    aggregate the cleaning yield per source.  The oracle replicates the
    full pipeline — segmentation, distinct-doc line frequency, anti-join,
    ordered reassembly, char accounting — in pure SQL, so a wrong
    segmentation boundary, frequency threshold, or reassembly order
    shifts ``clean_chars``/``keep_ratio`` and fails the hash."""
    docs = load_table(spark, sf_dir, "documents")
    cleaned = dedup.remove_boilerplate_lines(
        docs, min_doc_count=15, line_words=2
    )
    joined = cleaned.join(
        docs.select(F.col("doc_id").alias("id"), "source"), "id"
    )
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_lines").alias("n_lines"),
            F.sum(F.col("n_lines") - F.col("n_kept")).alias("n_removed"),
            F.sum(F.length("clean_text")).alias("clean_chars"),
            F.round(
                F.sum("n_kept") / F.sum("n_lines").cast("double"), 6
            ).alias("keep_ratio"),
        )
        .orderBy("source")
    )


@register(
    "dd_substring_spans",
    survey="ext:dedup-substring-spans",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), occ AS (
  SELECT doc_id, i,
         t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
              || ' ' || t[i+4] || ' ' || t[i+5] AS g
  FROM toks, unnest(range(1, len(t) - 4)) AS r(i)
), dupg AS (
  SELECT g FROM (
    SELECT g, count(DISTINCT doc_id) AS df FROM occ GROUP BY g
  ) WHERE df >= 2
), dup AS (
  SELECT o.doc_id, o.i FROM occ o JOIN dupg USING (g)
), nd AS (
  SELECT doc_id, count(*) AS n_dup_grams FROM dup GROUP BY doc_id
), cov AS (
  SELECT doc_id, count(DISTINCT i + j) AS n_covered
  FROM dup, unnest(range(0, 6)) AS rj(j) GROUP BY doc_id
), nt AS (
  SELECT doc_id, len(t) AS n_tokens FROM toks
)
SELECT nt.doc_id, nt.n_tokens, nd.n_dup_grams, cov.n_covered,
       round(cov.n_covered * 1.0 / nt.n_tokens, 4) AS coverage
FROM nd JOIN cov USING (doc_id) JOIN nt USING (doc_id)
ORDER BY doc_id
""",
)
def dd_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-substring (span-level) dedup profile —
    the Lee et al. 2022 exact-substring signal as a relational plan
    (:func:`functions.dedup.duplicated_span_profile`): per document, the
    count of 6-token grams that recur verbatim in another document and
    the fraction of token positions those spans cover.  The suffix-array
    formulation is replaced by a position-indexed gram table + one
    hash-groupBy document-frequency pass + a k× coverage fan-out on the
    duplicated subset only."""
    docs = load_table(spark, sf_dir, "documents")
    prof = dedup.duplicated_span_profile(
        docs, id_col="doc_id", text_col="text", k=6, min_df=2
    )
    return prof.select(
        F.col("id").alias("doc_id"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "n_dup_grams",
        "n_covered",
        "coverage",
    ).orderBy("doc_id")


@register(
    "dd_semantic_dedup",
    survey="ext:dedup-semantic",
    oracle="""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), n AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
), seeds AS (
  SELECT vec_id AS cell_id, v AS c, nrm AS cn FROM n WHERE vec_id < 8
), scored AS (
  SELECT n.vec_id, n.v, n.nrm, s.cell_id,
         round(list_dot_product(n.v, s.c) / (n.nrm * s.cn), 5) AS cos
  FROM n, seeds s
), asg AS (
  SELECT vec_id, v, nrm, cell_id FROM (
    SELECT *, row_number() OVER
        (PARTITION BY vec_id ORDER BY cos DESC, cell_id) AS rk
    FROM scored
  ) WHERE rk = 1
), rem AS (
  SELECT DISTINCT a.vec_id FROM asg a JOIN asg b
    ON a.cell_id = b.cell_id AND b.vec_id < a.vec_id
   AND round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 5) >= 0.45
)
SELECT asg.cell_id, count(*) AS n_items,
       CAST(count(rem.vec_id) AS BIGINT) AS n_removed,
       CAST(count(*) - count(rem.vec_id) AS BIGINT) AS n_kept
FROM asg LEFT JOIN rem ON rem.vec_id = asg.vec_id
GROUP BY asg.cell_id ORDER BY asg.cell_id
""",
)
def dd_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster embeddings (8 deterministic
    lowest-id seed centroids — the registered closed-form mode;
    production passes :func:`functions.similarity.fit_ivf_quantizer`
    k-means centers), then within each cell remove every vector whose
    cosine to a lower-id cell-mate reaches 0.45
    (:func:`functions.similarity.semantic_dedup_assignments`).  Reports
    per-cell kept/removed counts; the dedup join is bounded by
    Σ|cell|², never N²."""
    emb = load_table(spark, sf_dir, "embeddings")
    asg = similarity.semantic_dedup_assignments(
        emb, n_cells=8, threshold=0.45
    )
    return (
        asg.groupBy("cell_id")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("removed").cast("long").alias("n_removed"),
            (F.count(F.lit(1)) - F.sum("removed"))
            .cast("long")
            .alias("n_kept"),
        )
        .orderBy("cell_id")
    )


@register(
    "dd_bloom_screen",
    survey="ext:dedup-bloom",
    bench=True,
    oracle="""
WITH newb AS (
  SELECT source, doc_id, 1 AS is_dup FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT source, doc_id, 0 AS is_dup FROM documents WHERE doc_id % 5 = 1
)
SELECT source,
       count(*) AS n_new,
       CAST(sum(is_dup) AS BIGINT) AS n_true_dup,
       CAST(0 AS BIGINT) AS n_missed,
       1 AS fp_ok
FROM newb GROUP BY source ORDER BY source
""",
)
def dd_bloom_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom corpus-membership screen — the incremental-dedup entry
    point a 100 TB user hits first (r8 verdict gap #3): the archive
    (here: the whole documents table) reduces ONCE to ≤ m_bits set-bit
    rows (:func:`functions.dedup.bloom_build`), and each new batch
    screens against that sketch via a broadcast join
    (:func:`functions.dedup.bloom_check`) — the archive itself is never
    rescanned, unlike the exact anti-join (``dd_incremental_new_docs``).

    The synthetic new batch is exact-SQL-derivable: docs with
    ``doc_id % 5 = 0`` re-submitted VERBATIM (true duplicates) plus docs
    with ``doc_id % 5 = 1`` with a novel suffix appended (guaranteed
    non-members, since the corpus' normalized texts are distinct).  The
    Bloom bit positions are Spark ``xxhash64`` — not replicable in SQL —
    so, like the sketch queries, the contract is verified IN-ENGINE and
    the oracle hash-pins the exact part: per source, ``n_missed`` (true
    duplicates the screen failed to flag) must be 0 — Bloom's
    no-false-negative guarantee — and ``fp_ok=1`` iff false positives
    stay under 5% of the batch (designed FPP here ≈ 1e-13)."""
    docs = load_table(spark, sf_dir, "documents")
    m_bits, k = 1 << 20, 5
    bits = dedup.bloom_build(docs, m_bits=m_bits, k=k)
    verbatim = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", "source", "text", F.lit(1).alias("is_dup")
    )
    perturbed = docs.filter(F.col("doc_id") % 5 == 1).select(
        "doc_id",
        "source",
        F.concat(F.col("text"), F.lit(" zq-novel-suffix")).alias("text"),
        F.lit(0).alias("is_dup"),
    )
    newb = verbatim.unionByName(perturbed)
    # carry (source, is_dup) through the screen itself — the batch is
    # consumed ONCE; the previous join-back re-derived the whole newb
    # union a third time (r13 optimization: 7 → 3 corpus subtrees in the
    # optimized plan, spikes/scan_multiplicity.py)
    joined = dedup.bloom_check(
        newb, bits, m_bits=m_bits, k=k, carry_cols=("source", "is_dup")
    ).withColumnRenamed("id", "doc_id")
    missed = F.when(
        (F.col("is_dup") == 1) & (F.col("might_exist") == 0), 1
    ).otherwise(0)
    false_pos = F.when(
        (F.col("is_dup") == 0) & (F.col("might_exist") == 1), 1
    ).otherwise(0)
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            F.sum("is_dup").cast("long").alias("n_true_dup"),
            F.sum(missed).cast("long").alias("n_missed"),
            F.sum(false_pos).alias("n_fp"),
        )
        .select(
            "source",
            "n_new",
            "n_true_dup",
            "n_missed",
            (F.col("n_fp") <= 0.05 * F.col("n_new")).cast("int").alias("fp_ok"),
        )
        .orderBy("source")
    )


@register(
    "dd_span_removal",
    survey="ext:dedup-substring-removal",
    oracle="""
WITH toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
), occ AS (
  SELECT doc_id, i,
         t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
              || ' ' || t[i+4] || ' ' || t[i+5] AS g
  FROM toks, unnest(range(1, len(t) - 4)) AS r(i)
), gs AS (
  SELECT g, min(doc_id) AS canon
  FROM (SELECT DISTINCT g, doc_id FROM occ)
  GROUP BY g HAVING count(*) >= 2
), cov AS (
  SELECT DISTINCT o.doc_id, o.i + j.j AS cp
  FROM occ o JOIN gs USING (g), unnest(range(0, 6)) AS j(j)
  WHERE o.doc_id <> gs.canon
), prot AS (
  SELECT DISTINCT o.doc_id, o.i + j.j AS cp
  FROM occ o JOIN gs USING (g), unnest(range(0, 6)) AS j(j)
  WHERE o.doc_id = gs.canon
), cut AS (
  SELECT doc_id, cp FROM cov
  ANTI JOIN prot USING (doc_id, cp)
), touched AS (
  SELECT DISTINCT doc_id FROM cut
), pos AS (
  SELECT k.doc_id, p.i AS cp, k.t[p.i] AS tok
  FROM toks k JOIN touched USING (doc_id),
       unnest(range(1, len(k.t) + 1)) AS p(i)
), kept AS (
  SELECT doc_id, cp, tok FROM pos ANTI JOIN cut USING (doc_id, cp)
), rebuilt AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY cp) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
), out_touched AS (
  SELECT k.doc_id, len(k.t) AS n_tokens,
         CAST(len(k.t) - coalesce(r.n_kept, 0) AS BIGINT)
             AS n_removed_tokens,
         coalesce(r.clean_text, '') AS clean_text
  FROM toks k JOIN touched USING (doc_id)
  LEFT JOIN rebuilt r USING (doc_id)
)
SELECT doc_id, n_tokens, n_removed_tokens, clean_text FROM out_touched
UNION ALL
SELECT k.doc_id, len(k.t) AS n_tokens, CAST(0 AS BIGINT), k.text
FROM toks k ANTI JOIN touched USING (doc_id)
ORDER BY doc_id
""",
)
def dd_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lee et al. 2022 REMOVAL action — the dedup step the span
    profile (``dd_substring_spans``) only measures: excise every
    cross-document duplicated 6-token span while keeping one canonical
    copy (lowest doc id per gram; positions the doc is itself canonical
    for are protected), one output row per input document with the
    cleaned text (:func:`functions.dedup.remove_duplicated_spans`).
    The token surgery is join-gated to documents that actually lose a
    span, so the explode shuffle is proportional to real duplication,
    not corpus size — the 100 TB shape."""
    docs = load_table(spark, sf_dir, "documents")
    out = dedup.remove_duplicated_spans(
        docs, id_col="doc_id", text_col="text", k=6, min_df=2
    )
    return out.select(
        F.col("id").alias("doc_id"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "n_removed_tokens",
        "clean_text",
    ).orderBy("doc_id")


@register(
    "dd_url_dedup",
    survey="ext:dedup-url-frontier",
    oracle="""
SELECT source,
       count(*) AS n_urls,
       count(DISTINCT 'http://' || source || '.example.com/p/' ||
             CAST(doc_id % 25 AS VARCHAR)) AS n_canonical
FROM documents GROUP BY source ORDER BY source
""",
)
def dd_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier URL dedup (:func:`functions.web.url_normalize`):
    each document carries one of three MESSY renderings of a canonical
    URL (upper-cased scheme/host with an explicit :80, a #fragment, a
    trailing slash — the variants real frontiers drown in), and exact
    dedup is a plain groupBy on the normalized column.  The oracle
    counts distinct CANONICAL urls directly from the id arithmetic, so
    any normalization miss (a variant that fails to collapse) inflates
    the Spark-side distinct count and fails the hash."""
    from entropy_balance_weighting_spark.functions.web import url_normalize

    docs = load_table(spark, sf_dir, "documents")
    pid = (F.col("doc_id") % 25).cast("string")
    sel = F.col("doc_id") % 3
    messy = (
        F.when(
            sel == 0,
            F.concat(
                F.lit("HTTP://"), F.upper("source"),
                F.lit(".EXAMPLE.COM:80/p/"), pid,
            ),
        )
        .when(
            sel == 1,
            F.concat(
                F.lit("http://"), F.col("source"),
                F.lit(".example.com/p/"), pid, F.lit("#section-2"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("http://"), F.col("source"),
                F.lit(".example.com/p/"), pid, F.lit("/"),
            )
        )
    )
    return (
        docs.select("source", url_normalize(messy).alias("canon"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("canon").alias("n_canonical"),
        )
        .orderBy("source")
    )


@register(
    "dd_fuzzy_join",
    survey="ext:fuzzy-join-linkage",
    oracle="""
WITH dtok AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split_regex(trim(lower(text)),
                                                      '\\s+'),
                       x -> x <> '')) AS toks
  FROM documents
), qtok AS (
  SELECT doc_id AS query_id, list_distinct(t[1:40]) AS qtoks FROM (
    SELECT doc_id,
           list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                       x -> x <> '') AS t
    FROM documents WHERE doc_id % 5 = 0) s
), pairs AS (
  SELECT d.doc_id, q.query_id,
         round(CAST(len(list_intersect(d.toks, q.qtoks)) AS DOUBLE)
               / (len(d.toks) + len(q.qtoks)
                  - len(list_intersect(d.toks, q.qtoks))), 6) AS jaccard
  FROM dtok d, qtok q
)
SELECT doc_id, query_id, jaccard
FROM pairs WHERE jaccard >= 0.8
ORDER BY query_id, doc_id
""",
)
def dd_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table FUZZY JOIN (record linkage): a probe table of
    truncated queries (every 5th document's first 40 words — the
    noisy-derivative-to-canonical matching shape) links back to the
    corpus by exact word-token Jaccard ≥ 0.8 via
    :func:`functions.dedup.fuzzy_join_jaccard` — RAREST-k PREFIX
    blocking (r13: each side blocks only on its ⌊(1−t)·n⌋+1
    rarest-by-left-df tokens — COMPLETE for the threshold by the
    prefix-filtering lemma, and a stopword in every document never
    generates its df_L·df_R block, the skew that killed the old
    share-any-token scheme at corpus scale) then exact verify over the
    full distinct-token sets, probe side broadcast.  The ORACLE replays the
    same arithmetic from a cross join — correct single-node, the exact
    plan shape the blocked join exists to avoid at corpus scale.
    Integer intersection/union arithmetic → one rounded division, so
    the hash is float-discipline-safe; the threshold applies to the
    ROUNDED value in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda x: x != ""
    )
    queries = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(toks, 1, 40)).alias("qtext"),
    )
    out = dedup.fuzzy_join_jaccard(
        docs,
        queries,
        left_id="doc_id",
        left_text="text",
        right_id="query_id",
        right_text="qtext",
        threshold=0.8,
    )
    return out.select("doc_id", "query_id", "jaccard").orderBy(
        "query_id", "doc_id"
    )
