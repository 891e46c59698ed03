"""Fitted language identification: multinomial Naive Bayes over
character n-grams — the classifier-shaped upgrade of the stopword
heuristics in :mod:`functions.text` (``langid_en_score`` /
``langid_scores``), fit FROM labeled data instead of hand-picked marker
words (r11 verdict task #5).

Shape (the capped-distributed-fit → driver-model → broadcast-apply
pattern this engine already uses for BPE/unigram/PQ):

- **Fit** is two bounded Spark jobs over the labeled corpus: (1) char
  n-gram counts per (lang, gram) → per-lang top-``k_per_lang`` grams by
  a deterministic window (count desc, gram asc) → the shared vocabulary
  V (union over langs, ≤ k·L entries); (2) counts restricted to V →
  collected (≤ |V|·L rows — model-sized, the one driver inflow).  The
  driver finishes the model arithmetically: Laplace-smoothed
  ``p(g|lang) = (c+1)/(Σc + |V|)`` and priors ``p(lang) = n_l/n``.
- **Quantized log-probs.**  Every log-probability is stored as
  ``round(ln(p)·10⁶)`` (BIGINT).  Scoring is then INTEGER arithmetic —
  a sum of quantized terms plus the quantized prior — so per-doc scores
  are exactly reproducible across engines and partition orders (float
  summation order can never flip an argmax), and a DuckDB oracle can
  replay fit + scoring bit-for-bit from the same formulas.
- **Apply** drops grams outside V symmetrically for every language
  (standard restricted-vocabulary NB), scores each remaining gram via
  the model, and argmaxes with a deterministic tie-break (score desc,
  lang asc); a document with zero in-vocabulary grams classifies as
  ``'und'``.
- **100 TB shape**: the model is a broadcast dim table ((gram, lang,
  qlogp), ≤ |V|·L rows); scoring is explode → broadcast hash join →
  partial-aggregated groupBy — no UDF, no driver loop, no full-vocab
  shuffle.  :func:`langid_predict` additionally offers the model as a
  pure JVM expression (per-lang map literals) for map-only pipelines
  where even one shuffle is unwanted.

Public algorithm: standard multinomial NB (McCallum & Nigam 1998);
char-n-gram features per Cavnar & Trenkle 1994.  Reference parity:
/root/reference has no classifier surface — §7.5 extension scope.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window, functions as F

QUANT = 1_000_000  # log-prob quantization: round(ln(p) * QUANT) as BIGINT


def char_ngrams(col: Column | str, *, n: int = 2, prefix: int = 200) -> Column:
    """Array of lower-cased character ``n``-grams over the first
    ``prefix`` characters — the standard langid feature (a prefix is
    enough signal, and it bounds the explode at corpus scale).  Pure
    expression: ``substr`` with Column offsets inside ``transform``.
    Texts shorter than ``n`` yield an empty array (guarding
    ``sequence``'s auto-negative step)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.substring(F.lower(c), 1, prefix)
    ln = F.length(t)
    return F.when(
        ln >= n,
        F.transform(
            F.sequence(F.lit(1), ln - (n - 1)),
            lambda i: t.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


@dataclass
class LangIdModel:
    """Multinomial-NB langid model: quantized log-probs over a shared
    restricted vocabulary.  ``qlogp[lang][gram]`` covers EVERY gram in
    ``vocab`` for every lang (unseen grams carry the smoothed floor),
    so apply-side lookup is total on V and OOV grams are the only
    misses."""

    n: int
    prefix: int
    langs: list[str] = field(default_factory=list)
    vocab: list[str] = field(default_factory=list)
    prior_q: dict[str, int] = field(default_factory=dict)
    qlogp: dict[str, dict[str, int]] = field(default_factory=dict)


def fit_langid(
    df: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "lang",
    n: int = 2,
    k_per_lang: int = 64,
    prefix: int = 200,
) -> LangIdModel:
    """Fit the NB model from a labeled DataFrame (see module
    docstring).  Two bounded jobs; the only driver inflows are the
    per-lang doc counts (L rows) and the vocab-restricted count table
    (≤ |V|·L rows)."""
    grams = df.select(
        F.col(label_col).alias("lang"),
        F.explode(char_ngrams(text_col, n=n, prefix=prefix)).alias("g"),
    )
    cnt = grams.groupBy("lang", "g").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), "g")
    vocab_rows = (
        cnt.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k_per_lang)
        .select("g")
        .distinct()
        .collect()
    )
    vocab = sorted(r["g"] for r in vocab_rows)
    if not vocab:
        raise ValueError(
            "cannot fit langid: corpus yields no character n-grams "
            f"(every text shorter than n={n}?)"
        )
    vc = {
        (r["lang"], r["g"]): r["c"]
        for r in cnt.filter(F.col("g").isin(vocab)).collect()
    }
    lang_docs = {
        r["lang"]: r["nd"]
        for r in df.groupBy(F.col(label_col).alias("lang"))
        .agg(F.count(F.lit(1)).alias("nd"))
        .collect()
    }
    langs = sorted(lang_docs)
    total_docs = sum(lang_docs.values())
    nv = len(vocab)

    model = LangIdModel(n=n, prefix=prefix, langs=langs, vocab=vocab)
    for lang in langs:
        denom = sum(vc.get((lang, g), 0) for g in vocab) + nv
        model.qlogp[lang] = {
            g: int(round(math.log((vc.get((lang, g), 0) + 1) / denom) * QUANT))
            for g in vocab
        }
        model.prior_q[lang] = int(
            round(math.log(lang_docs[lang] / total_docs) * QUANT)
        )
    return model


def langid_model_table(spark, model: LangIdModel) -> DataFrame:
    """The model as a broadcast-sized dim table ``(g, mlang, qlogp)`` —
    the scoring join's small side at any corpus scale."""
    rows = [
        (g, lang, model.qlogp[lang][g])
        for lang in model.langs
        for g in model.vocab
    ]
    return spark.createDataFrame(rows, "g string, mlang string, qlogp long")


def predict_langid(
    df: DataFrame,
    model: LangIdModel,
    *,
    text_col: str = "text",
    output_col: str = "pred_lang",
    id_col: str | None = None,
) -> DataFrame:
    """Relational NB scoring: explode grams → broadcast-join the model
    table → integer sum per (row, lang) + prior → deterministic argmax
    (score desc, lang asc); rows with zero in-vocab grams get
    ``'und'``.  Adds ``output_col`` to ``df``.  Pass ``id_col`` (a
    unique row key) whenever one exists — the fallback derives a
    transient ``monotonically_increasing_id`` and PERSISTS the keyed
    relation (MEMORY_AND_DISK) before it is used on both sides of the
    join-back, so the ids cannot differ between the two evaluations
    even over a nondeterministic upstream (same recompute-consistency
    class as ``functions/ranking.py``; the cache holds one copy of the
    input until the session ends — pass ``id_col`` to avoid it)."""
    from pyspark.storagelevel import StorageLevel

    spark = df.sparkSession
    if id_col is not None:
        keyed = df.withColumn("__rid", F.col(id_col))
    else:
        keyed = df.withColumn(
            "__rid", F.monotonically_increasing_id()
        ).persist(StorageLevel.MEMORY_AND_DISK)
        keyed.count()  # materialize: pin ids before either join side reads
    grams = keyed.select(
        "__rid",
        F.explode(
            char_ngrams(text_col, n=model.n, prefix=model.prefix)
        ).alias("g"),
    )
    mt = langid_model_table(spark, model)
    priors = spark.createDataFrame(
        [(l, model.prior_q[l]) for l in model.langs],
        "mlang string, prior_q long",
    )
    scores = (
        grams.join(F.broadcast(mt), "g")
        .groupBy("__rid", "mlang")
        .agg(F.sum("qlogp").alias("s"))
        .join(F.broadcast(priors), "mlang")
        .select("__rid", "mlang", (F.col("s") + F.col("prior_q")).alias("score"))
    )
    rk = Window.partitionBy("__rid").orderBy(F.col("score").desc(), "mlang")
    best = (
        scores.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select("__rid", F.col("mlang").alias(output_col))
    )
    return (
        keyed.join(best, "__rid", "left")
        .withColumn(output_col, F.coalesce(F.col(output_col), F.lit("und")))
        .drop("__rid")
    )


def langid_predict(col: Column | str, model: LangIdModel) -> Column:
    """The model as ONE pure JVM expression (per-lang gram→qlogp map
    literals + integer fold + argmax) — zero joins, zero shuffles, for
    map-only pipelines.  Identical semantics to :func:`predict_langid`
    (pinned by test); practical for the model sizes this fit produces
    (|V|·L ≤ a few thousand literals)."""
    grams = char_ngrams(col, n=model.n, prefix=model.prefix)
    # in-vocab check shares any one lang's map: all maps have V's keys
    first_map = _gram_map(model, model.langs[0])
    n_known = F.size(
        F.filter(grams, lambda g: F.element_at(first_map, g).isNotNull())
    )
    best = F.lit("und")
    best_score = F.lit(None).cast("long")
    for lang in reversed(model.langs):  # earlier langs win exact ties
        m = _gram_map(model, lang)
        score = F.aggregate(
            grams,
            F.lit(model.prior_q[lang]).cast("long"),
            lambda acc, g: acc + F.coalesce(F.element_at(m, g), F.lit(0)),
        )
        # fold runs reversed, so >= lets the EARLIER lang take exact ties
        better = best_score.isNull() | (score >= best_score)
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_score = F.when(better, score).otherwise(best_score)
    return F.when(n_known > 0, best).otherwise(F.lit("und"))


def _gram_map(model: LangIdModel, lang: str) -> Column:
    pairs: list[Column] = []
    for g in model.vocab:
        pairs.append(F.lit(g))
        pairs.append(F.lit(model.qlogp[lang][g]).cast("long"))
    return F.create_map(*pairs)


def save_langid(model: LangIdModel, path: str) -> None:
    """Persist as JSON (engine-portable, no pickle) — same
    model-artifact discipline as ``save_bpe`` / ``save_quantizer``."""
    import json

    with open(path, "w") as f:
        json.dump(
            {
                "version": 1,
                "n": model.n,
                "prefix": model.prefix,
                "langs": model.langs,
                "vocab": model.vocab,
                "prior_q": model.prior_q,
                "qlogp": model.qlogp,
            },
            f,
        )


def load_langid(path: str) -> LangIdModel:
    import json

    with open(path) as f:
        d = json.load(f)
    return LangIdModel(
        n=d["n"],
        prefix=d["prefix"],
        langs=list(d["langs"]),
        vocab=list(d["vocab"]),
        prior_q={k: int(v) for k, v in d["prior_q"].items()},
        qlogp={
            lang: {g: int(q) for g, q in gm.items()}
            for lang, gm in d["qlogp"].items()
        },
    )
