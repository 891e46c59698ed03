"""Fitted NB language ID (functions/langid_nb.py): accuracy on a
controlled multilingual fixture (vs the stopword heuristic), expression
≡ relational apply, quantized-model determinism, JSON persistence,
feature-extraction edges."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.functions import langid_nb as L
from entropy_balance_weighting_spark.functions import text as T

# Real high-frequency words per language — enough char-bigram signal for
# NB, while only SOME overlap the LANG_MARKERS stopword tables (so the
# heuristic has a fair shot but misses marker-free sentences).
_POOLS = {
    "en": "the and of to in is was that for with as his they at this have "
          "from by hot word but what some were when your said there use".split(),
    "es": "el la de que y en los del las por un para con una su al es lo "
          "como más pero sus le ya o este sí porque esta cuando".split(),
    "fr": "le de la et les des en une du que pour qui dans par sur est il "
          "au plus ne se pas ce avec son cette mais comme nous vous".split(),
    "de": "der die und in den von zu das mit sich des auf für ist im dem "
          "nicht ein eine als auch es an werden aus er hat dass sie nach".split(),
    "it": "il di che la e per una in un del sono mi si lo ma le con non "
          "ci questo hai io come qui ho ha sei cosa se della più".split(),
    "pt": "o que de não e do da em um para é com uma os no se na por mais "
          "as dos como mas foi ao ele isso das tem à seu sua ou".split(),
}


def _fixture_rows(n_per_lang=40, words_per_doc=30, seed=7):
    rng = random.Random(seed)
    rows = []
    i = 0
    for lang, pool in _POOLS.items():
        for _ in range(n_per_lang):
            rows.append((i, lang, " ".join(rng.choices(pool, k=words_per_doc))))
            i += 1
    return rows


@pytest.fixture(scope="module")
def labeled(spark):
    return spark.createDataFrame(
        _fixture_rows(), "doc_id long, lang string, text string"
    ).cache()


def test_nb_beats_heuristic_on_real_language_signal(labeled, spark):
    """Fit on even doc_ids, evaluate on odd: the fitted NB should be
    near-perfect on 6-way real-language data, and strictly better than
    the hand-tuned marker-word heuristic (the r11 verdict's ask:
    measure, don't assert)."""
    train = labeled.filter(F.col("doc_id") % 2 == 0)
    test = labeled.filter(F.col("doc_id") % 2 == 1)
    model = L.fit_langid(train, n=2, k_per_lang=64, prefix=200)

    pred = L.predict_langid(test, model)
    nb_acc = (
        pred.select((F.col("pred_lang") == F.col("lang")).cast("int").alias("ok"))
        .agg(F.avg("ok"))
        .first()[0]
    )
    heur_acc = (
        test.select(
            (T.langid_best(F.col("text")) == F.col("lang")).cast("int").alias("ok")
        )
        .agg(F.avg("ok"))
        .first()[0]
    )
    assert nb_acc >= 0.95, nb_acc
    assert nb_acc > heur_acc, (nb_acc, heur_acc)


def test_expression_apply_matches_relational(labeled):
    """langid_predict (pure JVM map-literal expression) must agree with
    predict_langid (broadcast-join relational path) row for row."""
    model = L.fit_langid(labeled, n=2, k_per_lang=32, prefix=120)
    rel = {
        r["doc_id"]: r["pred_lang"]
        for r in L.predict_langid(labeled, model).select(
            "doc_id", "pred_lang"
        ).collect()
    }
    expr = {
        r["doc_id"]: r["p"]
        for r in labeled.select(
            "doc_id", L.langid_predict(F.col("text"), model).alias("p")
        ).collect()
    }
    assert rel == expr


def test_und_for_empty_and_oov_text(labeled, spark):
    model = L.fit_langid(labeled, n=2, k_per_lang=16, prefix=100)
    df = spark.createDataFrame(
        [(0, ""), (1, "x"), (2, "000000000")],  # empty, < n, all-OOV-ish
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["pred_lang"]
        for r in L.predict_langid(df, model).collect()
    }
    assert out[0] == "und"
    assert out[1] == "und"
    # "000000000" has bigrams but none in a letters-only vocab
    if "00" not in model.vocab:
        assert out[2] == "und"


def test_char_ngrams_prefix_and_short_edges(spark):
    df = spark.createDataFrame(
        [(0, "AbCd"), (1, "x"), (2, ""), (3, None)],
        "i long, t string",
    )
    got = {
        r["i"]: r["g"]
        for r in df.select(
            "i", L.char_ngrams("t", n=2, prefix=3).alias("g")
        ).collect()
    }
    assert got[0] == ["ab", "bc"]  # lower-cased, prefix-capped at 3 chars
    assert got[1] == []
    assert got[2] == []
    assert got[3] is None or got[3] == []


def test_save_load_roundtrip(labeled, tmp_path):
    model = L.fit_langid(labeled, n=2, k_per_lang=16, prefix=100)
    p = str(tmp_path / "langid.json")
    L.save_langid(model, p)
    back = L.load_langid(p)
    assert back == model


def test_model_is_deterministic_across_partitionings(labeled):
    a = L.fit_langid(labeled.repartition(7), n=2, k_per_lang=32, prefix=120)
    b = L.fit_langid(labeled.coalesce(1), n=2, k_per_lang=32, prefix=120)
    assert a == b


def test_fit_rejects_gramless_corpus(spark):
    df = spark.createDataFrame(
        [(0, "en", "x"), (1, "de", "")], "doc_id long, lang string, text string"
    )
    with pytest.raises(ValueError, match="no character n-grams"):
        L.fit_langid(df, n=2)


def test_predict_with_explicit_id_col_matches_fallback(labeled):
    model = L.fit_langid(labeled, n=2, k_per_lang=32, prefix=120)
    a = {
        r["doc_id"]: r["pred_lang"]
        for r in L.predict_langid(labeled, model).collect()
    }
    b = {
        r["doc_id"]: r["pred_lang"]
        for r in L.predict_langid(labeled, model, id_col="doc_id").collect()
    }
    assert a == b
