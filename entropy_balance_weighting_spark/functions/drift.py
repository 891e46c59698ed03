"""Distribution-drift monitoring between two snapshots of a corpus —
the check a 100 TB ingest pipeline runs before promoting a new crawl:
has the language / domain / event-type mix moved enough to matter?

Engine-portable by the repo's rounding discipline: category shares are
integer ppm (``div`` arithmetic), and the divergence terms use the same
``round``-before-aggregate convention as ``dq_column_entropy``, so a
DuckDB oracle replays them bit-for-bit.

Reference parity: /root/reference has no drift surface; this is §7.5
extension surface (training-data pipeline operations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def category_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    *,
    round_digits: int = 6,
) -> DataFrame:
    """Per-category share shift + pointwise Jensen-Shannon terms
    between snapshot A (baseline) and snapshot B (candidate).

    Returns one row per category present in EITHER snapshot:
    ``(category, n_a, n_b, share_a_ppm, share_b_ppm, delta_ppm,
    js_term)`` where ``js_term`` is the category's contribution to the
    Jensen-Shannon divergence JS(A‖B) = ½·KL(A‖M) + ½·KL(B‖M) with
    M = ½(A+B) — chosen over raw KL because a category present in only
    one snapshot (the common drift signal: a NEW language appears, an
    old domain vanishes) contributes a FINITE term instead of ∞.
    ``Σ js_term ∈ [0, ln 2]``; promote-gate on the sum, triage on the
    per-category rows sorted by |delta|.

    Plan shape at 100 TB: one partial-agg groupBy per snapshot (shuffle
    carries one row per category), a full outer join on the category
    key (vocabulary-sized), scalar totals folded as literals — no
    corpus-sized shuffle anywhere.
    """
    n_a = df_a.count()
    n_b = df_b.count()
    if n_a == 0 or n_b == 0:
        raise ValueError(
            f"category_drift: both snapshots must be non-empty "
            f"(n_a={n_a}, n_b={n_b})"
        )
    ca = df_a.groupBy(F.col(col).alias("category")).agg(
        F.count(F.lit(1)).alias("n_a")
    )
    cb = df_b.groupBy(F.col(col).alias("category")).agg(
        F.count(F.lit(1)).alias("n_b")
    )
    both = (
        ca.join(cb, "category", "full_outer")
        .fillna(0, subset=["n_a", "n_b"])
    )
    p = F.col("n_a") / F.lit(float(n_a))
    q = F.col("n_b") / F.lit(float(n_b))
    m = (p + q) / F.lit(2.0)
    # 0·ln(0/m) := 0 (the standard continuity convention)
    kl_a = F.when(F.col("n_a") > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
    kl_b = F.when(F.col("n_b") > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    return both.select(
        "category",
        "n_a",
        "n_b",
        F.expr(f"(n_a * 1000000) div {n_a}").cast("long").alias("share_a_ppm"),
        F.expr(f"(n_b * 1000000) div {n_b}").cast("long").alias("share_b_ppm"),
        (
            F.expr(f"(n_b * 1000000) div {n_b}")
            - F.expr(f"(n_a * 1000000) div {n_a}")
        ).cast("long").alias("delta_ppm"),
        F.round((kl_a + kl_b) / F.lit(2.0), round_digits).alias("js_term"),
    )
