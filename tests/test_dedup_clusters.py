"""Connected-components dedup clustering: topology cases the registered
query (dense LSH cliques) does not exercise."""

from __future__ import annotations

from entropy_balance_weighting_spark.functions.dedup import connected_components


def _clusters(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    rows = connected_components(df).collect()
    return {r.id: r.cluster_id for r in rows}


def test_chain_graph_transitive(spark):
    # 1-2, 2-3, 3-4: transitivity must collapse the whole chain even though
    # (1,4) never appears as a pair — needs multiple propagation rounds
    got = _clusters(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_multiple_components(spark):
    got = _clusters(spark, [(10, 11), (11, 12), (20, 21), (30, 31)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30}


def test_label_flows_against_edge_direction(spark):
    # min id appears on the RIGHT of its pair: label must flow both ways
    got = _clusters(spark, [(5, 1), (5, 9)])
    assert got == {1: 1, 5: 1, 9: 1}


def test_long_chain_converges(spark):
    n = 12
    got = _clusters(spark, [(i, i + 1) for i in range(n)])
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_only_paired_nodes_appear(spark):
    got = _clusters(spark, [(3, 7)])
    assert got == {3: 3, 7: 3}
