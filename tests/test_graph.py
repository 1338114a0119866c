"""Unit tests for connected components (dedup clustering)."""

from __future__ import annotations

from cid_etl_spark.operators.graph import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = connected_components(df).collect()
    return {r["node"]: r["cluster_id"] for r in rows}


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    # diameter > 1 forces multiple propagation rounds
    got = _cc(spark, [(i, i + 1) for i in range(1, 9)])
    assert set(got.values()) == {1}
    assert len(got) == 9


def test_cycle_and_reversed_edges(spark):
    got = _cc(spark, [(3, 2), (2, 1), (1, 3), (7, 6)])
    assert got == {1: 1, 2: 1, 3: 1, 6: 6, 7: 6}


def test_self_loop_singleton(spark):
    got = _cc(spark, [(5, 5)])
    assert got == {5: 5}
