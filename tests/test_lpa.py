"""Invariant tests for deterministic synchronous label propagation."""

from __future__ import annotations


def test_lpa_two_cliques_with_bridge(spark):
    """Two 4-cliques joined by one bridge edge must resolve into two
    communities labeled by each clique's smallest node."""
    from cid_etl_spark.operators.graph import label_propagation

    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = c1 + c2 + [(3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.community for r in label_propagation(df, rounds=4).collect()}
    assert {got[n] for n in range(4)} == {0}
    assert {got[n] for n in range(10, 14)} == {10}


def test_lpa_deterministic_and_symmetric_input(spark):
    """Reversed/duplicated edges must not change the result, and two
    runs of the same lazy plan agree."""
    from cid_etl_spark.operators.graph import label_propagation

    edges = [(0, 1), (1, 2), (2, 0), (3, 4)]
    noisy = edges + [(b, a) for a, b in edges] + edges
    d1 = spark.createDataFrame(edges, "src long, dst long")
    d2 = spark.createDataFrame(noisy, "src long, dst long").repartition(5)
    r1 = sorted((r.node, r.community) for r in label_propagation(d1).collect())
    r2 = sorted((r.node, r.community) for r in label_propagation(d2).collect())
    assert r1 == r2
    r1again = sorted((r.node, r.community) for r in label_propagation(d1).collect())
    assert r1 == r1again
    # triangle 0-1-2 collapses to community 0; pair 3-4: each adopts
    # the other's label round 1 (swap), round 2 swaps back -> after an
    # even round count both end on their OWN label is wrong; verify the
    # actual fixed semantics instead: the pair oscillates, rounds=4
    # leaves 3->3? compute expected by hand below.
    got = dict(r1)
    assert got[0] == got[1] == got[2] == 0


def test_lpa_singleton_pair_oscillation_is_deterministic(spark):
    """A 2-node path oscillates under synchronous LPA; the fixed round
    count pins the phase deterministically (engine == hand simulation)."""
    from cid_etl_spark.operators.graph import label_propagation

    df = spark.createDataFrame([(7, 9)], "src long, dst long")
    # hand-simulate: l0: {7:7, 9:9}; each round node adopts neighbor's
    # previous label: r1 {7:9, 9:7}; r2 {7:7, 9:9}; r3 swap; r4 back.
    got = {r.node: r.community for r in label_propagation(df, rounds=4).collect()}
    assert got == {7: 7, 9: 9}
    got3 = {r.node: r.community for r in label_propagation(df, rounds=3).collect()}
    assert got3 == {7: 9, 9: 7}
