"""Invariant tests for degree-oriented triangle counting."""

from __future__ import annotations

import itertools
import random


def _brute_triangles(edges):
    es = set()
    for a, b in edges:
        if a != b:
            es.add((min(a, b), max(a, b)))
    nodes = sorted({n for e in es for n in e})
    t = 0
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            t += 1
    return len(es), t


def test_triangle_count_k4(spark):
    from cid_etl_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = spark.createDataFrame(k4, "src long, dst long")
    row = triangle_count(df).collect()[0]
    assert row.n_nodes == 4
    assert row.n_edges == 6
    assert row.n_triangles == 4
    # K4: every vertex has degree 3 -> wedges = 4 * 3 = 12; gcc = 1.0
    assert row.n_wedges == 12
    assert row.clustering == 1.0


def test_triangle_count_path_has_none(spark):
    from cid_etl_spark.operators.graph import triangle_count

    path = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(path, "src long, dst long")
    row = triangle_count(df).collect()[0]
    assert row.n_triangles == 0
    assert row.clustering == 0.0


def test_triangle_count_hub_skew_matches_bruteforce(spark):
    """A hub star plus random edges: the degree orientation must give
    the exact same census as brute force, and duplicate/reversed input
    edges must not change it."""
    from cid_etl_spark.operators.graph import triangle_count

    rng = random.Random(5)
    edges = [(0, i) for i in range(1, 30)]  # hub
    edges += [(rng.randint(1, 29), rng.randint(1, 29)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    n_edges, n_tri = _brute_triangles(edges)
    # feed duplicates and reversed orientations on purpose
    noisy = edges + [(b, a) for a, b in edges[:20]] + edges[:10]
    df = spark.createDataFrame(noisy, "src long, dst long").repartition(8)
    row = triangle_count(df).collect()[0]
    assert row.n_edges == n_edges
    assert row.n_triangles == n_tri
