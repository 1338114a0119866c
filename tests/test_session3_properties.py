"""Property-based invariants for the session-3 operators, hypothesis
driving input generation (one Spark job per example batch, per the
test_properties.py strategy note)."""

from __future__ import annotations

import math
import random

from hypothesis import given, settings, strategies as st


# ---------------------------------------------------------------------------
# quality classifier: model agreement on arbitrary token bags
# ---------------------------------------------------------------------------


def _model_margin(text: str) -> int:
    import hashlib

    toks = text.strip().lower().split()
    m = 0
    for t in toks:
        h = int(hashlib.md5(t.encode()).hexdigest()[:7], 16)
        m += (h % 4096) * 2654435761 % 4097 - 2048
    return m


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(list("abcxyz0123456789ñüé ")), max_size=24
        ),
        min_size=1,
        max_size=12,
    )
)
def test_classifier_margin_matches_python_model(spark, values):
    from cid_etl_spark.operators.classifier import quality_classifier

    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.margin for r in quality_classifier(df).collect()}
    for i, v in rows:
        assert got[i] == _model_margin(v), (v, got[i], _model_margin(v))


# ---------------------------------------------------------------------------
# skyline: frontier of the frontier is itself; membership is dominance-free
# ---------------------------------------------------------------------------


@settings(max_examples=5, deadline=None)
@given(st.integers(min_value=1, max_value=500))
def test_skyline_no_member_dominated(spark, seed):
    from cid_etl_spark.operators.skyline import pareto_frontier

    rng = random.Random(seed)
    pts = [(i, rng.randint(0, 40) * 1.0, rng.randint(0, 40)) for i in range(200)]
    df = spark.createDataFrame(pts, "id long, x double, y long")
    front = [(r.id, r.x, r.y) for r in pareto_frontier(df, "x", "y").collect()]
    fset = {(x, y) for _, x, y in front}
    all_pts = [(x, y) for _, x, y in pts]
    # no frontier member strictly dominated by ANY input point
    for fx, fy in fset:
        assert not any(x > fx and y > fy for x, y in all_pts)
    # every non-member IS dominated by someone
    member_ids = {i for i, _, _ in front}
    for i, x, y in pts:
        if i not in member_ids:
            assert any(px > x and py > y for _, px, py in pts)


# ---------------------------------------------------------------------------
# KMV estimate error bound: relative error concentrates ~1/sqrt(k)
# ---------------------------------------------------------------------------


def test_kmv_estimate_within_statistical_bound(spark):
    import hashlib

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    k = 64
    n_true = 3000
    hvs = sorted(
        int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
        for u in range(n_true)
    )
    hk = hvs[k - 1]
    est = (k - 1) / (hk / float(1 << 60))
    # KMV standard error is ~ n/sqrt(k-1); allow 4 sigma
    assert abs(est - n_true) < 4 * n_true / math.sqrt(k - 1)


# ---------------------------------------------------------------------------
# hamming blocking: recall guarantee on random fingerprints
# ---------------------------------------------------------------------------


@settings(max_examples=5, deadline=None)
@given(st.integers(min_value=1, max_value=10_000))
def test_hamming_blocking_guaranteed_recall(spark, seed):
    from cid_etl_spark.operators.dedup import hamming_pairs_from_fingerprints

    rng = random.Random(seed)
    base = rng.getrandbits(60)
    fps = [(0, base)]
    # plant neighbors at hamming 1..4 and far-away noise
    for i in range(1, 5):
        fp = base
        for b in rng.sample(range(60), i):
            fp ^= 1 << b
        fps.append((i, fp))
    for i in range(5, 15):
        fps.append((i, rng.getrandbits(60)))
    df = spark.createDataFrame(fps, "id long, fp long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_pairs_from_fingerprints(
            df, "id", "fp", bits=60, max_hamming=3
        ).collect()
    }
    expect = {}
    for i, (ia, fa) in enumerate(fps):
        for ib, fb in fps[i + 1 :]:
            h = bin(fa ^ fb).count("1")
            if h <= 3:
                expect[(min(ia, ib), max(ia, ib))] = h
    assert got == expect


# ---------------------------------------------------------------------------
# BFS: distances match networkx-free hand BFS on random graphs
# ---------------------------------------------------------------------------


@settings(max_examples=4, deadline=None)
@given(st.integers(min_value=1, max_value=1000))
def test_bfs_matches_reference_bfs(spark, seed):
    from cid_etl_spark.operators.graph import bfs_distances

    rng = random.Random(seed)
    n = 30
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(50)]
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        edges = [(0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    seed_node = min(min(a, b) for a, b in edges)
    seeds = spark.createDataFrame([(seed_node,)], "node long")
    rounds = 4
    got = {r.node: r.dist for r in bfs_distances(df, seeds, rounds=rounds).collect()}
    # reference BFS bounded at `rounds` hops
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {seed_node: 0}
    frontier = [seed_node]
    for d in range(1, rounds + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in want:
                    want[v] = d
                    nxt.append(v)
        frontier = nxt
    assert got == want


# ---------------------------------------------------------------------------
# k-core: every surviving node has core_degree >= k within the core
# ---------------------------------------------------------------------------


@settings(max_examples=4, deadline=None)
@given(st.integers(min_value=1, max_value=1000))
def test_kcore_members_have_min_degree(spark, seed):
    from cid_etl_spark.operators.graph import kcore_peel

    rng = random.Random(seed)
    n = 25
    edges = list({(min(a, b), max(a, b))
                  for a, b in ((rng.randrange(n), rng.randrange(n))
                               for _ in range(70)) if a != b})
    df = spark.createDataFrame(edges or [(0, 1)], "src long, dst long")
    rows = kcore_peel(df, k=3, rounds=6).collect()
    members = {r.node for r in rows}
    for r in rows:
        assert r.core_degree >= 3
        # degree counted within the surviving subgraph only
        deg = sum(
            1
            for a, b in edges
            if (a == r.node and b in members) or (b == r.node and a in members)
        )
        assert deg == r.core_degree
