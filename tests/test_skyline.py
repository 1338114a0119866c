"""Invariant tests for the partition-prune-merge Pareto frontier."""

from __future__ import annotations

import random


def _brute(points):
    out = []
    for i, (xi, yi) in enumerate(points):
        if not any(
            (xj > xi and yj > yi) for j, (xj, yj) in enumerate(points) if j != i
        ):
            out.append(i)
    return sorted(out)


def test_pareto_planted_ties(spark):
    from cid_etl_spark.operators.skyline import pareto_frontier

    # equal-x and equal-(x,y) rows never dominate each other
    rows = [(1, 10.0, 5), (2, 9.0, 6), (3, 8.0, 4), (4, 10.0, 7), (5, 1.0, 1),
            (6, 10.0, 7)]
    df = spark.createDataFrame(rows, "id long, x double, y long")
    got = sorted(r.id for r in pareto_frontier(df, "x", "y").collect())
    assert got == [1, 4, 6]


def test_pareto_matches_bruteforce_random(spark):
    from cid_etl_spark.operators.skyline import pareto_frontier

    rng = random.Random(7)
    pts = [(rng.randint(0, 50) * 1.0, rng.randint(0, 50)) for _ in range(400)]
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x double, y long").repartition(8)
    got = sorted(r.id for r in pareto_frontier(df, "x", "y").collect())
    assert got == _brute(pts)


def test_pareto_stable_across_actions(spark):
    """The regression the deterministic bucket fixes: repeated actions
    on the same lazy frontier plan must agree (spark_partition_id as
    the prune key did not)."""
    from cid_etl_spark.operators.skyline import pareto_frontier

    rng = random.Random(11)
    rows = [(i, rng.random(), rng.random()) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, x double, y double").repartition(16)
    fr = pareto_frontier(df, "x", "y")
    n1 = fr.count()
    ids = sorted(r.id for r in fr.collect())
    n2 = fr.count()
    assert n1 == n2 == len(ids) > 0


def test_pareto_idempotent(spark):
    from cid_etl_spark.operators.skyline import pareto_frontier

    rng = random.Random(3)
    rows = [(i, rng.randint(0, 30) * 1.0, rng.randint(0, 30)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, x double, y long")
    fr = pareto_frontier(df, "x", "y")
    again = pareto_frontier(fr, "x", "y")
    assert sorted(r.id for r in fr.collect()) == sorted(
        r.id for r in again.collect()
    )
