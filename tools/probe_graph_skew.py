#!/usr/bin/env python3
"""Scale probe #2 (round-3 VERDICT ask): iterative graph operators on a
HUB-SKEWED graph — one node incident to ~30% of all edges — checking
for straggler tasks.

Why this shape: the sf-scale co-purchase fixture is near-uniform, so the
round-1/2 numbers never stressed the case that actually breaks iterative
graph jobs at 100 TB — a power-law hub whose adjacency rows all hash to
ONE reduce task.  Each operator keys its per-round shuffle by node id;
the hub's edges land in a single partition, so the probe measures
whether any round degrades from "one balanced shuffle" to "one task
does 30% of the work".

Methodology (mirrors the round-1 8×-corpus probe): synthesize the edge
list at ~10× the sf0.1 co-purchase edge count (200k base edges, ~30%
rewired onto the hub), localCheckpoint it (probe measures the operator,
not edge-gen), run each operator end-to-end on local[32], record
wall-clock plus the worst max/median task-duration ratio over the
operator's non-trivial stages (Spark REST status API).

Usage: python tools/probe_graph_skew.py [--edges 200000] [--hub-frac 0.3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_skewed_edges(spark, n_edges: int, hub_frac: float, n_nodes: int):
    """Deterministic hub-skewed edge list: node ids hash-derived, a
    *hub_frac* fraction of edges rewired so dst is node 0 (the hub)."""
    from pyspark.sql import functions as F

    e = spark.range(n_edges).select(
        F.pmod(F.xxhash64(F.col("id") * 2 + 1), F.lit(n_nodes)).alias("src"),
        F.when(
            F.pmod(F.xxhash64(F.col("id") * 7 + 3), F.lit(1000))
            < int(hub_frac * 1000),
            F.lit(0).cast("bigint"),
        )
        .otherwise(F.pmod(F.xxhash64(F.col("id") * 5 + 2), F.lit(n_nodes)))
        .alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    return e.localCheckpoint(eager=True)


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def completed_stages(ui: str, app_id: str) -> dict[int, dict]:
    out = {}
    for s in _rest(ui, f"/api/v1/applications/{app_id}/stages?status=complete"):
        out[s["stageId"]] = s
    return out


def worst_task_skew(ui: str, app_id: str, stage_ids: set[int], stages: dict) -> tuple[float, int | None]:
    """Worst max/median task duration over non-trivial new stages."""
    worst, worst_sid = 1.0, None
    for sid in stage_ids:
        s = stages.get(sid)
        if not s or s.get("executorRunTime", 0) < 2000 or s.get("numCompleteTasks", 0) < 4:
            continue  # sub-2s stages are scheduler noise, not skew signal
        try:
            q = _rest(
                ui,
                f"/api/v1/applications/{app_id}/stages/{sid}/"
                f"{s['attemptId']}/taskSummary?quantiles=0.0,0.5,1.0",
            )
            lo, med, hi = q["duration"]
        except Exception:
            continue
        if med > 0 and hi / med > worst:
            worst, worst_sid = hi / med, sid
    return worst, worst_sid


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=200_000)
    ap.add_argument("--hub-frac", type=float, default=0.3)
    ap.add_argument("--nodes", type=int, default=20_000)
    args = ap.parse_args()

    from cid_etl_spark.operators.graph import (
        bfs_distances,
        connected_components,
        kcore_peel,
        label_propagation,
        pagerank,
    )
    from cid_etl_spark.session import get_spark

    spark = get_spark("graph-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    edges = build_skewed_edges(spark, args.edges, args.hub_frac, args.nodes)
    n_edges = edges.count()
    hub_deg = edges.filter("src = 0 OR dst = 0").count()
    print(
        f"# edges={n_edges}  hub_degree={hub_deg} "
        f"({hub_deg / n_edges:.1%} of edges touch the hub)"
    )

    sources = spark.createDataFrame([(0,)], "node bigint")
    ops = {
        "pagerank_10r": lambda: pagerank(edges, iterations=10),
        "bfs_distances_4r": lambda: bfs_distances(edges, sources),
        "kcore_peel_k3": lambda: kcore_peel(edges, k=3),
        "label_propagation_4r": lambda: label_propagation(edges, rounds=4),
        "connected_components": lambda: connected_components(edges, "src", "dst"),
    }

    results = {}
    for name, fn in ops.items():
        seen = set(completed_stages(ui, app_id))
        t0 = time.perf_counter()
        n = fn().count()
        wall = time.perf_counter() - t0
        stages = completed_stages(ui, app_id)
        new_ids = set(stages) - seen
        skew, sid = worst_task_skew(ui, app_id, new_ids, stages)
        results[name] = {
            "wall_sec": round(wall, 2),
            "rows": n,
            "max_over_median_task": round(skew, 1),
            "worst_stage": sid,
        }
        print(
            f"{name}: {wall:.2f}s rows={n} max/median_task={skew:.1f}"
            f" (stage {sid})"
        )

    print(json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
