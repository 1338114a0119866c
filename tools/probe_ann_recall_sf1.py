#!/usr/bin/env python3
"""ANN recall/latency curve at sf1 (VERDICT r11 #6): the LSH / IVF /
PQ probe variants are rows-only registry entries (approximate by
design), so their SCALE evidence is this measured curve — recall@k vs
exact brute force on the sf1 fixture's embeddings (10× sf0.1, 20k
vectors, 64 dims), with per-method wall time on the standard session.

Method grid (the registered rows' machinery at the registered
defaults, plus the recall levers each exposes):
- brute force (ground truth + latency anchor)
- hyperplane LSH, bits=8, multiprobe 0/1/2
- IVF, n_cells=16, nprobe 1/2/4/8
- PQ-ADC, 8 subspaces (the registered pq_adc_topk configuration)

Prints one JSON line and a markdown table ready for BASELINE.md.
Run SOLO.  Usage: python tools/probe_ann_recall_sf1.py [--queries 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_DIR = os.path.join(REPO, ".sf1fixture")
K = 10


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cid_etl_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
        cosine_topk_lsh,
        pq_adc_topk,
    )
    from cid_etl_spark.session import get_spark
    from cid_etl_spark.sources.parquet import load_table

    spark = get_spark("probe-ann-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(SF1_DIR, "embeddings.parquet")):
        from tools.bench_sf1 import generate_sf1

        generate_sf1(spark)

    emb = load_table(spark, SF1_DIR, "embeddings")
    # Query vectors are MIDPOINTS of adjacent corpus vectors, not raw
    # corpus rows: the sf1 fixture replicates every vector 10x (the
    # dedup-adversarial design), so a corpus-row query's top-10 is its
    # own replica set — identical values land in identical
    # buckets/cells and EVERY method scores a vacuous recall 1.0
    # (measured).  A midpoint query has genuinely spread neighbors, so
    # the probe discriminates.  Deterministic: pair (2i, 2i+1).
    lo = emb.filter((F.col("vec_id") % 2 == 0) & (F.col("vec_id") < 2 * args.queries)).select(
        (F.col("vec_id") / 2).cast("long").alias("query_id"),
        F.col("embedding").alias("e0"),
    )
    hi = emb.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 2 * args.queries)).select(
        ((F.col("vec_id") - 1) / 2).cast("long").alias("query_id"),
        F.col("embedding").alias("e1"),
    )
    queries = lo.join(hi, "query_id").select(
        "query_id",
        F.zip_with("e0", "e1", lambda x, y: (x + y) / 2.0).alias("query_vec"),
    )
    n_corpus = emb.count()

    def timed_topk(label: str, df_fn) -> tuple[dict[int, set[int]], float]:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        rows = df_fn().collect()
        wall = round(time.perf_counter() - t0, 2)
        out: dict[int, set[int]] = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out, wall

    exact, wall_bf = timed_topk(
        "bruteforce", lambda: cosine_topk_bruteforce(emb, queries, k=K)
    )

    def recall(approx: dict[int, set[int]]) -> float:
        hits = sum(len(approx.get(q, set()) & ids) for q, ids in exact.items())
        return round(hits / (len(exact) * K), 4)

    results = [
        {"method": "bruteforce", "params": "-", "recall_at_10": 1.0,
         "wall_sec": wall_bf}
    ]
    for mp in (0, 1, 2):
        got, wall = timed_topk(
            f"lsh mp={mp}",
            lambda mp=mp: cosine_topk_lsh(
                emb, queries, dim=64, k=K, bits=8, multiprobe=mp
            ),
        )
        results.append(
            {"method": "lsh_bits8", "params": f"multiprobe={mp}",
             "recall_at_10": recall(got), "wall_sec": wall}
        )
    for nprobe in (1, 2, 4, 8):
        got, wall = timed_topk(
            f"ivf np={nprobe}",
            lambda np_=nprobe: cosine_topk_ivf(
                emb, queries, k=K, n_cells=16, nprobe=np_
            ),
        )
        results.append(
            {"method": "ivf_cells16", "params": f"nprobe={nprobe}",
             "recall_at_10": recall(got), "wall_sec": wall}
        )
    got, wall = timed_topk(
        "pq", lambda: pq_adc_topk(emb, queries, k=K, n_subspaces=8)
    )
    results.append(
        {"method": "pq_adc_m8", "params": "asymmetric LUT",
         "recall_at_10": recall(got), "wall_sec": wall}
    )

    print("| method | params | recall@10 | wall (s) |")
    print("|---|---|---|---|")
    for r in results:
        print(
            f"| {r['method']} | {r['params']} | {r['recall_at_10']} "
            f"| {r['wall_sec']} |"
        )
    print(json.dumps({
        "sf": 1.0, "n_corpus": n_corpus, "n_queries": len(exact), "k": K,
        "results": results,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
