#!/usr/bin/env python3
"""ANN latency-separation probe (VERDICT r12 #5): find the corpus size
where IVF / LSH candidate-set reduction beats exact brute force in
WALL TIME, completing the r12 recall-only curve.

The sf1 embeddings fixture (20k vectors) is fixed-cost dominated —
every method's wall there is session overhead, so the r12 curve could
measure recall but not latency separation (BASELINE.md §r12 says so
honestly).  This probe generates a ~200k-vector 64-dim fixture with
CLUSTERED structure (64 well-separated centers + small per-vector
noise — the distribution IVF's coarse quantizer is built for, and the
realistic shape of embedding corpora) and sweeps corpus size
20k/50k/100k/200k at a fixed 64-query batch, recording wall + recall@10
per method:

- brute force: |Q|·N exact cosines (the baseline, linear in N)
- IVF n_cells=64, nprobe 1/4: candidate set ~ N·nprobe/n_cells
- hyperplane LSH bits=10, multiprobe 1: candidate set ~ N·(mp+1)/2^bits
  (data-independent buckets — included to show where bucket collisions
  on clustered data erode its pruning vs IVF's adaptive cells)

Everything is tools-only: no new registry query, no new test fixture.
The vectors are a pure function of (vec_id): center[c][j] = 2·sin(31c+j)
for cluster c = vec_id mod 64, noise = 0.15·sin(1.7·id + 0.63·j) —
deterministic across runs, no RNG state.

Writes .annfixture/ next to the repo root (gitignored).  Run SOLO.
Usage: python tools/probe_ann_latency.py [--queries 64] [--regen]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX_DIR = os.path.join(REPO, ".annfixture")
DIM = 64
N_CLUSTERS = 64
N_TOTAL = 200_000
SIZES = (20_000, 50_000, 100_000, 200_000)
K = 10


def generate(spark) -> None:
    from pyspark.sql import functions as F

    base = spark.range(N_TOTAL).select(F.col("id").alias("vec_id"))
    c = F.col("vec_id") % N_CLUSTERS
    comps = [
        (
            2.0 * F.sin(c * 31 + F.lit(j))
            + 0.15 * F.sin(F.col("vec_id") * 1.7 + F.lit(j * 0.63))
        ).cast("float")
        for j in range(DIM)
    ]
    df = base.select("vec_id", F.array(*comps).alias("embedding"))
    df.repartition(32).write.mode("overwrite").parquet(
        os.path.join(FIX_DIR, "vectors.parquet")
    )
    print(f"# ann fixture written to {FIX_DIR}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--regen", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cid_etl_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
        cosine_topk_lsh,
    )
    from cid_etl_spark.session import get_spark

    spark = get_spark("probe-ann-latency")
    spark.sparkContext.setLogLevel("ERROR")
    path = os.path.join(FIX_DIR, "vectors.parquet")
    if args.regen or not os.path.exists(path):
        generate(spark)
    corpus_all = spark.read.parquet(path)

    # Query vectors: midpoints of adjacent SAME-CLUSTER corpus vectors
    # (vec_id and vec_id + N_CLUSTERS share a cluster), so each query
    # has genuinely spread neighbors inside one cluster — the case
    # where IVF pruning is honest (nearest cell contains the true
    # neighbors) and recall is still non-vacuous.
    lo = corpus_all.filter(F.col("vec_id") < args.queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("e0")
    )
    hi = corpus_all.filter(
        (F.col("vec_id") >= N_CLUSTERS)
        & (F.col("vec_id") < N_CLUSTERS + args.queries)
    ).select(
        (F.col("vec_id") - N_CLUSTERS).alias("query_id"),
        F.col("embedding").alias("e1"),
    )
    queries = (
        lo.join(hi, "query_id")
        .select(
            "query_id",
            F.zip_with("e0", "e1", lambda x, y: (x + y) / 2.0).alias(
                "query_vec"
            ),
        )
        .cache()
    )
    queries.count()

    def timed(df_fn):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        rows = df_fn().collect()
        wall = round(time.perf_counter() - t0, 2)
        out: dict[int, set[int]] = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out, wall

    results = []
    for n in SIZES:
        corpus = corpus_all.filter(F.col("vec_id") < n)
        # warm the scan so the first timed method doesn't pay the
        # parquet footer/pageload cost the others skip
        corpus.write.format("noop").mode("overwrite").save()
        exact, wall_bf = timed(
            lambda: cosine_topk_bruteforce(corpus, queries, k=K)
        )

        def recall(approx: dict[int, set[int]]) -> float:
            hits = sum(
                len(approx.get(q, set()) & ids) for q, ids in exact.items()
            )
            return round(hits / (len(exact) * K), 4)

        results.append(
            {"n_corpus": n, "method": "bruteforce", "params": "-",
             "recall_at_10": 1.0, "wall_sec": wall_bf}
        )
        for nprobe in (1, 4):
            got, wall = timed(
                lambda np_=nprobe: cosine_topk_ivf(
                    corpus, queries, k=K, n_cells=N_CLUSTERS, nprobe=np_
                )
            )
            results.append(
                {"n_corpus": n, "method": "ivf_cells64",
                 "params": f"nprobe={nprobe}",
                 "recall_at_10": recall(got), "wall_sec": wall}
            )
        got, wall = timed(
            lambda: cosine_topk_lsh(
                corpus, queries, dim=DIM, k=K, bits=10, multiprobe=1
            )
        )
        results.append(
            {"n_corpus": n, "method": "lsh_bits10", "params": "multiprobe=1",
             "recall_at_10": recall(got), "wall_sec": wall}
        )
        for r in results[-4:]:
            print(f"# {r}", flush=True)

    print("| n_corpus | method | params | recall@10 | wall (s) |")
    print("|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['n_corpus']} | {r['method']} | {r['params']} "
            f"| {r['recall_at_10']} | {r['wall_sec']} |"
        )
    print(json.dumps({"k": K, "n_queries": args.queries, "results": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
