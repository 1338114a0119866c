#!/usr/bin/env python3
"""Scale probe #3 (round-4 VERDICT ask): the capstone dedup pipelines on
an sf1-equivalent, DUP-HEAVY document corpus.

Why this shape: the 100×-scale story for the composed pipelines
(pretraining_data_pipeline, neardup_curation_pipeline, CC clustering)
rests on plan shape plus probes #1 (8× corpus, standalone operators)
and #2 (hub-skewed graph).  This probe runs the COMPOSED capstones at
10× the sf0.1 document count (50k docs ≈ the sf1 ratio of the TPC-H
tables) with every base document replicated into a near-dup family —
each replica gets a one-token suffix, so Jaccard(base, replica) ≈ 1 and
the corpus carries ~5k clusters of size ~REPLICAS: the adversarial case
where the LSH verify join, the pair list, and the CC rounds all carry
real volume instead of the fixture's sparse dup structure.

Methodology mirrors probes #1/#2: synthesize to a throwaway parquet dir
(probe measures the pipeline, not corpus gen), run on the 16g local[32]
session, record wall-clock, worst max/median task-duration ratio over
non-trivial stages, and shuffle/memory spill bytes (Spark REST API).

Usage: python tools/probe_sf1_capstones.py [--replicas 10]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_BASE = "/root/testdata/sf0.1"


def build_dup_heavy_corpus(spark, replicas: int, out_dir: str) -> None:
    """documents.parquet at replicas× sf0.1: replica k of doc d gets
    doc_id = d + k*10_000 and text = base text + ' r<k>' (near-dup,
    not exact-dup, so the MinHash/LSH path does the work; the exact
    stage upstream of pretraining keeps all of them)."""
    from pyspark.sql import functions as F

    from cid_etl_spark.sources.parquet import load_table

    base = load_table(spark, SF_BASE, "documents")
    reps = spark.range(replicas).select(F.col("id").alias("__k"))
    corpus = (
        base.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("__k") * 10_000).alias("doc_id"),
            F.when(F.col("__k") == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" r"), F.col("__k")))
            .alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text").cast("bigint"))
    )
    corpus.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def completed_stages(ui: str, app_id: str) -> dict[int, dict]:
    return {
        s["stageId"]: s
        for s in _rest(ui, f"/api/v1/applications/{app_id}/stages?status=complete")
    }


def stage_stats(ui: str, app_id: str, stage_ids: set[int], stages: dict):
    """(worst max/median task ratio, total spill bytes) over non-trivial
    new stages.  Two noise filters: sub-2s stages are scheduler noise,
    and stages whose MEDIAN task is <250ms are eager-checkpoint /
    near-empty-partition artifacts (a 5ms median vs one 500ms task
    reads as 100× 'skew' while the absolute excess is half a second —
    a straggler only threatens scale when the median itself carries
    real work)."""
    worst, worst_sid, spill = 1.0, None, 0
    for sid in stage_ids:
        s = stages.get(sid)
        if not s:
            continue
        spill += s.get("memoryBytesSpilled", 0) + s.get("diskBytesSpilled", 0)
        if s.get("executorRunTime", 0) < 2000 or s.get("numCompleteTasks", 0) < 4:
            continue
        try:
            q = _rest(
                ui,
                f"/api/v1/applications/{app_id}/stages/{sid}/"
                f"{s['attemptId']}/taskSummary?quantiles=0.0,0.5,1.0",
            )
            lo, med, hi = q["duration"]
        except Exception:
            continue
        if med >= 250 and hi / med > worst:
            worst, worst_sid = hi / med, sid
    return worst, worst_sid, spill


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()

    from cid_etl_spark.queries import (
        dedup_clusters_documents,
        dedup_clusters_star,
        neardup_curation_pipeline,
        pretraining_data_pipeline,
    )
    from cid_etl_spark.session import get_spark

    spark = get_spark("sf1-capstone-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    probe_dir = tempfile.mkdtemp(prefix="cid_etl_sf1probe_")
    t0 = time.perf_counter()
    build_dup_heavy_corpus(spark, args.replicas, probe_dir)
    print(
        f"# corpus: {args.replicas}x sf0.1 documents "
        f"({5000 * args.replicas} docs, ~5k near-dup families) "
        f"built in {time.perf_counter() - t0:.1f}s -> {probe_dir}"
    )

    ops = {
        "pretraining_data_pipeline": pretraining_data_pipeline,
        "neardup_curation_pipeline": neardup_curation_pipeline,
        "dedup_clusters_documents": dedup_clusters_documents,
        "dedup_clusters_star": dedup_clusters_star,
    }
    results = {}
    for name, fn in ops.items():
        spark.catalog.clearCache()
        seen = set(completed_stages(ui, app_id))
        t0 = time.perf_counter()
        n = fn(spark, probe_dir).count()
        wall = time.perf_counter() - t0
        stages = completed_stages(ui, app_id)
        skew, sid, spill = stage_stats(ui, app_id, set(stages) - seen, stages)
        results[name] = {
            "wall_sec": round(wall, 2),
            "rows": n,
            "max_over_median_task": round(skew, 1),
            "worst_stage": sid,
            "spill_bytes": spill,
        }
        print(
            f"{name}: {wall:.2f}s rows={n} max/median_task={skew:.1f} "
            f"spill={spill / 1e6:.0f}MB (stage {sid})"
        )

    print(json.dumps(results))
    spark.stop()
    shutil.rmtree(probe_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
