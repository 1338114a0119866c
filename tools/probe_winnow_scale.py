#!/usr/bin/env python3
"""Scale probe #5: the vectorized winnowing fast path at 10x / 20x
corpus volume.

Round 5 replaced content_fingerprints' interpreted-lambda winnowing
(68 s at sf0.1) with a numpy Arrow UDF (0.57 s).  The operator is a
pure per-document map — no shuffle, no state — so the 100 TB question
is purely throughput linearity and task balance: does wall time scale
with corpus bytes, and do the Arrow batches keep the 32 tasks even?

Methodology mirrors probes #1-#4: synthesize a replicated corpus to a
throwaway parquet dir (replica text is perturbed with a suffix so the
gram stream is not byte-identical across replicas), run
content_fingerprints over it, record wall, grams/sec, and worst
max/median task ratio from the Spark REST API.

Usage: python tools/probe_winnow_scale.py [--replicas 10 20]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_sf1_capstones import (  # noqa: E402 - sibling probe helpers
    build_dup_heavy_corpus,
    completed_stages,
    stage_stats,
)

SF_BASE = "/root/testdata/sf0.1"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, nargs="+", default=[10, 20])
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cid_etl_spark.queries import spark_queries
    from cid_etl_spark.session import get_spark

    spark = get_spark("winnow-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    q = spark_queries()["content_fingerprints"]

    results = {}
    # baseline at sf0.1 itself; the warmup must FORCE the UDF (an
    # unaggregated count would be column-pruned) so Python workers and
    # Arrow serialization are warm before the timed runs
    q(spark, SF_BASE).agg(F.sum("n_winnow_fps")).first()
    for replicas in [1] + args.replicas:
        if replicas == 1:
            probe_dir = SF_BASE
        else:
            probe_dir = tempfile.mkdtemp(prefix="cid_etl_winnowprobe_")
            build_dup_heavy_corpus(spark, replicas, probe_dir)
        grams = (
            spark.read.parquet(os.path.join(probe_dir, "documents.parquet"))
            .select(
                F.sum(F.greatest(F.length(F.trim("text")) - 7, F.lit(1)))
            )
            .first()[0]
        )
        # aggregate over every output column: a bare count() lets
        # Catalyst prune the Arrow UDF projection away entirely and
        # times the parquet scan instead (observed: 20x corpus
        # "finishing" faster than 1x).  Each scale is run twice and
        # timed on the second pass — the first pass at a new scale
        # absorbs scheduler/Arrow-batch sizing warmup.
        def run():
            return (
                q(spark, probe_dir)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("n_winnow_fps").alias("fps"),
                    F.max(F.abs("fingerprint")).alias("fp_probe"),
                )
                .first()
            )

        run()
        seen = set(completed_stages(ui, app_id))
        t0 = time.perf_counter()
        n = run()["n"]
        wall = time.perf_counter() - t0
        stages = completed_stages(ui, app_id)
        skew, sid, spill = stage_stats(ui, app_id, set(stages) - seen, stages)
        results[f"{replicas}x"] = {
            "docs": n,
            "grams": grams,
            "wall_sec": round(wall, 2),
            "grams_per_sec": round(grams / wall),
            "max_over_median_task": round(skew, 1),
            "spill_bytes": spill,
        }
        print(
            f"{replicas}x: {n} docs, {grams / 1e6:.1f}M grams in {wall:.2f}s "
            f"({grams / wall / 1e6:.1f}M grams/s) "
            f"max/median_task={skew:.1f} spill={spill}"
        )
        if probe_dir != SF_BASE:
            shutil.rmtree(probe_dir, ignore_errors=True)

    print(json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
