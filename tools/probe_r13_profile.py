#!/usr/bin/env python3
"""Round-13 profiling probe: per-query time breakdown.

For each named query: time plan BUILD (Python DataFrame construction,
including any eager sizing jobs), then N noop-sink runs, and pull the
per-run job/stage wall decomposition from the UI REST API so the time
can be attributed to scheduling vs compute vs shuffle.  Optionally dump
`.explain("formatted")` to plans/r13/<name>_before.txt.

Usage:
  python tools/probe_r13_profile.py --names q1,q2 [--runs 3] [--sf DIR]
                                    [--explain-dir plans/r13] [--suffix _before]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
import urllib.request
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain-dir", default="")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--out", default="/tmp/probe_r13_profile.json")
    args = ap.parse_args()

    from cid_etl_spark.queries import spark_queries
    from cid_etl_spark.session import get_spark

    spark = get_spark("r13-profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = spark_queries()
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    # warm as bench.py does
    queries["pricing_summary"](spark, args.sf).write.format("noop").mode("overwrite").save()

    def _warm(batches):
        import numpy  # noqa: F401
        import pandas as _pd
        _pd.util.hash_array(__import__("numpy").array(["w"], dtype=object))
        yield from batches

    spark.range(256, numPartitions=2 * sc.defaultParallelism).mapInPandas(
        _warm, "id long"
    ).write.format("noop").mode("overwrite").save()

    report: dict[str, dict] = {}
    for name in [n for n in args.names.split(",") if n]:
        rec: dict = {}
        spark.catalog.clearCache()
        sc._jvm.System.gc()
        t0 = time.perf_counter()
        df = queries[name](spark, args.sf)
        rec["build_sec"] = round(time.perf_counter() - t0, 3)

        if args.explain_dir:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            os.makedirs(args.explain_dir, exist_ok=True)
            with open(os.path.join(args.explain_dir, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())

        runs = []
        stage_rollups = []
        for i in range(args.runs):
            spark.catalog.clearCache()
            sc._jvm.System.gc()
            jobs_before = {j["jobId"] for j in _rest(base, "/jobs")}
            sc.setJobDescription(f"r13probe:{name}:run{i}")
            t0 = time.perf_counter()
            # rebuild the plan each run like bench.py does (build cost
            # is paid inside the bench's timed window too)
            queries[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            wall = round(time.perf_counter() - t0, 3)
            sc.setJobDescription(None)
            runs.append(wall)
            # attribute this run's jobs/stages
            jobs = [j for j in _rest(base, "/jobs") if j["jobId"] not in jobs_before]
            n_stages = sum(len(j.get("stageIds", [])) for j in jobs)
            n_tasks = sum(j.get("numTasks", 0) for j in jobs)
            stage_rollups.append({
                "jobs": len(jobs), "stages": n_stages, "tasks": n_tasks,
            })
        rec["runs_sec"] = runs
        rec["per_run"] = stage_rollups
        report[name] = rec
        print(f"{name}: build={rec['build_sec']}s runs={runs} "
              f"jobs/stages/tasks={stage_rollups[-1]}", flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
