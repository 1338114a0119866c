#!/usr/bin/env python3
"""Adaptive-tier threshold sweep (round 9, VERDICT r8 #7): measure the
bucket-count crossover on REAL input sizes instead of the two-point
A/B that placed the r8 edges.

For each input size (slices of the sf1 lineitem fixture, written to
temp parquet so the plan estimate sees exactly that size), run the
representative helper call — ``bucketed_row_number`` over the price
key, the rank shape every family member reduces to — at n_buckets in
{8, 32, 1024} and report the median-of-3 wall next to the input's
plan-size estimate.  The tier edges belong where the curves cross:
below the 8/32 crossover the flat-7-quantile level wins (fewer
percentile quantiles, no second level), above the 32/1024 crossover
the two-level hybrid's bounded per-task sort pays for its fixed
rollup+join.

Usage:  python tools/sweep_bucket_tiers.py
(requires the .sf1fixture/ from tools/bench_sf1.py)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_DIR = os.path.join(REPO, ".sf1fixture")

#: target row counts: sf0.01-grain through full sf1 lineitem
SIZES = [60_000, 600_000, 2_000_000, 6_000_000]
BUCKETS = [8, 32, 1024]


def main() -> None:
    from pyspark.sql import functions as F

    from cid_etl_spark.operators.aggregates import (
        _plan_size_bytes,
        bucketed_row_number,
    )
    from cid_etl_spark.session import get_spark

    spark = get_spark("sweep-bucket-tiers")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(os.path.join(SF1_DIR, "lineitem.parquet"))
    total = li.count()
    tmp = tempfile.mkdtemp(prefix="tier_sweep_")

    def med3(fn):
        ts = []
        for _ in range(3):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]

    print(f"| rows | est MiB | " + " | ".join(f"n={b}" for b in BUCKETS) + " |")
    print("|---|---|" + "---|" * len(BUCKETS))
    for rows in SIZES:
        path = os.path.join(tmp, f"slice_{rows}")
        (
            li.limit(min(rows, total))
            .repartition(32)
            .write.mode("overwrite")
            .parquet(path)
        )
        sl = spark.read.parquet(path)
        est = _plan_size_bytes(sl)
        walls = []
        for nb in BUCKETS:
            walls.append(
                med3(
                    lambda nb=nb: bucketed_row_number(
                        sl,
                        "l_extendedprice",
                        tiebreaks=("l_orderkey", "l_linenumber"),
                        n_buckets=nb,
                    )
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )
            )
        cells = " | ".join(f"{w:.2f}s" for w in walls)
        print(f"| {rows} | {est >> 20 if est else '?'} | {cells} |", flush=True)


if __name__ == "__main__":
    main()
