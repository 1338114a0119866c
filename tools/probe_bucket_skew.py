#!/usr/bin/env python3
"""Probe #8 (round 7): bucket balance of `_range_bucketed` under
heavy-tailed keys — the VERDICT r6 #1 failure mode of the old min/max
equi-width edges, where a single outlier (log-normal max) or a Zipf
mass point collapsed most rows into one bucket and silently restored
the single-task sort the helper exists to kill.

Three key distributions at 600k rows, n_buckets=1024, comparing the
shipped hybrid (equi-depth percentile coarse level + equi-width fine
refinement) against the r6 equi-width form.  The metric is the LARGEST
bucket (the longest downstream sort task is proportional to it); the
irreducible floor for any order-preserving bucketing is
max(rows/n_buckets, hottest duplicate key).

Usage: python tools/probe_bucket_skew.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 600_000
NB = 1024


def main() -> int:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from cid_etl_spark.operators.aggregates import _range_bucketed
    from cid_etl_spark.session import get_spark

    spark = get_spark("bucket-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(42)

    def old_equiwidth(df, col):
        bounds = df.agg(
            F.min(col).cast("double").alias("__lo"),
            F.max(col).cast("double").alias("__hi"),
        )
        return df.join(F.broadcast(bounds)).withColumn(
            "__bucket",
            F.when(col.isNull(), F.lit(-1))
            .when(
                F.col("__hi") > F.col("__lo"),
                F.least(
                    F.lit(NB - 1),
                    F.floor(
                        (col.cast("double") - F.col("__lo"))
                        / ((F.col("__hi") - F.col("__lo")) / NB)
                    ).cast("int"),
                ),
            )
            .otherwise(F.lit(0)),
        )

    def max_bucket(b):
        row = (
            b.groupBy("__bucket")
            .count()
            .agg(F.max("count").alias("mx"), F.count("*").alias("used"))
            .collect()[0]
        )
        return int(row["mx"]), int(row["used"])

    cases: dict[str, np.ndarray] = {}
    logn = rng.lognormal(0, 2.5, N)
    logn[0] = logn.max() * 1e6  # the outlier that kills equi-width
    cases["lognormal_outlier"] = logn
    cases["zipf_1.5"] = rng.zipf(1.5, N).astype("float64")
    cases["uniform"] = rng.uniform(0, 100, N)

    out: dict[str, dict] = {"rows": N, "n_buckets": NB, "cases": {}}
    for name, vals in cases.items():
        df = spark.createDataFrame(
            pd.DataFrame({"v": vals, "id": np.arange(N)})
        ).repartition(32)
        new_mx, new_used = max_bucket(_range_bucketed(df, F.col("v"), NB))
        old_mx, old_used = max_bucket(old_equiwidth(df, F.col("v")))
        uniq, counts = np.unique(vals, return_counts=True)
        out["cases"][name] = {
            "hybrid_max_bucket": new_mx,
            "hybrid_buckets_used": new_used,
            "equiwidth_max_bucket": old_mx,
            "equiwidth_buckets_used": old_used,
            "ideal": N // NB,
            "hottest_key": int(counts.max()),
        }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
