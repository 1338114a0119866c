#!/usr/bin/env python3
"""Probe #8b (round 7): LONGEST-TASK evidence for the equi-depth
bucketer under heavy skew at 10× sf0.1 volume.

Probe #8 measured bucket COUNTS (the longest downstream sort task is
proportional to the largest bucket); this probe closes the loop by
measuring the tasks themselves: `bucketed_row_number` over 6M rows of
a log-normal key with an outlier max — the distribution that collapsed
the r6 equi-width edges into ONE bucket — comparing the shipped
equi-depth hybrid against the old equi-width edge formula, max
single-task duration from the Spark REST API (methodology of probes
#2/#6).

Usage: python tools/probe_bucket_skew_tasks.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_sf1_capstones import (  # noqa: E402 - sibling probe helpers
    _rest,
    completed_stages,
)
from probe_stats_scale import longest_task_ms  # noqa: E402

N = 6_000_000
NB = 1024


def main() -> int:
    import time

    from pyspark.sql import functions as F

    import cid_etl_spark.operators.aggregates as agg
    from cid_etl_spark.session import get_spark

    spark = get_spark("bucket-skew-task-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId

    # 6M-row log-normal(0, 2.5) key with one ×1e12 outlier, generated
    # distributed (randn per row; no driver materialization) — the
    # probe-#8 distribution at 10× sf0.1's lineitem volume
    df = (
        spark.range(N, numPartitions=64)
        .withColumn("v", F.exp(F.lit(2.5) * F.randn(seed=42)))
        .withColumn(
            "v",
            F.when(F.col("id") == 0, F.lit(1.0e12)).otherwise(F.col("v")),
        )
        .select(F.col("id").alias("tb"), "v")
        # freeze the random key: randn is nondeterministic across
        # recomputes, and the helper consumes its input twice
        .localCheckpoint(eager=True)
    )

    def old_equiwidth(d, col, n_buckets, partition_by=()):
        bounds = d.agg(
            F.min(col).cast("double").alias("__lo"),
            F.max(col).cast("double").alias("__hi"),
        )
        return d.join(F.broadcast(bounds)).withColumn(
            "__bucket",
            F.when(col.isNull(), F.lit(-1))
            .when(
                F.col("__hi") > F.col("__lo"),
                F.least(
                    F.lit(n_buckets - 1),
                    F.floor(
                        (col.cast("double") - F.col("__lo"))
                        / ((F.col("__hi") - F.col("__lo")) / n_buckets)
                    ).cast("int"),
                ),
            )
            .otherwise(F.lit(0)),
        ).drop("__lo", "__hi")

    out: dict[str, dict] = {"rows": N, "n_buckets": NB, "forms": {}}
    hybrid = agg._range_bucketed
    for label, impl in (("equidepth_hybrid", hybrid), ("equiwidth_r6", None)):
        if impl is None:
            agg._range_bucketed = (
                lambda d, c, n, partition_by=(): old_equiwidth(d, c, n)
            )
        else:
            agg._range_bucketed = impl
        before = set(completed_stages(ui, app_id))
        t0 = time.perf_counter()
        ranked = agg.bucketed_row_number(df, "v", tiebreaks=("tb",), n_buckets=NB)
        ranked.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        stages = completed_stages(ui, app_id)
        new_ids = [s for s in stages if s not in before]
        out["forms"][label] = {
            "wall_s": wall,
            "longest_task_ms": longest_task_ms(ui, app_id, new_ids, stages),
        }
    agg._range_bucketed = hybrid
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
