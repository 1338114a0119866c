"""SparkSession factory with defaults sized for both local testing and
large-cluster execution.

The reference engine is a single-process pandas script
(/root/reference/etl_cid10.py:374-404); here the equivalent "runtime" is a
SparkSession.  Every knob below is chosen for the 100 TB design point and
degrades gracefully on ``local[N]``:

- AQE on: runtime partition coalescing, skew-join splitting, and
  dynamic join-strategy switching replace any hand-tuned plan.
- ``spark.sql.shuffle.partitions`` starts modest; AQE coalesces down
  (local) or the cluster config raises it (prod).  It is a *default*,
  not a constant the code depends on.
- Arrow enabled so the few Pandas-UDF paths (multimodal decode,
  vector ops fallback) move columnar batches, never pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults applied by :func:`get_spark`.  Callers (and the driver's own
#: session) may override any of these; no operator in the package relies
#: on a specific value to be *correct* — only to be fast.
DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # dims in the fixture star schema are tiny; at 100 TB the dims are
    # still ≪ this threshold while facts never qualify
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # timestamps in fixtures are timezone-naive; keep session TZ fixed so
    # date_trunc/window results are reproducible anywhere
    "spark.sql.session.timeZone": "UTC",
    # ContextCleaner's periodic FORCED full GC stays at the 30min
    # default: a short interval (tried: 1min) fires stop-the-world
    # collections in the middle of whatever query is running — measured
    # as random 3-15s spikes on individual bench queries.  Steady-state
    # hygiene belongs BETWEEN queries (bench.py clears the SQL cache and
    # triggers an explicit System.gc outside every timed window).
    "spark.cleaner.periodicGC.interval": "30min",
}


def get_spark(app_name: str = "cid-etl-spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with the package defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    when no cluster master is configured — mirroring how the driver runs
    the test harness.  On a real cluster, leave ``master`` unset and let
    spark-submit supply it.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
        if master.startswith("local"):
            # local mode: driver == executor; the 1g default heap OOMs
            # wide joins long before the machine does (only effective
            # when this builder launches the JVM — a cluster's
            # spark-submit sets its own executor/driver sizing)
            builder = builder.config(
                "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
            )
    for k, v in DEFAULT_CONF.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
