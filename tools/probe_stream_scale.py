#!/usr/bin/env python3
"""Scale probe #4 (round-4 VERDICT ask #7): the stateful streaming
operators on a 10× replicated events staging.

Why this shape: the streaming rows' 100×-scale story rests on two
claims — (a) the state-store fan-out freeze (`_bounded_state_
partitions`) is a fixture-size artifact, and (b) state size is bounded
by the OPERATOR's key structure (users for the running totals,
watermark-horizon keys for dedup), not by event volume.  Until now the
evidence was one measurement (36.6 s → ~5 s after the fan-out bound).
This probe replicates sf0.1 events 10× (1M events, event_ids offset
per replica, user_ids UNCHANGED so the totals operator sees 10× the
events over the SAME 1,500 keys), stages 8 micro-batches, runs each
operator through a real availableNow stream, and reads the state-store
metrics Spark reports per progress update (`stateOperators[*]`:
numRowsTotal, memoryUsedBytes).

Pass criteria: no OOM; running-totals state rows == distinct users
(event-volume-independent); dedup admitted == unique event count and
state rows == admitted keys (the watermark horizon is 'never' here —
production's lateness SLA shrinks exactly this number).

Usage: python tools/probe_stream_scale.py [--replicas 10] [--files 8]
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

SF_BASE = "/root/testdata/sf0.1"


def build_session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .appName("probe_stream_scale")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def build_replicated_staging(spark, replicas: int, n_files: int, out_dir: str,
                             duplicated: bool) -> None:
    """events at replicas× sf0.1: replica k offsets event_id by
    k*10_000_000 (unique ids across replicas) but keeps user_id and ts,
    so per-user state sees 10× the updates over the same key set.
    ``duplicated=True`` additionally unions the corpus with itself
    (exact dup pairs scattered across micro-batches) for the dedup
    operator."""
    from pyspark.sql import functions as F

    from cid_etl_spark.sources.parquet import load_table

    base = load_table(spark, SF_BASE, "events")
    reps = spark.range(replicas).select(F.col("id").alias("__k"))
    ev = base.crossJoin(reps).select(
        (F.col("event_id") + F.col("__k") * 10_000_000).alias("event_id"),
        "ts", "user_id", "event_type", "value", "props",
    )
    if duplicated:
        ev = ev.unionAll(ev)
    ev.repartition(n_files).write.mode("overwrite").parquet(out_dir)


def drain(writer, ckpt: str):
    """Start an availableNow stream, await, and return the final
    state-operator metrics + micro-batch count from progress."""
    q = writer.option("checkpointLocation", ckpt).trigger(availableNow=True).start()
    q.awaitTermination()
    n_batches = len(q.recentProgress)
    state = {}
    for p in reversed(q.recentProgress):
        ops = p.get("stateOperators") or []
        if ops:
            state = {
                "operator": ops[0].get("operatorName"),
                "state_rows": ops[0].get("numRowsTotal"),
                "state_mem_bytes": ops[0].get("memoryUsedBytes"),
            }
            break
    return n_batches, state


def probe_running_totals(spark, staging: str, root: str):
    from pyspark.sql import functions as F

    from cid_etl_spark.streaming.events import (
        read_event_stream,
        running_user_totals,
    )

    sink = os.path.join(root, "totals_sink")
    ckpt = os.path.join(root, "totals_ckpt")
    stream = read_event_stream(spark, staging, max_files_per_trigger=1)
    totals = running_user_totals(stream, watermark="90 days")

    def append_batch(batch_df, batch_id):
        batch_df.write.mode("append").parquet(sink)

    t0 = time.time()
    n_batches, state = drain(
        totals.writeStream.foreachBatch(append_batch).outputMode("update"),
        ckpt,
    )
    wall = time.time() - t0
    emitted = spark.read.parquet(sink)
    n_users = emitted.select("user_id").distinct().count()
    max_events = emitted.agg(F.max("n_events")).collect()[0][0]
    return {
        "probe": "running_user_totals",
        "wall_s": round(wall, 1),
        "micro_batches": n_batches,
        "distinct_users": n_users,
        "max_events_per_user": max_events,
        **state,
    }


def probe_stream_dedup(spark, staging: str, root: str):
    from cid_etl_spark.streaming.events import (
        read_event_stream,
        stream_dedup_events,
    )

    sink = os.path.join(root, "dedup_sink")
    ckpt = os.path.join(root, "dedup_ckpt")
    stream = read_event_stream(spark, staging, max_files_per_trigger=1)
    admitted = stream_dedup_events(stream, watermark="90 days")
    t0 = time.time()
    n_batches, state = drain(
        admitted.writeStream.format("parquet").option("path", sink)
        .outputMode("append"),
        ckpt,
    )
    wall = time.time() - t0
    n_admitted = spark.read.parquet(sink).count()
    return {
        "probe": "stream_dedup_admission",
        "wall_s": round(wall, 1),
        "micro_batches": n_batches,
        "admitted": n_admitted,
        **state,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--files", type=int, default=8)
    args = ap.parse_args()

    spark = build_session()
    spark.conf.set("spark.sql.shuffle.partitions", "8")  # state fan-out
    root = tempfile.mkdtemp(prefix="probe_stream_scale_")
    try:
        plain = os.path.join(root, "staging_plain")
        dup = os.path.join(root, "staging_dup")
        build_replicated_staging(spark, args.replicas, args.files, plain, False)
        build_replicated_staging(spark, args.replicas, args.files, dup, True)

        results = [
            probe_running_totals(spark, plain, root),
            probe_stream_dedup(spark, dup, root),
        ]
        for r in results:
            print(json.dumps(r))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
