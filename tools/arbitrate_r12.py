#!/usr/bin/env python3
"""Round-12 arbitration run (VERDICT r11 #1): a fresh solo session
measuring, INTERLEAVED, the two open driver-bench flags
(``holdout_split_documents`` 3.5x, ``exists_late_orders`` 1.69x) and
the on-watch ``neardup_curation_pipeline`` (1.64x, twice arbitrated
ambient in r11), plus five stable voters to estimate this session's
ambient drift vs BASELINE.md.

Interleaving is the point: a rotating host stall hits whichever query
is running when it lands, so across ROUNDS interleaved passes a stall
inflates ONE sample of ONE name while the voters date the session's
overall ambience.  The verdict per target is its MEDIAN here vs its
BASELINE.md row at the voter-estimated drift.  Prints one JSON line.
Run SOLO (no concurrent Spark jobs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGETS = [
    "holdout_split_documents",
    "exists_late_orders",
    "neardup_curation_pipeline",
]
VOTERS = ["pricing_summary", "join_chain_revenue", "sessionize_events",
          "dedup_exact_documents", "tfidf_top_terms"]
ROUNDS = 5
SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    from cid_etl_spark.queries import spark_queries
    from cid_etl_spark.session import get_spark

    spark = get_spark("arbitrate-r12")
    spark.sparkContext.setLogLevel("ERROR")
    queries = spark_queries()
    # warm like bench.py: JVM/codegen + the Arrow worker pool
    queries["pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    def run_once(name: str) -> float:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    names = TARGETS + VOTERS
    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(ROUNDS):  # interleaved: ambient shifts hit all names alike
        for n in names:
            runs[n].append(run_once(n))
    med = {n: sorted(v)[len(v) // 2] for n, v in runs.items()}

    import re
    baseline: dict[str, float] = {}
    with open(os.path.join(os.path.dirname(__file__), "..", "BASELINE.md")) as f:
        for line in f:
            m = re.match(r"\|\s*([a-z0-9_]+)\s*\|\s*0\.1\s*\|\s*([\d.]+)\s*\|", line)
            if m:
                baseline[m.group(1)] = float(m.group(2))
    drift_votes = sorted(
        med[n] / baseline[n] for n in VOTERS if baseline.get(n)
    )
    drift = drift_votes[len(drift_votes) // 2] if drift_votes else None
    print(json.dumps({
        "runs": runs,
        "medians": med,
        "mins": {n: min(v) for n, v in runs.items()},
        "voter_drift_median": round(drift, 3) if drift else None,
        "baseline": {n: baseline.get(n) for n in names},
        "target_ratio_vs_baseline": {
            n: round(med[n] / baseline[n], 2)
            for n in TARGETS if baseline.get(n)
        },
    }, sort_keys=True))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
