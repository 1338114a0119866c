#!/usr/bin/env python3
"""Round-11 arbitration run (VERDICT r10 #2 + ADVICE r10 #3): a fresh
solo session measuring, INTERLEAVED, the one standing bench flag
(``source_similarity_weighted_jaccard``) and the four rows r10 moved to
band middles (``ewma_user_values``, ``cogroup_click_purchase``,
``tpch_q3_shipping_priority``, ``pretraining_data_pipeline``), plus two
stable voters to estimate this session's ambient drift vs BASELINE.md.

ADVICE r10 #3's point: those four rows were loosened to the slow-r10
band middle while bench.py's new ambient_drift factor ALSO normalizes
host slowness — double compensation.  The fix is to re-baseline them to
fresh-session medians measured at drift≈1.0, which this script
produces.  Prints one JSON line: per-query runs + medians + the voter
drift estimate.  Run SOLO (no concurrent Spark jobs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGETS = [
    "source_similarity_weighted_jaccard",
    "ewma_user_values",
    "cogroup_click_purchase",
    "tpch_q3_shipping_priority",
    "pretraining_data_pipeline",
]
VOTERS = ["pricing_summary", "join_chain_revenue", "sessionize_events",
          "dedup_exact_documents", "tfidf_top_terms"]
ROUNDS = 3
SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    from cid_etl_spark.queries import spark_queries
    from cid_etl_spark.session import get_spark

    spark = get_spark("arbitrate-r11")
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
        "voter_drift_median": round(drift, 3) if drift else None,
        "baseline": {n: baseline.get(n) for n in names},
    }, sort_keys=True))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
