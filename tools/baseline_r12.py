#!/usr/bin/env python3
"""Measure sf0.1 baselines for the round-12 queries with the standing
new-query convention (BASELINE.md §r11): INTERLEAVED fresh-session
medians — consecutive repeats of one query reuse hot codegen classes a
full bench never does, so the honest reference interleaves the new
rows across passes, with stable voters dating the session's ambience.
Prints one JSON line: runs, medians, voter drift.  Run SOLO.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGETS = [
    "weighted_geomean_grouped_agg",
    "skipgram_cooccurrence_topk",
    "welch_t_test_click_purchase",
    "cramers_v_categorical",
    "hill_tail_index_prices",
    "group_kfold_split_audit",
    "preference_pairs_by_quality",
    "markov_stationary_events",
]
VOTERS = ["pricing_summary", "join_chain_revenue", "sessionize_events",
          "dedup_exact_documents", "tfidf_top_terms"]
ROUNDS = 5
SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    from cid_etl_spark.queries import spark_queries
    from cid_etl_spark.session import get_spark

    spark = get_spark("baseline-r12")
    spark.sparkContext.setLogLevel("ERROR")
    queries = spark_queries()
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
    for _ in range(ROUNDS):
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
    }, sort_keys=True))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
