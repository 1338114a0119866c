#!/usr/bin/env python3
"""Round-8 run_batch ladders (VERDICT r7 #1/#3): measure batch reuse
for the NEW fragment families at sf0.1 —

1. the sequence/ANN mixed batch (user_event_seq shared by 3 sequence
   consumers, signed_embeddings by the 2 LSH consumers);
2. the bucket family batch (no declared fragments — reuse comes from
   the batch context materializing each helper's percentile edge
   rollup once per canonical plan, shared_scan);
3. the r7 lexical batch re-measured (regression guard on the 2.53×).

Each mode reports the median of 3.  Run:  python tools/probe_batch_families.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cid_etl_spark.plans.batch import run_batch  # noqa: E402
from cid_etl_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

LADDERS = {
    "seq_ann_mixed": [
        "event_transition_matrix", "top_session_paths", "sessionize_events",
        "consecutive_dup_collapse", "interarrival_burstiness_users",
        "cosine_topk_lsh", "cosine_topk_lsh_probeall",
    ],
    "bucket_family": [
        "rfm_segmentation_customers", "gini_by_region_orders",
        "weighted_median_lineitem", "ks_test_priority_orders",
        "mann_whitney_priority_orders",
    ],
    "lexical_r7": [
        "top_ngrams_per_lang", "vocab_encode_documents",
        "unigram_logprob_score", "inverted_index_lookup",
        "tfidf_top_terms", "bm25_search_documents",
        "ccnet_quality_buckets", "hybrid_rrf_search",
    ],
    # round 9 (VERDICT r8 #4): the revenue-series stats family over
    # the daily_order_cents + monthly_order_stats fragments
    "stats_family_r9": [
        "autocorrelation_daily_revenue", "runs_test_daily_revenue",
        "monthly_order_revenue", "seasonal_naive_mape_orders",
        "anomaly_months_orders", "cusum_changepoint_orders",
    ],
    # round 9 (VERDICT r8 #5): customer-grain members over a bucketed
    # orders fact — the honest-negative sf0.1 ladder (BASELINE.md)
    "custkey_bucketed_r9": [
        "window_topk_orders_per_customer", "lag_order_gaps",
        "window_running_revenue",
    ],
    # round 13 (VERDICT r12 #6): the r11/r12 lexical consumers folded
    # into the standing lexical batch — skipgram_cooccurrence_topk
    # consumes doc_token_seq, ndcg_retrieval_eval token_stream, so the
    # mixed ladder materializes BOTH canonical fragments once and
    # shares them across all 10 members
    "lexical_mixed_r13": [
        "top_ngrams_per_lang", "vocab_encode_documents",
        "unigram_logprob_score", "inverted_index_lookup",
        "tfidf_top_terms", "bm25_search_documents",
        "ccnet_quality_buckets", "hybrid_rrf_search",
        "skipgram_cooccurrence_topk", "ndcg_retrieval_eval",
    ],
}

#: ladder name → verify member digest parity batch-vs-solo after the
#: timing modes (VERDICT r12 #6's "member digests equal to solo runs"
#: bar, applied to the new mixed ladder)
LADDER_VERIFY_DIGESTS = {"lexical_mixed_r13"}

#: ladder name → bucket_facts declaration passed to run_batch for an
#: EXTRA measured mode (bucketed-fact materialization, round 9)
LADDER_BUCKET_FACTS = {
    "custkey_bucketed_r9": {"orders": "o_custkey"},
}


def _digest(df):
    """Order-insensitive (n_rows, sum-of-48-bit-md5-prefix) digest over
    the frame's canonicalized rows — same canon as the registered
    run_batch_*_verified rows (sorted columns, %.4f doubles, NULL-safe)."""
    from pyspark.sql import functions as F

    parts = []
    for c in sorted(df.columns):
        if df.schema[c].dataType.simpleString() == "double":
            parts.append(
                F.when(F.col(c).isNull(), F.lit(None)).otherwise(
                    F.format_string("%.4f", F.col(c))
                )
            )
        else:
            parts.append(F.col(c).cast("string"))
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", *parts)), 1, 12), 16, 10
    ).cast("bigint")
    r = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(h).cast("bigint").alias("d"),
    ).collect()[0]
    return (r["n"], r["d"])


def main() -> None:
    import argparse

    from cid_etl_spark.queries import spark_queries

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="", help="comma list of ladder names")
    args = ap.parse_args()
    only = {s for s in args.only.split(",") if s}

    spark = get_spark("probe-batch-families")
    spark.sparkContext.setLogLevel("ERROR")
    queries = spark_queries()
    queries["pricing_summary"](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def med3(fn):
        ts = []
        for _ in range(3):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[1]

    for ladder, names in LADDERS.items():
        if only and ladder not in only:
            continue
        seq = med3(lambda: [noop(queries[n](spark, SF)) for n in names])
        bat_serial = med3(
            lambda: run_batch(spark, SF, names, max_concurrency=1)
        )
        bat = med3(lambda: run_batch(spark, SF, names))
        extra = ""
        facts = LADDER_BUCKET_FACTS.get(ladder)
        if facts:
            buck = med3(
                lambda: run_batch(spark, SF, names, bucket_facts=facts)
            )
            extra = f" bucketed_facts={buck:.2f}s"
        print(
            f"LADDER {ladder}: sequential={seq:.2f}s "
            f"materialize_serial={bat_serial:.2f}s "
            f"materialize_concurrent={bat:.2f}s "
            f"speedup={seq / bat:.2f}x{extra}",
            flush=True,
        )
        if ladder in LADDER_VERIFY_DIGESTS:
            batch_digests = run_batch(spark, SF, names, action=_digest)
            mismatches = []
            for n in names:
                solo = _digest(queries[n](spark, SF))
                if solo != tuple(batch_digests[n]):
                    mismatches.append((n, solo, batch_digests[n]))
            print(
                f"DIGESTS {ladder}: "
                + ("all_equal" if not mismatches else f"MISMATCH {mismatches}"),
                flush=True,
            )


if __name__ == "__main__":
    main()
