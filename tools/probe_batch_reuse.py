#!/usr/bin/env python3
"""Probe #7 (round-6 groundwork for the r7 multi-query-reuse story):
how much does Spark's cache-fragment substitution buy a BATCH of
registered queries today, with zero query changes?

Mechanism under test: `CacheManager` replaces any cached DataFrame's
canonicalized logical subtree inside later plans.  All token-heavy
registry queries start from the same `load_table(documents)` scan, so
caching that one DataFrame should substitute an `InMemoryTableScan`
into every member of the batch — automatic base-table reuse.  Deeper
fragments (the exploded token stream, per-doc rollups) do NOT match
today because each query projects/filters differently before the
explode; measuring that gap is the point — it sizes the win available
to an r7 `run_batch` API that routes hot intermediates through one
shared (canonically identical) helper.

Usage: python tools/probe_batch_reuse.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Queries that each re-derive document text features from the same scan.
BATCH = (
    "bm25_search_documents",
    "ccnet_quality_buckets",
    "top_ngrams_per_lang",
    "pmi_bigrams_tokens",
    "char_entropy_documents",
    "tfidf_top_terms",
    "quality_score_documents",
    "lang_id_documents",
)


def main() -> int:
    from pyspark.sql import functions as F  # noqa: F401

    from cid_etl_spark.queries import spark_queries
    from cid_etl_spark.session import get_spark
    from cid_etl_spark.sources.parquet import load_table

    spark = get_spark("batch-reuse-probe")
    spark.sparkContext.setLogLevel("ERROR")
    q = spark_queries()

    def run_batch() -> float:
        t0 = time.perf_counter()
        for name in BATCH:
            q[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        return time.perf_counter() - t0

    # warm codegen/scheduler once, then time the uncached baseline twice
    run_batch()
    base = min(run_batch(), run_batch())

    docs = load_table(spark, SF_DIR, "documents")
    docs.persist()
    docs.count()  # materialize before timing
    # confirm the substitution actually happens in a member's plan
    plan = (
        q[BATCH[0]](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    substituted = "InMemoryTableScan" in plan
    cached = min(run_batch(), run_batch())
    docs.unpersist()

    # round 7: the actual run_batch API ladder — canonical fragments
    # (token_stream / doc_term_counts) shared via the row cache vs
    # scratch-parquet materialization, serial vs concurrent members
    from cid_etl_spark.plans.batch import run_batch as rb

    def run_api(**kw) -> float:
        t0 = time.perf_counter()
        rb(spark, SF_DIR, list(BATCH), **kw)
        return time.perf_counter() - t0

    api_cache = min(
        run_api(mode="cache", max_concurrency=1),
        run_api(mode="cache", max_concurrency=1),
    )
    api_mat = min(
        run_api(mode="materialize", max_concurrency=1),
        run_api(mode="materialize", max_concurrency=1),
    )
    api_conc = min(run_api(), run_api())

    out = {
        "sf_dir": SF_DIR,
        "batch": list(BATCH),
        "uncached_sec": round(base, 2),
        "base_table_cached_sec": round(cached, 2),
        "speedup": round(base / cached, 2),
        "cache_substituted_into_plans": substituted,
        "run_batch_cache_sec": round(api_cache, 2),
        "run_batch_materialize_sec": round(api_mat, 2),
        "run_batch_concurrent_sec": round(api_conc, 2),
        "run_batch_speedup": round(base / api_conc, 2),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
