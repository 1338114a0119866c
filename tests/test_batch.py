"""run_batch (SURVEY §7, round 7): shared-fragment batch execution
must be invisible to results — row-identical to per-query runs — while
actually substituting the cached fragments into member plans and
releasing them by the end.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cid_etl_spark.plans.batch import (
    FRAGMENTS,
    QUERY_FRAGMENTS,
    plan_fragments,
    run_batch,
)

SF = "/root/testdata/sf0.001"

BATCH = [
    "top_ngrams_per_lang",
    "tfidf_top_terms",
    "bm25_search_documents",
    "ccnet_quality_buckets",
    "lang_id_documents",
    "quality_score_documents",
]


def test_plan_fragments_refcounts():
    # both fragments cached when the explode has 2+ transitive uses
    assert plan_fragments(BATCH) == {"token_stream": 2, "doc_term_counts": 3}
    # a single consumer caches nothing
    assert plan_fragments(["tfidf_top_terms"]) == {}
    assert plan_fragments(["lang_id_documents"]) == {}
    # two doc_term_counts consumers cache the rollup but not the
    # stream (it is read once, while building the rollup)
    assert plan_fragments(["tfidf_top_terms", "bm25_search_documents"]) == {
        "doc_term_counts": 2
    }
    # stream + one rollup consumer: the stream is read twice (once by
    # the consumer, once by the rollup build) — cache it, not the rollup
    assert plan_fragments(["top_ngrams_per_lang", "tfidf_top_terms"]) == {
        "token_stream": 2
    }


def test_run_batch_matches_per_query_results(spark):
    from cid_etl_spark.queries import spark_queries

    queries = spark_queries()

    def rows(df):
        return sorted(map(tuple, df.collect()))

    jsc = spark.sparkContext._jsc.sc()
    pinned_before = jsc.getPersistentRDDs().size()
    want = {n: rows(queries[n](spark, SF)) for n in BATCH}
    # default mode: parquet-materialized fragments + concurrent members
    got = run_batch(spark, SF, BATCH, action=rows)
    assert set(got) == set(want)
    for n in BATCH:
        assert got[n] == want[n], f"materialize-batch result differs for {n}"
    # the overrides were cleared: standalone plans rebuild normally
    from cid_etl_spark.plans import fragments as fr

    assert not fr._OVERRIDES
    # cache mode, strictly serial
    got_c = run_batch(
        spark, SF, BATCH, action=rows, mode="cache", max_concurrency=1
    )
    for n in BATCH:
        assert got_c[n] == want[n], f"cache-batch result differs for {n}"
    # the batch released its caches (nothing new pinned for the caller)
    assert jsc.getPersistentRDDs().size() == pinned_before


def test_fragment_substitution_fires(spark):
    """Caching the fragment must change each consumer's EXECUTED plan
    (InMemoryTableScan appears) — this is what keeps QUERY_FRAGMENTS
    honest: if a refactor drifts a query off the canonical helper, the
    subtree no longer matches and this test fails for that query."""
    from cid_etl_spark.queries import spark_queries

    queries = spark_queries()
    for frag_name, builder in FRAGMENTS.items():
        consumers = [
            n for n, fs in QUERY_FRAGMENTS.items() if frag_name in fs
        ]
        frag = builder(spark, SF)
        frag.persist()
        try:
            frag.count()
            for n in consumers:
                plan = (
                    queries[n](spark, SF)
                    ._jdf.queryExecution()
                    .executedPlan()
                    .toString()
                )
                assert "InMemoryTableScan" in plan, (
                    f"{n} does not reuse cached fragment {frag_name}"
                )
        finally:
            frag.unpersist()


def test_fragments_standalone_values(spark):
    """The canonical fragments themselves compute what they claim."""
    from cid_etl_spark.plans.fragments import doc_term_counts, token_stream

    ts = token_stream(spark, SF)
    dtc = doc_term_counts(spark, SF)
    n_stream = ts.count()
    n_from_rollup = dtc.agg(F.sum("n")).collect()[0][0]
    assert n_stream == n_from_rollup  # rollup loses no occurrences
    # lang is functionally dependent on doc_id: the rollup grain is
    # exactly (doc_id, tok)
    assert (
        dtc.groupBy("doc_id", "tok").count().filter(F.col("count") > 1).count()
        == 0
    )
