"""Multi-query batch execution with shared-fragment reuse (SURVEY §7,
VERDICT r6 #3).

``run_batch`` runs a list of registered queries while persisting the
canonical fragments (:mod:`cid_etl_spark.plans.fragments`) that at
least two of them consume, in dependency order, and unpersisting each
fragment at its LAST consumer — the persist/unpersist discipline the
registry enforces per-query, lifted to a batch.

Mechanism: queries build their hot intermediates through the shared
fragment helpers, so a persisted fragment's canonicalized subtree is
substituted into every member plan by Spark's ``CacheManager`` — the
queries themselves are batch-agnostic and keep their standalone plans
when nothing is cached.  Probe #7 (BASELINE.md) sized the approach:
fragment-level reuse measured 1.36× on four consumers sharing one
explode, while base-table caching measured 0.89× (never done here).

Batch results are row-identical to per-query runs by construction
(caching never changes values) and pinned by
``tests/test_batch.py::test_run_batch_matches_per_query_results``.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from cid_etl_spark.plans import fragments as _frag

#: Fragment name → builder.  Order is topological (parents before
#: children): a child fragment's own build then reads its parent's
#: cache through the same substitution mechanism.
FRAGMENTS: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "token_stream": _frag.token_stream,
    "doc_term_counts": _frag.doc_term_counts,
}

#: Fragment → fragments it is built FROM (one level here; kept as data
#: so the refcounting below stays general).
FRAGMENT_PARENTS: dict[str, tuple[str, ...]] = {
    "token_stream": (),
    "doc_term_counts": ("token_stream",),
}

#: Registered query name → fragments its plan consumes directly.
#: Maintained alongside the query refactors; test_batch asserts the
#: mapping stays honest (each listed query's analyzed plan contains
#: the fragment subtree, i.e. caching it changes the executed plan).
QUERY_FRAGMENTS: dict[str, tuple[str, ...]] = {
    "top_ngrams_per_lang": ("token_stream",),
    "vocab_encode_documents": ("token_stream",),
    "unigram_logprob_score": ("token_stream",),
    "inverted_index_lookup": ("token_stream",),
    "tfidf_top_terms": ("doc_term_counts",),
    "bm25_search_documents": ("doc_term_counts",),
    "ccnet_quality_buckets": ("doc_term_counts",),
    "hybrid_rrf_search": ("doc_term_counts",),
}


def plan_fragments(names: list[str]) -> dict[str, int]:
    """Decide which fragments a batch of *names* should persist and
    return ``{fragment: use_count}`` for those worth caching.  A
    fragment is worth caching when it has ≥ 2 uses, where a use is a
    direct consumer query in the batch or a cached child fragment
    built from it (building the child reads the parent once)."""
    direct: dict[str, int] = {f: 0 for f in FRAGMENTS}
    for n in names:
        for f in QUERY_FRAGMENTS.get(n, ()):
            direct[f] += 1
    # children first (reverse topological), so a parent sees how many
    # times each child will be BUILT: once if the child is cached,
    # otherwise once per direct consumer (each consumer's plan
    # re-derives it — and re-reads this parent)
    cached: dict[str, int] = {}
    builds: dict[str, int] = {}
    for f in reversed(list(FRAGMENTS)):
        uses = direct[f] + sum(
            builds[c]
            for c in FRAGMENTS
            if f in FRAGMENT_PARENTS.get(c, ()) and c in builds
        )
        if uses >= 2:
            cached[f] = uses
            builds[f] = 1
        else:
            builds[f] = uses
    return {f: cached[f] for f in FRAGMENTS if f in cached}


def run_batch(
    spark: SparkSession,
    sf_dir: str,
    names: list[str],
    action: Callable[[DataFrame], Any] | None = None,
) -> dict[str, Any]:
    """Run registered queries *names* (in the given order) with shared
    fragments persisted across them.  *action* materializes each
    query's DataFrame and its return value lands in the result dict
    (default: a ``noop``-format write — full materialization, no
    driver collect).  Fragments unpersist at their last consumer, so
    nothing returned pins executor storage.

    At 100 TB the fragments are token-grain: ``persist()`` uses the
    default MEMORY_AND_DISK level, so a fragment larger than cluster
    memory degrades to local-disk reads — still strictly cheaper than
    re-running the explode/shuffle per consumer, which is the
    alternative being replaced.
    """
    if action is None:
        def action(df: DataFrame) -> None:  # noqa: F811
            df.write.format("noop").mode("overwrite").save()

    to_cache = plan_fragments(names)
    # remaining consumers per fragment: queries still to run + child
    # fragments still to materialize
    remaining: dict[str, int] = dict(to_cache)
    built: dict[str, DataFrame] = {}
    # materialize parents-first so each child build hits parent caches
    for f in to_cache:
        df = FRAGMENTS[f](spark, sf_dir)
        df.persist()
        df.count()
        built[f] = df
        for p in FRAGMENT_PARENTS.get(f, ()):
            if p in remaining:
                remaining[p] -= 1

    def _release_done() -> None:
        for f in [f for f, r in remaining.items() if r <= 0]:
            built[f].unpersist()
            del remaining[f]

    _release_done()
    results: dict[str, Any] = {}
    try:
        from cid_etl_spark.queries import spark_queries

        queries = spark_queries()
        for n in names:
            results[n] = action(queries[n](spark, sf_dir))
            for f in QUERY_FRAGMENTS.get(n, ()):
                if f in remaining:
                    remaining[f] -= 1
            _release_done()
    finally:
        for f in list(remaining):
            built[f].unpersist()
    return results
