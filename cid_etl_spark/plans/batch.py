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

import os
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
    mode: str = "materialize",
    max_concurrency: int = 4,
) -> dict[str, Any]:
    """Run registered queries *names* with shared fragments reused
    across them.  *action* materializes each query's DataFrame and its
    return value lands in the result dict (default: a ``noop``-format
    write — full materialization, no driver collect).

    Two reuse mechanisms, both A/B-measured at sf0.1:

    - ``mode="materialize"`` (default): fragments with ≥2 uses are
      written ONCE to scratch parquet and every consumer's helper call
      returns a SCAN of the materialized copy — keeping whole-stage
      codegen, column pruning, and predicate pushdown into the shared
      intermediate.  This beat the row cache on every member (probe
      #7's InMemoryTableScan-loses-to-codegen finding applies to
      fragments too, not just bare scans).  The standard warehouse
      "materialized intermediate" pattern; at 100 TB the scratch dir
      is distributed storage and each consumer's scan is pruned to
      the columns/predicates it needs.
    - ``mode="cache"``: ``persist()`` + CacheManager plan substitution,
      unpersisting each fragment at its last consumer.  Kept for
      memory-resident batches; measured ~neutral at sf0.1.

    In materialize mode members additionally run CONCURRENTLY
    (*max_concurrency* threads, order-preserving result dict):
    independent queries interleave their stages, so single-task stages
    (1-row rollups, driver-side heap merges) of one query fill cores
    another query leaves idle — the multi-query-scheduler half of the
    batch story.  Set ``max_concurrency=1`` for strictly serial
    execution.  Cache mode is always serial: its unpersist-at-last-
    consumer accounting needs the member order.  Results are
    row-identical to per-query runs in every mode
    (caching/materializing never changes values; queries are
    independent); pinned by tests/test_batch.py.
    """
    if action is None:
        def action(df: DataFrame) -> None:  # noqa: F811
            df.write.format("noop").mode("overwrite").save()

    if mode == "materialize":
        return _run_materialized(spark, sf_dir, names, action, max_concurrency)
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


def _run_members(
    spark: SparkSession,
    sf_dir: str,
    names: list[str],
    action: Callable[[DataFrame], Any],
    max_concurrency: int,
) -> dict[str, Any]:
    """Execute member queries, optionally from a small thread pool
    (SparkSession is thread-safe; each query is an independent job
    set).  Result dict preserves *names* order; a member's exception
    propagates after the pool drains."""
    from cid_etl_spark.queries import spark_queries

    queries = spark_queries()
    if max_concurrency <= 1 or len(names) == 1:
        return {n: action(queries[n](spark, sf_dir)) for n in names}
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
        futures = {n: pool.submit(lambda q=n: action(queries[q](spark, sf_dir))) for n in names}
        return {n: futures[n].result() for n in names}


def _run_materialized(
    spark: SparkSession,
    sf_dir: str,
    names: list[str],
    action: Callable[[DataFrame], Any],
    max_concurrency: int,
) -> dict[str, Any]:
    """Materialize ≥2-use fragments to scratch parquet, point the
    fragment builders at the copies (plans/fragments._OVERRIDES), run
    the members, then clear overrides and delete the scratch dir."""
    import shutil
    import tempfile

    to_share = plan_fragments(names)
    # overrides are process-global (the fragment builders read them):
    # two concurrent materialize-mode batches over the SAME sf_dir
    # would race on paths and cleanup, so refuse up front — callers
    # wanting parallel batches should merge them into one `names` list
    # (members already run concurrently inside a batch)
    for f in to_share:
        if (f, sf_dir) in _frag._OVERRIDES:
            raise RuntimeError(
                f"fragment {f!r} for {sf_dir!r} is already materialized "
                "by another in-flight run_batch; merge the batches"
            )
    scratch = tempfile.mkdtemp(prefix="cid_etl_batch_")
    try:
        # parents first: a child fragment's build reads the parent's
        # materialized copy through the same override mechanism
        for f in to_share:
            path = os.path.join(scratch, f)
            FRAGMENTS[f](spark, sf_dir).write.mode("overwrite").parquet(path)
            _frag._OVERRIDES[(f, sf_dir)] = path
        return _run_members(spark, sf_dir, names, action, max_concurrency)
    finally:
        for f in to_share:
            _frag._OVERRIDES.pop((f, sf_dir), None)
        shutil.rmtree(scratch, ignore_errors=True)
