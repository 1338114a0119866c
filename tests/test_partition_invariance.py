"""Partition-count invariance: a distributed operator whose RESULT
depends on ``spark.sql.shuffle.partitions`` is hiding a
single-partition assumption (the bug class behind zipWithIndex-style
id assignment, first()-based survivors, and unordered window frames).
Representative shuffle-heavy queries must return identical rows under
skewed-odd and cluster-like partition counts.

``spark.sql.shuffle.partitions`` is runtime-settable, so one session
serves all settings.
"""

from __future__ import annotations

import pytest

from cid_etl_spark.queries import spark_queries

from .conftest import SF_SMOKE

QUERIES = spark_queries()

#: Queries chosen for partition-sensitive mechanics: window survivors,
#: distributed id assignment, iterative convergence, grouped Arrow
#: recurrences, banded self-joins, block-pair exact similarity.
SENSITIVE = (
    "priority_dedup_orders",
    "contiguous_ids_documents",
    "dedup_clusters_star",
    "ewma_user_values",
    "minhash_lsh_verified",
    "embedding_neardup_exact",
    "asof_prior_purchase",
    "salted_agg_lineitem",
    "pagerank_copurchase",
    # round-2 continuation: iterative/global-state additions
    "kmeans_cluster_assign",     # double avg re-ordered by partitioning
    "neardup_curation_pipeline", # LSH bands + CC rounds + anti join
    "cdc_merge_full",            # latest-wins window survivor
    "curriculum_phases",         # global ntile boundary stability
    "bpe_train_rounds",          # 3 compounding argmax/merge rounds
    "salted_join_events_hot",    # salt derived from partition id
    "pretraining_data_pipeline", # capstone: every stage composed
    # round-2 continuation, session 3
    "pareto_frontier_orders",    # local-prune bucket must not leak into result
    "triangle_census_copurchase",# orientation + wedge join over any layout
    "lpa_communities_copurchase",# synchronous vote rounds, argmax tie-break
    "kmv_distinct_users",        # salted partial k-minima merge
    "phash_image_neardup",       # banded Hamming self-join
    "top_session_paths",         # per-session collect+sort, heap top-k
    "bfs_distances_copurchase",  # per-round min relaxation
    "kcore_copurchase",          # iterative peel via semi joins
    # round 3
    "temperature_mixture_sample",  # rates from global counts + md5 gate
    "zipf_fit_tokens",           # global top-1000 heap + single-row OLS
    # round 5: stat rows with global/keyed cumulative windows
    "ks_test_priority_orders",   # global ECDF window over distinct values
    "kaplan_meier_conversion",   # running log-sum product over event times
    "weighted_median_lineitem",  # per-flag cumulative weight boundary
    "interarrival_burstiness_users",  # keyed lag over (ts, event_id) order
    "jaro_winkler_part_pairs",   # blocked self-join + Arrow pair scoring
    "content_fingerprints",      # Arrow winnowing UDF batch boundaries
    # round 6: bucket-offset rank/cumsum rewrites join the
    # partition-sensitive class (range bucketing + per-bucket windows
    # + broadcast offsets must reproduce the global order exactly
    # under ANY shuffle layout); ks_test + curriculum already above
    "mann_whitney_priority_orders",  # exclusive bucketed cumsum (below)
    "spearman_acctbal_spend",    # doubled ranks from two bucketed cumsums
    "rfm_segmentation_customers",  # exact ntile on three bucketed ranks
    "hybrid_rrf_search",         # heap-cut-then-rank per channel
    "ccnet_quality_buckets",     # sorted-list log accumulation per doc
    # round 6, second batch: partitioned bucket-offset rewrites
    "gini_by_region_orders",     # per-region bucketed ranks + 5-row stats
    "rank_customers_in_segment", # per-segment rank + exact ntile(4)
    "weighted_median_lineitem",  # per-flag partitioned bucketed cumsum
    "pack_sequences_documents",  # per-lang prefix sum via bucket offsets
)


def _rows(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_under_partition_count(spark, name):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        odd = _rows(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "64")
        wide = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert odd == wide, f"{name}: result depends on shuffle partition count"
