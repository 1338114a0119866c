"""Invariant tests for the round-2 continuation operators — properties
that must hold regardless of data, complementing the DuckDB oracles
(which pin one dataset) with structural guarantees.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cid_etl_spark.queries import spark_queries

from .conftest import SF_SMOKE

QUERIES = spark_queries()


def test_cdc_merge_is_idempotent_and_delete_complete(spark):
    """Applying the same merged state through another latest-wins pass
    changes nothing (idempotence), no deleted key survives, and every
    surviving key carries exactly one row."""
    merged = QUERIES["cdc_merge_full"](spark, SF_SMOKE).cache()
    # exactly one row per key
    dup = (
        merged.groupBy("o_orderkey").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0
    # no key with a terminal delete survives: keys where o_orderkey%10==7
    # were deleted with the highest sequence number
    assert merged.filter(F.col("o_orderkey") % 10 == 7).count() == 0
    # idempotence: re-running the window over the merged snapshot with
    # equal sequence numbers keeps every row
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_orderkey").orderBy(F.lit(0))
    again = (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    assert again.count() == merged.count()
    merged.unpersist()


def test_bpe_rounds_counts_monotone_and_mergeable(spark):
    """Each chosen pair's count fits the corpus (>0) and counts are
    non-increasing round over round ONLY when the merged token keeps
    competing — but the chosen pair's count must always be the round
    maximum, which implies count_1 >= count_2-after-merge cannot grow
    above the prior winner on unchanged pairs.  We pin the structural
    parts: 3 rounds, positive counts, pairs are distinct tokens."""
    rows = QUERIES["bpe_train_rounds"](spark, SF_SMOKE).collect()
    assert [r.step for r in sorted(rows, key=lambda r: r.step)] == [1, 2, 3]
    for r in rows:
        assert r.pair_count > 0
        assert r.pair_a != r.pair_b


def test_kmeans_assignment_total_and_valid(spark):
    """Every vector gets exactly one cluster; cluster ids come from the
    seed set; cosine stays in [-1, 1]."""
    from cid_etl_spark.sources.parquet import load_table

    out = QUERIES["kmeans_cluster_assign"](spark, SF_SMOKE).cache()
    n_vec = load_table(spark, SF_SMOKE, "embeddings").count()
    assert out.count() == n_vec
    assert out.select("vec_id").distinct().count() == n_vec
    bad_cluster = out.filter(~F.col("cluster_id").between(0, 7)).count()
    assert bad_cluster == 0
    bad_cos = out.filter(~F.col("cosine").between(-1.0, 1.0)).count()
    assert bad_cos == 0
    out.unpersist()


def test_neardup_curation_keeps_subset_and_survivors(spark):
    """The curated corpus is a subset of the input; every duplicate
    CLUSTER keeps exactly its minimum member (survivor rule)."""
    from cid_etl_spark.operators.graph import connected_components
    from cid_etl_spark.queries import minhash_lsh_verified
    from cid_etl_spark.sources.parquet import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    report = QUERIES["neardup_curation_pipeline"](spark, SF_SMOKE)
    kept_total = report.agg(F.sum("n_docs_kept")).collect()[0][0]
    pairs = minhash_lsh_verified(spark, SF_SMOKE).select("id_a", "id_b")
    cc = connected_components(pairs, "id_a", "id_b")
    n_docs = d.count()
    n_dropped = cc.filter(F.col("node") != F.col("cluster_id")).count()
    assert kept_total == n_docs - n_dropped


def test_incremental_maintenance_cutoff_invariance(spark):
    """merge(state, delta) == recompute(all) must hold for ANY cutoff —
    the registered query uses one; here the direct rollup is compared
    against three more cutoffs, including degenerate all-state and
    all-delta splits."""
    from cid_etl_spark.operators.aggregates import money
    from cid_etl_spark.sources.parquet import load_table

    o = load_table(spark, SF_SMOKE, "orders")
    day = F.col("o_orderdate").cast("date").alias("day")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    direct = (
        o.groupBy(day)
        .agg(money(F.sum(price)).alias("revenue"), F.count(F.lit(1)).alias("n"))
    )
    expected = sorted(
        (str(r.day), r.revenue, r.n) for r in direct.collect()
    )
    for cutoff in ("1901-01-01", "1997-06-15", "2301-01-01"):
        c = F.lit(f"{cutoff} 00:00:00").cast("timestamp")
        state = o.filter(F.col("o_orderdate") < c).groupBy(day).agg(
            F.sum(price).alias("r"), F.count(F.lit(1)).alias("k")
        )
        delta = o.filter(F.col("o_orderdate") >= c).groupBy(day).agg(
            F.sum(price).alias("r"), F.count(F.lit(1)).alias("k")
        )
        merged = (
            state.unionByName(delta)
            .groupBy("day")
            .agg(money(F.sum("r")).alias("revenue"), F.sum("k").alias("n"))
        )
        got = sorted((str(r.day), r.revenue, r.n) for r in merged.collect())
        assert got == expected, f"cutoff {cutoff} diverged"


def test_psi_terms_nonnegative_within_bins(spark):
    """PSI terms are non-negative by construction ((p-q)ln(p/q) >= 0
    whenever both shares are clamped positive)."""
    rows = QUERIES["psi_drift_orders"](spark, SF_SMOKE).collect()
    assert rows, "psi produced no bins"
    for r in rows:
        assert r.psi_term >= 0.0, r


def test_gdpr_purge_is_complete_and_minimal(spark):
    """After the purge, no cohort user remains, and non-cohort rows
    are untouched."""
    from cid_etl_spark.sources.parquet import load_table

    e = load_table(spark, SF_SMOKE, "events")
    report = {r.entity: r for r in QUERIES["gdpr_erasure_cascade"](spark, SF_SMOKE).collect()}
    n_cohort_rows = e.filter(F.col("user_id") % 97 == 0).count()
    n_total = e.count()
    assert report["events"].rows_purged == n_cohort_rows
    assert report["events"].rows_kept == n_total - n_cohort_rows
