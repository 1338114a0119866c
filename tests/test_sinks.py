"""Scale-path sink + skew-join tests: hive-partitioned parquet prunes,
bucketed tables sort-merge-join without an exchange, salted join is
row-identical to the plain join."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cid_etl_spark.operators.joins import salted_join
from cid_etl_spark.sources.parquet import load_table
from cid_etl_spark.sources.sinks import (
    write_parquet_partitioned,
    write_table_bucketed,
)

from .conftest import SF_SMOKE


def test_salted_join_matches_plain_join(spark):
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    right = customer.withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(right, "o_custkey").collect()
    salted = salted_join(orders, right, "o_custkey", salt_buckets=8).collect()
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(salted) == key(plain)


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    right = spark.createDataFrame([(1, "x")], "k int, w string")
    out = salted_join(left, right, "k", how="left", salt_buckets=4).collect()
    got = {(r.k, r.v, r.w) for r in out}
    assert got == {(1, "a", "x"), (2, "b", None)}


def test_partitioned_write_prunes(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "docs_by_lang")
    write_parquet_partitioned(docs, out, partition_by="lang")
    langs = [
        d.split("=", 1)[1]
        for d in os.listdir(out)
        if d.startswith("lang=")
    ]
    assert len(langs) > 1
    back = spark.read.parquet(out).filter(F.col("lang") == langs[0])
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan
    assert back.count() == docs.filter(F.col("lang") == langs[0]).count()


def test_bucketed_tables_join_without_exchange(spark):
    # managed tables land in the session's (static) warehouse dir;
    # dropped at the end, and spark-warehouse/ is gitignored
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    lineitem = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_table_bucketed(orders, "b_orders", "o_orderkey", 8, sort_cols="o_orderkey")
    write_table_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        8,
        sort_cols="o_orderkey",
    )
    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    # force SMJ so the bucketing (not a broadcast) carries the join
    joined = bo.hint("merge").join(bl, "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert joined.count() == orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
    ).count()
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    import glob

    from cid_etl_spark.sources.sinks import compact_parquet

    src = str(tmp_path / "fragmented")
    spark.range(10_000).selectExpr("id", "repeat('x', 100) AS pad").repartition(
        40
    ).write.parquet(src)
    assert len(glob.glob(src + "/part-*")) == 40

    dst = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, dst, target_file_bytes=10 * 1024 * 1024)
    files = glob.glob(dst + "/part-*")
    assert len(files) == n == 1
    assert spark.read.parquet(dst).count() == 10_000


def test_observed_quality_counts_without_extra_pass(spark):
    from cid_etl_spark.operators.aggregates import observed_quality

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "d")], "id long, v string"
    )
    observed, obs = observed_quality(df, "qc", "v")
    assert observed.count() == 4  # the action that populates the metrics
    assert obs.get == {"total": 4, "missing": 2}
