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


def test_zorder_write_bounds_file_rectangles(spark, tmp_path):
    """Z-ordered files must cover far smaller (partkey x suppkey)
    rectangles than a round-robin layout — that footer-stat tightness
    IS the data-skipping win, measured here exactly as a scan planner
    would: from the parquet min/max metadata."""
    import pyarrow.parquet as pq

    from cid_etl_spark.sources.parquet import load_table
    from cid_etl_spark.sources.sinks import zorder_write

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_partkey", "l_suppkey")
    zdir, rdir = str(tmp_path / "z"), str(tmp_path / "r")
    zorder_write(li, "l_partkey", "l_suppkey", zdir, n_files=8)
    li.repartition(8).write.mode("overwrite").parquet(rdir)

    def avg_rect_area(d):
        import os

        areas = []
        for f in os.listdir(d):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            for rg in range(md.num_row_groups):
                stats = {
                    md.row_group(rg).column(i).path_in_schema: md.row_group(rg)
                    .column(i)
                    .statistics
                    for i in range(md.row_group(rg).num_columns)
                }
                px = stats["l_partkey"]
                sx = stats["l_suppkey"]
                areas.append(
                    (px.max - px.min + 1) * (sx.max - sx.min + 1)
                )
        return sum(areas) / len(areas)

    z_area, r_area = avg_rect_area(zdir), avg_rect_area(rdir)
    # round-robin files span ~the whole key space; z-ordered files must
    # cover a fraction of it on BOTH dimensions at once
    assert z_area < 0.5 * r_area, (z_area, r_area)

    # and the layout is lossless: same multiset of rows
    a = spark.read.parquet(zdir).groupBy("l_partkey", "l_suppkey").count()
    b = spark.read.parquet(rdir).groupBy("l_partkey", "l_suppkey").count()
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_morton_code_interleaves_bits(spark):
    from pyspark.sql import functions as F

    from cid_etl_spark.sources.sinks import morton_code

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (1023, 1023)], "x long, y long"
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", morton_code("x", "y").alias("z")).collect()
    }

    def ref(x, y):
        z = 0
        for i in range(10):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == ref(x, y), (x, y, z)


def test_partitioned_layout_enables_dynamic_partition_pruning(spark, tmp_path):
    """Hive-partitioned parquet + a selective dim filter must produce a
    DynamicPruning subquery on the fact scan: at 100 TB this is the
    difference between scanning one partition directory and all of
    them when the partition keys arrive only through a join."""
    fact_dir = str(tmp_path / "orders_by_status")
    orders = load_table(spark, SF_SMOKE, "orders", spread=False)
    orders.write.partitionBy("o_orderstatus").parquet(fact_dir)

    fact = spark.read.parquet(fact_dir)
    dim = spark.createDataFrame(
        [("F", "finished"), ("O", "open"), ("P", "pending")],
        "status string, label string",
    ).filter(F.col("label") == "open")
    joined = fact.join(dim, fact.o_orderstatus == dim.status)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan

    # and it actually prunes: only the 'O' partition's rows survive
    got = joined.count()
    expect = orders.filter("o_orderstatus = 'O'").count()
    assert got == expect
