"""ORC source/sink: roundtrip fidelity, pushdown/pruning, partitioning."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cid_etl_spark.sources.orc import read_orc, write_orc
from cid_etl_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_orc_roundtrip(spark, tmp_path):
    nation = load_table(spark, SF_DIR, "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(nation, path)
    back = read_orc(spark, path)
    assert back.schema == nation.schema
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in nation.collect()
    )


def test_orc_pushdown_and_pruning(spark, tmp_path):
    cust = load_table(spark, SF_DIR, "customer")
    path = str(tmp_path / "cust_orc")
    write_orc(cust, path)
    df = read_orc(spark, path).filter(F.col("c_acctbal") > 0).select("c_name")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [IsNotNull(c_acctbal), GreaterThan(c_acctbal,0.0" in plan
    assert "ReadSchema" in plan and "c_comment" not in plan.split("ReadSchema")[1]


def test_orc_hive_partitioned_write(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path, partition_by=["o_orderstatus"])
    dirs = {d for d in os.listdir(path) if d.startswith("o_orderstatus=")}
    assert dirs  # hive layout written
    # partition pruning: scanning one status touches only its directory
    one = read_orc(spark, path).filter(F.col("o_orderstatus") == "F")
    assert one.count() == orders.filter(F.col("o_orderstatus") == "F").count()
