"""The bucket-offset two-pass rank/cumsum helpers must reproduce the
single-partition global window EXACTLY — they exist so fact-grain
cumulative statistics (ECDFs, rank sums, ntile buckets) never funnel
through one sort partition (VERDICT r5 #2).  Equivalence is asserted
against the plain ``Window.orderBy`` forms on inputs engineered for
the edge cases: heavy ties, a constant key (hi == lo bucket path),
more buckets than rows, and n_buckets=2 (maximal offset mixing).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cid_etl_spark.operators.aggregates import (
    assign_contiguous_ids,
    bucketed_cumsum,
    bucketed_row_number,
)


def _values(i: int) -> float:
    # deterministic, collision-rich: 40 rows over 13 distinct values
    return float((i * 7) % 13)


@pytest.fixture(scope="module")
def df(spark):
    rows = [Row(v=_values(i), tb=i, c=(i % 3) + 1) for i in range(40)]
    return spark.createDataFrame(rows).repartition(7)


@pytest.mark.parametrize("n_buckets", [2, 5, 1024])
def test_bucketed_row_number_matches_global_window(spark, df, n_buckets):
    got = {
        r["tb"]: r["rn"]
        for r in bucketed_row_number(
            df, "v", tiebreaks=("tb",), n_buckets=n_buckets, id_col="rn"
        ).collect()
    }
    w = Window.orderBy("v", "tb")
    want = {
        r["tb"]: r["rn"]
        for r in df.select("tb", F.row_number().over(w).alias("rn")).collect()
    }
    assert got == want


@pytest.mark.parametrize("inclusive", [True, False])
@pytest.mark.parametrize("n_buckets", [2, 1024])
def test_bucketed_cumsum_matches_global_window(spark, df, inclusive, n_buckets):
    # distinct-value grain input, as the contract requires
    by_v = df.groupBy("v").agg(F.sum("c").alias("c"))
    got = {
        r["v"]: r["cum_c"]
        for r in bucketed_cumsum(
            by_v, "v", ("c",), n_buckets=n_buckets, inclusive=inclusive
        ).collect()
    }
    upper = 0 if inclusive else -1
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, upper)
    want = {
        r["v"]: r["cum_c"]
        for r in by_v.select(
            "v", F.coalesce(F.sum("c").over(w), F.lit(0)).alias("cum_c")
        ).collect()
    }
    assert got == want


def test_constant_key_all_one_bucket(spark):
    rows = [Row(v=3.0, tb=i, c=1) for i in range(9)]
    df = spark.createDataFrame(rows).repartition(4)
    ranked = bucketed_row_number(df, "v", tiebreaks=("tb",), id_col="rn")
    assert sorted(r["rn"] for r in ranked.collect()) == list(range(1, 10))
    cum = bucketed_cumsum(
        df.groupBy("v").agg(F.sum("c").alias("c")), "v", ("c",)
    ).collect()
    assert len(cum) == 1 and cum[0]["cum_c"] == 9


@pytest.mark.parametrize("n_buckets", [2, 1024])
def test_partitioned_row_number_matches_keyed_window(spark, df, n_buckets):
    # low-cardinality group key (3 values) — one rank sequence per group
    g = df.withColumn("grp", (F.col("tb") % 3).cast("int"))
    got = {
        (r["grp"], r["tb"]): r["rn"]
        for r in bucketed_row_number(
            g,
            "v",
            tiebreaks=("tb",),
            n_buckets=n_buckets,
            id_col="rn",
            partition_by=("grp",),
        ).collect()
    }
    w = Window.partitionBy("grp").orderBy("v", "tb")
    want = {
        (r["grp"], r["tb"]): r["rn"]
        for r in g.select(
            "grp", "tb", F.row_number().over(w).alias("rn")
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("inclusive", [True, False])
def test_partitioned_cumsum_matches_keyed_window(spark, df, inclusive):
    g = df.withColumn("grp", (F.col("tb") % 3).cast("int"))
    by_v = g.groupBy("grp", "v").agg(F.sum("c").alias("c"))
    got = {
        (r["grp"], r["v"]): r["cum_c"]
        for r in bucketed_cumsum(
            by_v,
            "v",
            ("c",),
            n_buckets=2,
            inclusive=inclusive,
            partition_by=("grp",),
        ).collect()
    }
    upper = 0 if inclusive else -1
    w = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    want = {
        (r["grp"], r["v"]): r["cum_c"]
        for r in by_v.select(
            "grp",
            "v",
            F.coalesce(F.sum("c").over(w), F.lit(0)).alias("cum_c"),
        ).collect()
    }
    assert got == want


def test_assign_contiguous_ids_zero_based_dense(spark, df):
    ids = sorted(
        r["row_id"]
        for r in assign_contiguous_ids(
            df.select(F.col("tb").alias("k")), "k"
        ).collect()
    )
    assert ids == list(range(40))
