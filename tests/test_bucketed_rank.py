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


def test_null_keys_rank_first_like_a_window(spark):
    # ASC window order puts NULLS FIRST; the range bucketer must send
    # null keys to a bucket that sorts before every non-null bucket
    rows = [Row(v=None if i % 5 == 0 else float(i % 7), tb=i) for i in range(30)]
    df = spark.createDataFrame(rows, "v double, tb long").repartition(4)
    got = {
        r["tb"]: r["rn"]
        for r in bucketed_row_number(
            df, "v", tiebreaks=("tb",), n_buckets=3, id_col="rn"
        ).collect()
    }
    w = Window.orderBy("v", "tb")
    want = {
        r["tb"]: r["rn"]
        for r in df.select("tb", F.row_number().over(w).alias("rn")).collect()
    }
    assert got == want


def test_fuzz_bucketed_rank_and_cumsum_match_windows(spark):
    # hypothesis-style fuzz without per-example Spark jobs (too slow):
    # a few seeded random datasets spanning duplicates, negatives,
    # nulls, constant keys, and group skew
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n = rng.randint(5, 120)
        rows = [
            Row(
                v=None
                if rng.random() < 0.08
                else round(rng.uniform(-50, 50), 1),
                tb=i,
                g=rng.randint(0, 2),
                c=rng.randint(1, 9),
            )
            for i in range(n)
        ]
        df = spark.createDataFrame(
            rows, "v double, tb long, g int, c int"
        ).repartition(5)
        nb = rng.choice([1, 2, 7, 1024])
        got = {
            (r["g"], r["tb"]): r["rn"]
            for r in bucketed_row_number(
                df,
                "v",
                tiebreaks=("tb",),
                n_buckets=nb,
                id_col="rn",
                partition_by=("g",),
            ).collect()
        }
        w = Window.partitionBy("g").orderBy("v", "tb")
        want = {
            (r["g"], r["tb"]): r["rn"]
            for r in df.select(
                "g", "tb", F.row_number().over(w).alias("rn")
            ).collect()
        }
        assert got == want, f"rank mismatch seed={seed} n_buckets={nb}"

        by_v = df.where(F.col("v").isNotNull()).groupBy("g", "v").agg(
            F.sum("c").alias("c")
        )
        got_c = {
            (r["g"], r["v"]): r["cum_c"]
            for r in bucketed_cumsum(
                by_v, "v", ("c",), n_buckets=nb, partition_by=("g",)
            ).collect()
        }
        wc = (
            Window.partitionBy("g")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        want_c = {
            (r["g"], r["v"]): r["cum_c"]
            for r in by_v.select(
                "g", "v", F.sum("c").over(wc).alias("cum_c")
            ).collect()
        }
        assert got_c == want_c, f"cumsum mismatch seed={seed} n_buckets={nb}"


def test_assign_contiguous_ids_zero_based_dense(spark, df):
    ids = sorted(
        r["row_id"]
        for r in assign_contiguous_ids(
            df.select(F.col("tb").alias("k")), "k"
        ).collect()
    )
    assert ids == list(range(40))
