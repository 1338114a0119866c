#!/usr/bin/env python3
"""Scale probe #6: the bucket-offset statistical family at 10× orders.

Round 6 replaced the single-partition rank/cumulative windows in
ks_test / mann_whitney / spearman / rfm_segmentation with the
``bucketed_cumsum`` / ``bucketed_row_number`` two-pass forms
(VERDICT r5 #2).  This probe quantifies the before/after at 10× the
sf0.1 fact volume: each query runs in BOTH forms — the registered
bucket-offset plan and an inline reconstruction of the r5
single-partition-window plan — recording wall, worst max/median task
ratio, and spill from the Spark REST API (methodology of probes
#1-#5).  The replica perturbs prices/balances per replica index so the
distinct-value grain keeps growing with volume (the property that made
the global windows fact-sized in the first place).

Usage: python tools/probe_stats_scale.py [--replicas 10]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_sf1_capstones import (  # noqa: E402 - sibling probe helpers
    _rest,
    completed_stages,
    stage_stats,
)

SF_BASE = "/root/testdata/sf0.1"


def longest_task_ms(ui: str, app_id: str, stage_ids, stages) -> int:
    """Max single-task duration across the given stages — THE metric
    the single-partition/low-parallelism window forms fail at scale:
    their sort runs as ONE task whose duration grows with data volume
    on one core, while every bucketed stage's longest task is bounded
    by bucket width."""
    worst = 0
    for sid in stage_ids:
        s = stages.get(sid)
        if not s or s.get("numCompleteTasks", 0) < 1:
            continue
        try:
            q = _rest(
                ui,
                f"/api/v1/applications/{app_id}/stages/{sid}/"
                f"{s['attemptId']}/taskSummary?quantiles=1.0",
            )
            worst = max(worst, int(q["duration"][0]))
        except Exception:
            continue
    return worst


def build_stats_replica(spark, replicas: int, out_dir: str) -> None:
    """orders + customer at replicas× sf0.1 with per-replica key offsets
    and +k cents on prices/balances, so |distinct o_totalprice| and
    |customers| scale with volume (near-unique value grains)."""
    from pyspark.sql import functions as F

    from cid_etl_spark.sources.parquet import load_table

    reps = spark.range(replicas).select(F.col("id").alias("__k"))
    o = load_table(spark, SF_BASE, "orders")
    omax = o.agg(
        F.max("o_orderkey").alias("ok"), F.max("o_custkey").alias("ck")
    ).first()

    def replicate(df, perturb: dict):
        cols = [
            perturb[c].alias(c) if c in perturb else F.col(c)
            for c in df.columns
        ]
        return df.crossJoin(reps).select(*cols)

    orders = replicate(
        o,
        {
            "o_orderkey": F.col("o_orderkey")
            + F.col("__k") * (omax["ok"] + 1),
            "o_custkey": F.col("o_custkey") + F.col("__k") * (omax["ck"] + 1),
            "o_totalprice": F.round(
                F.col("o_totalprice") + F.col("__k") * 0.01, 2
            ),
        },
    )
    orders.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "orders.parquet")
    )
    c = load_table(spark, SF_BASE, "customer")
    cust = replicate(
        c,
        {
            "c_custkey": F.col("c_custkey") + F.col("__k") * (omax["ck"] + 1),
            "c_acctbal": F.round(
                F.col("c_acctbal") + F.col("__k") * 0.01, 2
            ),
        },
    )
    cust.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out_dir, "customer.parquet")
    )
    li = load_table(spark, SF_BASE, "lineitem")
    lmax = li.agg(F.max("l_orderkey").alias("ok")).first()
    lrep = replicate(
        li,
        {
            "l_orderkey": F.col("l_orderkey")
            + F.col("__k") * (lmax["ok"] + 1),
            # +k/100 cents per replica: distinct extended prices grow
            # with volume, keeping the (flag, cents) grain fact-sized
            "l_extendedprice": F.round(
                F.col("l_extendedprice") + F.col("__k") * 0.01, 2
            ),
        },
    )
    lrep.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "lineitem.parquet")
    )


# --- inline reconstructions of the r5 single-partition forms ---------


def ks_naive(spark, sf_dir):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from cid_etl_spark.sources.parquet import load_table

    o = load_table(spark, sf_dir, "orders")
    pool = o.select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1))
        .otherwise(F.lit(0))
        .alias("g"),
    )
    tot = pool.agg(
        F.sum("g").alias("n1"), F.sum(F.lit(1) - F.col("g")).alias("n0")
    )
    by_v = pool.groupBy("v").agg(
        F.sum("g").alias("c1"), F.sum(F.lit(1) - F.col("g")).alias("c0")
    )
    w = Window.orderBy("v")
    cum = by_v.select(
        F.sum("c1").over(w).alias("a1"), F.sum("c0").over(w).alias("a0")
    )
    return (
        cum.join(F.broadcast(tot))
        .groupBy("n1", "n0")
        .agg(
            F.round(
                F.max(
                    F.abs(F.col("a1") * F.col("n0") - F.col("a0") * F.col("n1"))
                ).cast("double")
                / (F.col("n1") * F.col("n0")),
                6,
            ).alias("ks_stat")
        )
    )


def mwu_naive(spark, sf_dir):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from cid_etl_spark.sources.parquet import load_table

    o = load_table(spark, sf_dir, "orders")
    pool = o.select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1))
        .otherwise(F.lit(0))
        .alias("g"),
    )
    by_v = pool.groupBy("v").agg(
        F.sum("g").alias("c1"), F.count(F.lit(1)).alias("ct")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = by_v.select(
        "c1", "ct", F.coalesce(F.sum("ct").over(w), F.lit(0)).alias("below")
    )
    return cum.agg(
        F.sum(F.col("c1") * (2 * F.col("below") + F.col("ct") + 1)).alias(
            "two_r1"
        )
    )


def spearman_naive(spark, sf_dir):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from cid_etl_spark.sources.parquet import load_table

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    xy = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_custkey").alias("k"), F.col("c_acctbal").alias("x"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "y"
            )
        )
    )

    def doubled_ranks(df, col):
        byv = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return byv.select(
            col,
            (
                2 * F.coalesce(F.sum("cnt").over(w), F.lit(0))
                + F.col("cnt")
                + 1
            ).alias(f"t{col}"),
        )

    ranked = (
        xy.join(doubled_ranks(xy, "x"), "x")
        .join(doubled_ranks(xy, "y"), "y")
        .select("tx", "ty")
    )
    return ranked.agg(
        F.sum(F.col("tx").cast("decimal(38,0)") * F.col("ty")).alias("sxy")
    )


def rfm_naive(spark, sf_dir):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from cid_etl_spark.sources.parquet import load_table

    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("monetary"),
    )
    r_w = Window.orderBy("last_order", "o_custkey")
    f_w = Window.orderBy("frequency", "o_custkey")
    m_w = Window.orderBy("monetary", "o_custkey")
    return base.select(
        (
            F.ntile(5).over(r_w) * 100
            + F.ntile(5).over(f_w) * 10
            + F.ntile(5).over(m_w)
        ).alias("rfm_code")
    )


def wm_naive(spark, sf_dir):
    """The r5 weighted_median form: per-flag cumulative window +
    whole-partition total — one sort task per return flag (3 flags)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from cid_etl_spark.sources.parquet import load_table

    li = load_table(spark, sf_dir, "lineitem")
    w = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    g = w.groupBy("flag", "cents").agg(F.sum("q").alias("qsum"))
    part = Window.partitionBy("flag")
    c = g.select(
        "flag",
        "cents",
        F.sum("qsum").over(part.orderBy("cents")).alias("cw"),
        F.sum("qsum").over(part).alias("tot"),
    )
    return (
        c.where(2 * F.col("cw") >= F.col("tot"))
        .groupBy("flag")
        .agg(
            F.round(F.min("cents") / 100.0, 2).alias("weighted_median"),
            F.max("tot").cast("bigint").alias("total_weight"),
        )
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cid_etl_spark.queries import spark_queries
    from cid_etl_spark.session import get_spark

    spark = get_spark("stats-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    q = spark_queries()

    probe_dir = tempfile.mkdtemp(prefix="cid_etl_statsprobe_")
    build_stats_replica(spark, args.replicas, probe_dir)
    n_orders = spark.read.parquet(
        os.path.join(probe_dir, "orders.parquet")
    ).count()
    print(f"replica: {args.replicas}x sf0.1 orders = {n_orders} rows")

    # every run reduces to a tiny aggregate so timing excludes driver
    # transfer; rfm (customer-grain output) is rolled up the same way
    cases = {
        "ks_test": (
            lambda d: q["ks_test_priority_orders"](spark, d).agg(
                F.sum("ks_stat")
            ),
            lambda d: ks_naive(spark, d).agg(F.sum("ks_stat")),
        ),
        "mann_whitney": (
            lambda d: q["mann_whitney_priority_orders"](spark, d).agg(
                F.sum("two_u1")
            ),
            lambda d: mwu_naive(spark, d),
        ),
        "spearman": (
            lambda d: q["spearman_acctbal_spend"](spark, d).agg(
                F.sum("spearman_rho")
            ),
            lambda d: spearman_naive(spark, d),
        ),
        "rfm": (
            lambda d: q["rfm_segmentation_customers"](spark, d).agg(
                F.count(F.lit(1)), F.sum("rfm_code")
            ),
            lambda d: rfm_naive(spark, d).agg(
                F.count(F.lit(1)), F.sum("rfm_code")
            ),
        ),
        "weighted_median": (
            lambda d: q["weighted_median_lineitem"](spark, d).agg(
                F.sum("weighted_median"), F.sum("total_weight")
            ),
            lambda d: wm_naive(spark, d).agg(
                F.sum("weighted_median"), F.sum("total_weight")
            ),
        ),
    }

    results = {}
    for name, (fixed, naive) in cases.items():
        results[name] = {}
        for form, fn in (("bucketed", fixed), ("single_partition", naive)):
            fn(probe_dir).first()  # warm: codegen + scheduler
            seen = set(completed_stages(ui, app_id))
            t0 = time.perf_counter()
            fn(probe_dir).first()
            wall = time.perf_counter() - t0
            stages = completed_stages(ui, app_id)
            new_ids = set(stages) - seen
            skew, _sid, spill = stage_stats(ui, app_id, new_ids, stages)
            longest = longest_task_ms(ui, app_id, new_ids, stages)
            results[name][form] = {
                "wall_sec": round(wall, 2),
                "max_over_median_task": round(skew, 1),
                "longest_task_ms": longest,
                "spill_bytes": spill,
            }
            print(
                f"{name:15s} {form:17s} wall={wall:6.2f}s "
                f"max/median_task={skew:.1f} longest_task={longest}ms "
                f"spill={spill}"
            )

    shutil.rmtree(probe_dir, ignore_errors=True)
    print(json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
