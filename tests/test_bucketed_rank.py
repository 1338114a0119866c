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


def test_null_group_keys_form_their_own_group(spark):
    # Window.partitionBy keeps NULL as its own partition; the helpers'
    # rollup joins must be null-safe or those rows silently vanish
    # (ADVICE r6, medium)
    rows = [
        Row(g=None if i % 4 == 0 else f"g{i % 3}", v=float(i % 7), tb=i, c=1)
        for i in range(36)
    ]
    df = spark.createDataFrame(rows, "g string, v double, tb long, c int")
    df = df.repartition(5)
    ranked = bucketed_row_number(
        df, "v", tiebreaks=("tb",), n_buckets=4, id_col="rn",
        partition_by=("g",),
    )
    assert ranked.count() == 36  # no rows dropped
    got = {(r["g"], r["tb"]): r["rn"] for r in ranked.collect()}
    w = Window.partitionBy("g").orderBy("v", "tb")
    want = {
        (r["g"], r["tb"]): r["rn"]
        for r in df.select("g", "tb", F.row_number().over(w).alias("rn")).collect()
    }
    assert got == want

    by_v = df.groupBy("g", "v").agg(F.sum("c").alias("c"))
    cum = bucketed_cumsum(by_v, "v", ("c",), n_buckets=4, partition_by=("g",))
    assert cum.count() == by_v.count()
    got_c = {(r["g"], r["v"]): r["cum_c"] for r in cum.collect()}
    wc = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want_c = {
        (r["g"], r["v"]): r["cum_c"]
        for r in by_v.select("g", "v", F.sum("c").over(wc).alias("cum_c")).collect()
    }
    assert got_c == want_c


@pytest.mark.parametrize("dist", ["zipf", "lognormal"])
def test_skewed_keys_stay_balanced_and_exact(spark, dist):
    # VERDICT r6 #1: the old min/max equi-width edges collapsed under a
    # heavy tail (lognormal outlier max → every row in one bucket).
    # Equi-depth edges must (a) still rank exactly and (b) bound the
    # largest bucket near rows/n_buckets + the hottest duplicate key.
    import random

    rng = random.Random(4242)
    n = 4000
    if dist == "zipf":
        vals = [float(min(int(rng.paretovariate(0.5)), 10**6)) for _ in range(n)]
    else:
        vals = [rng.lognormvariate(0, 2.5) for _ in range(n)]
        vals[0] = max(vals) * 1e6  # the outlier that kills equi-width
    rows = [Row(v=vals[i], tb=i) for i in range(n)]
    df = spark.createDataFrame(rows, "v double, tb long").repartition(8)
    nb = 64
    from cid_etl_spark.operators.aggregates import _range_bucketed

    counts = (
        _range_bucketed(df, F.col("v"), nb)
        .groupBy("__bucket")
        .count()
        .collect()
    )
    from collections import Counter

    max_key_freq = max(Counter(vals).values())
    max_bucket = max(r["count"] for r in counts)
    # bound: ~2× the ideal depth, or the irreducible hottest key
    assert max_bucket <= max(2 * (n // nb) + 1, max_key_freq), (
        f"{dist}: max bucket {max_bucket} vs ideal {n // nb}, "
        f"hottest key {max_key_freq}"
    )
    # exactness under the same skew
    got = {
        r["tb"]: r["rn"]
        for r in bucketed_row_number(
            df, "v", tiebreaks=("tb",), n_buckets=nb, id_col="rn"
        ).collect()
    }
    w = Window.orderBy("v", "tb")
    want = {
        r["tb"]: r["rn"]
        for r in df.select("tb", F.row_number().over(w).alias("rn")).collect()
    }
    assert got == want


def test_exact_ntile_matches_builtin(spark):
    # shared arithmetic extracted from rfm/ccnet/curriculum/rank_
    # customers (ADVICE r6): must be bit-identical to F.ntile(k) on a
    # total (tie-broken) order, across n % k == 0 and != 0 and n < k
    from cid_etl_spark.operators.aggregates import exact_ntile

    for n, k in ((40, 5), (37, 4), (3, 8), (16, 16), (1, 3)):
        rows = [Row(v=float((i * 11) % 19), tb=i) for i in range(n)]
        df = spark.createDataFrame(rows, "v double, tb long").repartition(3)
        w = Window.orderBy("v", "tb")
        total = df.agg(F.count(F.lit(1)).alias("__n"))
        got = {
            r["tb"]: r["nt"]
            for r in df.select("tb", F.row_number().over(w).alias("__r"))
            .join(F.broadcast(total))
            .select("tb", exact_ntile(F.col("__r"), F.col("__n"), k).alias("nt"))
            .collect()
        }
        want = {
            r["tb"]: r["nt"]
            for r in df.select("tb", F.ntile(k).over(w).alias("nt")).collect()
        }
        assert got == want, f"ntile mismatch n={n} k={k}"


def test_assign_contiguous_ids_zero_based_dense(spark, df):
    ids = sorted(
        r["row_id"]
        for r in assign_contiguous_ids(
            df.select(F.col("tb").alias("k")), "k"
        ).collect()
    )
    assert ids == list(range(40))


def test_adaptive_n_buckets_tiers(spark):
    """Round-8 adaptive default (VERDICT r7 #1): small plan estimates
    resolve to the single flat level, unavailable estimates fall back
    to the safe LARGE tier, and the estimate itself is bounded by the
    LEAF-scan sum (Catalyst's default join estimate multiplies child
    sizes; the leaf sum is what actually grows at scale)."""
    from cid_etl_spark.operators.aggregates import (
        _ADAPTIVE_LARGE_BUCKETS,
        _ADAPTIVE_TINY_BUCKETS,
        _adaptive_n_buckets,
        _plan_size_bytes,
    )
    from cid_etl_spark.sources.parquet import load_table

    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    assert _adaptive_n_buckets(o) == _ADAPTIVE_TINY_BUCKETS
    # a self-join would multiply the top-level estimate; the leaf-sum
    # bound keeps the resolved size within what the plan reads
    j = o.alias("a").join(
        load_table(spark, "/root/testdata/sf0.001", "orders").alias("b"),
        F.col("a.o_custkey") == F.col("b.o_custkey"),
    )
    size = _plan_size_bytes(j)
    assert size is not None and size < 64 << 20
    assert _adaptive_n_buckets(j) == _ADAPTIVE_TINY_BUCKETS
    # estimate unavailable -> the safe big tier
    class _Broken:
        class _J:
            def queryExecution(self):
                raise RuntimeError("no plan")

        _jdf = _J()

    assert _adaptive_n_buckets(_Broken()) == _ADAPTIVE_LARGE_BUCKETS


def test_plan_size_scales_up_for_generate(spark):
    """ADVICE r8 #3: neither the top estimate nor the leaf sum sees
    generator fan-out (Generate stats don't grow past the child, leaf
    bytes are compressed), so an explode-fed plan's estimate is scaled
    by the fan-out allowance — erring toward the bigger, sort-safe
    tier."""
    from cid_etl_spark.operators.aggregates import (
        _GENERATE_FANOUT_ALLOWANCE,
        _plan_size_bytes,
    )
    from cid_etl_spark.sources.parquet import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    flat = d.select("doc_id", "text")
    exploded = d.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    base = _plan_size_bytes(flat)
    grown = _plan_size_bytes(exploded)
    assert base is not None and grown is not None
    # the exploded plan reads a subset of the same leaf yet estimates
    # LARGER by exactly the allowance factor over its own min-bound
    assert grown >= base
    assert grown % _GENERATE_FANOUT_ALLOWANCE == 0


def test_generate_allowance_per_node_and_short_circuits(spark):
    """ADVICE r9 #4: the fan-out allowance is applied PER Generate node
    (stacked explodes multiply), and the py4j plan walk is skipped or
    cut short once the tier is already decided — a plan past the LARGE
    threshold never pays the traversal, and the walk stops at the
    first node that pushes the estimate across it."""
    from cid_etl_spark.operators.aggregates import (
        _ADAPTIVE_SIZE_THRESHOLD,
        _GENERATE_FANOUT_ALLOWANCE,
        _generate_allowance,
    )
    from cid_etl_spark.sources.parquet import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    nested = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .select(F.explode(F.split("w", "")).alias("c"))
    )
    plan = nested._jdf.queryExecution().optimizedPlan()
    # two stacked Generates: allowance multiplies per node
    assert _generate_allowance(plan, 1) == _GENERATE_FANOUT_ALLOWANCE ** 2
    # estimate already past the LARGE edge: walk skipped entirely
    assert _generate_allowance(plan, _ADAPTIVE_SIZE_THRESHOLD + 1) == 1
    # first node already crosses the edge: walk stops at one factor
    assert (
        _generate_allowance(plan, _ADAPTIVE_SIZE_THRESHOLD)
        == _GENERATE_FANOUT_ALLOWANCE
    )
    # explode-free plan: multiplier is exactly 1
    flat = d.select("doc_id")._jdf.queryExecution().optimizedPlan()
    assert _generate_allowance(flat, 1) == 1
    # a Generate BURIED under an Aggregate is not live: the
    # aggregation collapses the fan-out back to group grain, so the
    # allowance must not fire (the pretraining pack-stage case — its
    # quota-bounded doc-grain input carries 8 buried Generates and the
    # naive per-node form cost 1.7× by flipping it to the hybrid tier)
    buried = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id")
        .count()
    )._jdf.queryExecution().optimizedPlan()
    assert _generate_allowance(buried, 1) == 1
    # ...while an explode ABOVE the aggregate stays live
    relive = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id")
        .agg(F.collect_list("w").alias("ws"))
        .select(F.explode("ws").alias("w"))
    )._jdf.queryExecution().optimizedPlan()
    assert _generate_allowance(relive, 1) == _GENERATE_FANOUT_ALLOWANCE


def test_bucketed_helpers_bit_identical_across_tiers(spark, df):
    """The tier choice must never change VALUES: ranks and cumsums for
    n_buckets 8 / 32 / 1024 / adaptive are identical (the monotone
    bucket-composition argument, pinned)."""
    from cid_etl_spark.operators.aggregates import (
        bucketed_cumsum,
        bucketed_row_number,
    )

    base = df.select(F.col("v"), F.col("tb"))
    want = None
    for nb in (8, 32, 1024, None):
        got = sorted(
            (r["tb"], r["row_id"])
            for r in bucketed_row_number(
                base, "v", tiebreaks=("tb",), n_buckets=nb
            ).collect()
        )
        if want is None:
            want = got
        assert got == want, f"rank mismatch at n_buckets={nb}"
    grain = base.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    want = None
    for nb in (8, 32, 1024, None):
        got = sorted(
            (r["v"], r["cum_c"])
            for r in bucketed_cumsum(grain, "v", ("c",), n_buckets=nb).collect()
        )
        if want is None:
            want = got
        assert got == want, f"cumsum mismatch at n_buckets={nb}"
