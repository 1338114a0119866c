"""Semantic unit tests for the round-12 queries (queries/round12.py):
brute-force cross-checks and closed-form properties, independent of
the DuckDB oracle (tests/test_oracle_parity.py covers the oracle
hash-match at sf0.001; these pin the MATH), plus the physical-plan
pin for the grouped-agg pandas UDF surface (VERDICT r11 #5)."""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd

from .conftest import SF_SMOKE


def test_grouped_agg_plan_has_one_aggregate_in_pandas(spark):
    """VERDICT r11 #5's done-criterion: the registered query's plan
    runs the UDAF as ONE AggregateInPandas stage (the grouped-agg
    pandas eval type), with the sibling exact-count aggregate joined
    back broadcast — not a fallback to grouped-map or a collect."""
    from cid_etl_spark.queries.round12 import weighted_geomean_grouped_agg

    plan = (
        weighted_geomean_grouped_agg(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # Spark 3 printed this node as AggregateInPandas; Spark 4.1 renamed
    # it ArrowAggregatePython — same PythonEvalType (grouped-agg UDF)
    n_udaf = plan.count("ArrowAggregatePython") + plan.count(
        "AggregateInPandas"
    )
    assert n_udaf == 1, plan
    assert "BroadcastHashJoin" in plan, plan


def test_weighted_geomean_matches_bruteforce(spark, duck):
    """Per-group result equals a pure-Python weighted geometric mean
    on the same quantized inputs (micro-int terms, min/cap free)."""
    from cid_etl_spark.queries.round12 import weighted_geomean_grouped_agg

    rows = duck.execute(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(round(l_extendedprice*100) AS BIGINT),
               CAST(round(l_quantity) AS BIGINT)
        FROM lineitem
        """
    ).fetchall()
    sums: dict[tuple, list[int]] = defaultdict(lambda: [0, 0, 0])
    for rf, ls, cents, w in rows:
        acc = sums[(rf, ls)]
        acc[0] += round(math.log(cents) * 1_000_000) * w
        acc[1] += w
        acc[2] += 1
    expected = {
        k: (v[2], v[1], round(math.exp((v[0] / v[1]) / 1_000_000) / 100, 2))
        for k, v in sums.items()
    }
    got = {
        (r["l_returnflag"], r["l_linestatus"]): (
            r["n_items"], r["sum_qty"], r["geomean_price"]
        )
        for r in (
            weighted_geomean_grouped_agg(spark, SF_SMOKE)
            .toPandas()
            .to_dict("records")
        )
    }
    assert got == expected


def test_geomean_between_min_and_max_price(spark):
    """Closed-form sanity: a weighted geometric mean lies strictly
    inside [min, max] of the underlying prices per group."""
    from cid_etl_spark.queries.round12 import weighted_geomean_grouped_agg
    from cid_etl_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    bounds = {
        (r["l_returnflag"], r["l_linestatus"]): (r["lo"], r["hi"])
        for r in load_table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .toPandas()
        .to_dict("records")
    }
    for r in (
        weighted_geomean_grouped_agg(spark, SF_SMOKE).toPandas().to_dict("records")
    ):
        lo, hi = bounds[(r["l_returnflag"], r["l_linestatus"])]
        assert lo <= r["geomean_price"] <= hi


def test_skipgram_counts_match_bruteforce(spark, duck):
    """Top-k skip-gram pairs equal a pure-Python +1/+2 window count
    with the same (count desc, pair asc) cut."""
    from cid_etl_spark.queries.round12 import (
        _SKIPGRAM_K,
        skipgram_cooccurrence_topk,
    )

    docs = duck.execute(
        "SELECT text FROM documents WHERE length(trim(text)) > 0"
    ).fetchall()
    counts: dict[tuple[str, str], int] = defaultdict(int)
    for (text,) in docs:
        toks = text.strip().lower().split()
        for i, t in enumerate(toks):
            for d in (1, 2):
                if i + d < len(toks):
                    counts[(t, toks[i + d])] += 1
    expected = sorted(
        ((n, w1, w2) for (w1, w2), n in counts.items()),
        key=lambda x: (-x[0], x[1], x[2]),
    )[:_SKIPGRAM_K]
    got = [
        (r["n_cooc"], r["w1"], r["w2"])
        for r in skipgram_cooccurrence_topk(spark, SF_SMOKE)
        .toPandas()
        .to_dict("records")
    ]
    assert sorted(got, key=lambda x: (-x[0], x[1], x[2])) == expected


def test_welch_matches_scipy_style_reference(spark, duck):
    """t and df equal the textbook Welch formulas computed in pure
    Python on the quantized (cents) samples."""
    from cid_etl_spark.queries.round12 import welch_t_test_click_purchase

    def sample(t):
        return [
            r[0]
            for r in duck.execute(
                "SELECT CAST(round(value*100) AS BIGINT) FROM events "
                f"WHERE event_type = '{t}'"
            ).fetchall()
        ]

    a, b = sample("click"), sample("purchase")
    n1, n2 = len(a), len(b)
    m1, m2 = sum(a) / n1, sum(b) / n2
    v1 = (sum(x * x for x in a) - m1 * sum(a)) / (n1 - 1)
    v2 = (sum(x * x for x in b) - m2 * sum(b)) / (n2 - 1)
    se1, se2 = v1 / n1, v2 / n2
    t_ref = (m1 - m2) / math.sqrt(se1 + se2)
    df_ref = (se1 + se2) ** 2 / (se1**2 / (n1 - 1) + se2**2 / (n2 - 1))
    row = welch_t_test_click_purchase(spark, SF_SMOKE).toPandas().iloc[0]
    assert row["n_click"] == n1 and row["n_purchase"] == n2
    assert abs(row["t_stat"] - t_ref) < 1e-5
    assert abs(row["df_welch"] - df_ref) < 1e-3
    # df bound: min(n1,n2)-1 <= df <= n1+n2-2 (Welch-Satterthwaite)
    assert min(n1, n2) - 1 <= row["df_welch"] <= n1 + n2 - 2


def test_cramers_v_matches_bruteforce_and_bounds(spark, duck):
    """chi2 (with structural zeros) and V equal a pure-Python
    contingency computation; V in [0, 1]."""
    from cid_etl_spark.queries.round12 import cramers_v_categorical

    rows = duck.execute(
        """
        SELECT o_orderpriority, o_orderstatus, c_mktsegment
        FROM orders JOIN customer ON o_custkey = c_custkey
        """
    ).fetchall()
    pairs = {
        "priority_status": [(r[0], r[1]) for r in rows],
        "priority_segment": [(r[0], r[2]) for r in rows],
        "status_segment": [(r[1], r[2]) for r in rows],
    }
    expected = {}
    for name, ab in pairs.items():
        n = len(ab)
        cells: dict[tuple, int] = defaultdict(int)
        ra: dict[str, int] = defaultdict(int)
        cb: dict[str, int] = defaultdict(int)
        for a, b in ab:
            cells[(a, b)] += 1
            ra[a] += 1
            cb[b] += 1
        chi2 = 0.0
        for a in ra:
            for b in cb:
                e = ra[a] * cb[b] / n
                o = cells.get((a, b), 0)
                chi2 += (o - e) ** 2 / e
        v = math.sqrt(chi2 / (n * (min(len(ra), len(cb)) - 1)))
        expected[name] = (n, len(ra), len(cb), chi2, v)
    for r in cramers_v_categorical(spark, SF_SMOKE).toPandas().to_dict("records"):
        n, rr, cc, chi2, v = expected[r["pair"]]
        assert (r["n_rows"], r["r"], r["c"]) == (n, rr, cc)
        assert abs(r["chi2"] - chi2) < 1e-4
        assert abs(r["cramers_v"] - v) < 1e-6
        assert 0.0 <= r["cramers_v"] <= 1.0


def test_hill_matches_bruteforce_and_tie_identity(spark, duck):
    """alpha equals the pure-Python Hill estimator on the top-(k+1)
    order statistics, and the sum-over-all-(k+1)-rows formulation is
    tie-safe by the x/x ratio identity."""
    from cid_etl_spark.queries.round12 import _HILL_K, hill_tail_index_prices

    cents = sorted(
        (
            r[0]
            for r in duck.execute(
                "SELECT CAST(round(o_totalprice*100) AS BIGINT) FROM orders"
            ).fetchall()
        ),
        reverse=True,
    )
    top = cents[: _HILL_K + 1]
    x_tail = float(min(top))
    s = sum(math.log(c / x_tail) for c in top)
    row = hill_tail_index_prices(spark, SF_SMOKE).toPandas().iloc[0]
    assert row["k"] == _HILL_K
    assert abs(row["sum_log_ratio"] - s) < 1e-5
    assert abs(row["alpha_hill"] - _HILL_K / s) < 1e-5
    assert row["tail_price"] == round(x_tail / 100, 2)


def test_kfold_partition_and_leakage(spark):
    """Folds partition the orders exactly, every fold is non-empty,
    revenue shares sum to 1, and the leakage count is 0 (a customer's
    fold is a pure hash of the customer key)."""
    from cid_etl_spark.queries.round12 import _KFOLD_N, group_kfold_split_audit
    from cid_etl_spark.sources.parquet import load_table

    pdf = group_kfold_split_audit(spark, SF_SMOKE).toPandas()
    assert len(pdf) == _KFOLD_N
    assert set(pdf["fold"]) == set(range(_KFOLD_N))
    n_orders = load_table(spark, SF_SMOKE, "orders").count()
    assert pdf["n_orders"].sum() == n_orders
    assert (pdf["leaky_customers"] == 0).all()
    assert abs(pdf["revenue_share"].sum() - 1.0) < 1e-4
    assert (pdf["n_orders"] > 0).all()


def test_preference_pairs_extremes(spark, duck):
    """chosen/rejected are the true per-lang quality extremes with the
    documented tiebreaks, and chosen != rejected on every pair."""
    from cid_etl_spark.queries.round12 import preference_pairs_by_quality
    from cid_etl_spark.queries import quality_score_documents

    q = {
        r["doc_id"]: r["quality"]
        for r in quality_score_documents(spark, SF_SMOKE)
        .toPandas()
        .to_dict("records")
    }
    langs = duck.execute("SELECT doc_id, lang FROM documents").fetchall()
    by_lang: dict[str, list[tuple[float, int]]] = defaultdict(list)
    for doc_id, lang in langs:
        by_lang[lang].append((q[doc_id], doc_id))
    got = {
        r["lang"]: r
        for r in preference_pairs_by_quality(spark, SF_SMOKE)
        .toPandas()
        .to_dict("records")
    }
    for lang, docs in by_lang.items():
        if len(docs) < 2:
            assert lang not in got
            continue
        chosen = min(docs, key=lambda t: (-t[0], t[1]))
        rejected = min(docs, key=lambda t: (t[0], -t[1]))
        r = got[lang]
        assert (r["chosen_quality"], r["chosen_doc"]) == chosen
        assert (r["rejected_quality"], r["rejected_doc"]) == rejected
        assert r["chosen_doc"] != r["rejected_doc"]
        assert r["quality_gap"] >= 0


def test_markov_stationary_is_fixed_point(spark, duck):
    """The registered 8-iteration vector equals a numpy power
    iteration on the empirical transition matrix, sums to 1, and is
    (near-)invariant under one more application of the matrix —
    the fixed-point property that DEFINES stationarity."""
    import numpy as np

    from cid_etl_spark.queries.round12 import (
        _MARKOV_ITERS,
        markov_stationary_events,
    )

    rows = duck.execute(
        """
        WITH seq AS (
          SELECT event_type,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS nxt
          FROM events
        )
        SELECT event_type, nxt, count(*) FROM seq
        WHERE nxt IS NOT NULL GROUP BY 1, 2
        """
    ).fetchall()
    states = sorted({r[0] for r in rows})
    idx = {s: i for i, s in enumerate(states)}
    mat = np.zeros((len(states), len(states)))
    for a, b, n in rows:
        mat[idx[a], idx[b]] = n
    mat = mat / mat.sum(axis=1, keepdims=True)
    v = np.full(len(states), 1.0 / len(states))
    for _ in range(_MARKOV_ITERS):
        v = v @ mat
    got = {
        r["state"]: r["stationary_p"]
        for r in markov_stationary_events(spark, SF_SMOKE)
        .toPandas()
        .to_dict("records")
    }
    assert set(got) == set(states)
    for s in states:
        assert abs(got[s] - v[idx[s]]) < 1e-5
    total = sum(got.values())
    assert abs(total - 1.0) < 1e-4
    v2 = v @ mat
    assert np.abs(v2 - v).max() < 1e-3  # converged: one more step is a no-op


def test_conformal_coverage_guarantee_and_order_stat(spark, duck):
    """Split-conformal invariants: q_hat is exactly the
    ceil((n+1)(1-alpha))-th smallest calibration score (pure-Python
    order statistic on the same quantized values), coverage on the
    eval split is >= 1 - alpha - slack (the finite-sample conformal
    guarantee holds in expectation; md5 split is exchangeable here),
    and k/alpha are consistent."""
    import math as m

    from cid_etl_spark.queries.round12 import (
        _CONF_ALPHAS,
        conformal_threshold_classifier,
    )
    from cid_etl_spark.queries import quality_classifier_score  # noqa: F401

    rows = (
        conformal_threshold_classifier(spark, SF_SMOKE).toPandas().to_dict("records")
    )
    assert [r["alpha"] for r in rows] == sorted(_CONF_ALPHAS)
    # replicate scores in python via the spark scoring pieces
    from cid_etl_spark.functions.text import quality_score
    from cid_etl_spark.operators.classifier import quality_classifier
    from cid_etl_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text",
        (quality_score("text") >= 0.9).cast("int").alias("label"),
    )
    sc = quality_classifier(d, "doc_id", "text", passthrough=("label",)).select(
        "doc_id",
        F.round(
            (F.when(F.col("label") == 1, 1.0 - F.col("quality_score"))
             .otherwise(F.col("quality_score"))) * 1_000_000
        ).cast("bigint").alias("s"),
        (F.md5(F.col("doc_id").cast("string"))
         < "3333333333333333333333333333333333").alias("calib"),
    ).toPandas()
    calib = sorted(sc[sc["calib"]]["s"])
    ev = list(sc[~sc["calib"]]["s"])
    for r in rows:
        n = len(calib)
        k = m.ceil((n + 1) * (1 - r["alpha"]))
        assert r["n_calib"] == n and r["k"] == k
        q = calib[k - 1]  # k-th smallest
        assert abs(r["q_hat"] - q / 1e6) < 1e-9
        cov = sum(1 for s in ev if s <= q) / len(ev)
        assert abs(r["coverage_eval"] - round(cov, 6)) < 1e-9
        # guarantee direction (allow small finite-sample slack)
        assert r["coverage_eval"] >= 1 - r["alpha"] - 0.05
        assert 1.0 <= r["avg_set_size"] <= 2.0


def test_mcnemar_cells_and_chi2(spark):
    """Cells partition the corpus; chi2 forms match the textbook
    formulas on the exact discordant counts."""
    from cid_etl_spark.queries.round12 import mcnemar_heuristic_vs_classifier
    from cid_etl_spark.sources.parquet import load_table

    r = mcnemar_heuristic_vs_classifier(spark, SF_SMOKE).toPandas().iloc[0]
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert (
        r["both_keep"] + r["heur_only"] + r["clf_only"] + r["neither"] == n_docs
    )
    b, c = int(r["heur_only"]), int(r["clf_only"])
    assert abs(r["chi2"] - (b - c) ** 2 / (b + c)) < 1e-6
    assert abs(r["chi2_cc"] - (abs(b - c) - 1) ** 2 / (b + c)) < 1e-6
    assert r["reject_05"] == ((abs(b - c) - 1) ** 2 / (b + c) > 3.841459)


def test_gini_split_matches_bruteforce(spark, duck):
    """Per feature, the chosen threshold minimizes the exhaustive
    weighted-impurity sweep computed in pure Python."""
    from cid_etl_spark.queries.round12 import gini_best_split_lineitem

    rows = duck.execute(
        """
        SELECT CAST(round(l_quantity) AS BIGINT),
               CAST(round(l_discount*100) AS BIGINT),
               CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END
        FROM lineitem
        """
    ).fetchall()

    def best(feature_idx):
        from collections import Counter

        n_by, pos_by = Counter(), Counter()
        for r in rows:
            n_by[r[feature_idx]] += 1
            pos_by[r[feature_idx]] += r[2]
        vals = sorted(n_by)
        nt = sum(n_by.values())
        pt = sum(pos_by.values())
        nl = pl = 0
        cands = []
        for v in vals[:-1]:
            nl += n_by[v]
            pl += pos_by[v]
            nr, pr = nt - nl, pt - pl
            gl = 1 - (pl / nl) ** 2 - ((nl - pl) / nl) ** 2
            gr = 1 - (pr / nr) ** 2 - ((nr - pr) / nr) ** 2
            cands.append((round((nl * gl + nr * gr) / nt, 6), v, nl, nr))
        return min(cands)

    got = {
        r["feature"]: r
        for r in gini_best_split_lineitem(spark, SF_SMOKE)
        .toPandas()
        .to_dict("records")
    }
    for feat, idx in (("quantity", 0), ("discount_cents", 1)):
        imp, v, nl, nr = best(idx)
        r = got[feat]
        assert (r["impurity"], r["threshold"]) == (imp, v)
        assert (r["n_left"], r["n_right"]) == (nl, nr)
        # a split can only reduce impurity vs the parent
        assert r["impurity"] <= r["gini_parent"] + 1e-9


def test_kendall_tau_matches_bruteforce(spark, duck):
    """tau-b equals a pure-Python pair sweep over the same top-N set,
    and the concordance decomposition covers all pairs."""
    from cid_etl_spark.queries.round12 import (
        _KENDALL_TOP_N,
        kendall_tau_top_customers,
    )

    top = duck.execute(
        f"""
        WITH s AS (
          SELECT o_custkey ck,
                 CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) sp
          FROM orders GROUP BY 1 ORDER BY sp DESC, ck LIMIT {_KENDALL_TOP_N}
        )
        SELECT s.sp, CAST(round(c.c_acctbal*100) AS BIGINT)
        FROM s JOIN customer c ON s.ck = c.c_custkey
        """
    ).fetchall()
    import math as m

    C = D = tx = ty = tb = 0
    for i in range(len(top)):
        for j in range(i + 1, len(top)):
            ds = top[i][0] - top[j][0]
            db = top[i][1] - top[j][1]
            if ds == 0 and db == 0:
                tb += 1
            elif ds == 0:
                tx += 1
            elif db == 0:
                ty += 1
            elif ds * db > 0:
                C += 1
            else:
                D += 1
    n0 = len(top) * (len(top) - 1) // 2
    tau = (C - D) / m.sqrt((n0 - tx - tb) * (n0 - ty - tb))
    r = kendall_tau_top_customers(spark, SF_SMOKE).toPandas().iloc[0]
    assert (r["concordant"], r["discordant"]) == (C, D)
    assert (r["ties_spend"], r["ties_bal"], r["ties_both"]) == (tx, ty, tb)
    assert C + D + tx + ty + tb == n0
    assert abs(r["tau_b"] - round(tau, 6)) < 1e-9
