"""Invariant tests for the round-5 analytics family (oracle parity
pins exact values; these pin the semantic contracts that survive
fixture changes)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cid_etl_spark.queries import spark_queries

SF = "/root/testdata/sf0.001"


def _q(name, spark):
    return spark_queries()[name](spark, SF)


def test_rfm_scores_are_quintiles(spark):
    rows = _q("rfm_segmentation_customers", spark).collect()
    assert rows
    for r in rows:
        assert 1 <= r["r_score"] <= 5 and 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5
        assert r["rfm_code"] == r["r_score"] * 100 + r["f_score"] * 10 + r["m_score"]
    # quintiles are balanced: bucket sizes differ by at most 1
    from collections import Counter

    for col in ("r_score", "f_score", "m_score"):
        sizes = Counter(r[col] for r in rows).values()
        assert max(sizes) - min(sizes) <= 1, (col, sizes)


def test_benford_probabilities_sum_to_one(spark):
    rows = _q("benford_first_digit_orders", spark).collect()
    digits = {r["first_digit"] for r in rows}
    assert digits <= set(range(1, 10))
    assert abs(sum(r["observed_p"] for r in rows) - 1.0) < 1e-3
    # Benford expectation itself sums to 1 over digits 1..9
    assert abs(sum(math.log10(1 + 1 / d) for d in range(1, 10)) - 1.0) < 1e-12


def test_session_entropy_bounds(spark):
    for r in _q("session_entropy_users", spark).collect():
        assert r["type_entropy"] >= -1e-9
        # H <= ln(#types) (uniform maximizes entropy)
        assert r["type_entropy"] <= math.log(r["n_types"]) + 1e-6


def test_knn_vote_winner_has_plurality(spark):
    rows = _q("knn_label_vote_embeddings", spark).collect()
    assert rows
    for r in rows:
        assert 1 <= r["votes"] <= 7


def test_rolling_corr_in_range(spark):
    for r in _q("rolling_corr_daily_events", spark).collect():
        assert -1.0 - 1e-9 <= r["click_purchase_corr"] <= 1.0 + 1e-9
        assert r["n"] == 7


def test_data_profile_counts_consistent(spark):
    rows = {r["col_name"]: r for r in _q("data_profile_orders", spark).collect()}
    assert set(rows) == {
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority",
        "o_orderdate",
    }
    for r in rows.values():
        assert r["n_nonnull"] <= r["n_rows"]
        assert r["n_distinct"] <= r["n_nonnull"]
    assert rows["o_orderkey"]["n_distinct"] == rows["o_orderkey"]["n_rows"]


def test_gini_in_unit_interval(spark):
    rows = _q("gini_by_region_orders", spark).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["gini"] < 1.0


def test_feature_hashing_l1_bounded_by_tokens(spark):
    df = _q("feature_hashing_documents", spark)
    bad = df.filter(
        sum(F.abs(F.col(f"f{i}")) for i in range(16)) > F.col("n_tokens")
    ).count()
    assert bad == 0  # |signed slot sums| can only cancel, never exceed


def test_target_encoding_excludes_self(spark, duck=None):
    import pandas as pd

    enc = _q("target_encode_loo_orders", spark).toPandas()
    # recompute one category's LOO mean by hand
    from cid_etl_spark.sources.parquet import load_table
    from pyspark.sql import SparkSession

    spark_ = SparkSession.getActiveSession()
    o = load_table(spark_, SF, "orders").toPandas()
    o["cents"] = (o["o_totalprice"].astype(float) * 100).round().astype("int64")
    cat = o["o_orderpriority"].iloc[0]
    sub = o[o["o_orderpriority"] == cat]
    row = sub.iloc[0]
    want = round((sub["cents"].sum() - row["cents"]) / (100.0 * (len(sub) - 1)), 4)
    got = enc[enc["o_orderkey"] == row["o_orderkey"]]["loo_target_enc"].iloc[0]
    assert abs(got - want) < 1e-9


def test_cms_never_undercounts_and_top10(spark):
    rows = _q("countmin_heavy_users_events", spark).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["never_undercounts"] is True
        assert r["overcount"] == r["cms_estimate"] - r["exact_n"] >= 0


def test_cusum_single_peak_row(spark):
    rows = _q("cusum_changepoint_orders", spark).collect()
    assert len(rows) == 1
    assert rows[0]["revenue"] > 0


def test_pmi_results_sorted_and_supported(spark):
    rows = _q("pmi_bigrams_tokens", spark).collect()
    assert 0 < len(rows) <= 25
    pmis = [r["pmi"] for r in rows]
    assert pmis == sorted(pmis, reverse=True)
    assert all(r["c12"] >= 5 for r in rows)


# ---------------------------------------------------------------------------
# Vectorized winnowing fast path (functions.text.winnowing_fingerprints)
# ---------------------------------------------------------------------------


def _naive_winnow(data: bytes, k: int = 8, window: int = 4) -> list:
    """Independent pure-Python winnowing reference (Schleimer et al.):
    Horner polynomial k-gram hashes mod 2^64, sliding-window minima,
    sorted signed-int64 distinct — deliberately shares NO code with the
    numpy implementation it pins."""
    from cid_etl_spark.functions.text import _WINNOW_BASE

    M = 1 << 64
    if len(data) >= k:
        grams = []
        for i in range(len(data) - k + 1):
            h = 0
            for b in data[i : i + k]:
                h = (h * _WINNOW_BASE + b) % M
            grams.append(h)
    else:
        h = 0
        for b in data:
            h = (h * _WINNOW_BASE + b) % M
        grams = [h]
    if len(grams) >= window:
        mins = [min(grams[i : i + window]) for i in range(len(grams) - window + 1)]
    else:
        mins = [min(grams)]
    return sorted({m - M if m >= 1 << 63 else m for m in mins})


def test_winnow_numpy_matches_naive_reference():
    import random

    from cid_etl_spark.functions.text import winnow_fingerprints_py

    random.seed(11)
    cases = [
        b"",
        b"a",
        b"abcdefg",          # < k: single whole-string gram
        b"abcdefgh",         # == k: one gram, one window
        b"abcdefghij",       # k < n < k+window-1: fewer grams than window
        b"aaaaaaaaaaaaaaaa", # degenerate repeats collapse to one fp
        "déjà vu déjà vu encoded as utf-8 bytes".encode("utf-8"),
    ]
    cases += [
        bytes(random.randrange(256) for _ in range(random.randrange(0, 300)))
        for _ in range(40)
    ]
    for c in cases:
        assert winnow_fingerprints_py(c) == _naive_winnow(c), c[:24]
    # k/window variants exercise the non-default edge arithmetic too
    for c in cases[:12]:
        assert winnow_fingerprints_py(c, k=5, window=7) == _naive_winnow(
            c, k=5, window=7
        )


def test_winnow_spark_path_matches_reference(spark):
    """The Arrow UDF through a real Spark plan returns exactly the
    reference fingerprints (normalization included: strip spaces,
    lowercase, utf-8 bytes)."""
    from cid_etl_spark.functions.text import winnowing_fingerprints

    texts = [
        "  The Quick Brown Fox Jumps Over the Lazy Dog  ",
        "short",
        "",
        "The quick brown fox jumps over the lazy dog " * 8,
        None,
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    got = {
        r["id"]: r["fps"]
        for r in df.select("id", winnowing_fingerprints("text").alias("fps")).collect()
    }
    for i, t in enumerate(texts):
        if t is None:
            assert got[i] is None
        else:
            assert got[i] == _naive_winnow(t.strip(" ").lower().encode("utf-8"))


def test_content_fingerprints_query_shape(spark):
    rows = _q("content_fingerprints", spark).collect()
    assert rows
    n_by_doc = {r["doc_id"]: r["n_winnow_fps"] for r in rows}
    assert all(n >= 1 for n in n_by_doc.values())
    # fingerprint column is the exact-content xxhash64 (deterministic)
    again = {r["doc_id"]: r["fingerprint"] for r in _q("content_fingerprints", spark).collect()}
    assert again == {r["doc_id"]: r["fingerprint"] for r in rows}


# ---------------------------------------------------------------------------
# Statistical-test rows (KS / OLS trend / chi-square)
# ---------------------------------------------------------------------------


def test_ks_statistic_bounds_and_counts(spark):
    rows = _q("ks_test_priority_orders", spark).collect()
    assert len(rows) == 1
    r = rows[0]
    assert 0.0 <= r["ks_stat"] <= 1.0
    assert r["n_urgent"] > 0 and r["n_other"] > 0


def test_trend_slope_matches_numpy_polyfit(spark):
    import numpy as np

    from cid_etl_spark.sources.parquet import load_table

    rows = {r["region"]: r for r in _q("trend_slope_region_monthly", spark).collect()}
    assert len(rows) == 5
    # independent reference: rebuild one region's monthly series in
    # pandas and fit with numpy.polyfit
    o = load_table(spark, SF, "orders").toPandas()
    c = load_table(spark, SF, "customer").toPandas()
    n = load_table(spark, SF, "nation").toPandas()
    rg = load_table(spark, SF, "region").toPandas()
    df = (
        o.merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n, left_on="c_nationkey", right_on="n_nationkey")
        .merge(rg, left_on="n_regionkey", right_on="r_regionkey")
    )
    df["m"] = df["o_orderdate"].dt.year * 12 + df["o_orderdate"].dt.month
    df["cents"] = (df["o_totalprice"] * 100).round().astype("int64")
    monthly = df.groupby(["r_name", "m"], as_index=False)["cents"].sum()
    monthly["x"] = monthly["m"] - monthly["m"].min()
    region = sorted(rows)[0]
    sub = monthly[monthly["r_name"] == region]
    slope_cents = np.polyfit(sub["x"], sub["cents"], 1)[0]
    assert abs(rows[region]["slope_per_month"] - round(slope_cents / 100, 4)) < 0.01
    assert rows[region]["n_months"] == len(sub)


def test_chi_square_matches_python_reference(spark):
    from collections import Counter

    from cid_etl_spark.sources.parquet import load_table

    got = _q("chi_square_priority_status", spark).collect()[0]
    o = load_table(spark, SF, "orders").select(
        "o_orderpriority", "o_orderstatus"
    ).collect()
    cnt = Counter((r[0], r[1]) for r in o)
    ps = sorted({p for p, _ in cnt})
    ss = sorted({s for _, s in cnt})
    N = sum(cnt.values())
    rt = {p: sum(v for (pp, _), v in cnt.items() if pp == p) for p in ps}
    ct = {s: sum(v for (_, s2), v in cnt.items() if s2 == s) for s in ss}
    chi = sum(
        (cnt.get((p, s), 0) - rt[p] * ct[s] / N) ** 2 / (rt[p] * ct[s] / N)
        for p in ps
        for s in ss
    )
    assert abs(got["chi2"] - round(chi, 4)) < 1e-9
    assert got["dof"] == (len(ps) - 1) * (len(ss) - 1)
    assert got["n_orders"] == N


# ---------------------------------------------------------------------------
# Entity resolution / survival / weighted median rows
# ---------------------------------------------------------------------------


def test_jaro_winkler_fuzz_matches_duckdb(duck):
    import random

    from cid_etl_spark.functions.text import jaro_winkler_py

    random.seed(3)
    for trial in range(3000):
        alpha = "abcde" if trial % 2 else "abcdefghijklmnopqrstuvwxyz "
        a = "".join(random.choice(alpha) for _ in range(random.randrange(0, 14)))
        b = "".join(random.choice(alpha) for _ in range(random.randrange(0, 14)))
        want = duck.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert abs(jaro_winkler_py(a, b) - want) < 1e-12, (a, b)
    # canonical textbook pairs
    assert abs(jaro_winkler_py("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12
    assert jaro_winkler_py("", "") == 0.0
    assert jaro_winkler_py("same", "same") == 1.0


def test_jaro_winkler_pairs_blocked_and_symmetricish(spark):
    rows = _q("jaro_winkler_part_pairs", spark).collect()
    assert rows
    for r in rows:
        assert 0.9 <= r["jw"] <= 1.0
        assert r["name_a"] < r["name_b"]
        # blocked on the last token: nouns must agree
        assert r["name_a"].split()[-1] == r["name_b"].split()[-1]


def test_kaplan_meier_survival_monotone(spark):
    rows = _q("kaplan_meier_conversion", spark).collect()
    assert rows
    prev = 1.0
    for r in sorted(rows, key=lambda r: r["hours"]):
        assert 0.0 < r["survival"] <= prev + 1e-9
        assert r["conversions"] >= 1
        assert r["at_risk"] >= r["conversions"]
        prev = r["survival"]


def test_weighted_median_is_weighted_midpoint(spark):
    from cid_etl_spark.sources.parquet import load_table

    rows = {r["flag"]: r for r in _q("weighted_median_lineitem", spark).collect()}
    li = load_table(spark, SF, "lineitem").toPandas()
    li["cents"] = (li["l_extendedprice"] * 100).round().astype("int64")
    li["q"] = li["l_quantity"].astype("int64")
    for flag, sub in li.groupby("l_returnflag"):
        sub = sub.sort_values("cents")
        tot = sub["q"].sum()
        cum = sub["q"].cumsum()
        want = sub.loc[cum * 2 >= tot, "cents"].iloc[0]
        got = rows[flag]
        assert got["weighted_median"] == round(want / 100.0, 2)
        assert got["total_weight"] == tot


def test_readability_flesch_consistent(spark):
    rows = _q("readability_documents", spark).collect()
    assert rows
    for r in rows[:50]:
        want = round(
            206.835
            - 1.015 * (r["n_words"] / r["n_sentences"])
            - 84.6 * (r["n_syllables"] / r["n_words"]),
            4,
        )
        assert r["flesch"] == want
        assert r["n_syllables"] >= 1 and r["n_words"] >= 1


def test_burstiness_bounds_and_poisson_sign(spark):
    rows = _q("interarrival_burstiness_users", spark).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["burstiness"] <= 1.0
        assert r["n_gaps"] >= 5
        assert r["mean_gap_sec"] > 0


def test_lsh_recall_report_consistency(spark):
    r = _q("lsh_recall_report", spark).collect()[0]
    assert r["n_true_positives"] <= r["n_truth"]
    assert r["n_true_positives"] <= r["n_candidates"]
    assert 0.0 <= r["recall"] <= 1.0 and 0.0 <= r["precision"] <= 1.0
    assert r["n_truth"] > 0  # vacuous-empty guard
    # on this fixture the near-dup families are cleanly separated, so
    # aggressive banding (16 hashes / 4 bands) should lose nothing
    assert r["recall"] == 1.0


def test_mann_whitney_exact_u_vs_scipy_free_reference(spark):
    from cid_etl_spark.sources.parquet import load_table

    r = _q("mann_whitney_priority_orders", spark).collect()[0]
    o = load_table(spark, SF, "orders").select(
        "o_totalprice", "o_orderpriority"
    ).toPandas()
    o["rank"] = o["o_totalprice"].rank(method="average")
    urgent = o[o["o_orderpriority"] == "1-URGENT"]
    n1, n0 = len(urgent), len(o) - len(urgent)
    r1 = urgent["rank"].sum()
    two_u1 = int(round(2 * (r1 - n1 * (n1 + 1) / 2)))
    assert r["two_u1"] == two_u1
    assert r["n_urgent"] == n1 and r["n_other"] == n0
    # U within its valid range
    assert 0 <= r["two_u1"] <= 2 * n1 * n0


def test_theil_sen_is_median_of_pairwise_slopes(spark):
    import numpy as np

    from cid_etl_spark.sources.parquet import load_table

    rows = {r["region"]: r for r in _q("theil_sen_region_monthly", spark).collect()}
    assert len(rows) == 5
    o = load_table(spark, SF, "orders").toPandas()
    c = load_table(spark, SF, "customer").toPandas()
    n = load_table(spark, SF, "nation").toPandas()
    rg = load_table(spark, SF, "region").toPandas()
    df = (
        o.merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n, left_on="c_nationkey", right_on="n_nationkey")
        .merge(rg, left_on="n_regionkey", right_on="r_regionkey")
    )
    df["m"] = df["o_orderdate"].dt.year * 12 + df["o_orderdate"].dt.month
    df["cents"] = (df["o_totalprice"] * 100).round().astype("int64")
    region = sorted(rows)[0]
    sub = (
        df[df["r_name"] == region]
        .groupby("m", as_index=False)["cents"]
        .sum()
        .sort_values("m")
    )
    ms, cs = sub["m"].to_numpy(), sub["cents"].to_numpy()
    slopes = [
        (cs[j] - cs[i]) / ((ms[j] - ms[i]) * 100)
        for i in range(len(ms))
        for j in range(i + 1, len(ms))
    ]
    assert rows[region]["n_pairs"] == len(slopes)
    assert rows[region]["theil_sen_slope"] == round(
        float(np.median(slopes)), 4
    )


def test_autocorrelation_matches_numpy(spark):
    import numpy as np

    from cid_etl_spark.sources.parquet import load_table

    rows = {r["lag"]: r for r in _q("autocorrelation_daily_revenue", spark).collect()}
    assert len(rows) == 7
    o = load_table(spark, SF, "orders").toPandas()
    o["d"] = o["o_orderdate"].dt.date
    o["cents"] = (o["o_totalprice"] * 100).round().astype("int64")
    x = (
        o.groupby("d")["cents"].sum().sort_index().to_numpy().astype(float)
    )
    mu = x.mean()
    den = ((x - mu) ** 2).sum()
    for k in (1, 3, 7):
        want = round(float(((x[:-k] - mu) * (x[k:] - mu)).sum() / den), 4)
        assert rows[k]["acf"] == want, k
        assert rows[k]["n_terms"] == len(x) - k
    assert all(-1.0 <= r["acf"] <= 1.0 for r in rows.values())


def test_runs_test_counts_consistent(spark):
    r = _q("runs_test_daily_revenue", spark).collect()[0]
    # runs bounded by [1, n]; above/below balanced by median dichotomy
    n = r["n_above"] + r["n_below"]
    assert 1 <= r["n_runs"] <= n
    assert abs(r["n_above"] - r["n_below"]) <= 1


def test_spearman_matches_pandas_rank_corr(spark):
    from cid_etl_spark.sources.parquet import load_table

    r = _q("spearman_acctbal_spend", spark).collect()[0]
    o = load_table(spark, SF, "orders").toPandas()
    c = load_table(spark, SF, "customer").toPandas()
    o["cents"] = (o["o_totalprice"] * 100).round().astype("int64")
    xy = (
        o.merge(c, left_on="o_custkey", right_on="c_custkey")
        .groupby(["c_custkey", "c_acctbal"], as_index=False)["cents"]
        .sum()
    )
    want = round(float(xy["c_acctbal"].rank().corr(xy["cents"].rank())), 4)
    assert r["spearman_rho"] == want
    assert r["n_customers"] == len(xy)
    assert -1.0 <= r["spearman_rho"] <= 1.0
