"""Semantic unit tests for the round-11 queries (queries/round11.py):
brute-force cross-checks and closed-form properties, independent of
the DuckDB oracle (tests/test_oracle_parity.py covers the oracle
hash-match at sf0.001; these pin the MATH)."""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd
import pytest

from .conftest import SF_SMOKE


def _baskets(duck):
    rows = duck.execute(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
    ).fetchall()
    baskets = defaultdict(set)
    for o, p in rows:
        baskets[o].add(p)
    return baskets


def _edges_support2(duck):
    pair_count: dict[tuple[int, int], int] = defaultdict(int)
    for items in _baskets(duck).values():
        s = sorted(items)
        for i, a in enumerate(s):
            for b in s[i + 1:]:
                pair_count[(a, b)] += 1
    return {p for p, c in pair_count.items() if c >= 2}


def test_adamic_adar_matches_bruteforce(spark, duck):
    """The registered top-k must equal a pure-Python Adamic-Adar on
    the same support->=2 graph: same integer micro scores, same
    deterministic ordering, no existing edge leaking through the
    anti-join."""
    from cid_etl_spark.queries.round11 import (
        _AA_DEGREE_CAP,
        _AA_TOP_K,
        adamic_adar_link_prediction,
    )

    edges = _edges_support2(duck)
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    scores: dict[tuple[int, int], int] = defaultdict(int)
    common: dict[tuple[int, int], int] = defaultdict(int)
    for z, nbrs in adj.items():
        deg = len(nbrs)
        if deg < 2 or deg > _AA_DEGREE_CAP:
            continue
        w = round(1000000.0 / math.log(deg))
        s = sorted(nbrs)
        for i, u in enumerate(s):
            for v in s[i + 1:]:
                scores[(u, v)] += w
                common[(u, v)] += 1
    expected = sorted(
        ((u, v, common[(u, v)], sc) for (u, v), sc in scores.items()
         if (u, v) not in edges),
        key=lambda r: (-r[3], r[0], r[1]),
    )[:_AA_TOP_K]

    got = adamic_adar_link_prediction(spark, SF_SMOKE).collect()
    assert len(got) == len(expected)
    for row, (u, v, cn, sc) in zip(got, expected):
        assert (row.u, row.v, row.common_neighbors, row.score_micro) == (
            u, v, cn, sc,
        )
        assert (row.u, row.v) not in edges
        assert row.aa_score == pytest.approx(sc / 1e6, abs=1e-9)


def test_assoc_rules_confidence_lift_bruteforce(spark, duck):
    """Directional rules: confidence = pairs/supp(antecedent), lift
    symmetric, pair support bounded by both singleton supports."""
    from cid_etl_spark.queries.round11 import assoc_rules_copurchase

    baskets = _baskets(duck)
    n_orders = len(baskets)
    supp: dict[int, int] = defaultdict(int)
    pair: dict[tuple[int, int], int] = defaultdict(int)
    for items in baskets.values():
        for p in items:
            supp[p] += 1
        s = sorted(items)
        for i, a in enumerate(s):
            for b in s[i + 1:]:
                pair[(a, b)] += 1

    rows = assoc_rules_copurchase(spark, SF_SMOKE).collect()
    assert rows, "sf0.001 has support-2 pairs"
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        key = (min(r.antecedent, r.consequent), max(r.antecedent, r.consequent))
        assert r.pair_orders == pair[key] >= 2
        assert r.antecedent_orders == supp[r.antecedent]
        assert r.consequent_orders == supp[r.consequent]
        assert r.pair_orders <= min(r.antecedent_orders, r.consequent_orders)
        assert r.confidence == pytest.approx(
            r.pair_orders / r.antecedent_orders, abs=1e-6
        )
        assert r.lift == pytest.approx(
            r.pair_orders * n_orders / (r.antecedent_orders * r.consequent_orders),
            abs=1e-6,
        )


def test_mutual_information_matches_manual(spark, duck):
    """MI/H computed independently from the raw (lang, source) counts
    must match the registered single-pass window plan."""
    from cid_etl_spark.queries.round11 import mutual_information_lang_source

    counts = duck.execute(
        "SELECT lang, source, count(*) FROM documents GROUP BY 1, 2"
    ).fetchall()
    n = sum(c for _, _, c in counts)
    nl: dict[str, int] = defaultdict(int)
    ns: dict[str, int] = defaultdict(int)
    for l, s, c in counts:
        nl[l] += c
        ns[s] += c
    mi = sum(
        (c / n) * math.log2(c * n / (nl[l] * ns[s])) for l, s, c in counts
    )
    hl = -sum((v / n) * math.log2(v / n) for v in nl.values())
    hs = -sum((v / n) * math.log2(v / n) for v in ns.values())

    row = mutual_information_lang_source(spark, SF_SMOKE).collect()[0]
    assert row.n_docs == n
    assert row.mi_bits == pytest.approx(mi, abs=1e-5)
    assert row.h_lang_bits == pytest.approx(hl, abs=1e-5)
    assert row.h_source_bits == pytest.approx(hs, abs=1e-5)
    assert row.nmi == pytest.approx(mi / math.sqrt(hl * hs), abs=1e-5)
    # information-theoretic bounds
    assert -1e-9 <= row.mi_bits <= min(hl, hs) + 1e-9
    assert -1e-9 <= row.nmi <= 1 + 1e-9


def test_calibration_ece_consistency(spark):
    """Bin table invariants: bins cover all docs exactly once, the
    published ECE is the count-weighted mean absolute gap, gaps match
    |mean_conf - frac_pos| before rounding."""
    from cid_etl_spark.queries.round11 import calibration_ece_classifier

    rows = calibration_ece_classifier(spark, SF_SMOKE).collect()
    assert rows
    n_total = sum(r.n_docs for r in rows)
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchone()[0]
    assert n_total == n_docs
    eces = {r.ece for r in rows}
    assert len(eces) == 1, "ECE is a single corpus-level number"
    expected_ece = sum(r.n_docs * r.abs_gap for r in rows) / n_total
    assert rows[0].ece == pytest.approx(expected_ece, abs=2e-6)
    for r in rows:
        assert 0 <= r.bin <= 9
        assert 0.0 <= r.mean_conf <= 1.0
        assert 0.0 <= r.frac_pos <= 1.0
        assert r.abs_gap == pytest.approx(abs(r.mean_conf - r.frac_pos), abs=2e-6)


def test_holt_recurrence_exact_on_linear_series():
    """On an exactly linear series the Holt recurrence reproduces the
    line: level = last value, trend = slope, forecasts extrapolate."""
    from cid_etl_spark.queries.round11 import _holt_frame

    months = [f"2024-{m:02d}" for m in range(1, 13)]
    ys = [10.0 + 5.0 * t for t in range(12)]
    pdf = pd.DataFrame({"region": ["R"] * 12, "month": months, "y": ys})
    out = _holt_frame(pdf.sample(frac=1.0, random_state=7))  # order-proof
    row = out.iloc[0]
    assert row["n_months"] == 12
    assert row["level"] == pytest.approx(ys[-1], abs=1e-8)
    assert row["trend"] == pytest.approx(5.0, abs=1e-8)
    for h in (1, 2, 3):
        assert row[f"forecast_{h}"] == pytest.approx(ys[-1] + 5.0 * h, abs=1e-7)


def test_holt_level_tracks_step_change():
    """After a level step the smoothed level must move to the new
    plateau's neighborhood (Holt's trend term legitimately OVERSHOOTS
    a step — the level lands above 200 and decays back, so the bound
    is a neighborhood, not the plateau itself)."""
    from cid_etl_spark.queries.round11 import _holt_frame

    months = [f"2024-{m:02d}" for m in range(1, 11)]
    ys = [100.0] * 5 + [200.0] * 5
    pdf = pd.DataFrame({"region": ["R"] * 10, "month": months, "y": ys})
    row = _holt_frame(pdf).iloc[0]
    assert 180.0 < row["level"] < 250.0, "level reaches the step neighborhood"
    # five flat observations after the step already bend the trend down
    assert row["trend"] < 25.0


def test_classifier_passthrough_columns(spark):
    """The round-11 passthrough on quality_classifier appends caller
    columns without disturbing the pinned 5-column contract."""
    from cid_etl_spark.operators.classifier import quality_classifier

    df = spark.createDataFrame(
        [("a", "the quick brown fox", 1)], "doc_id string, text string, label int"
    )
    base = quality_classifier(df)
    assert base.columns == ["doc_id", "n_tokens", "margin", "quality_score", "keep"]
    ext = quality_classifier(df, passthrough=("label",))
    assert ext.columns == base.columns + ["label"]
    assert ext.collect()[0].label == 1
