"""Decontamination operator: planted overlap detected, clean docs kept."""

from __future__ import annotations

from cid_etl_spark.operators.decontaminate import (
    contamination_report,
    decontaminate,
)


def _frames(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text about spark shuffles"),
            (3, "quick brown fox appears here too somehow"),
        ],
        "doc_id bigint, text string",
    )
    benchmark = spark.createDataFrame(
        [(100, "a quick brown fox story"), (101, "the lazy dog sleeps")],
        "doc_id bigint, text string",
    )
    return corpus, benchmark


def test_contamination_report_flags_overlap(spark):
    corpus, benchmark = _frames(spark)
    rep = {
        r["doc_id"]: r["n_shared_ngrams"]
        for r in contamination_report(corpus, benchmark, n=3).collect()
    }
    # doc 1 shares "quick brown fox" and "the lazy dog"; doc 3 shares
    # "quick brown fox"; doc 2 shares nothing
    assert rep[1] == 2
    assert rep[3] == 1
    assert 2 not in rep


def test_decontaminate_drops_flagged_docs(spark):
    corpus, benchmark = _frames(spark)
    kept = decontaminate(corpus, benchmark, n=3)
    assert {r["doc_id"] for r in kept.collect()} == {2}
    strict = decontaminate(corpus, benchmark, n=3, min_shared=2)
    assert {r["doc_id"] for r in strict.collect()} == {2, 3}


def test_benchmark_side_is_broadcast(spark):
    corpus, benchmark = _frames(spark)
    plan = (
        contamination_report(corpus, benchmark, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
