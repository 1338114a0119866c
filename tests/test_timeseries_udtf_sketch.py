"""Unit tests: resample+ffill, span dedup, sequence packing, the
FlattenJsonProps UDTF, and HLL sketch roll-ups (oracle parity for the
oracled four lives in tests/test_oracle_parity.py via the registry)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_resample_ffill_fills_gaps_and_flags_them(spark):
    from cid_etl_spark.operators.timeseries import resample_ffill

    t0 = dt.datetime(2024, 1, 1, 0, 7)
    rows = [
        ("a", t0, 10.0),                           # bucket 00:00
        ("a", t0 + dt.timedelta(minutes=9), 20.0), # bucket 00:15
        # 00:30 missing -> filled with 20.0
        ("a", t0 + dt.timedelta(minutes=40), 40.0),  # bucket 00:45
        ("b", t0, 1.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = resample_ffill(df, "ts", ["event_type"], "value", bucket_minutes=15)
    got = {
        (r.event_type, r.bucket_ts.minute): (r.avg_value, r.is_gap)
        for r in out.collect()
    }
    assert got[("a", 0)] == (10.0, False)
    assert got[("a", 15)] == (20.0, False)
    assert got[("a", 30)] == (20.0, True)  # forward-filled
    assert got[("a", 45)] == (40.0, False)
    assert got[("b", 0)] == (1.0, False)
    assert len(got) == 5  # b has a single bucket: no grid beyond its bounds


def test_resample_ffill_buckets_are_epoch_aligned(spark):
    from cid_etl_spark.operators.timeseries import resample_ffill

    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 3, 5, 13, 44, 59), 5.0)],
        "event_type string, ts timestamp, value double",
    )
    [row] = resample_ffill(df, "ts", ["event_type"], "value", 15).collect()
    assert row.bucket_ts == dt.datetime(2024, 3, 5, 13, 30)


def test_span_dedup_keeps_first_occurrence_only(spark):
    from cid_etl_spark.queries import spark_queries

    # doc 0 must survive untouched (it is the first occurrence of all
    # of its spans); every dropped span elsewhere duplicates an
    # earlier (doc_id, pos).
    out = spark_queries()["span_dedup_documents"](
        spark, "/root/testdata/sf0.01"
    )
    first = out.filter(F.col("doc_id") == 0).collect()[0]
    src = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .filter(F.col("doc_id") == 0)
        .collect()[0]
    )
    import re

    normalized = " ".join(re.split(r"[ \t\n\x0b\f\r]+", src.text.lower().strip(" ")))
    assert first.text_dedup == normalized
    assert first.n_spans_dropped == 0


def test_pack_sequences_covers_all_docs_without_overlap(spark):
    from cid_etl_spark.queries import spark_queries

    out = spark_queries()["pack_sequences_documents"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    n_docs = sum(r.n_docs for r in out)
    assert n_docs == 500  # every document lands in exactly one sequence
    # every sequence except possibly each lang's last should start
    # within budget of the previous (monotone contiguous ids)
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r.seq_id)
    for ids in by_lang.values():
        ids = sorted(ids)
        assert ids == list(range(ids[0], ids[0] + len(ids)))


def test_flatten_udtf_edge_cases(spark):
    from cid_etl_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    df = spark.createDataFrame(
        [
            (1, '{"a": 1, "b": "x", "c": true, "d": null, "e": [1,2]}'),
            (2, "not json"),
            (3, "[1,2,3]"),  # non-object: no rows
            (4, None),
        ],
        "id long, props string",
    )
    df.createOrReplaceTempView("__udtf_edge")
    rows = spark.sql(
        "SELECT i.id, f.prop_key, f.prop_value "
        "FROM __udtf_edge i, LATERAL flatten_json_props(i.props) f"
    ).collect()
    got = {(r.id, r.prop_key): r.prop_value for r in rows}
    assert got == {
        (1, "a"): "1",
        (1, "b"): "x",
        (1, "c"): "true",
        (1, "d"): None,
        (1, "e"): "[1,2]",
    }


def test_hll_estimates_match_exact_at_fixture_scale(spark):
    # The query now emits the exact count plus the sketch's
    # bounded-error verdict (oracle-checkable contract); assert the
    # exact side really is exact and every merged estimate verdict
    # holds at fixture scale.
    from cid_etl_spark.queries import spark_queries
    from cid_etl_spark.sources.parquet import load_table

    sf = "/root/testdata/sf0.01"
    rows = {
        r.event_type: r
        for r in spark_queries()["hll_daily_users_events"](spark, sf).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert rows.keys() == exact.keys()
    for k in exact:
        assert rows[k].exact_users == exact[k]
        assert rows[k].merged_within_5pct


def test_approx_percentiles_bracket_exact_rank(spark):
    # The query now re-ranks its own GK estimates against the data and
    # emits per-group rank-error verdicts (oracle-checkable contract);
    # every verdict must hold and group counts must be exact.
    from cid_etl_spark.queries import spark_queries
    from cid_etl_spark.sources.parquet import load_table

    sf = "/root/testdata/sf0.01"
    rows = list(spark_queries()["approx_percentile_lineitem"](spark, sf).collect())
    li = load_table(spark, sf, "lineitem")
    exact_n = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r.l_returnflag for r in rows} == set(exact_n)
    for r in rows:
        assert r.n == exact_n[r.l_returnflag]
        assert r.p50_rank_ok and r.p90_rank_ok and r.p99_rank_ok


def test_ewma_matches_sequential_recurrence(spark):
    import pandas as pd

    from cid_etl_spark.operators.timeseries import ewma_by_key
    from cid_etl_spark.sources.parquet import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "event_id", "ts", "value"
    )
    got = ewma_by_key(
        ev, ["user_id"], "ts", "value", alpha=0.3, tiebreak="event_id"
    ).toPandas()

    pdf = ev.toPandas().sort_values(["user_id", "ts", "event_id"])
    expect = (
        pdf.groupby("user_id")["value"]
        .apply(lambda s: s.ewm(alpha=0.3, adjust=False).mean())
        .reset_index(level=0, drop=True)
        .round(6)
    )
    pdf["expect"] = expect
    merged = pdf.merge(got[["event_id", "ewma"]], on="event_id")
    assert len(merged) == len(pdf)
    assert (merged["expect"] - merged["ewma"]).abs().max() < 1e-9

    # first value of each series is the raw value (recurrence seed)
    firsts = merged.sort_values(["user_id", "ts", "event_id"]).groupby("user_id").first()
    assert (firsts["value"].round(6) == firsts["ewma"]).all()
