"""JSONL source/sink round-trip and corrupt-record handling."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cid_etl_spark.sources.json import read_jsonl, write_jsonl


def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", -2.0), (3, None, 0.0)],
        "id bigint, name string, score double",
    )
    out = str(tmp_path / "out")
    write_jsonl(df, out)
    back = read_jsonl(spark, out, schema="id bigint, name string, score double")
    assert sorted(back.collect(), key=lambda r: r["id"]) == sorted(
        df.collect(), key=lambda r: r["id"]
    )


def test_jsonl_partitioned_write_prunes_directories(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "en"), (2, "de"), (3, "en")], "id bigint, lang string"
    )
    out = str(tmp_path / "bylang")
    write_jsonl(df, out, partition_by=["lang"])
    assert os.path.isdir(os.path.join(out, "lang=en"))
    back = read_jsonl(spark, out, schema="id bigint, lang string").filter(
        F.col("lang") == "en"
    )
    assert {r["id"] for r in back.collect()} == {1, 3}
    # partition pruning: only the lang=en directory is scanned
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "lang=de" not in plan


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text('{"id": 1, "name": "ok"}\n{definitely not json\n{"id": 2}\n')
    df = read_jsonl(
        spark,
        str(p),
        schema="id bigint, name string, _corrupt_record string",
    )
    rows = df.collect()
    assert len(rows) == 3
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["id"] for r in good} == {1, 2}
    assert len(bad) == 1
