"""Unit tests for the scalar string library (SURVEY §2.8) — edge cases
the reference handles: NULLs, whitespace, the blank-4th-char SUBCAT."""

from __future__ import annotations

from pyspark.sql import functions as F

from cid_etl_spark.functions.strings import (
    concat_range,
    extract_root_category,
    format_subcat,
    normalize_code,
    subcategory_or_null,
)


def _run(spark, col_expr, values):
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    return [r[0] for r in df.select(col_expr.alias("out")).collect()]


def test_normalize_code(spark):
    out = _run(spark, normalize_code("raw"), ["  a00.1 ", "T65", None, "x "])
    assert out == ["A00.1", "T65", None, "X"]


def test_extract_root_category(spark):
    out = _run(spark, extract_root_category("raw"), [" t65.9 ", "A00", None])
    assert out == ["T65", "A00", None]


def test_subcategory_or_null(spark):
    out = _run(spark, subcategory_or_null(normalize_code("raw")), ["T65.9", "T65", None])
    assert out == ["T65.9", None, None]


def test_format_subcat_branches(spark):
    # dotted insertion; blank 4th char → 3-char root; short code; longer tail
    out = _run(spark, format_subcat("raw"), ["t659", "A07 ", "B99", "U0712", None])
    assert out == ["T65.9", "A07", "B99", "U07.12", None]


def test_concat_range(spark):
    df = spark.createDataFrame([(" a00 ", "b99")], "s string, e string")
    out = df.select(concat_range("s", "e").alias("out")).collect()[0][0]
    assert out == "A00-B99"
