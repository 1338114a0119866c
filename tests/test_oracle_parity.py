"""Differential tests mirroring the driver's harness: every query with
an oracle twin must match DuckDB exactly (row count, column names,
order-insensitive values) at sf0.001.  Exact equality on purpose —
the driver compares value *hashes*, so 'close' is not good enough.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from cid_etl_spark.queries import oracle_queries, spark_queries

from .conftest import SF_SMOKE

ORACLE = oracle_queries()
QUERIES = spark_queries()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if df.empty:
        return df.reset_index(drop=True)
    # canonical row order: sort by stringified row
    key = df.astype(str).agg("|".join, axis=1)
    df = df.loc[key.sort_values().index].reset_index(drop=True)
    return df


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # pandas NaT/NaN cross-type
    if pd.isna(a) and pd.isna(b):
        return True
    return a == b


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(name, spark, duck):
    spark_df = QUERIES[name](spark, SF_SMOKE).toPandas()
    duck_df = duck.execute(ORACLE[name]).fetchdf()

    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: column mismatch {spark_df.columns} vs {duck_df.columns}"
    )
    assert len(spark_df) == len(duck_df), (
        f"{name}: row count {len(spark_df)} vs {len(duck_df)}"
    )

    s, d = _normalize(spark_df), _normalize(duck_df)
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(sv, dv)) if not _values_equal(x, y)
        ]
        assert not bad, f"{name}.{col}: first mismatches {bad[:5]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_oracle_free_query_runs(name, spark):
    # rows-only contract: must execute and have a stable schema
    df = QUERIES[name](spark, SF_SMOKE)
    assert df.columns
    assert df.count() >= 0
