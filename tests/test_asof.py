"""Unit tests for the backward as-of join (operators.joins.asof_join):
exact-timestamp ties, strict mode, unmatched-left NULLs, multi-key
grouping.  Oracle parity on fixtures is covered by test_oracle_parity
via the asof_prior_purchase query.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row

from cid_etl_spark.operators.joins import asof_join


def _ts(s: int):
    return datetime(2024, 1, 1, 0, 0, s)


def _mk(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(10), lval=1),
            Row(k="a", ts=_ts(20), lval=2),
            Row(k="a", ts=_ts(5), lval=3),   # before any right row
            Row(k="b", ts=_ts(10), lval=4),  # key with no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", rts=_ts(10), rval=100),  # exact tie with lval=1
            Row(k="a", rts=_ts(15), rval=200),
        ]
    )
    return left, right


def test_backward_allow_exact(spark):
    left, right = _mk(spark)
    out = asof_join(left, right, by="k", left_ts="ts", right_ts="rts")
    got = {(r.k, r.lval): r.rval for r in out.collect()}
    assert got == {
        ("a", 1): 100,  # exact ts counts
        ("a", 2): 200,  # latest <= 20 is 15
        ("a", 3): None,  # nothing at or before 5
        ("b", 4): None,  # key absent on right
    }


def test_backward_strict(spark):
    left, right = _mk(spark)
    out = asof_join(
        left, right, by="k", left_ts="ts", right_ts="rts", allow_exact=False
    )
    got = {(r.k, r.lval): r.rval for r in out.collect()}
    # exact-ts right row no longer visible to lval=1
    assert got[("a", 1)] is None
    assert got[("a", 2)] == 200


def test_payload_collision_raises(spark):
    left, right = _mk(spark)
    import pytest

    with pytest.raises(ValueError, match="collides"):
        asof_join(
            left,
            right.withColumnRenamed("rval", "lval"),
            by="k",
            left_ts="ts",
            right_ts="rts",
        )


def test_row_count_preserved(spark):
    left, right = _mk(spark)
    out = asof_join(left, right, by="k", left_ts="ts", right_ts="rts")
    assert out.count() == left.count()
