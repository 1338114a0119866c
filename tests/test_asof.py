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


def test_interval_overlap_bucketed_equals_naive(spark):
    """Property: the bucketed interval-overlap join must equal the
    naive theta join exactly — including intervals spanning many
    buckets, bucket-boundary endpoints, and same-block pairs."""
    from pyspark.sql import functions as F

    from cid_etl_spark.operators.joins import interval_overlap_join_bucketed

    # deterministic pseudo-random intervals straddling bucket width 10
    left = spark.range(60).select(
        F.col("id").alias("lid"),
        (F.col("id") * 37 % 97).alias("l_lo"),
        (F.col("id") * 37 % 97 + F.col("id") * 13 % 23).alias("l_hi"),
    )
    right = spark.range(40).select(
        F.col("id").alias("rid"),
        (F.col("id") * 53 % 89).alias("r_lo"),
        (F.col("id") * 53 % 89 + F.col("id") * 7 % 31).alias("r_hi"),
    )
    naive = {
        (r["lid"], r["rid"])
        for r in left.join(
            right,
            (F.col("l_lo") <= F.col("r_hi")) & (F.col("r_lo") <= F.col("l_hi")),
        ).collect()
    }
    for width in (1, 10, 50):
        got = {
            (r["lid"], r["rid"])
            for r in interval_overlap_join_bucketed(
                left, "l_lo", "l_hi", right, "r_lo", "r_hi", bucket_width=width
            ).collect()
        }
        assert got == naive, f"width={width}: {len(got)} vs {len(naive)}"
