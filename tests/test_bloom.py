"""Bloom pre-filter: no false negatives, bounded false positives,
prefilter+exact == exact."""

from __future__ import annotations

import numpy as np

from cid_etl_spark.operators.bloom import (
    BloomFilter,
    bloom_prefilter,
    bloom_semi_join,
    build_bloom,
    optimal_params,
)


def test_optimal_params_sizing():
    m, k = optimal_params(1_000_000, 0.01)
    # classic ~9.6 bits/key, 7 hashes at 1% FPP
    assert 9_000_000 < m < 10_500_000
    assert k == 7
    assert m % 8 == 0


def test_no_false_negatives_and_fp_rate(spark):
    keys = spark.range(0, 2000).withColumnRenamed("id", "k")
    bloom = build_bloom(keys, "k", fpp=0.01)
    member = bloom.might_contain_np(np.arange(0, 2000))
    assert member.all(), "bloom must never drop a true key"
    probe = np.arange(1_000_000, 1_050_000)  # disjoint from keys
    fp = bloom.might_contain_np(probe).mean()
    assert fp < 0.03, f"false-positive rate {fp} above ~3x target"


def test_prefilter_keeps_all_matches(spark):
    fact = spark.range(0, 10_000).withColumnRenamed("id", "fk")
    keys = spark.range(0, 10_000, 7).withColumnRenamed("id", "k")
    bloom = build_bloom(keys, "k", fpp=0.01)
    kept = {r["fk"] for r in bloom_prefilter(fact, "fk", bloom).collect()}
    assert set(range(0, 10_000, 7)) <= kept


def test_bloom_semi_join_exact(spark):
    fact = spark.range(0, 5_000).withColumnRenamed("id", "fk")
    keys = spark.range(0, 5_000, 13).withColumnRenamed("id", "k")
    got = sorted(r["fk"] for r in bloom_semi_join(fact, keys, "fk", "k").collect())
    assert got == list(range(0, 5_000, 13))


def test_empty_key_side(spark):
    fact = spark.range(0, 100).withColumnRenamed("id", "fk")
    empty = spark.range(0, 0).withColumnRenamed("id", "k")
    bloom = build_bloom(empty, "k", fpp=0.01)
    assert bloom_prefilter(fact, "fk", bloom).count() == 0


def test_serialized_roundtrip_matches():
    import pickle

    keys = np.arange(100, 200)
    m, k = optimal_params(100, 0.01)
    from cid_etl_spark.operators.bloom import _positions

    bitmap = np.zeros(m // 8, dtype=np.uint8)
    pos = np.unique(_positions(keys, m, k))
    np.bitwise_or.at(
        bitmap,
        (pos >> np.uint64(3)).astype(np.int64),
        np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8),
    )
    bf = BloomFilter(bits=bitmap.tobytes(), m=m, k=k)
    bf2 = pickle.loads(pickle.dumps(bf))
    assert bf2.might_contain_np(keys).all()
