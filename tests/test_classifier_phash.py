"""Invariant tests for the hashed linear quality classifier, n-gram
containment pairs, and perceptual-hash image near-dup (round-2
continuation operators).  Oracle parity is covered separately by
tests/test_oracle_parity.py; these pin the semantic contracts the
oracle alone can't state (bounds, asymmetry, guaranteed recall).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# quality_classifier
# ---------------------------------------------------------------------------


def test_classifier_score_bounds_and_empty(spark):
    from cid_etl_spark.operators.classifier import quality_classifier

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, ""),
            (3, "   "),
            (4, "single"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in quality_classifier(df).collect()}
    for r in rows.values():
        assert 0.0 <= r.quality_score <= 1.0
    # empty / whitespace-only → neutral score, never kept
    for did in (2, 3):
        assert rows[did].n_tokens == 0
        assert rows[did].quality_score == 0.5
        assert rows[did].keep is False
    assert rows[1].n_tokens == 9


def test_classifier_deterministic_and_token_order_invariant(spark):
    """Same bag of tokens → same margin (bag-of-words model), and the
    margin is the exact sum of per-token weights."""
    from cid_etl_spark.operators.classifier import quality_classifier

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in quality_classifier(df).collect()}
    assert rows[1].margin == rows[2].margin
    assert rows[1].quality_score == rows[2].quality_score
    # single-token doc margin equals that token's weight, which must
    # lie in [-2048, 2048]
    one = spark.createDataFrame([(9, "alpha")], "doc_id long, text string")
    m = quality_classifier(one).collect()[0].margin
    assert -2048 <= m <= 2048


# ---------------------------------------------------------------------------
# ngram_containment_pairs
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def contain_df(spark):
    quote = "the five boxing wizards jump quickly over the lazy dog tonight"
    long_doc = (
        "opening boilerplate sentence with many extra words here "
        + quote
        + " trailing boilerplate content continues with unrelated filler text"
    )
    return spark.createDataFrame(
        [(1, quote), (2, long_doc), (3, "completely different content about ships")],
        "doc_id long, text string",
    )


def test_containment_catches_embedded_quote(spark, contain_df):
    """A document wholly embedded in a longer one has containment 1.0
    even though Jaccard is far below any useful threshold."""
    from cid_etl_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs_exact,
    )

    cont = {
        (r.id_a, r.id_b): r
        for r in ngram_containment_pairs(
            contain_df, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    assert (1, 2) in cont
    assert cont[(1, 2)].containment == 1.0
    assert cont[(1, 2)].len_ratio < 0.6  # subset relation, not equal-size dup
    # Jaccard on the same pair is small — below the 0.5 the containment
    # query uses — demonstrating the asymmetric measure is not redundant
    jac = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs_exact(
            contain_df, "doc_id", "text", n=3, threshold=0.01
        ).collect()
    }
    assert jac[(1, 2)] < 0.5


def test_containment_dominates_jaccard(spark, contain_df):
    """containment >= jaccard for every pair (min ≤ union)."""
    from cid_etl_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs_exact,
    )

    cont = {
        (r.id_a, r.id_b): r.containment
        for r in ngram_containment_pairs(
            contain_df, "doc_id", "text", n=3, threshold=0.0001
        ).collect()
    }
    jac = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs_exact(
            contain_df, "doc_id", "text", n=3, threshold=0.0001
        ).collect()
    }
    assert set(jac) == set(cont)
    for k, j in jac.items():
        assert cont[k] >= j


# ---------------------------------------------------------------------------
# perceptual-hash image near-dup
# ---------------------------------------------------------------------------


def test_phash_stub_contract():
    from cid_etl_spark.multimodal.binary import _phash_image_stub

    with pytest.raises(ValueError):
        _phash_image_stub(b"")
    with pytest.raises(ValueError):
        _phash_image_stub(b"0123456789abc")  # 13 < 15 bytes
    v = _phash_image_stub(b"0123456789abcde" + b"ff")
    assert v == int("0123456789abcde", 16)
    assert 0 <= v < (1 << 60)


def test_phash_blocking_recall_equals_allpairs(spark):
    """Pigeonhole blocking over the pHash fingerprints must reproduce
    the all-pairs Hamming result exactly (guaranteed recall)."""
    from cid_etl_spark.operators.dedup import hamming_pairs_from_fingerprints

    # planted: 0/1 differ in 1 bit, 2 matches 0 exactly, 3 is far away
    fps = [
        (0, 0x0F0F0F0F0F0F0F0),
        (1, 0x0F0F0F0F0F0F0F1),
        (2, 0x0F0F0F0F0F0F0F0),
        (3, 0x7FFFFFFFFFFFFFF),
    ]
    fp = spark.createDataFrame(fps, "media_id long, fp long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_pairs_from_fingerprints(
            fp, "media_id", "fp", bits=60, max_hamming=2
        ).collect()
    }
    expect = {}
    for i, (ida, fa) in enumerate(fps):
        for idb, fb in fps[i + 1 :]:
            h = bin(fa ^ fb).count("1")
            if h <= 2:
                expect[(ida, idb)] = h
    assert got == expect
    assert got[(0, 2)] == 0 and got[(0, 1)] == 1
