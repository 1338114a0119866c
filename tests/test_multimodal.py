"""Multimodal plumbing tests: schema, Arrow batch dataflow, stubbed
decode determinism, metadata pre-pass."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cid_etl_spark.multimodal.binary import (
    attach_fake_media,
    decode_image_features,
    extract_media_meta,
    sample_video_frames,
)
from cid_etl_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF, "documents").limit(30)
    return attach_fake_media(docs, "doc_id", "text").cache()


def test_media_schema_and_kinds(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "kind",
        "mime",
        "payload",
        "n_bytes",
    ]
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_media_meta_no_python(media):
    out = {r["kind"]: r["n_media"] for r in extract_media_meta(media).collect()}
    assert sum(out.values()) == 30
    # metadata pass is pure expressions: no BatchEvalPython/ArrowEval in plan
    plan = extract_media_meta(media)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_decode_image_features_deterministic(media):
    a = {r["media_id"]: r.asDict() for r in decode_image_features(media).collect()}
    b = {r["media_id"]: r.asDict() for r in decode_image_features(media).collect()}
    assert a == b
    assert a  # at least one image row
    for feat in a.values():
        assert 64 <= feat["width"] <= 255
        assert feat["channels"] in (1, 2, 3, 4)
        assert 0.0 <= float(feat["mean_luma"]) <= 1.0


def test_decode_stub_raises_on_empty_payload():
    from cid_etl_spark.multimodal.binary import _decode_image_stub

    with pytest.raises(NotImplementedError):
        _decode_image_stub(b"")


def test_sample_video_frames_shape(media):
    frames = sample_video_frames(media)
    rows = frames.collect()
    assert rows, "expected video rows"
    assert frames.columns == ["media_id", "frame_idx", "frame_sig"]
    per_media = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(r["n"] >= 1 for r in per_media)


def test_audio_features_shape_and_determinism(spark):
    from cid_etl_spark.multimodal.binary import extract_audio_features

    media = attach_fake_media(
        load_table(spark, SF, "documents"), "doc_id", "text"
    )
    feats = extract_audio_features(media)
    rows = {r.media_id: r for r in feats.collect()}
    n_audio = media.filter("kind = 'audio'").count()
    assert len(rows) == n_audio and n_audio > 0
    # deterministic: second run produces identical stats
    again = {r.media_id: r for r in extract_audio_features(media).collect()}
    assert rows == again
    for r in rows.values():
        assert r.sample_rate in (8000, 16000, 22050, 44100, 48000)
        assert r.duration_ms == (r.n_samples * 1000) // r.sample_rate


def test_audio_decode_stub_rejects_empty_payload():
    import pytest as _pytest

    from cid_etl_spark.multimodal.binary import _decode_audio_stub

    with _pytest.raises(NotImplementedError):
        _decode_audio_stub(b"")
