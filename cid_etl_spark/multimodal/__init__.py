"""Multimodal (binary) column plumbing."""

from cid_etl_spark.multimodal.binary import (
    MEDIA_SCHEMA,
    attach_fake_media,
    decode_image_features,
    extract_media_meta,
    sample_video_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_fake_media",
    "decode_image_features",
    "extract_media_meta",
    "sample_video_frames",
]
