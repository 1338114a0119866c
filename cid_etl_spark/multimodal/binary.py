"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns with typed metadata (north-star extension).

What's REAL here (and tested): the Spark-side dataflow — schema,
Arrow-batched ``mapInPandas`` UDF signatures, per-partition batch
shapes, partitioning discipline.  What's STUBBED: the actual codec
work (`_decode_image_stub`), because image/audio libraries are not in
this container.  Swap the stub for PIL/ffmpeg calls and nothing about
the Spark plumbing changes.

Scale design:
- media bytes travel ONCE through an Arrow batch into the Python
  worker; features come back as small fixed-width columns — never
  ship bytes back out.
- batch size is bounded via ``spark.sql.execution.arrow.maxRecordsPerBatch``
  (set in the session factory's Arrow block) so a partition of 10 MB
  images can't blow worker memory.
- downstream joins/apply happen on the *feature* columns; the binary
  column is pruned away by Catalyst the moment it's unused.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media-row schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

#: Feature schema produced by the image-decode stage.
IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("mean_luma", StringType(), True),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, seed_col: str) -> DataFrame:
    """Build a deterministic fake media table from any fixture table:
    payload bytes derive from sha2(seed) — stable across runs, no RNG.
    This stands in for `spark.read.format('binaryFile')` in an
    environment with real assets."""
    payload = F.sha2(F.col(seed_col).cast("string"), 256).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        (
            F.when(F.col(id_col) % 3 == 0, F.lit("image"))
            .when(F.col(id_col) % 3 == 1, F.lit("audio"))
            .otherwise(F.lit("video"))
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def extract_media_meta(df: DataFrame) -> DataFrame:
    """Metadata pass that never touches Python: size/kind stats as
    plain expressions — the cheap pre-filter before any decode."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )


def _decode_image_stub(payload: bytes) -> tuple[int, int, int, str]:
    """STUB decoder — deterministic fake dimensions derived from the
    payload bytes.  Replace with e.g. PIL.Image.open for real data;
    the mapInPandas plumbing around it is already production-shaped.
    """
    if payload is None or len(payload) < 3:
        # the stub indexes payload[0..2]; short payloads take the same
        # not-decodable branch as empty ones instead of IndexError-ing
        # the whole mapInPandas stage
        raise NotImplementedError(
            "real image decode requires an imaging library not present "
            "in this environment"
        )
    w = 64 + payload[0] % 192
    h = 64 + payload[1] % 192
    c = 1 + payload[2] % 4
    luma = f"{(sum(payload[:16]) % 256) / 255.0:.4f}"
    return w, h, c, luma


def decode_image_features(df: DataFrame) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (media_id, payload),
    emitting fixed-width features.  Bytes in, features out — the
    binary column dies here."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, c, luma = _decode_image_stub(bytes(payload))
                rows.append((mid, w, h, c, luma))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "channels", "mean_luma"]
            )

    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(decode, IMAGE_FEATURES_SCHEMA)
    )


def sample_video_frames(df: DataFrame, every_n_bytes: int = 8) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled 'frame' via
    posexplode of a byte-stride sequence — the dataflow shape of real
    frame extraction (explode → per-frame features), with the codec
    stubbed to byte slices."""
    frames = F.transform(
        F.sequence(
            F.lit(0),
            F.greatest((F.length("payload") / every_n_bytes).cast("int") - 1, F.lit(0)),
        ),
        lambda i: F.substring(F.col("payload").cast("string"), i * every_n_bytes + 1, 4),
    )
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", F.posexplode(frames).alias("frame_idx", "frame_sig"))
    )


#: Feature schema produced by the audio-decode stage.
AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("rms", StringType(), True),
    ]
)


def _decode_audio_stub(payload: bytes) -> tuple[int, int, int, str]:
    """STUB audio decoder — deterministic fake waveform stats derived
    from the payload bytes.  Replace with soundfile/ffmpeg probing for
    real data; the mapInPandas plumbing is already production-shaped.
    """
    if payload is None or len(payload) < 2:
        # the stub indexes payload[0] and payload[1]; a 0/1-byte payload
        # is not a decodable header either way
        raise NotImplementedError(
            "real audio decode requires an audio library not present "
            "in this environment"
        )
    rates = (8000, 16000, 22050, 44100, 48000)
    sr = rates[payload[0] % len(rates)]
    n = 1000 * (1 + payload[1])  # fake sample count from the header byte
    dur = (n * 1000) // sr
    rms = f"{(sum(payload[:32]) % 1000) / 1000.0:.4f}"
    return sr, n, dur, rms


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Arrow-batched audio feature extraction, mirroring
    :func:`decode_image_features`: (media_id, payload) batches in,
    fixed-width waveform stats out, payload pruned after this stage.
    The same shape carries real resample/VAD/fingerprint stages — each
    is another mapInPandas over the previous stage's feature frame."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                sr, n, dur, rms = _decode_audio_stub(bytes(payload))
                rows.append((mid, sr, n, dur, rms))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_samples", "duration_ms", "rms"],
            )

    return (
        df.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(decode, AUDIO_FEATURES_SCHEMA)
    )


def _phash_image_stub(payload: bytes) -> int:
    """STUB perceptual hash — 60 bits derived deterministically from
    the payload (the ASCII hex form of the fake sha256 content, see
    attach_fake_media).  A real pHash decodes the image, downsamples
    to 8×8 luma, DCTs, and thresholds the low-frequency coefficients
    against the median; identical content → identical hash, re-encoded
    or slightly-edited content → small Hamming distance.  The stub
    preserves exactly that contract on fake payloads: same content
    bytes → same 60-bit hash."""
    if payload is None or len(payload) < 15:
        raise NotImplementedError(
            "real perceptual hashing requires an imaging library not "
            "present in this environment"
        )
    return int(payload[:15].decode("ascii"), 16)


def perceptual_hash_images(df: DataFrame) -> DataFrame:
    """Arrow-batched perceptual hashing: (media_id, payload) batches
    in, ``(media_id, phash)`` out — the fingerprint stage feeding
    operators.dedup.hamming_pairs_from_fingerprints for image
    near-dup.  Payload bytes die here; downstream blocking moves
    8 bytes per image, not the image."""

    def ph(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": [
                        _phash_image_stub(bytes(p)) for p in pdf["payload"]
                    ],
                }
            )

    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(ph, "media_id long, phash long")
    )
