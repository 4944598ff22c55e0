"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schema, Arrow batch shape, mapInPandas
signatures, partitioning — is real and tested; the actual codec work is
stubbed (the sandbox has no image/audio libraries): ``decode_stub``
raises NotImplementedError, ``fake_features`` produces deterministic
pseudo-features from the bytes (crc32-derived), so downstream plumbing
can be exercised end-to-end.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),        # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),      # opaque bytes
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("width", T.IntegerType()),       # fake-decoded
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: utf-8 bytes as the
    opaque payload (stands in for real image/audio blobs)."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def decode_stub(payload: bytes, mime: str):  # pragma: no cover - stub
    """Real codec entry point — requires PIL/ffmpeg, absent in sandbox."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; wire PIL/torchaudio/ffmpeg here in production"
    )


def _fake_feature_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payload = pdf["payload"]
        n_bytes = payload.map(len).astype("int32")
        checksum = payload.map(lambda b: zlib.crc32(bytes(b))).astype("int64")
        width = (checksum % 1920 + 1).astype("int32")
        height = (checksum % 1080 + 1).astype("int32")
        n_frames = ((checksum % 240) + 1).astype("int32")
        n_frames = n_frames.where(pdf["kind"] == "video", 1).astype("int32")
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": n_bytes,
                "checksum": checksum,
                "width": width,
                "height": height,
                "n_frames": n_frames,
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.  With a
    real codec, swap `_fake_feature_batches` internals for decode +
    resize/frame-sample; the Spark plumbing (schema, batching,
    partitioning) is identical."""
    return media.select("media_id", "kind", "payload").mapInPandas(
        _fake_feature_batches, schema=FEATURES_SCHEMA
    )


def sample_frames(media: DataFrame, max_frames: int = 8) -> DataFrame:
    """Frame sampling plumbing: one row per sampled frame, the frame
    payload a contiguous byte slice of the media blob.

    This is the real Spark shape of a frame sampler — row-expanding
    fan-out (posexplode over a sequence), byte-offset arithmetic, binary
    slicing — all JVM-side Catalyst expressions, no Python.  A real
    video codec replaces the byte-slice with decoded frames at the same
    (media_id, frame_idx, payload) schema; frame COUNT here is a
    deterministic stand-in (n_bytes mod max_frames + 1 for video,
    1 otherwise) so the fan-out is verifiable cross-engine."""
    n_bytes = F.octet_length("payload")
    n_frames = F.when(
        F.col("kind") == "video", F.pmod(n_bytes, F.lit(max_frames)) + 1
    ).otherwise(F.lit(1))
    step = F.floor(n_bytes / n_frames).cast("int")
    ex = media.select(
        "media_id",
        "kind",
        "payload",
        n_bytes.alias("n_bytes"),
        step.alias("step"),
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("pos", "frame_idx"),
    )
    frame = F.expr("substring(payload, frame_idx * step + 1, step)")
    return ex.select(
        "media_id",
        "kind",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        (F.col("frame_idx") * F.col("step")).cast("long").alias("byte_offset"),
        frame.alias("frame_payload"),
        F.octet_length(frame).cast("long").alias("frame_bytes"),
    )


def thumbnail(media: DataFrame, width: int = 64, height: int = 64,
              head_bytes: int = 16) -> DataFrame:
    """Resize/thumbnail plumbing: per-media fixed-size derived payload.
    The codec is stubbed (head-byte slice stands in for the resized
    pixel buffer — the sandbox has no PIL/ffmpeg); schema, dimensions
    metadata, and the binary column shape are the production contract."""
    return media.select(
        "media_id",
        "kind",
        F.lit(width).alias("width"),
        F.lit(height).alias("height"),
        F.expr(f"substring(payload, 1, {head_bytes})").alias("thumb_payload"),
        F.least(F.octet_length("payload"), F.lit(head_bytes))
        .cast("long")
        .alias("thumb_bytes"),
    )
