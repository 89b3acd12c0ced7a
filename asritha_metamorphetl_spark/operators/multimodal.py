"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The container has no media libraries, so DECODING is stubbed (clearly
marked, deterministic fake or NotImplementedError) — but everything Spark
cares about is real and tested: the schema contract, Arrow-batched
``mapInPandas`` plumbing, partition sizing for large blobs, and the
metadata extraction path.

Scale notes: media blobs dominate row size, so the operators (a) never
collect blobs to the driver, (b) run decode/feature steps as mapInPandas
with bounded Arrow batch sizes (spark.sql.execution.arrow.maxRecordsPerBatch
should be lowered for multi-MB blobs), and (c) keep metadata in separate
narrow columns so pure-metadata queries prune the binary column out of the
parquet scan entirely.
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

#: Schema contract for a multimodal asset table.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("format", StringType(), True),  # png|wav|mp4|...
        StructField("n_bytes", LongType(), True),
    ]
)

#: Output of feature extraction (decode stub): per-asset features.
FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_hash", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def with_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach byte-size + content-hash metadata (JVM-side, no decode)."""
    return df.withColumns(
        {
            "n_bytes": F.length(F.col(content_col)).cast("long"),
            "content_hash": F.md5(F.col(content_col)),
        }
    )


def _decode_image_stub(blob: bytes) -> tuple[int, int]:
    """STUB — deterministic fake decoder.

    A real implementation would use Pillow/opencv (not in this container):
    ``Image.open(io.BytesIO(blob)).size``. The fake derives a stable
    (width, height) from the blob bytes so the full pipeline remains
    testable end-to-end.
    """
    if not blob:
        return (0, 0)
    return (64 + blob[0] % 64, 64 + blob[-1] % 64)


def extract_image_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary image content.

    mapInPandas (not a row UDF): each Arrow batch crosses the JVM↔Python
    boundary once; the Python loop is per-blob, which is unavoidable for
    codec work. Output drops the blob column — downstream feature joins
    never carry the binary payload.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            blobs = pdf["content"]
            dims = [
                _decode_image_stub(b if b is not None else b"") for b in blobs
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(b) if b is not None else 0 for b in blobs],
                    "content_hash": [
                        hashlib.md5(b).hexdigest() if b is not None else None
                        for b in blobs
                    ],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)


#: Output of the resize step: original identity + target geometry + the
#: resized payload (still binary — the next pipeline stage's input).
RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("target_width", IntegerType(), False),
        StructField("target_height", IntegerType(), False),
        StructField("content", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def _resize_image_stub(blob: bytes, width: int, height: int) -> bytes:
    """STUB — deterministic fake resizer.

    A real implementation decodes, resamples, and re-encodes
    (``Image.open(...).resize((w, h)).save(buf, format)``) — Pillow is not
    in this container. The fake emits a deterministic payload whose size
    scales with the target area, so partition-sizing behavior downstream
    of a resize is exercised realistically.
    """
    if not blob:
        return b""
    seed = bytes([blob[0], blob[-1], width % 256, height % 256])
    reps = max(1, (width * height) // (64 * len(seed)))
    return seed * reps


def resize_images(
    df: DataFrame, width: int = 224, height: int = 224
) -> DataFrame:
    """Arrow-batched image resize to a fixed target geometry (the
    normalization step before feature extraction / embedding).

    Same mapInPandas shape as extract_image_features: one JVM↔Python
    crossing per Arrow batch, per-blob Python only for the codec work.
    Lower ``spark.sql.execution.arrow.maxRecordsPerBatch`` when blobs are
    multi-MB so a batch stays within executor memory."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                _resize_image_stub(b if b is not None else b"", width, height)
                for b in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "target_width": width,
                    "target_height": height,
                    "content": out,
                    "n_bytes": [len(b) for b in out],
                }
            )

    return df.filter(F.col("media_type") == "image").mapInPandas(
        resize, schema=RESIZED_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_nth: int = 30) -> DataFrame:
    """Video frame-sampling PLAN: expands each video asset into frame-row
    stubs (asset_id, frame_index) without decoding. A real decoder slots
    into the downstream mapInPandas; the expansion itself — the part that
    changes row counts and partition sizing — is real Spark.

    Frame count is a stub: derived deterministically from n_bytes (a real
    implementation reads the container header).
    """
    n_frames = (F.coalesce(F.col("n_bytes"), F.lit(0)) % 300 + 1).cast("int")
    return (
        df.filter(F.col("media_type") == "video")
        .withColumn("n_frames", n_frames)
        .select(
            "asset_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("n_frames") - 1, F.lit(every_nth)
                )
            ).alias("frame_index"),
        )
    )
