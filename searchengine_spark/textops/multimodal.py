"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a metadata struct.
The Spark-side plumbing (schemas, batch iteration via mapInPandas, bounded
batch sizes so a partition of large blobs can't OOM an executor) is real
and tested; the actual media decode is STUBBED — the decode libraries
(Pillow/ffmpeg/etc.) are not available in this container. Each stub either
raises NotImplementedError (strict mode) or produces a deterministic fake
feature so downstream plumbing is testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("payload_sha", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _decode_image(payload: bytes) -> np.ndarray:
    """STUB: real impl would be PIL.Image.open(BytesIO(payload)).
    Raises in strict mode; extract_features uses the deterministic fake."""
    raise NotImplementedError("image decode requires Pillow (not in container)")


def _fake_feature(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in feature: bytes of sha256 scaled to [0,1).
    Keeps the full pipeline (schema, batching, downstream ANN) testable."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:dim]]


def extract_features(df: DataFrame, batch_rows: int = 64, strict: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary media payloads.

    batch_rows bounds Arrow batch size: large blobs * default 10k-row
    batches would blow executor memory; the real knob at scale is
    spark.sql.execution.arrow.maxRecordsPerBatch set per-job.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                payloads = chunk["payload"]
                if strict:
                    payloads.map(_decode_image)  # raises NotImplementedError
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "kind": chunk["kind"],
                        "payload_sha": payloads.map(
                            lambda p: hashlib.sha256(p or b"").hexdigest()
                        ),
                        "n_bytes": payloads.map(lambda p: len(p or b"")).astype("int64"),
                        "feature": payloads.map(_fake_feature),
                    }
                )

    return df.mapInPandas(gen, schema=FEATURE_SCHEMA)


def sample_media_df(spark, n: int = 32) -> DataFrame:
    """Deterministic synthetic media table for plumbing tests."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 5)
        kind = ("image", "audio", "video")[i % 3]
        rows.append(
            (
                f"m-{i:05d}",
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                bytearray(payload),
                64 + i if kind == "image" else None,
                48 + i if kind == "image" else None,
                1000 * i if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
