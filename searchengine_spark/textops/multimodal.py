"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a metadata struct.
The Spark-side plumbing (schemas, batch iteration via mapInPandas, bounded
batch sizes so a partition of large blobs can't OOM an executor) is real
and tested.

Decode status per modality:

- **audio (WAV/PCM): REAL** — stdlib ``wave`` + numpy decode of 8/16/32-bit
  PCM, mono-mixed; features are the true duration, RMS energy,
  zero-crossing rate, and peak amplitude (value-level tested against
  synthesized sine waves).
- **image / video: STUBBED** — the decode libraries (Pillow/ffmpeg) are
  not in this container; their rows get a deterministic sha256 fake
  feature (``decoded = false``) so downstream plumbing stays testable, and
  strict mode raises NotImplementedError instead.
"""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
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
        StructField("decoded", BooleanType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

# feature vector layout for decoded audio rows
AUDIO_FEATURE_NAMES = ["duration_s", "rms", "zero_crossing_rate", "peak"]


def _decode_image(payload: bytes) -> np.ndarray:
    """STUB: real impl would be PIL.Image.open(BytesIO(payload)).
    Raises in strict mode; extract_features falls back to the fake."""
    raise NotImplementedError("image decode requires Pillow (not in container)")


def _decode_video(payload: bytes) -> np.ndarray:
    """STUB: real impl would frame-sample via ffmpeg/PyAV."""
    raise NotImplementedError("video decode requires ffmpeg (not in container)")


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL decode: WAV container, 8/16/32-bit PCM -> (mono float64 samples
    in [-1, 1], sample_rate). Raises on anything that isn't valid WAV."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n, rate = w.getnframes(), w.getframerate()
        width, ch = w.getsampwidth(), w.getnchannels()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, rate


def audio_features(payload: bytes) -> list[float]:
    """[duration_s, rms, zero_crossing_rate, peak] from a WAV payload
    (AUDIO_FEATURE_NAMES). All numpy; no external audio libs."""
    x, rate = decode_wav(payload)
    if not len(x):
        return [0.0, 0.0, 0.0, 0.0]
    duration = len(x) / rate
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))) / len(x)
    peak = float(np.max(np.abs(x)))
    return [duration, rms, zcr, peak]


def _fake_feature(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in feature for the stubbed modalities: bytes of
    sha256 scaled to [0,1). Keeps the full pipeline (schema, batching,
    downstream ANN) testable."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:dim]]


def extract_features(df: DataFrame, batch_rows: int = 64, strict: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary media payloads.

    Audio rows get REAL WAV features (audio_features); image/video rows get
    the sha256 fake with ``decoded = false`` (or raise in strict mode).
    batch_rows bounds Arrow batch size: large blobs * default 10k-row
    batches would blow executor memory; the real knob at scale is
    spark.sql.execution.arrow.maxRecordsPerBatch set per-job.
    """

    def one(kind: str, payload) -> tuple[bool, list[float]]:
        p = bytes(payload or b"")
        if kind == "audio":
            try:
                return True, audio_features(p)
            except Exception:
                if strict:
                    raise
                return False, _fake_feature(p)
        if strict:
            (_decode_image if kind == "image" else _decode_video)(p)
        return False, _fake_feature(p)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                payloads = chunk["payload"]
                decoded_feat = [
                    one(k, p) for k, p in zip(chunk["kind"], payloads)
                ]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "kind": chunk["kind"],
                        "payload_sha": payloads.map(
                            lambda p: hashlib.sha256(p or b"").hexdigest()
                        ),
                        "n_bytes": payloads.map(lambda p: len(p or b"")).astype("int64"),
                        "decoded": [d for d, _ in decoded_feat],
                        "feature": [f for _, f in decoded_feat],
                    }
                )

    return df.mapInPandas(gen, schema=FEATURE_SCHEMA)


def synth_wav(
    freq_hz: float, duration_s: float, rate: int = 8000, amplitude: float = 0.5
) -> bytes:
    """Deterministic 16-bit mono PCM sine wave as WAV bytes (test media)."""
    n = int(round(duration_s * rate))
    t = np.arange(n, dtype=np.float64) / rate
    x = (amplitude * np.sin(2 * np.pi * freq_hz * t) * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def sample_media_df(spark, n: int = 32) -> DataFrame:
    """Deterministic synthetic media table for plumbing tests. Audio rows
    carry REAL WAV payloads (synthesized sines) so the decode path runs."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "audio":
            payload = synth_wav(220.0 + 10 * i, 0.05 + 0.01 * (i % 5))
        else:
            payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 5)
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
