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
- **image (PNG / BMP / PPM-PGM / baseline JPEG): REAL** — a from-scratch
  PNG decoder (stdlib ``zlib`` inflate + numpy per-row unfiltering, all
  five PNG filter types, color types gray/RGB/gray+alpha/RGBA at bit
  depth 8), uncompressed 24/32-bit BMP, binary PPM/PGM, and a
  from-scratch baseline-sequential + progressive JPEG codec (canonical
  Huffman + dequant + orthonormal IDCT, 4:4:4/4:2:2/4:2:0 sampling,
  restart markers, SOF2 multi-scan — see ``.jpeg``); features are the
  true dimensions, channel count, luma mean/std, and histogram entropy
  (round-trip and value-level tested). WebP/AVIF/arithmetic-JPEG/
  interlaced-PNG raise in strict mode (arithmetic/ANS entropy coders
  genuinely need external libs).
- **video (YUV4MPEG2): REAL** — uncompressed y4m container parse + frame
  sampling with numpy; features are the true frame count/rate/geometry,
  luma stats, and inter-frame motion energy. Compressed video (mp4/webm)
  raises in strict mode (needs ffmpeg).
- rows that fail or hit a stubbed codec get a deterministic sha256 fake
  feature (``decoded = false``) so downstream plumbing stays testable.

Beyond feature extraction, the module ships the other two pretraining
media stages the brief names: :func:`resize_images` (nearest-neighbor
thumbnail + PNG re-encode) and :func:`sample_frames` (evenly spaced luma
frame extraction from video) — both mapInPandas with bounded Arrow
batches, both value-tested and driver-oracled via construction-derived
VALUES tables (``media_resize`` / ``media_frames``).
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
    DoubleType,
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


# --- image decode (REAL: PNG / BMP / PPM-PGM, from scratch) ---------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (bit depth 8, non-interlaced)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """From-scratch PNG decode: chunk walk, zlib inflate, per-row
    unfiltering (all five filter types) -> (H, W, C) uint8. Supports bit
    depth 8, color types gray/RGB/gray+alpha/RGBA, non-interlaced — the
    overwhelming majority of real PNGs. Palette/16-bit/Adam7 raise
    NotImplementedError (honest stub edge)."""
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _PNG_CHANNELS or interlace:
        raise NotImplementedError(
            f"PNG depth={depth} color={color} interlace={interlace}: only "
            "8-bit gray/RGB/LA/RGBA non-interlaced supported without "
            "external libs"
        )
    ch = _PNG_CHANNELS[color]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    stride = w * ch
    rows = raw.reshape(h, stride + 1)
    ftypes, rows = rows[:, 0], rows[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        r, ft = rows[y], int(ftypes[y])
        if ft == 0:
            cur = r.copy()
        elif ft == 1:  # Sub: prefix sums per channel stride
            cur = r.reshape(w, ch).cumsum(axis=0, dtype=np.int64) % 256
            cur = cur.reshape(stride).astype(np.int32)
        elif ft == 2:  # Up
            cur = (r + prev) % 256
        elif ft == 3:  # Average (left-sequential per pixel, numpy rows)
            cur = np.empty(stride, dtype=np.int32)
            for x in range(w):
                sl = slice(x * ch, (x + 1) * ch)
                a = cur[(x - 1) * ch : x * ch] if x else np.zeros(ch, np.int32)
                cur[sl] = (r[sl] + (a + prev[sl]) // 2) % 256
        elif ft == 4:  # Paeth
            cur = np.empty(stride, dtype=np.int32)
            zero = np.zeros(ch, np.int32)
            for x in range(w):
                sl = slice(x * ch, (x + 1) * ch)
                a = cur[(x - 1) * ch : x * ch] if x else zero
                b = prev[sl]
                c = prev[(x - 1) * ch : x * ch] if x else zero
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                )
                cur[sl] = (r[sl] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = cur
        prev = cur
    return out.astype(np.uint8).reshape(h, w, ch)


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG encoder (8-bit gray/LA/RGB/RGBA; one filter type for
    every row) — deterministic test media + decoder round-trip fixture."""
    import struct
    import zlib

    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = arr.astype(np.int32).reshape(h, w * ch)
    lines = []
    prev = np.zeros(w * ch, dtype=np.int32)
    zero = np.zeros(ch, np.int32)
    for y in range(h):
        cur = flat[y]
        left = np.concatenate([zero, cur[:-ch]])
        ul = np.concatenate([zero, prev[:-ch]])
        if filter_type == 0:
            res = cur
        elif filter_type == 1:
            res = (cur - left) % 256
        elif filter_type == 2:
            res = (cur - prev) % 256
        elif filter_type == 3:
            res = (cur - (left + prev) // 2) % 256
        elif filter_type == 4:
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            res = (cur - pred) % 256
        else:
            raise ValueError(filter_type)
        lines.append(bytes([filter_type]) + res.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return (
            struct.pack(">I", len(data)) + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BI_RGB BMP -> (H, W, 3) uint8 (top-down)."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack("<I", payload[10:14])[0]
    hdr_sz, w, h, _planes, bpp, compression = struct.unpack(
        "<IiiHHI", payload[14:34]
    )
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    step = bpp // 8
    row_bytes = (w * step + 3) & ~3
    flipped = h > 0
    h = abs(h)
    rows = np.frombuffer(
        payload, np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)[:, : w * step].reshape(h, w, step)
    rgb = rows[:, :, 2::-1]  # BGR(A) -> RGB
    return (rgb[::-1] if flipped else rgb).copy()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5), maxval <= 255 -> (H, W, C) uint8."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PPM/PGM")
    ch = 3 if payload[:2] == b"P6" else 1
    # header: magic, width, height, maxval as whitespace-separated tokens
    # (comment lines start with '#')
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit PPM")
    return (
        np.frombuffer(payload, np.uint8, count=w * h * ch, offset=pos)
        .reshape(h, w, ch)
        .copy()
    )


def decode_image(payload: bytes) -> np.ndarray:
    """REAL image decode by magic-byte sniffing: PNG, BMP, binary PPM/PGM,
    and baseline-sequential or progressive JPEG (from-scratch Huffman +
    dequant + IDCT, see .jpeg). Formats whose entropy coding genuinely
    needs external libs (WebP/AVIF arithmetic-ANS coders, arithmetic
    JPEG) raise NotImplementedError — an honest, narrow stub edge."""
    if payload[:8] == _PNG_MAGIC:
        return decode_png(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] in (b"P5", b"P6"):
        return decode_ppm(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise NotImplementedError(
        "image codec not supported without external libs (WebP/AVIF/...)"
    )


IMAGE_FEATURE_NAMES = ["width", "height", "channels", "luma_mean", "luma_std", "entropy"]


def image_features(payload: bytes) -> list[float]:
    """[width, height, channels, luma_mean, luma_std, entropy] from a real
    decode (IMAGE_FEATURE_NAMES); luma = ITU-R 601 on RGB, the gray channel
    otherwise; entropy in bits over the 256-bin luma histogram."""
    img = decode_image(payload)
    h, w, ch = img.shape
    if ch >= 3:
        luma = (
            0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
        )
    else:
        luma = img[:, :, 0].astype(np.float64)
    hist = np.bincount(
        np.clip(luma, 0, 255).astype(np.uint8).ravel(), minlength=256
    )
    p = hist[hist > 0] / luma.size
    entropy = float(-(p * np.log2(p)).sum())
    return [
        float(w), float(h), float(ch),
        float(luma.mean()), float(luma.std()), entropy,
    ]


# --- video decode (REAL: uncompressed YUV4MPEG2) --------------------------


def decode_y4m(payload: bytes, max_frames: int | None = None):
    """YUV4MPEG2 parse -> (luma_frames (T, H, W) uint8, fps). Supports the
    common C420* / C444 / Cmono colorspaces (only the luma plane is read).
    Compressed containers (mp4/webm) raise NotImplementedError."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            "video codec not supported without ffmpeg (mp4/webm/...)"
        )
    nl = payload.index(b"\n")
    w = h = 0
    num, den = 25, 1
    cs = "420"
    for tok in payload[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            num, den = (int(x) for x in t[1:].split(":"))
        elif t[0] == "C":
            cs = t[1:]
    if not w or not h:
        raise ValueError("y4m missing geometry")
    if cs.startswith("420"):
        frame_bytes = w * h * 3 // 2
    elif cs.startswith("444"):
        frame_bytes = w * h * 3
    elif cs.startswith("mono"):
        frame_bytes = w * h
    else:
        raise NotImplementedError(f"y4m colorspace {cs}")
    pos, frames = nl + 1, []
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("bad y4m FRAME marker")
        pos = payload.index(b"\n", pos) + 1
        frames.append(
            np.frombuffer(payload, np.uint8, count=w * h, offset=pos)
            .reshape(h, w)
        )
        pos += frame_bytes
        if max_frames and len(frames) >= max_frames:
            break
    return np.stack(frames), num / den


VIDEO_FEATURE_NAMES = [
    "n_frames", "fps", "width", "height", "luma_mean", "motion"
]


def video_features(payload: bytes, max_frames: int = 64) -> list[float]:
    """[n_frames, fps, width, height, luma_mean, motion] from a real y4m
    decode (VIDEO_FEATURE_NAMES); motion = mean |frame delta| per pixel —
    0 for a static clip, large for scene changes."""
    frames, fps = decode_y4m(payload, max_frames=max_frames)
    t, h, w = frames.shape
    f = frames.astype(np.float64)
    motion = float(np.abs(np.diff(f, axis=0)).mean()) if t > 1 else 0.0
    return [float(t), float(fps), float(w), float(h), float(f.mean()), motion]


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

    Every modality gets a REAL decode for its supported codecs (WAV audio,
    PNG/BMP/PPM images, y4m video — see module docstring); rows in
    unsupported codecs get the sha256 fake with ``decoded = false``, or
    raise in strict mode. batch_rows bounds Arrow batch size: large blobs
    * default 10k-row batches would blow executor memory; the real knob at
    scale is spark.sql.execution.arrow.maxRecordsPerBatch set per-job.
    """

    def one(kind: str, payload) -> tuple[bool, list[float]]:
        p = bytes(payload or b"")
        fn = {
            "audio": audio_features,
            "image": image_features,
            "video": video_features,
        }.get(kind)
        if fn is not None:
            try:
                return True, fn(p)
            except Exception:
                if strict:
                    raise
        elif strict:
            # an unknown modality must not silently ship a sha256 noise
            # vector when the caller asked for strict decoding
            raise ValueError(f"unknown media kind {kind!r} (strict mode)")
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


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("payload", BinaryType()),  # re-encoded PNG
        StructField("luma_mean", DoubleType()),
    ]
)


def _nn_resize(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize by integer index maps (floor mapping
    ``src = dst * src_size // dst_size``) — pure numpy fancy indexing,
    deterministic, no interpolation ties."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[np.ix_(ys, xs)]


def _luma_mean(img: np.ndarray) -> float:
    if img.shape[2] >= 3:
        luma = (
            0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
        )
    else:
        luma = img[:, :, 0].astype(np.float64)
    return float(luma.mean())


def resize_image_payload(payload: bytes, out_w: int, out_h: int) -> tuple[np.ndarray, bytes]:
    """Decode -> nearest-neighbor resize -> PNG re-encode. Returns
    (resized array, png bytes); shared by the Spark op and its oracle."""
    img = _nn_resize(decode_image(payload), out_w, out_h)
    return img, encode_png(img)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    batch_rows: int = 64,
    strict: bool = False,
) -> DataFrame:
    """mapInPandas image resize: every decodable image row is decoded,
    nearest-neighbor resized to (out_w, out_h) and re-encoded as PNG
    (RESIZED_SCHEMA). Undecodable rows and non-image rows are dropped
    (or raise in strict mode) — a thumbnail stage keeps only what it
    could thumbnail. Arrow batch size bounded like extract_features."""
    if out_w < 1 or out_h < 1:
        raise ValueError(f"bad target size {out_w}x{out_h}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = []
                for mid, kind, payload in zip(
                    chunk["media_id"], chunk["kind"], chunk["payload"]
                ):
                    if kind != "image":
                        continue
                    try:
                        img, png = resize_image_payload(
                            bytes(payload or b""), out_w, out_h
                        )
                    except Exception:
                        if strict:
                            raise
                        continue
                    rows.append(
                        (mid, out_w, out_h, img.shape[2], png, _luma_mean(img))
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "width", "height", "channels",
                        "payload", "luma_mean",
                    ],
                )

    return df.mapInPandas(gen, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),  # grayscale PNG of the luma plane
        StructField("luma_mean", DoubleType()),
    ]
)


def frame_sample_indices(n_frames: int, n_samples: int) -> list[int]:
    """Evenly spaced frame picks ``k * n_frames // n_samples`` (k = 0..n-1),
    de-duplicated when the clip is shorter than the sample count.
    Deterministic integer math; shared by the Spark op and its oracle."""
    return sorted({(k * n_frames) // n_samples for k in range(n_samples)})


def sample_frames(
    df: DataFrame,
    n_samples: int = 4,
    batch_rows: int = 16,
    strict: bool = False,
) -> DataFrame:
    """mapInPandas video frame sampling: each decodable video row explodes
    into ``n_samples`` evenly spaced luma frames, each re-encoded as a
    grayscale PNG (FRAME_SCHEMA) — the pretraining frame-extraction stage.
    Undecodable / non-video rows drop (or raise in strict mode)."""
    if n_samples < 1:
        raise ValueError(f"n_samples must be >= 1, got {n_samples}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = []
                for mid, kind, payload in zip(
                    chunk["media_id"], chunk["kind"], chunk["payload"]
                ):
                    if kind != "video":
                        continue
                    try:
                        frames, _fps = decode_y4m(bytes(payload or b""))
                    except Exception:
                        if strict:
                            raise
                        continue
                    t, h, w = frames.shape
                    for idx in frame_sample_indices(t, n_samples):
                        luma = frames[idx]
                        rows.append(
                            (
                                mid, idx, t, w, h,
                                encode_png(luma),
                                float(luma.astype(np.float64).mean()),
                            )
                        )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "frame_idx", "n_frames", "width",
                        "height", "payload", "luma_mean",
                    ],
                )

    return df.mapInPandas(gen, schema=FRAME_SCHEMA)


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


def synth_png(
    width: int, height: int, seed: int = 0, channels: int = 3,
    filter_type: int = 0,
) -> bytes:
    """Deterministic gradient PNG (real, decodable) as test media."""
    y, x = np.mgrid[0:height, 0:width]
    base = (x * 3 + y * 5 + seed * 17) % 256
    img = np.stack(
        [(base + 31 * c) % 256 for c in range(channels)], axis=2
    ).astype(np.uint8)
    return encode_png(img, filter_type=filter_type)


def synth_y4m(
    width: int = 32, height: int = 24, n_frames: int = 8,
    fps: int = 25, motion_step: int = 0, seed: int = 0,
) -> bytes:
    """Deterministic YUV4MPEG2 (C420) clip; ``motion_step`` shifts the luma
    gradient per frame (0 = perfectly static clip)."""
    header = f"YUV4MPEG2 W{width} H{height} F{fps}:1 Ip A1:1 C420jpeg\n"
    y, x = np.mgrid[0:height, 0:width]
    out = [header.encode("ascii")]
    chroma = np.full((height // 2) * (width // 2) * 2, 128, np.uint8).tobytes()
    for t in range(n_frames):
        luma = ((x * 7 + y * 3 + seed + t * motion_step) % 256).astype(np.uint8)
        out.append(b"FRAME\n" + luma.tobytes() + chroma)
    return b"".join(out)


def synth_jpeg(
    w: int, h: int, seed: int = 0, subsample: bool = False, quality: int = 90
) -> bytes:
    """Deterministic smooth RGB baseline JPEG (from-scratch encoder —
    see .jpeg). Smooth content keeps quantization error small and the
    byte stream stable across platforms (all arithmetic is exact numpy
    float64 + integer rounding)."""
    from .jpeg import encode_jpeg

    yy, xx = np.mgrid[0:h, 0:w]
    arr = np.clip(
        np.stack(
            [
                128 + 80 * np.sin((xx + seed) / 9.0) + 20 * np.cos(yy / 7.0),
                100 + 0.5 * xx + 0.8 * yy + (seed % 40),
                200 - 60 * np.sin((xx + yy + 2 * seed) / 11.0),
            ],
            axis=2,
        ),
        0,
        255,
    ).astype(np.uint8)
    return encode_jpeg(arr, quality=quality, subsample=subsample)


def media_payload(i: int) -> tuple[str, str, bytes]:
    """(kind, mime, payload) for row i of the deterministic media table —
    the ONE recipe shared by :func:`sample_media_df` and the driver-side
    oracle builders (entry_queries), so the construction-derived VALUES
    oracles can never drift from the Spark-side table. Image rows cycle
    PNG (all five row filters), baseline JPEG 4:4:4 (i % 12 == 3) and
    JPEG 4:2:0 (i % 12 == 9); every 9th media row is an
    unsupported-codec blob exercising the fallback path."""
    kind = ("image", "audio", "video")[i % 3]
    if i % 9 == 8:  # undecodable payloads: fallback/strict path
        return (
            kind,
            "application/octet-stream",
            hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 5),
        )
    if kind == "audio":
        return kind, "audio/wav", synth_wav(220.0 + 10 * i, 0.05 + 0.01 * (i % 5))
    if kind == "image":
        if i % 12 == 3:
            return kind, "image/jpeg", synth_jpeg(24 + i, 16 + (i % 7), seed=i)
        if i % 12 == 9:
            return (
                kind,
                "image/jpeg",
                synth_jpeg(24 + i, 16 + (i % 7), seed=i, subsample=True),
            )
        return (
            kind,
            "image/png",
            synth_png(
                24 + i, 16 + (i % 7), seed=i,
                channels=(1, 3, 4)[i % 3], filter_type=i % 5,
            ),
        )
    return (
        kind,
        "video/mp4",
        synth_y4m(32, 24, n_frames=4 + i % 5, motion_step=(i % 4) * 3, seed=i),
    )


def sample_media_df(spark, n: int = 32) -> DataFrame:
    """Deterministic synthetic media table for plumbing tests. EVERY
    modality carries real decodable payloads (WAV sines, gradient PNGs
    cycling all five row filters, baseline JPEGs in both 4:4:4 and 4:2:0,
    y4m clips), except every 9th media row which is an unsupported-codec
    blob exercising the fallback path. Row recipe: :func:`media_payload`."""
    rows = []
    for i in range(n):
        kind, mime, payload = media_payload(i)
        rows.append(
            (
                f"m-{i:05d}",
                kind,
                mime,
                bytearray(payload),
                64 + i if kind == "image" else None,
                48 + i if kind == "image" else None,
                1000 * i if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
