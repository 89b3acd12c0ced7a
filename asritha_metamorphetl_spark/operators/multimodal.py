"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

Image HEADER decoding (PNG/BMP/GIF/JPEG dimensions + channels) and WAV
audio decoding are REAL — pure stdlib (``struct``/``zlib``/``wave``), no
Pillow/opencv needed, so the container's lack of media libraries costs
nothing for metadata-level features. Pixel resampling uses Pillow WHEN
the executor environment provides it (lazy per-process probe,
``pillow_or_none``) and otherwise falls back to a clearly-marked
deterministic stub — a real deploy gets real decode with zero code
change; video codec work remains stubbed behind the same Spark
plumbing.

Scale notes: media blobs dominate row size, so the operators (a) never
collect blobs to the driver, (b) run decode/feature steps as mapInPandas
with bounded Arrow batch sizes (spark.sql.execution.arrow.maxRecordsPerBatch
should be lowered for multi-MB blobs), and (c) keep metadata in separate
narrow columns so pure-metadata queries prune the binary column out of the
parquet scan entirely.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
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

#: Output of image feature extraction: per-asset features. width/height/
#: channels come from the REAL header parser when the blob is a valid
#: PNG/BMP/GIF/JPEG (format_detected non-null); otherwise from the
#: deterministic fallback (format_detected null).
FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_hash", StringType(), True),
        StructField("format_detected", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
    ]
)


# ---------------------------------------------------------------------------
# Real image header codecs (pure stdlib — no media library required)
# ---------------------------------------------------------------------------

#: PNG color type → samples per pixel (PNG spec, IHDR colour types).
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_image_meta(blob: bytes) -> tuple[str, int, int, int] | None:
    """Parse (format, width, height, channels) from real image headers.

    Supports PNG (IHDR chunk), BMP (BITMAPINFOHEADER), GIF (logical
    screen descriptor), and JPEG (SOF0/1/2 frame marker scan). Returns
    None for anything unparseable — callers choose their fallback. This
    is an actual decoder of the wire formats, not a stub; only pixel-
    level work (resampling, color stats) needs a media library.
    """
    if not blob or len(blob) < 10:
        return None
    try:
        if blob[:8] == b"\x89PNG\r\n\x1a\n" and blob[12:16] == b"IHDR":
            w, h = struct.unpack(">II", blob[16:24])
            color_type = blob[25]
            return ("png", w, h, _PNG_CHANNELS.get(color_type, 0))
        if blob[:2] == b"BM" and len(blob) >= 30:
            # BITMAPINFOHEADER: signed width/height at offset 18/22,
            # bits-per-pixel at 28 (height may be negative = top-down).
            w, h = struct.unpack("<ii", blob[18:26])
            bpp = struct.unpack("<H", blob[28:30])[0]
            return ("bmp", w, abs(h), max(1, bpp // 8))
        if blob[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", blob[6:10])
            return ("gif", w, h, 3)
        if blob[:2] == b"\xff\xd8":
            # scan JPEG segments for a start-of-frame marker
            i = 2
            while i + 9 < len(blob):
                if blob[i] != 0xFF:
                    break
                marker = blob[i + 1]
                if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                    h, w = struct.unpack(">HH", blob[i + 5 : i + 9])
                    return ("jpeg", w, h, blob[i + 9])
                seg_len = struct.unpack(">H", blob[i + 2 : i + 4])[0]
                i += 2 + seg_len
    except (struct.error, IndexError):
        return None
    return None


def decode_wav_meta(blob: bytes) -> tuple[int, int, int, float] | None:
    """Parse (sample_rate, n_channels, n_frames, rms) from a real WAV
    blob via the stdlib ``wave`` module + numpy over the PCM payload.
    Returns None for non-WAV/corrupt input."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(blob)) as w:
            rate, nch, nframes = (
                w.getframerate(),
                w.getnchannels(),
                w.getnframes(),
            )
            if w.getsampwidth() != 2:
                return (rate, nch, nframes, 0.0)
            pcm = np.frombuffer(w.readframes(nframes), dtype="<i2")
            rms = float(np.sqrt(np.mean(pcm.astype("float64") ** 2))) if pcm.size else 0.0
            return (rate, nch, nframes, round(rms, 4))
    except Exception:
        return None


# ---------------------------------------------------------------------------
# Deterministic encoders — real wire formats, used to synthesize binary
# fixtures (and verified against the decoders above in tests)
# ---------------------------------------------------------------------------


def encode_png(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """A REAL minimal PNG writer: 8-bit RGB, filter-0 scanlines, zlib
    stream, correct CRCs — decodable by any PNG reader."""

    def chunk(tag: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    row = b"\x00" + bytes(rgb) * width
    idat = zlib.compress(row * height)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def encode_bmp(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """A REAL minimal 24-bit BMP writer (BITMAPINFOHEADER, padded
    bottom-up BGR rows)."""
    row = bytes(reversed(rgb)) * width
    pad = (-len(row)) % 4
    pixels = (row + b"\x00" * pad) * height
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40)
    return header + info + pixels


def encode_wav(
    n_frames: int, sample_rate: int = 8000, period: int = 16, amplitude: int = 8000
) -> bytes:
    """A REAL PCM16 mono WAV writer; integer square wave so the payload
    is bit-deterministic (no float synthesis)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        frames = bytearray()
        for i in range(n_frames):
            v = amplitude if (i % period) < period // 2 else -amplitude
            frames += struct.pack("<h", v)
        w.writeframes(bytes(frames))
    return buf.getvalue()


def with_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach byte-size + content-hash metadata (JVM-side, no decode)."""
    return df.withColumns(
        {
            "n_bytes": F.length(F.col(content_col)).cast("long"),
            "content_hash": F.md5(F.col(content_col)),
        }
    )


def _decode_image_stub(blob: bytes) -> tuple[int, int]:
    """Deterministic FALLBACK for blobs the real header parser rejects
    (unknown/corrupt formats): a stable (width, height) derived from the
    blob bytes so the pipeline keeps flowing and the row is identifiable
    by ``format_detected IS NULL``."""
    if not blob:
        return (0, 0)
    return (64 + blob[0] % 64, 64 + blob[-1] % 64)


def extract_image_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary image content.

    Dimensions/channels come from the REAL header parser
    (``decode_image_meta`` — PNG/BMP/GIF/JPEG); unparseable blobs fall
    back to the deterministic stub with ``format_detected`` null.

    mapInPandas (not a row UDF): each Arrow batch crosses the JVM↔Python
    boundary once; the Python loop is per-blob, which is unavoidable for
    codec work. Output drops the blob column — downstream feature joins
    never carry the binary payload.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            blobs = pdf["content"]
            fmts, widths, heights, chans = [], [], [], []
            for b in blobs:
                b = b if b is not None else b""
                meta = decode_image_meta(b)
                if meta is not None:
                    fmts.append(meta[0])
                    widths.append(meta[1])
                    heights.append(meta[2])
                    chans.append(meta[3])
                else:
                    w, h = _decode_image_stub(b)
                    fmts.append(None)
                    widths.append(w)
                    heights.append(h)
                    chans.append(None)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(b) if b is not None else 0 for b in blobs],
                    "content_hash": [
                        hashlib.md5(b).hexdigest() if b is not None else None
                        for b in blobs
                    ],
                    "format_detected": fmts,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "channels": pd.array(chans, dtype="Int32"),
                }
            )

    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)


#: Output of audio feature extraction (real WAV decode).
AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("n_frames", LongType(), True),
        StructField("rms", DoubleType(), True),
    ]
)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Arrow-batched audio feature extraction: REAL WAV decode (stdlib
    ``wave`` + numpy RMS) per blob; non-WAV blobs yield null features.
    Same mapInPandas shape as extract_image_features."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["content"]
            metas = [decode_wav_meta(b if b is not None else b"") for b in blobs]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": [len(b) if b is not None else 0 for b in blobs],
                    "sample_rate": pd.array(
                        [m[0] if m else None for m in metas], dtype="Int32"
                    ),
                    "n_channels": pd.array(
                        [m[1] if m else None for m in metas], dtype="Int32"
                    ),
                    "n_frames": pd.array(
                        [m[2] if m else None for m in metas], dtype="Int64"
                    ),
                    "rms": [m[3] if m else None for m in metas],
                }
            )

    return df.mapInPandas(extract, schema=AUDIO_FEATURE_SCHEMA)


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
        StructField("resized_real", BooleanType(), False),
    ]
)


_PIL_CACHE: list = []  # memoized [module-or-None]; one probe per process


def pillow_or_none():
    """Lazily probe for Pillow ONCE per process; returns the PIL.Image
    module or None. The probe runs wherever the caller runs — inside a
    mapInPandas worker it is per-executor-process, so a deploy that
    ships Pillow in its environment gets real pixel decode with zero
    code change, while this container (no Pillow) takes the
    deterministic fallback."""
    if not _PIL_CACHE:
        try:
            from PIL import Image

            _PIL_CACHE.append(Image)
        except ImportError:
            _PIL_CACHE.append(None)
    return _PIL_CACHE[0]


def _resize_image_stub(blob: bytes, width: int, height: int) -> bytes:
    """Deterministic FALLBACK resizer, used when Pillow is absent or the
    blob doesn't decode. Emits a payload whose size scales with the
    target area, so partition-sizing behavior downstream of a resize is
    exercised realistically even without a media library.
    """
    if not blob:
        return b""
    seed = bytes([blob[0], blob[-1], width % 256, height % 256])
    reps = max(1, (width * height) // (64 * len(seed)))
    return seed * reps


def _resize_image_real(image_mod, blob: bytes, width: int, height: int) -> bytes | None:
    """Real pixel path: decode → resample → re-encode in the source
    format via Pillow. Returns None when the blob doesn't decode (the
    caller falls back to the stub)."""
    import io

    try:
        img = image_mod.open(io.BytesIO(blob))
        fmt = img.format or "PNG"
        buf = io.BytesIO()
        img.resize((width, height)).save(buf, format=fmt)
        return buf.getvalue()
    except Exception:
        return None


def resize_images(
    df: DataFrame, width: int = 224, height: int = 224
) -> DataFrame:
    """Arrow-batched image resize to a fixed target geometry (the
    normalization step before feature extraction / embedding).

    Pixel work uses Pillow when the executor environment has it
    (``pillow_or_none`` probes lazily per process — a real deploy gets
    real decode/resample/re-encode with zero code change); otherwise,
    or for undecodable blobs, the deterministic ``_resize_image_stub``
    keeps the pipeline flowing. ``resized_real`` records which path
    produced each row, so a mixed fleet can't silently pass fakes off
    as pixels.

    Same mapInPandas shape as extract_image_features: one JVM↔Python
    crossing per Arrow batch, per-blob Python only for the codec work.
    Lower ``spark.sql.execution.arrow.maxRecordsPerBatch`` when blobs are
    multi-MB so a batch stays within executor memory."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod = pillow_or_none()
        for pdf in batches:
            out, real_flags = [], []
            for b in pdf["content"]:
                b = b if b is not None else b""
                resized = (
                    _resize_image_real(image_mod, b, width, height)
                    if image_mod is not None
                    else None
                )
                real_flags.append(resized is not None)
                out.append(
                    resized
                    if resized is not None
                    else _resize_image_stub(b, width, height)
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "target_width": width,
                    "target_height": height,
                    "content": out,
                    "n_bytes": [len(b) for b in out],
                    "resized_real": real_flags,
                }
            )

    return df.filter(F.col("media_type") == "image").mapInPandas(
        resize, schema=RESIZED_SCHEMA
    )


def synthesize_assets(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic binary-asset synthesis from an id column — the
    fixture generator for multimodal pipelines, run DISTRIBUTED as
    mapInPandas (each partition encodes its own blobs; nothing collects
    to the driver).

    Closed-form contract (id = the source id):
      - id % 3 == 0 → PNG,  width = 8 + id % 24, height = 8 + (id//3) % 16
      - id % 3 == 1 → BMP,  same geometry, 24-bit
      - id % 3 == 2 → WAV,  mono PCM16 @ 8000 Hz, 64 + id % 128 frames,
        ±8000 square wave (RMS exactly 8000.0)

    Because the geometry is arithmetic on the id, a SQL oracle can verify
    the whole encode→decode roundtrip without being able to read the
    binary itself."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid in pdf[id_col]:
                rid = int(rid)
                w = 8 + rid % 24
                h = 8 + (rid // 3) % 16
                color = (rid % 256, (rid * 7) % 256, (rid * 13) % 256)
                kind = rid % 3
                if kind == 0:
                    blob, media, fmt = encode_png(w, h, color), "image", "png"
                elif kind == 1:
                    blob, media, fmt = encode_bmp(w, h, color), "image", "bmp"
                else:
                    blob, media, fmt = (
                        encode_wav(64 + rid % 128),
                        "audio",
                        "wav",
                    )
                out.append((rid, media, blob, fmt, len(blob)))
            yield pd.DataFrame(
                out, columns=["asset_id", "media_type", "content", "format", "n_bytes"]
            )

    return ids.select(id_col).mapInPandas(synth, schema=ASSET_SCHEMA)


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
