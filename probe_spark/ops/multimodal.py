"""Multimodal column plumbing: images/audio/video as opaque binary columns.

The Spark side is real and tested — schema, partition-size-aware batching,
Arrow-batched UDF signatures over ``mapInPandas``.  Decode is two-tier:
payloads that actually ARE recognized media (PNG/JPEG/WAV by magic bytes)
go through the REAL decoders in ``ops/codecs.py`` (pure zlib+numpy PNG,
stdlib ``wave``, Pillow/soundfile first when importable); anything else
falls back to the deterministic fakes, which remain the documented
stand-in for formats that need a third-party codec (and the path the
synthetic-fixture correctness oracles compare against).

Design rules for 100 TB of binaries:
  * binaries ride in their own column so Parquet column pruning keeps
    metadata-only queries from touching them;
  * ``mapInPandas`` (not a scalar UDF) so one Python worker invocation
    handles a whole Arrow batch and can drop/emit rows (corrupt samples);
  * outputs are fixed-width feature columns, never re-encoded blobs, so
    downstream stages shuffle features, not media.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("sample_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("byte_mean", FloatType(), False),
        StructField("phash", StringType(), False),
        StructField("status", StringType(), False),
    ]
)

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("sample_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_feature", ArrayType(FloatType(), False), False),
    ]
)

# pixels/rms/duration are float64: the feature math runs in f64 and f32
# storage would truncate below the 6-dp rounding the correctness oracles
# compare at
IMAGE_RESIZE_SCHEMA = StructType(
    [
        StructField("sample_id", LongType(), False),
        StructField("out_w", IntegerType(), False),
        StructField("out_h", IntegerType(), False),
        StructField("pixels", ArrayType(DoubleType(), False), False),
        StructField("status", StringType(), False),
    ]
)

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("sample_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("duration_ms", DoubleType(), False),
        StructField("rms", DoubleType(), False),
        StructField("zero_crossings", IntegerType(), False),
        StructField("status", StringType(), False),
    ]
)


def _fake_decode_image(data: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a real decoder: derive (w, h) from content.

    Raises on empty payloads the way a real decoder raises on corrupt files,
    so the error-row path is exercised for real.
    """
    if not data:
        raise ValueError("empty image payload")
    return 16 + data[0] % 64, 16 + data[-1] % 64


def image_features(df: DataFrame, id_col: str = "sample_id",
                   bin_col: str = "image") -> DataFrame:
    """Decode + feature-extract images: (sample_id, width, height, n_bytes,
    byte_mean, phash, status); corrupt rows come back with status='error'
    instead of failing the task."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from probe_spark.ops import codecs

        for pdf in it:
            rows = []
            for sid, data in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(data) if data is not None else b""
                try:
                    real = codecs.decode_image(b) if b else None
                    if real is not None:
                        w, h, gray = real
                        mean = (
                            float(gray.mean())
                            if gray is not None
                            else float(np.frombuffer(b, dtype=np.uint8).mean())
                        )
                    else:
                        w, h = _fake_decode_image(b)
                        arr = np.frombuffer(b, dtype=np.uint8)
                        mean = float(arr.mean()) if len(arr) else 0.0
                    rows.append(
                        (
                            int(sid), w, h, len(b), mean,
                            __import__("hashlib").md5(b).hexdigest()[:16],
                            "ok",
                        )
                    )
                except (ValueError, OSError):
                    rows.append((int(sid), 0, 0, len(b), 0.0, "", "error"))
            yield pd.DataFrame(
                rows,
                columns=[
                    "sample_id", "width", "height", "n_bytes",
                    "byte_mean", "phash", "status",
                ],
            )

    return df.select(id_col, bin_col).mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def image_resize(
    df: DataFrame,
    out_w: int = 8,
    out_h: int = 8,
    id_col: str = "sample_id",
    bin_col: str = "image",
) -> DataFrame:
    """Resize to a fixed out_w x out_h grayscale pixel array.

    The "decoded image" is the deterministic fake (bytes = row-major
    grayscale); resize = mean-pool fold into out_w*out_h cells — a real
    deployment swaps the two marked lines for PIL decode + PIL resize and
    keeps the identical batch/schema plumbing.  Output is a fixed-width
    float array, so downstream stages shuffle out_w*out_h floats per
    sample, never the source blob."""
    n_px = out_w * out_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from probe_spark.ops import codecs

        for pdf in it:
            rows = []
            for sid, data in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(data) if data is not None else b""
                try:
                    real = codecs.decode_image(b) if b else None
                    if real is not None and real[2] is not None:
                        # real pixels (PNG/Pillow): true area-average
                        # resize of the decoded grayscale image
                        px = codecs.resize_area_f64(
                            real[2], out_w, out_h
                        ).reshape(n_px)
                    else:
                        _fake_decode_image(b)  # raises on empty payloads
                        arr = np.frombuffer(b, dtype=np.uint8).astype(
                            np.float64
                        )
                        pad = (-len(arr)) % n_px
                        px = np.pad(arr, (0, pad)).reshape(-1, n_px).mean(
                            axis=0
                        )
                    rows.append((int(sid), out_w, out_h, px.tolist(), "ok"))
                except (ValueError, OSError):
                    rows.append((int(sid), out_w, out_h, [], "error"))
            yield pd.DataFrame(
                rows, columns=["sample_id", "out_w", "out_h", "pixels", "status"]
            )

    return df.select(id_col, bin_col).mapInPandas(batches, IMAGE_RESIZE_SCHEMA)


def audio_features(
    df: DataFrame,
    sample_rate: int = 16_000,
    id_col: str = "sample_id",
    bin_col: str = "audio",
) -> DataFrame:
    """Audio decode + feature extraction: duration, RMS level, zero
    crossings.  The fake decoder reads the payload as int16 PCM mono at
    ``sample_rate`` (a deployment swaps it for soundfile/torchaudio inside
    the same batch function); corrupt/empty rows return status='error'."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from probe_spark.ops import codecs

        for pdf in it:
            rows = []
            for sid, data in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(data) if data is not None else b""
                if len(b) < 2:
                    rows.append((int(sid), len(b), 0.0, 0.0, 0, "error"))
                    continue
                if codecs.sniff(b) == "wav":
                    # real WAV parse: true sample rate/channels, PCM
                    # decoded to mono; rms reported on the int16 scale
                    # the raw-PCM fallback uses
                    try:
                        mono, rate = codecs.decode_wav(b)
                    except ValueError:
                        rows.append((int(sid), len(b), 0.0, 0.0, 0, "error"))
                        continue
                    pcm = mono * 32768.0
                    dur = len(pcm) / rate * 1000.0
                else:
                    pcm = np.frombuffer(
                        b[: len(b) - len(b) % 2], dtype="<i2"
                    ).astype(np.float64)
                    dur = len(pcm) / sample_rate * 1000.0
                if not len(pcm):
                    rows.append((int(sid), len(b), 0.0, 0.0, 0, "error"))
                    continue
                rms = float(np.sqrt(np.mean(pcm * pcm)))
                zc = int(np.count_nonzero(np.signbit(pcm[1:]) != np.signbit(pcm[:-1])))
                rows.append((int(sid), len(b), float(dur), rms, zc, "ok"))
            yield pd.DataFrame(
                rows,
                columns=[
                    "sample_id", "n_bytes", "duration_ms",
                    "rms", "zero_crossings", "status",
                ],
            )

    return df.select(id_col, bin_col).mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


def frame_sample(
    df: DataFrame,
    n_frames: int = 4,
    feat_dim: int = 8,
    id_col: str = "sample_id",
    bin_col: str = "video",
) -> DataFrame:
    """Sample n_frames per video and emit a small feature vector per frame
    (row-expanding mapInPandas: one input row -> n output rows)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fidx, feats = [], [], []
            for sid, data in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(data) if data is not None else b""
                if not b:
                    continue
                arr = np.frombuffer(b, dtype=np.uint8).astype(np.float32)
                for f in range(n_frames):
                    # deterministic fake "frame": strided slice + fold to feat_dim
                    sl = arr[f::n_frames]
                    if len(sl) == 0:
                        sl = np.zeros(feat_dim, dtype=np.float32)
                    pad = (-len(sl)) % feat_dim
                    folded = np.pad(sl, (0, pad)).reshape(-1, feat_dim).mean(axis=0)
                    ids.append(int(sid))
                    fidx.append(f)
                    feats.append(folded.tolist())
            yield pd.DataFrame(
                {"sample_id": ids, "frame_idx": fidx, "frame_feature": feats}
            )

    return df.select(id_col, bin_col).mapInPandas(batches, FRAME_SAMPLE_SCHEMA)
