"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed via mapInPandas (Arrow batches of bytes).

The Spark-side mechanics — schemas, batch shapes, partition-preserving
transforms, deterministic fake decoders for tests — are REAL; the actual
codec calls are stubbed (image/audio libraries are not in this container)
behind ``NotImplementedError`` with a deterministic fake used when
``fake=True``. A production deployment swaps ``_decode_image_real`` etc.
for Pillow/torchaudio/ffmpeg calls; nothing else changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "width int, height int, channels int, format string"
)
AUDIO_META_SCHEMA = "sample_rate int, n_samples bigint, channels int"


def _decode_image_real(data: bytes) -> np.ndarray:  # pragma: no cover
    raise NotImplementedError(
        "image codecs not available in this container; "
        "swap in PIL.Image.open(io.BytesIO(data)) in production"
    )


def _decode_image_fake(data: bytes) -> np.ndarray:
    """Deterministic fake decode: md5-EXPANDED 8×8×3 uint8 'image' — 12
    digests of md5(data ++ ':' ++ i) concatenated into 192 pixel bytes.
    Same bytes → same pixels on any executor, and (unlike a PCG stream)
    exactly reproducible in SQL via md5 + hex parse, so the decode
    PLUMBING itself carries a DuckDB oracle twin (`image_stats` gate row)
    — the same engine-agnostic expansion as similarity._planes."""
    chunks = [hashlib.md5(data + b":%d" % i).digest() for i in range(12)]
    return np.frombuffer(b"".join(chunks), dtype=np.uint8).reshape(8, 8, 3)


def decode_image(data: bytes, fake: bool = False) -> np.ndarray:
    return _decode_image_fake(data) if fake else _decode_image_real(data)


_IMAGE_STAT_COLS = ["width", "height", "channels",
                    "mean_r", "mean_g", "mean_b", "std_gray"]
_IMAGE_STAT_SCHEMA = ("width int, height int, channels int, mean_r double, "
                      "mean_g double, mean_b double, std_gray double")


def _binary_map(df: DataFrame, id_cols, binary_col: str,
                out_cols: list, out_schema: str, per_payload) -> DataFrame:
    """Shared mapInPandas scaffold for all binary-column ops: select keys +
    payload, stream Arrow batches, apply ``per_payload(bytes) -> list`` per
    row. ONE copy of the decode plumbing — the production codec swap point
    ('swap _decode_*_real in; nothing else changes') lives here."""
    id_cols = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    key_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name in id_cols)
    src = df.select(*id_cols, binary_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                list(tup[: len(id_cols)]) + per_payload(bytes(tup[len(id_cols)]))
                for tup in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(rows, columns=id_cols + out_cols)

    return src.mapInPandas(run, schema=f"{key_fields}, {out_schema}")


def _image_stat_row(img: np.ndarray) -> list:
    gray = img.mean(axis=2)
    return [img.shape[1], img.shape[0], img.shape[2],
            float(img[:, :, 0].mean()), float(img[:, :, 1].mean()),
            float(img[:, :, 2].mean()), float(gray.std())]


def image_features(
    df: DataFrame,
    id_cols,
    binary_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """Decode → per-image stats (mean/std per channel, dims) via
    mapInPandas. Shuffle-free; Arrow batches of binary payloads."""
    return _binary_map(
        df, id_cols, binary_col, _IMAGE_STAT_COLS, _IMAGE_STAT_SCHEMA,
        lambda data: _image_stat_row(decode_image(data, fake=fake)))


def _decode_audio_fake(data: bytes, n_samples: int = 256) -> np.ndarray:
    """Deterministic fake PCM decode: md5-expanded byte stream centered to
    [−128, 127] doubles — engine-reproducible like the image fake."""
    chunks = [hashlib.md5(data + b":a%d" % i).digest()
              for i in range((n_samples + 15) // 16)]
    raw = np.frombuffer(b"".join(chunks), dtype=np.uint8)[:n_samples]
    return raw.astype(np.float64) - 128.0


def _decode_audio_real(data: bytes) -> np.ndarray:  # pragma: no cover
    raise NotImplementedError(
        "audio codecs not available in this container; "
        "swap in torchaudio/soundfile decode in production")


def decode_audio(data: bytes, fake: bool = False,
                 n_samples: int = 256) -> np.ndarray:
    return (_decode_audio_fake(data, n_samples) if fake
            else _decode_audio_real(data))


def audio_features(
    df: DataFrame,
    id_cols,
    binary_col: str = "payload",
    fake: bool = True,
    n_samples: int = 256,
) -> DataFrame:
    """Decode → per-clip stats (mean, RMS, zero-crossing rate) via
    mapInPandas — the audio leg of the multimodal surface; same
    shuffle-free Arrow-batch shape as image_features."""

    def stats(data: bytes) -> list:
        s = decode_audio(data, fake=fake, n_samples=n_samples)
        return [s.size, float(s.mean()), float(np.sqrt((s * s).mean())),
                float((s[1:] * s[:-1] < 0).mean())]

    return _binary_map(
        df, id_cols, binary_col, ["n_samples", "mean", "rms", "zcr"],
        "n_samples int, mean double, rms double, zcr double", stats)


def resize_image_nn(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize — the deterministic plumbing op (a
    production path swaps PIL resampling in behind the same signature)."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return img[ri][:, ci]


def image_resize_stats(
    df: DataFrame,
    id_cols,
    binary_col: str = "payload",
    out_h: int = 4,
    out_w: int = 4,
    fake: bool = True,
) -> DataFrame:
    """decode → nearest-neighbor resize → channel stats: the resize leg of
    the multimodal surface, same per-image schema as image_features."""
    return _binary_map(
        df, id_cols, binary_col, _IMAGE_STAT_COLS, _IMAGE_STAT_SCHEMA,
        lambda data: _image_stat_row(resize_image_nn(
            decode_image(data, fake=fake), out_h, out_w)))


def frame_sample_plan(
    df: DataFrame,
    id_col: str,
    n_frames_col: str,
    every_k: int = 30,
) -> DataFrame:
    """Video frame-sampling PLAN: expand (video, n_frames) → one row per
    sampled frame index — pure relational (sequence + explode), the decode
    of each sampled frame is then a mapInPandas over this plan."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every_k))
        ).alias("frame_idx"),
    )
