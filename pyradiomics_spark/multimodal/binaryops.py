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


def image_features(
    df: DataFrame,
    id_cols,
    binary_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """Decode → per-image stats (mean/std per channel, dims) via
    mapInPandas. Shuffle-free; Arrow batches of binary payloads."""
    id_cols = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    key_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name in id_cols
    )
    schema = (
        f"{key_fields}, width int, height int, channels int, "
        "mean_r double, mean_g double, mean_b double, std_gray double"
    )
    src = df.select(*id_cols, binary_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for tup in pdf.itertuples(index=False):
                keys = tup[: len(id_cols)]
                data = tup[len(id_cols)]
                img = decode_image(bytes(data), fake=fake)
                gray = img.mean(axis=2)
                rows.append(
                    list(keys)
                    + [img.shape[1], img.shape[0], img.shape[2],
                       float(img[:, :, 0].mean()), float(img[:, :, 1].mean()),
                       float(img[:, :, 2].mean()), float(gray.std())]
                )
            yield pd.DataFrame(
                rows,
                columns=id_cols
                + ["width", "height", "channels", "mean_r", "mean_g", "mean_b",
                   "std_gray"],
            )

    return src.mapInPandas(run, schema=schema)


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
