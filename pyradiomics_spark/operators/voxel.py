"""Voxel-based (per-position) feature maps — the analog of the reference's
``voxelBased=True`` mode (/root/reference/radiomics/base.py:200-245): for
every position, features over the kernel neighborhood rowsBetween(−r, +r),
truncated at sequence edges (masked kernel, base.py:99-111).

First-order rolling stats are pure window functions
(``operators.windows.rolling_firstorder``). The histogram/texture maps here
(entropy, uniformity, GLCM contrast per position) need a per-window
histogram, so they run as a numpy kernel inside mapInPandas — batched, like
the reference's ``voxelBatch`` (base.py:214-237).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from pyradiomics_spark.config import EPS, ExtractionSettings
from pyradiomics_spark.functions.text import text_to_intensity
from pyradiomics_spark.kernels import discretize


def _rolling_maps(levels: np.ndarray, radius: int):
    """Per-position (entropy, uniformity, glcm_contrast) over ±radius,
    fully vectorized: per-gray-level prefix sums give every window's count
    in O(n) per level (G is small after discretization), and the contrast
    map is a prefix sum over squared adjacent diffs — no per-position
    python loop (the voxelBatch analog, base.py:214-237, but vectorized
    instead of chunked)."""
    n = levels.size
    G = int(levels.max()) if n else 0
    pos = np.arange(n)
    lo = np.maximum(0, pos - radius)
    hi = np.minimum(n, pos + radius + 1)
    size = (hi - lo).astype(np.float64)
    ent = np.zeros(n)
    uni = np.zeros(n)
    for g in range(1, G + 1):
        c = np.concatenate(([0], np.cumsum(levels == g)))
        p = (c[hi] - c[lo]) / size
        # zero-count levels contribute an exact 0 (−0·log2(eps) == 0)
        ent -= p * np.log2(p + EPS)
        uni += p * p
    if n > 1:
        d = np.diff(levels.astype(np.float64))
        D = np.concatenate(([0.0], np.cumsum(d * d)))
        m = np.maximum(hi - lo - 1, 1)
        con = np.where(hi - lo > 1, (D[np.maximum(hi - 1, 0)] - D[lo]) / m, 0.0)
    else:
        con = np.zeros(n)
    return ent, uni, con


def rolling_texture(
    df: DataFrame,
    keys: tuple = ("url", "warc_ts"),
    text_col: str = "text",
    radius: int = 2,
    settings: ExtractionSettings | None = None,
) -> DataFrame:
    """Per-position texture maps: one output row per token position."""
    if settings is None:
        settings = ExtractionSettings(bin_width=1.0)
    keys = tuple(keys)
    key_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name in keys)
    schema = (f"{key_fields}, pos int, level int, roll_entropy double, "
              "roll_uniformity double, roll_contrast double")
    src = df.select(*keys, text_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = list(keys) + ["pos", "level", "roll_entropy",
                             "roll_uniformity", "roll_contrast"]
        for pdf in batches:
            out = []
            for tup in pdf.itertuples(index=False):
                kv = list(tup[: len(keys)])
                text = tup[len(keys)] or ""
                vals = text_to_intensity(
                    text, settings.tokenizer, settings.intensity_mode,
                    settings.intensity_buckets).astype(np.float64)
                if vals.size == 0:
                    continue
                levels = discretize(vals, settings.bin_width, settings.bin_count)
                ent, uni, con = _rolling_maps(levels, radius)
                for p in range(levels.size):
                    out.append(kv + [p, int(levels[p]), float(ent[p]),
                                     float(uni[p]), float(con[p])])
            yield pd.DataFrame(out, columns=cols)

    return src.mapInPandas(run, schema=schema)
