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
    """Per-position (entropy, uniformity, glcm_contrast) over ±radius."""
    n = levels.size
    ent = np.empty(n)
    uni = np.empty(n)
    con = np.empty(n)
    for p in range(n):
        lo = max(0, p - radius)
        hi = min(n, p + radius + 1)
        w = levels[lo:hi]
        cnt = np.bincount(w)
        cnt = cnt[cnt > 0]
        prob = cnt / cnt.sum()
        ent[p] = -np.sum(prob * np.log2(prob + EPS))
        uni[p] = np.sum(prob ** 2)
        if w.size > 1:
            d = np.diff(w.astype(np.float64))
            con[p] = np.mean(d * d)
        else:
            con[p] = 0.0
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
