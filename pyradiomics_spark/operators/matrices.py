"""Texture-matrix extraction at the intermediate-matrix granularity — the
analog of accessing ``P_glcm`` / ``P_glrlm`` / … directly
(/root/reference/tests/test_matrices.py:56-65 compares these against .npy
goldens at max-abs 1e-3; examples/helloFeatureClass.py exposes the same).

Output is LONG form per (key…, class): one row per nonzero matrix cell —
``(keys…, matrix, i, j, value)`` where (i, j) are (level_i, level_j) for
glcm, (level, run_len) for glrlm, (level, zone_size) for glszm, (level,
dependence+1) for gldm, and (level, {0=n_i,1=s_i}) for ngtdm. Long form
keeps the schema fixed across documents (matrix shapes vary per case).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from pyradiomics_spark.config import ExtractionSettings
from pyradiomics_spark.functions.text import text_to_intensity
from pyradiomics_spark.kernels import (
    discretize, glcm_matrix, gldm_matrix, glrlm_matrix, glszm_matrix,
    ngtdm_matrix)

MATRIX_CLASSES = ("glcm", "glrlm", "glszm", "ngtdm", "gldm")


def _matrix_rows(levels: np.ndarray, settings: ExtractionSettings, classes) -> list:
    rows = []
    for cls in classes:
        try:
            if cls == "glcm":
                P, gl, _ = glcm_matrix(
                    levels, settings.distances, settings.symmetrical_glcm,
                    settings.weighting_norm)
                for a in range(P.shape[2]):
                    # a pair-less doc yields an all-NaN angle (0/0 normalize);
                    # emit only finite nonzero mass
                    nz = np.argwhere((P[:, :, a] != 0) & np.isfinite(P[:, :, a]))
                    for r, c in nz:
                        rows.append((cls, float(gl[r]), float(gl[c]),
                                     float(P[r, c, a]), int(a)))
            elif cls in ("glrlm", "glszm", "gldm"):
                fn = {"glrlm": glrlm_matrix, "glszm": glszm_matrix}.get(cls)
                if fn is not None:
                    P, iv, jv = fn(levels)
                else:
                    P, iv, jv = gldm_matrix(
                        levels, settings.distances, settings.gldm_a)
                nz = np.argwhere(P != 0)
                for r, c in nz:
                    rows.append((cls, float(iv[r]), float(jv[c]),
                                 float(P[r, c]), 0))
            elif cls == "ngtdm":
                n_i, s_i, iv = ngtdm_matrix(levels, settings.distances)
                for k in range(iv.size):
                    rows.append((cls, float(iv[k]), 0.0, float(n_i[k]), 0))
                    rows.append((cls, float(iv[k]), 1.0, float(s_i[k]), 0))
        except ValueError:
            continue  # empty ROI → no matrix rows
    return rows


def extract_matrices(
    df: DataFrame,
    keys: tuple = ("url", "warc_ts"),
    text_col: str = "text",
    settings: ExtractionSettings | None = None,
    classes=MATRIX_CLASSES,
) -> DataFrame:
    """Long-form texture matrices per input row. Shuffle-free mapInPandas."""
    if settings is None:
        settings = ExtractionSettings()
    keys = tuple(keys)
    key_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name in keys)
    schema = (f"{key_fields}, matrix string, i double, j double, "
              "value double, angle int")
    src = df.select(*keys, text_col)
    classes = tuple(classes)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = list(keys) + ["matrix", "i", "j", "value", "angle"]
        for pdf in batches:
            out = []
            for tup in pdf.itertuples(index=False):
                kv = tup[: len(keys)]
                text = tup[len(keys)] or ""
                vals = text_to_intensity(
                    text, settings.tokenizer, settings.intensity_mode,
                    settings.intensity_buckets).astype(np.float64)
                if vals.size == 0:
                    continue
                levels = discretize(vals, settings.bin_width, settings.bin_count)
                for row in _matrix_rows(levels, settings, classes):
                    out.append(list(kv) + [row[0], row[1], row[2], row[3], row[4]])
            yield pd.DataFrame(out, columns=cols)

    return src.mapInPandas(run, schema=schema)
