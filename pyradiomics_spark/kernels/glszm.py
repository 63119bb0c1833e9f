"""GLSZM (gray-level size-zone matrix) kernel, 1-D sequence analog.

Reimplements the documented semantics of the reference GLSZM class
(/root/reference/radiomics/glszm.py:75-436 + C region growing
src/cmatrices.c:94-297). In a 1-D sequence, connected zones under the
2-neighborhood ARE maximal runs, so zone extraction shares the run-length
encoder with GLRLM; the matrices differ only in normalization:

* Nz = number of zones; Np = Σ ps·j = number of voxels;
* GLSZM is rotation-independent (one matrix, no angle dimension);
* GLV/ZV/ZE divide by Nz first (glszm.py:261-305).
"""

from __future__ import annotations

import numpy as np

from pyradiomics_spark.config import EPS
from pyradiomics_spark.kernels.glrlm import run_lengths

GLSZM_FEATURES = (
    "SmallAreaEmphasis", "LargeAreaEmphasis", "GrayLevelNonUniformity",
    "GrayLevelNonUniformityNormalized", "SizeZoneNonUniformity",
    "SizeZoneNonUniformityNormalized", "ZonePercentage", "GrayLevelVariance",
    "ZoneVariance", "ZoneEntropy", "LowGrayLevelZoneEmphasis",
    "HighGrayLevelZoneEmphasis", "SmallAreaLowGrayLevelEmphasis",
    "SmallAreaHighGrayLevelEmphasis", "LargeAreaLowGrayLevelEmphasis",
    "LargeAreaHighGrayLevelEmphasis",
)


def glszm_matrix(levels: np.ndarray, valid: np.ndarray | None = None, rle=None):
    """Zones = 1-D connected runs. Returns (P, ivector, jvector).
    ``rle``: optional precomputed (level, length) pair shared with GLRLM."""
    z_level, z_size = rle if rle is not None else run_lengths(levels, valid)
    if z_level.size == 0:
        raise ValueError("empty ROI")
    ivector = np.unique(z_level)
    jvector = np.unique(z_size)
    gi = np.searchsorted(ivector, z_level)
    ji = np.searchsorted(jvector, z_size)
    P = np.zeros((ivector.size, jvector.size), dtype=np.float64)
    np.add.at(P, (gi, ji), 1.0)
    return P, ivector.astype(np.float64), jvector.astype(np.float64)


def glszm_features(levels: np.ndarray, valid: np.ndarray | None = None, rle=None) -> dict:
    P, iv, jv = glszm_matrix(levels, valid, rle=rle)
    eps = EPS
    ps = P.sum(axis=0)
    pg = P.sum(axis=1)
    nz = P.sum()
    if nz == 0:
        nz = 1.0
    np_voxels = np.sum(ps * jv)
    if np_voxels == 0:
        np_voxels = 1.0

    out = {}
    out["SmallAreaEmphasis"] = np.sum(ps / jv ** 2) / nz
    out["LargeAreaEmphasis"] = np.sum(ps * jv ** 2) / nz
    out["GrayLevelNonUniformity"] = np.sum(pg ** 2) / nz
    out["GrayLevelNonUniformityNormalized"] = np.sum(pg ** 2) / nz ** 2
    out["SizeZoneNonUniformity"] = np.sum(ps ** 2) / nz
    out["SizeZoneNonUniformityNormalized"] = np.sum(ps ** 2) / nz ** 2
    out["ZonePercentage"] = nz / np_voxels

    pg_n = pg / nz
    u_i = np.sum(pg_n * iv)
    out["GrayLevelVariance"] = np.sum(pg_n * (iv - u_i) ** 2)
    ps_n = ps / nz
    u_j = np.sum(ps_n * jv)
    out["ZoneVariance"] = np.sum(ps_n * (jv - u_j) ** 2)
    Pn = P / nz
    out["ZoneEntropy"] = -np.sum(Pn * np.log2(Pn + eps))

    out["LowGrayLevelZoneEmphasis"] = np.sum(pg / iv ** 2) / nz
    out["HighGrayLevelZoneEmphasis"] = np.sum(pg * iv ** 2) / nz
    ii = iv[:, None]
    jj = jv[None, :]
    out["SmallAreaLowGrayLevelEmphasis"] = np.sum(P / (ii ** 2 * jj ** 2)) / nz
    out["SmallAreaHighGrayLevelEmphasis"] = np.sum(P * ii ** 2 / jj ** 2) / nz
    out["LargeAreaLowGrayLevelEmphasis"] = np.sum(P * jj ** 2 / ii ** 2) / nz
    out["LargeAreaHighGrayLevelEmphasis"] = np.sum(P * ii ** 2 * jj ** 2) / nz

    return {k: float(v) for k, v in out.items()}
