"""GLDM (gray-level dependence matrix) kernel, 1-D sequence analog.

Reimplements the documented semantics of the reference GLDM class
(/root/reference/radiomics/gldm.py:84-434 + C dependence counting
src/cmatrices.c:660-754) on 1-D sequences:

* neighborhood of position p = {p±d : d in distances} (bidirectional);
* dependence of p = #valid neighbors j with |level(p) − level(j)| ≤ α
  (α = ``gldm_a``, default 0); every in-ROI voxel contributes one count at
  (level, dep) — a voxel with no valid neighbors has dep 0;
* matrix column for dependence d carries jvector value d+1
  (gldm.py:112 ``jvector = arange(1, Nd+1)`` over 0-based dep columns);
* Nz = Np (every voxel counted once); GLV/DV/DE normalize by Nz first.
"""

from __future__ import annotations

import numpy as np

from pyradiomics_spark.config import EPS

GLDM_FEATURES = (
    "SmallDependenceEmphasis", "LargeDependenceEmphasis",
    "GrayLevelNonUniformity", "DependenceNonUniformity",
    "DependenceNonUniformityNormalized", "GrayLevelVariance",
    "DependenceVariance", "DependenceEntropy", "LowGrayLevelEmphasis",
    "HighGrayLevelEmphasis", "SmallDependenceLowGrayLevelEmphasis",
    "SmallDependenceHighGrayLevelEmphasis", "LargeDependenceLowGrayLevelEmphasis",
    "LargeDependenceHighGrayLevelEmphasis",
)


def gldm_matrix(
    levels: np.ndarray,
    distances: tuple = (1,),
    alpha: float = 0.0,
    valid: np.ndarray | None = None,
):
    """Returns (P, ivector, jvector) — compacted dependence matrix.

    P[g, d] = #voxels with gray level ivector[g] and dependence jvector[d]-1.
    """
    levels = np.asarray(levels, dtype=np.int64)
    n = levels.size
    if valid is None:
        valid = np.ones(n, dtype=bool)
    else:
        valid = np.asarray(valid, dtype=bool)
    if not valid.any():
        raise ValueError("empty ROI")

    offsets = sorted({int(s * d) for d in distances for s in (-1, 1) if int(d) > 0})
    # offsets beyond the sequence length have no neighbors (the C scanner's
    # per-voxel bounds check, cmatrices.c) — and would corrupt the negative
    # slice arithmetic below
    offsets = [o for o in offsets if abs(o) < n]
    dep = np.zeros(n, dtype=np.int64)
    for off in offsets:
        if off > 0:
            src = slice(off, n)
            dst = slice(0, n - off)
        else:
            src = slice(0, n + off)
            dst = slice(-off, n)
        ok = valid[src] & (np.abs(levels[dst] - levels[src]) <= alpha)
        dep[dst] += ok.astype(np.int64)

    lv = levels[valid]
    dp = dep[valid]
    ivector = np.unique(lv)
    jdeps = np.unique(dp)
    gi = np.searchsorted(ivector, lv)
    ji = np.searchsorted(jdeps, dp)
    P = np.zeros((ivector.size, jdeps.size), dtype=np.float64)
    np.add.at(P, (gi, ji), 1.0)
    jvector = (jdeps + 1).astype(np.float64)  # dep d ↔ j = d+1 (gldm.py:112)
    return P, ivector.astype(np.float64), jvector


def gldm_features(
    levels: np.ndarray,
    distances: tuple = (1,),
    alpha: float = 0.0,
    valid: np.ndarray | None = None,
) -> dict:
    P, iv, jv = gldm_matrix(levels, distances, alpha, valid)
    eps = EPS
    pd = P.sum(axis=0)
    pg = P.sum(axis=1)
    nz = P.sum()
    if nz == 0:
        nz = 1.0

    out = {}
    out["SmallDependenceEmphasis"] = np.sum(pd / jv ** 2) / nz
    out["LargeDependenceEmphasis"] = np.sum(pd * jv ** 2) / nz
    out["GrayLevelNonUniformity"] = np.sum(pg ** 2) / nz
    out["DependenceNonUniformity"] = np.sum(pd ** 2) / nz
    out["DependenceNonUniformityNormalized"] = np.sum(pd ** 2) / nz ** 2

    pg_n = pg / nz
    u_i = np.sum(pg_n * iv)
    out["GrayLevelVariance"] = np.sum(pg_n * (iv - u_i) ** 2)
    pd_n = pd / nz
    u_j = np.sum(pd_n * jv)
    out["DependenceVariance"] = np.sum(pd_n * (jv - u_j) ** 2)
    Pn = P / nz
    out["DependenceEntropy"] = -np.sum(Pn * np.log2(Pn + eps))

    out["LowGrayLevelEmphasis"] = np.sum(pg / iv ** 2) / nz
    out["HighGrayLevelEmphasis"] = np.sum(pg * iv ** 2) / nz
    ii = iv[:, None]
    jj = jv[None, :]
    out["SmallDependenceLowGrayLevelEmphasis"] = np.sum(P / (ii ** 2 * jj ** 2)) / nz
    out["SmallDependenceHighGrayLevelEmphasis"] = np.sum(P * ii ** 2 / jj ** 2) / nz
    out["LargeDependenceLowGrayLevelEmphasis"] = np.sum(P * jj ** 2 / ii ** 2) / nz
    out["LargeDependenceHighGrayLevelEmphasis"] = np.sum(P * ii ** 2 * jj ** 2) / nz

    return {k: float(v) for k, v in out.items()}
