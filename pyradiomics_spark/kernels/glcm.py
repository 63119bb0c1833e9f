"""GLCM (gray-level co-occurrence matrix) kernel, 1-D sequence analog.

Reimplements the documented semantics of the reference GLCM class
(/root/reference/radiomics/glcm.py:123-887 + C pair counting
src/cmatrices.c:4-92) for 1-D token-intensity sequences:

* one "angle" per distance δ (the 1-D analog of the 13 3-D angles):
  directed pairs (level[p], level[p+δ]) counted when both positions are
  valid (masked positions break adjacency, like out-of-ROI voxels);
* gray levels absent from the ROI are dropped before feature math
  (glcm.py:149-152) — affects normalization;
* optional symmetrization P + Pᵀ (glcm.py:155-157);
* optional distance weighting exp(-‖δ‖²) then sum over angles
  (glcm.py:160-182; in 1-D all norms coincide);
* empty angles dropped when >1 angle (glcm.py:187-198); per-angle
  normalization; per-angle features then nan-mean over angles;
* edge fixups: Correlation→1 on zero sigma (glcm.py:409), Imc1→0 on
  zero max(HX,HY) (glcm.py:609-610), Imc2→0 where HXY2==HXY (glcm.py:645),
  MCC→1 when <2 gray levels (glcm.py:702-703), InverseVariance skips k=0.

The Spark-side pair counting can equivalently be expressed relationally as
``lag(level, δ) over (partition by entity, ts order by pos)`` followed by
``groupBy(i, j, δ).count()`` — that form is used for the DuckDB oracle; this
numpy kernel is the applyInPandas fast path.
"""

from __future__ import annotations

import numpy as np

from pyradiomics_spark.config import EPS

GLCM_FEATURES = (
    "Autocorrelation", "JointAverage", "ClusterProminence", "ClusterShade",
    "ClusterTendency", "Contrast", "Correlation", "DifferenceAverage",
    "DifferenceEntropy", "DifferenceVariance", "JointEnergy", "JointEntropy",
    "Imc1", "Imc2", "Idm", "MCC", "Idmn", "Id", "Idn", "InverseVariance",
    "MaximumProbability", "SumAverage", "SumEntropy", "SumSquares",
)


def glcm_matrix(
    levels: np.ndarray,
    distances: tuple = (1,),
    symmetric: bool = True,
    weighting_norm: str | None = None,
    valid: np.ndarray | None = None,
):
    """Build the (compacted) GLCM tensor.

    Returns ``(P, gray_levels, Ng_max)`` where ``P`` has shape
    (Ng', Ng', Na) of per-angle **normalized** probabilities (NaN-filled for
    an all-empty single angle), ``gray_levels`` the sorted distinct levels
    present, ``Ng_max`` the maximum level (normalization constant for
    Idmn/Idn and the k-value ranges).
    """
    levels = np.asarray(levels, dtype=np.int64)
    n = levels.size
    if valid is None:
        valid = np.ones(n, dtype=bool)
    else:
        valid = np.asarray(valid, dtype=bool)

    gray_levels = np.unique(levels[valid])
    if gray_levels.size == 0:
        raise ValueError("empty ROI")
    ng_max = int(gray_levels.max())
    idx = np.full(ng_max + 1, -1, dtype=np.int64)
    idx[gray_levels] = np.arange(gray_levels.size)

    na = len(distances)
    G = gray_levels.size
    P = np.zeros((G, G, na), dtype=np.float64)
    for a, d in enumerate(distances):
        d = int(d)
        if d <= 0 or d >= n:
            continue
        both = valid[:-d] & valid[d:]
        li = levels[:-d][both]
        lj = levels[d:][both]
        if li.size:
            flat = idx[li] * G + idx[lj]
            P[:, :, a] = np.bincount(flat, minlength=G * G).reshape(G, G)

    if symmetric:
        P = P + P.transpose(1, 0, 2)

    if weighting_norm is not None:
        # 1-D: manhattan/euclidean/infinity all give exp(-δ²); unit spacing
        if weighting_norm == "no_weighting":
            w = np.ones(na)
        else:
            w = np.exp(-np.asarray(distances, dtype=np.float64) ** 2)
        P = np.sum(P * w[None, None, :], axis=2, keepdims=True)

    sums = P.sum(axis=(0, 1))  # per angle
    if P.shape[2] > 1:
        keep = sums != 0
        if not keep.all():
            P = P[:, :, keep]
            sums = sums[keep]
    sums = sums.astype(np.float64)
    sums[sums == 0] = np.nan
    P = P / sums[None, None, :]
    return P, gray_levels.astype(np.float64), ng_max


def glcm_features(
    levels: np.ndarray,
    distances: tuple = (1,),
    symmetric: bool = True,
    weighting_norm: str | None = None,
    valid: np.ndarray | None = None,
) -> dict:
    """All 24 active GLCM features, per-angle then mean over angles.

    (The reference nan-means over angles; empty angles are already deleted
    in glcm_matrix when >1 angle exists, and a single empty angle yields NaN
    under both mean and nanmean — so plain mean is equivalent and faster.)
    """
    P, gl, ng_max = glcm_matrix(levels, distances, symmetric, weighting_norm, valid)
    eps = EPS
    na = P.shape[2]
    i = gl[:, None, None]          # (Ng,1,1) actual gray-level values
    j = gl[None, :, None]          # (1,Ng,1)

    k_sum = np.arange(2, 2 * ng_max + 1, dtype=np.float64)
    k_diff = np.arange(0, ng_max, dtype=np.float64)

    px = P.sum(axis=1, keepdims=True)   # (Ng,1,Na)
    py = P.sum(axis=0, keepdims=True)   # (1,Ng,Na)
    ux = np.sum(i * P, axis=(0, 1), keepdims=True)  # (1,1,Na)
    uy = np.sum(j * P, axis=(0, 1), keepdims=True)

    # p(x+y), p(x−y): (len(k), Na) via index-bincount (k ranges over the
    # FULL 2..2Ng / 0..Ng−1 grids even when levels are compacted)
    sum_idx = (gl[:, None] + gl[None, :] - 2).astype(np.int64).ravel()
    diff_idx = np.abs(gl[:, None] - gl[None, :]).astype(np.int64).ravel()
    p_add = np.empty((k_sum.size, na))
    p_sub = np.empty((k_diff.size, na))
    for a in range(na):
        flat = P[:, :, a].ravel()
        p_add[:, a] = np.bincount(sum_idx, weights=flat, minlength=k_sum.size)
        p_sub[:, a] = np.bincount(diff_idx, weights=flat, minlength=k_diff.size)

    HXY = -np.sum(P * np.log2(P + eps), axis=(0, 1))  # (Na,)

    out = {}
    out["Autocorrelation"] = np.mean(np.sum(P * (i * j), axis=(0, 1)))
    out["JointAverage"] = float(np.mean(ux))
    out["ClusterProminence"] = np.mean(np.sum(P * ((i + j) - ux - uy) ** 4, axis=(0, 1)))
    out["ClusterShade"] = np.mean(np.sum(P * ((i + j) - ux - uy) ** 3, axis=(0, 1)))
    out["ClusterTendency"] = np.mean(np.sum(P * ((i + j) - ux - uy) ** 2, axis=(0, 1)))
    out["Contrast"] = np.mean(np.sum(P * np.abs(i - j) ** 2, axis=(0, 1)))

    sigx = np.sum(P * (i - ux) ** 2, axis=(0, 1), keepdims=True) ** 0.5
    sigy = np.sum(P * (j - uy) ** 2, axis=(0, 1), keepdims=True) ** 0.5
    corm = np.sum(P * (i - ux) * (j - uy), axis=(0, 1), keepdims=True)
    corr = corm / (sigx * sigy + eps)
    corr[sigx * sigy == 0] = 1  # flat per angle → 1 (glcm.py:409)
    out["Correlation"] = float(np.mean(corr))

    diffavg = np.sum(k_diff[:, None] * p_sub, axis=0)
    out["DifferenceAverage"] = float(np.mean(diffavg))
    out["DifferenceEntropy"] = float(np.mean(-np.sum(p_sub * np.log2(p_sub + eps), axis=0)))
    out["DifferenceVariance"] = float(
        np.mean(np.sum(p_sub * (k_diff[:, None] - diffavg[None, :]) ** 2, axis=0))
    )
    out["JointEnergy"] = float(np.mean(np.sum(P ** 2, axis=(0, 1))))
    out["JointEntropy"] = float(np.mean(HXY))

    HX = -np.sum(px * np.log2(px + eps), axis=(0, 1))
    HY = -np.sum(py * np.log2(py + eps), axis=(0, 1))
    HXY1 = -np.sum(P * np.log2(px * py + eps), axis=(0, 1))
    HXY2 = -np.sum(px * py * np.log2(px * py + eps), axis=(0, 1))
    div = np.fmax(HX, HY)
    imc1 = HXY - HXY1
    imc1 = np.where(div != 0, imc1 / np.where(div != 0, div, 1.0), 0.0)
    out["Imc1"] = float(np.mean(imc1))
    imc2 = (1 - np.exp(-2.0 * (HXY2 - HXY))) ** 0.5
    imc2 = np.where(HXY2 == HXY, 0.0, imc2)
    out["Imc2"] = float(np.mean(imc2))

    out["Idm"] = float(np.mean(np.sum(p_sub / (1 + k_diff[:, None] ** 2), axis=0)))

    # MCC: second-largest eigenvalue of Q(i,j) = Σ_k p(i,k)p(j,k)/(px(i)py(k)+eps)
    if gl.size < 2:
        out["MCC"] = 1.0  # flat region (glcm.py:702-703)
    else:
        mcc_vals = np.empty(na)
        for a in range(na):
            Pa = P[:, :, a]
            pxa = Pa.sum(axis=1)  # (Ng,)
            pya = Pa.sum(axis=0)
            Q = (Pa[:, None, :] * Pa[None, :, :] / (pxa[:, None, None] * pya[None, None, :] + eps)).sum(axis=2)
            ev = np.linalg.eigvals(Q)
            ev.sort()
            mcc_vals[a] = np.real(np.sqrt(ev[-2]))
        out["MCC"] = float(np.mean(mcc_vals))

    out["Idmn"] = float(np.mean(np.sum(p_sub / (1 + k_diff[:, None] ** 2 / ng_max ** 2), axis=0)))
    out["Id"] = float(np.mean(np.sum(p_sub / (1 + k_diff[:, None]), axis=0)))
    out["Idn"] = float(np.mean(np.sum(p_sub / (1 + k_diff[:, None] / ng_max), axis=0)))
    out["InverseVariance"] = float(np.mean(np.sum(p_sub[1:, :] / k_diff[1:, None] ** 2, axis=0)))
    out["MaximumProbability"] = float(np.mean(np.max(P, axis=(0, 1))))
    out["SumAverage"] = float(np.mean(np.sum(k_sum[:, None] * p_add, axis=0)))
    out["SumEntropy"] = float(np.mean(-np.sum(p_add * np.log2(p_add + eps), axis=0)))
    out["SumSquares"] = float(np.mean(np.sum(P * (i - ux) ** 2, axis=(0, 1))))

    return {k: float(v) for k, v in out.items()}
