"""NGTDM (neighbouring gray-tone difference matrix) kernel, 1-D analog.

Reimplements the documented semantics of the reference NGTDM class
(/root/reference/radiomics/ngtdm.py:98-290 + C neighbor-mean scanning
src/cmatrices.c:543-658) on 1-D sequences:

* neighborhood of position p = {p±d : d in distances} (bidirectional);
* a voxel counts only if it has ≥1 valid in-ROI neighbor (Nvp ≤ Np);
* n_i = count of counted voxels with level i; s_i = Σ|i − mean(neighbors)|;
* edge fixups: Coarseness→1e6 when Σpᵢsᵢ==0 (ngtdm.py:149-150),
  Contrast→0 when Ngp==1, Busyness→0 on zero denominator, Strength→0 when
  Σsᵢ==0.

Relational equivalent (DuckDB oracle / pure-SQL path): neighbor mean via
``(sum(level) over rowsBetween(-d,d) − level) / (cnt − 1)`` then
``groupBy(level).agg(count, sum(abs(level − nbr_mean)))``.
"""

from __future__ import annotations

import numpy as np

NGTDM_FEATURES = ("Coarseness", "Contrast", "Busyness", "Complexity", "Strength")


def ngtdm_matrix(levels: np.ndarray, distances: tuple = (1,), valid: np.ndarray | None = None):
    """Returns (n_i, s_i, ivector) over gray levels present with n_i > 0...

    Actually returns ALL gray levels with any ROI presence then drops
    empty ones exactly like the reference (ngtdm.py:113-114): columns where
    n_i == 0 are removed (a level can have ROI voxels but none with valid
    neighbors — such a level keeps s_i but has n_i=0 and IS removed).
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
    lv = levels.astype(np.float64)
    nbr_sum = np.zeros(n, dtype=np.float64)
    nbr_cnt = np.zeros(n, dtype=np.int64)
    for off in offsets:
        if off > 0:
            src = slice(off, n)
            dst = slice(0, n - off)
        else:
            src = slice(0, n + off)
            dst = slice(-off, n)
        ok = valid[src]
        nbr_sum[dst] += np.where(ok, lv[src], 0.0)
        nbr_cnt[dst] += ok.astype(np.int64)

    counted = valid & (nbr_cnt > 0)
    ng_max = int(levels[valid].max())
    n_i = np.zeros(ng_max + 1, dtype=np.float64)
    s_i = np.zeros(ng_max + 1, dtype=np.float64)
    if counted.any():
        mean_nbr = nbr_sum[counted] / nbr_cnt[counted]
        diffs = np.abs(lv[counted] - mean_nbr)
        np.add.at(n_i, levels[counted], 1.0)
        np.add.at(s_i, levels[counted], diffs)
    # drop level 0 slot and levels with n_i == 0 (ngtdm.py:113-114)
    ivector = np.arange(ng_max + 1, dtype=np.float64)
    keep = n_i > 0
    keep[0] = False
    return n_i[keep], s_i[keep], ivector[keep]


def ngtdm_features(levels: np.ndarray, distances: tuple = (1,), valid: np.ndarray | None = None) -> dict:
    n_i, s_i, iv = ngtdm_matrix(levels, distances, valid)
    nvp = n_i.sum()
    if nvp == 0:
        return {f: 0.0 for f in NGTDM_FEATURES}
    p_i = n_i / nvp
    ngp = int(np.sum(n_i > 0))

    out = {}
    sum_coarse = np.sum(p_i * s_i)
    out["Coarseness"] = (1.0 / sum_coarse) if sum_coarse != 0 else 1e6

    div = ngp * (ngp - 1)
    if div != 0:
        contrast = (
            np.sum(p_i[:, None] * p_i[None, :] * (iv[:, None] - iv[None, :]) ** 2)
            * np.sum(s_i) / nvp / div
        )
    else:
        contrast = 0.0
    out["Contrast"] = contrast

    i_pi = iv * p_i
    absdiff = np.abs(i_pi[:, None] - i_pi[None, :])
    # terms with p_i == 0 are already absent (compacted), no masking needed
    denom = absdiff.sum()
    out["Busyness"] = (sum_coarse / denom) if denom != 0 else 0.0

    pi_si = p_i * s_i
    numer = pi_si[:, None] + pi_si[None, :]
    divis = p_i[:, None] + p_i[None, :]
    divis[divis == 0] = 1
    out["Complexity"] = np.sum(np.abs(iv[:, None] - iv[None, :]) * numer / divis) / nvp

    sum_s = s_i.sum()
    if sum_s != 0:
        strength = np.sum((p_i[:, None] + p_i[None, :]) * (iv[:, None] - iv[None, :]) ** 2) / sum_s
    else:
        strength = 0.0
    out["Strength"] = strength

    return {k: float(v) for k, v in out.items()}
