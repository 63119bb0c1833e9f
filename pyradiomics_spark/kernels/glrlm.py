"""GLRLM (gray-level run-length matrix) kernel, 1-D sequence analog.

Reimplements the documented semantics of the reference GLRLM class
(/root/reference/radiomics/glrlm.py:97-523 + C run scanning
src/cmatrices.c:299-541) on 1-D token-intensity sequences:

* runs = maximal stretches of consecutive equal levels; masked-out
  positions break runs (like out-of-ROI voxels breaking runs in C);
* in 1-D there is a single angle, so the per-angle nan-mean is trivial;
* raw counts (not normalized); Nr = total number of runs is the
  per-feature denominator; gray levels / run lengths with zero mass are
  dropped before feature math (affects nothing numerically here but kept
  for matrix-golden parity);
* GLV/RV/RE divide by Nr to get the normalized matrix first.

Relational equivalent used for the DuckDB oracle: classic gaps-and-islands —
``run_id = sum(level != lag(level)) over (order by pos)`` then
``groupBy(run_id, level).count() → groupBy(level, runlen).count()``.
"""

from __future__ import annotations

import numpy as np

from pyradiomics_spark.config import EPS

GLRLM_FEATURES = (
    "ShortRunEmphasis", "LongRunEmphasis", "GrayLevelNonUniformity",
    "GrayLevelNonUniformityNormalized", "RunLengthNonUniformity",
    "RunLengthNonUniformityNormalized", "RunPercentage", "GrayLevelVariance",
    "RunVariance", "RunEntropy", "LowGrayLevelRunEmphasis",
    "HighGrayLevelRunEmphasis", "ShortRunLowGrayLevelEmphasis",
    "ShortRunHighGrayLevelEmphasis", "LongRunLowGrayLevelEmphasis",
    "LongRunHighGrayLevelEmphasis",
)


def run_lengths(levels: np.ndarray, valid: np.ndarray | None = None):
    """Run-length encode: returns (run_level, run_length) int arrays.

    Invalid positions break runs and are excluded.
    """
    levels = np.asarray(levels, dtype=np.int64)
    n = levels.size
    if valid is None:
        valid = np.ones(n, dtype=bool)
    else:
        valid = np.asarray(valid, dtype=bool)
    if n == 0 or not valid.any():
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)

    # new run when: position invalid→valid boundary, or level change, or gap
    brk = np.ones(n, dtype=bool)
    brk[1:] = (levels[1:] != levels[:-1]) | ~valid[:-1]
    brk &= valid
    run_start_idx = np.flatnonzero(brk)
    # length of each run = distance to next break among valid positions
    run_ids = np.cumsum(brk) - 1            # -1 for positions before first run
    run_ids[~valid] = -1
    lengths = np.bincount(run_ids[run_ids >= 0], minlength=run_start_idx.size)
    return levels[run_start_idx], lengths.astype(np.int64)


def glrlm_matrix(levels: np.ndarray, valid: np.ndarray | None = None, rle=None):
    """Build the compacted GLRLM.

    Returns (P, ivector, jvector): P shape (Ng', Nr') raw counts with empty
    gray levels and run lengths dropped, ivector = present gray levels,
    jvector = present run lengths. ``rle``: optional precomputed
    (run_level, run_length) pair shared with GLSZM (same encoding in 1-D).
    """
    rl_level, rl_len = rle if rle is not None else run_lengths(levels, valid)
    if rl_level.size == 0:
        raise ValueError("empty ROI")
    ivector = np.unique(rl_level)
    jvector = np.unique(rl_len)
    gi = np.searchsorted(ivector, rl_level)
    ji = np.searchsorted(jvector, rl_len)
    P = np.zeros((ivector.size, jvector.size), dtype=np.float64)
    np.add.at(P, (gi, ji), 1.0)
    return P, ivector.astype(np.float64), jvector.astype(np.float64)


def glrlm_features(levels: np.ndarray, valid: np.ndarray | None = None, rle=None) -> dict:
    P, iv, jv = glrlm_matrix(levels, valid, rle=rle)
    eps = EPS
    nr = P.sum()
    pr = P.sum(axis=0)  # per run length
    pg = P.sum(axis=1)  # per gray level

    out = {}
    out["ShortRunEmphasis"] = np.sum(pr / jv ** 2) / nr
    out["LongRunEmphasis"] = np.sum(pr * jv ** 2) / nr
    out["GrayLevelNonUniformity"] = np.sum(pg ** 2) / nr
    out["GrayLevelNonUniformityNormalized"] = np.sum(pg ** 2) / nr ** 2
    out["RunLengthNonUniformity"] = np.sum(pr ** 2) / nr
    out["RunLengthNonUniformityNormalized"] = np.sum(pr ** 2) / nr ** 2
    np_voxels = np.sum(pr * jv)
    out["RunPercentage"] = nr / np_voxels

    pg_n = pg / nr
    u_i = np.sum(pg_n * iv)
    out["GrayLevelVariance"] = np.sum(pg_n * (iv - u_i) ** 2)
    pr_n = pr / nr
    u_j = np.sum(pr_n * jv)
    out["RunVariance"] = np.sum(pr_n * (jv - u_j) ** 2)
    Pn = P / nr
    out["RunEntropy"] = -np.sum(Pn * np.log2(Pn + eps))

    out["LowGrayLevelRunEmphasis"] = np.sum(pg / iv ** 2) / nr
    out["HighGrayLevelRunEmphasis"] = np.sum(pg * iv ** 2) / nr
    ii = iv[:, None]
    jj = jv[None, :]
    out["ShortRunLowGrayLevelEmphasis"] = np.sum(P / (ii ** 2 * jj ** 2)) / nr
    out["ShortRunHighGrayLevelEmphasis"] = np.sum(P * ii ** 2 / jj ** 2) / nr
    out["LongRunLowGrayLevelEmphasis"] = np.sum(P * jj ** 2 / ii ** 2) / nr
    out["LongRunHighGrayLevelEmphasis"] = np.sum(P * ii ** 2 * jj ** 2) / nr

    return {k: float(v) for k, v in out.items()}
