"""Sequence-shape descriptors — the 1-D analog of the reference's shape
class (SURVEY.md §2.4.7): gray-level-INDEPENDENT descriptors of ROI extent.

3-D mesh geometry (marching cubes, PCA axes) has no token-stream analog, so
we map the *spirit*: extent, compactness, and mass-distribution moments of
the valid-token positions. Flagged optional in the build plan; excluded from
reference allclose parity (the reference computes shape only on 3-D masks,
featureextractor.py:521-529). Deterministic and golden-tested like the rest.
"""

from __future__ import annotations

import numpy as np

SEQSHAPE_FEATURES = (
    "NTokens", "ValidFraction", "SpanStart", "SpanEnd", "SpanLength",
    "Compactness", "NRuns", "MeanRunLength", "MaxRunLength",
    "CenterOfMass", "PositionVariance",
)


def seqshape_features(n_total: int, valid: np.ndarray | None = None) -> dict:
    """Shape of the validity mask itself (intensity-free).

    ``n_total``: document length in tokens; ``valid``: boolean ROI mask.
    Compactness = n_valid / span_length (1.0 ⇔ ROI is one solid block —
    the sphericity analog); NRuns = connected components of the mask
    (generalinfo.py:153-159 CC-count analog); CenterOfMass in [0,1]
    normalized position.
    """
    if valid is None:
        valid = np.ones(n_total, dtype=bool)
    else:
        valid = np.asarray(valid, dtype=bool)
    n_valid = int(valid.sum())
    if n_total == 0 or n_valid == 0:
        return {f: float("nan") for f in SEQSHAPE_FEATURES}

    pos = np.flatnonzero(valid)
    start, end = int(pos[0]), int(pos[-1])
    span = end - start + 1

    # runs of the validity mask
    brk = np.ones(n_valid, dtype=bool)
    brk[1:] = np.diff(pos) > 1
    run_starts = np.flatnonzero(brk)
    n_runs = run_starts.size
    run_lens = np.diff(np.append(run_starts, n_valid))

    com = float(pos.mean()) / max(n_total - 1, 1)
    return {
        "NTokens": float(n_total),
        "ValidFraction": n_valid / n_total,
        "SpanStart": float(start),
        "SpanEnd": float(end),
        "SpanLength": float(span),
        "Compactness": n_valid / span,
        "NRuns": float(n_runs),
        "MeanRunLength": float(run_lens.mean()),
        "MaxRunLength": float(run_lens.max()),
        "CenterOfMass": com,
        "PositionVariance": float(np.var(pos / max(n_total - 1, 1))),
    }
