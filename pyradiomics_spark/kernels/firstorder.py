"""First-order statistics kernel (18 active features + deprecated stddev).

Reimplements the published formulas of the reference's first-order class
(/root/reference/radiomics/firstorder.py:135-474) on a 1-D intensity array:

* moments are population moments (nan-aware numpy), NOT sample moments —
  Spark's builtin ``skewness``/``kurtosis`` are sample/excess-based, so these
  stay in the kernel;
* Kurtosis is NOT excess kurtosis (reference note firstorder.py:433-435);
* Skewness/Kurtosis return 0 for flat regions (m2 == 0);
* percentiles use numpy linear interpolation (np.nanpercentile default);
* Energy/RMS use the ``voxelArrayShift`` c (default 0);
* Entropy/Uniformity operate on the normalized histogram ``p_i`` of the
  **discretized** array (firstorder.py:88-95 + 116-119), with
  eps = np.spacing(1).
"""

from __future__ import annotations

import numpy as np

from pyradiomics_spark.config import EPS
from pyradiomics_spark.kernels.binning import discretize

FIRSTORDER_FEATURES = (
    "Energy", "TotalEnergy", "Entropy", "Minimum", "10Percentile", "90Percentile",
    "Maximum", "Mean", "Median", "InterquartileRange", "Range",
    "MeanAbsoluteDeviation", "RobustMeanAbsoluteDeviation", "RootMeanSquared",
    "Skewness", "Kurtosis", "Variance", "Uniformity",
)


def _central_moment(x: np.ndarray, k: int) -> float:
    # plain mean: the batch path never passes NaNs (validity is an explicit
    # boolean mask applied before the kernel, unlike the reference's
    # NaN-padded voxel mode)
    m = x.mean()
    return float(((x - m) ** k).mean())


def firstorder_features(
    values: np.ndarray,
    bin_width: float = 25.0,
    bin_count: int | None = None,
    voxel_array_shift: float = 0.0,
    discretized: np.ndarray | None = None,
) -> dict:
    """Compute all first-order features for one entity×timestamp group.

    ``values``: 1-D float array of ROI intensities (already filtered).
    ``discretized``: optional pre-binned levels (shared with texture classes).
    """
    x = np.asarray(values, dtype=np.float64)
    n = x.size
    if n == 0:
        return {f: float("nan") for f in FIRSTORDER_FEATURES}

    if discretized is None:
        discretized = discretize(x, bin_width=bin_width, bin_count=bin_count)
    _, counts = np.unique(discretized, return_counts=True)
    p_i = counts.astype(np.float64) / counts.sum()

    c = voxel_array_shift
    shifted = x + c
    energy = float(np.sum(shifted ** 2))

    p10, p25, p50, p75, p90 = np.percentile(x, [10, 25, 50, 75, 90])
    mean = float(x.mean())
    mn = float(x.min())
    mx = float(x.max())

    # Robust MAD: restrict to the closed [P10, P90] range (firstorder.py:301-331)
    robust = x[(x >= p10) & (x <= p90)]
    if robust.size:
        rmad = float(np.abs(robust - robust.mean()).mean())
    else:
        rmad = float("nan")

    if mn == mx:
        # EXACTLY constant input (e.g. a flat doc through an irrational
        # transform): the mean can differ from the values by 1 ulp, leaving
        # a ~1e-31 moment residue that would turn Skewness/Kurtosis into
        # ±1.0 FP noise. Zero the central moments deterministically — the
        # batched kernel applies the identical truly_flat fixup.
        m2 = m3 = m4 = 0.0
    else:
        m2 = _central_moment(x, 2)
        m3 = _central_moment(x, 3)
        m4 = _central_moment(x, 4)
    # flat region (firstorder.py:405-406, 433-435) — including DENORMAL
    # variance whose power underflows to 0 (m2 ~ 1e-279 → m2² == 0): python
    # floats would raise ZeroDivisionError and numpy would emit inf/nan;
    # both kernels deterministically take the flat fixup instead
    if m2 ** 2.0 == 0:
        skewness, kurtosis = 0.0, 0.0
    else:
        skewness = m3 / m2 ** 1.5
        kurtosis = m4 / m2 ** 2.0

    return {
        "Energy": energy,
        "TotalEnergy": energy,  # voxel volume == 1.0 in the 1-D token analog
        "Entropy": float(-np.sum(p_i * np.log2(p_i + EPS))),
        "Minimum": mn,
        "10Percentile": float(p10),
        "90Percentile": float(p90),
        "Maximum": mx,
        "Mean": mean,
        "Median": float(p50),
        "InterquartileRange": float(p75 - p25),
        "Range": mx - mn,
        "MeanAbsoluteDeviation": float(np.abs(x - mean).mean()),
        "RobustMeanAbsoluteDeviation": rmad,
        "RootMeanSquared": float(np.sqrt(energy / n)),
        "Skewness": float(skewness),
        "Kurtosis": float(kurtosis),
        "Variance": float(m2),
        "Uniformity": float(np.sum(p_i ** 2)),
    }
