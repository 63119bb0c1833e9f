"""Derived "image type" transforms + normalization on intensity arrays.

Exact semantics of the reference's globally-rescaled elementwise filters
(/root/reference/radiomics/imageoperations.py:973-1091) and z-normalization
with outlier clamp (imageoperations.py:615-654), on 1-D numpy arrays.
Applied to the WHOLE sequence (the reference transforms the whole image
before ROI masking), using the global max(|x|).

The gradient analog is the 1-D central-difference magnitude (the spirit of
GradientMagnitudeImageFilter with unit spacing).
"""

from __future__ import annotations

import re

import numpy as np


def square_transform(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    m = np.max(np.abs(x)) if x.size else 0.0
    if m == 0:
        return x.copy()
    coeff = 1.0 / np.sqrt(m)
    return (coeff * x) ** 2


def squareroot_transform(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64).copy()
    m = np.max(np.abs(x)) if x.size else 0.0
    pos = x > 0
    neg = x < 0
    x[pos] = np.sqrt(x[pos] * m)
    x[neg] = -np.sqrt(-x[neg] * m)
    return x


def logarithm_transform(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64).copy()
    m = np.max(np.abs(x)) if x.size else 0.0
    pos = x > 0
    neg = x < 0
    x[pos] = np.log(x[pos] + 1)
    x[neg] = -np.log(-(x[neg] - 1))
    out_max = np.max(np.abs(x)) if x.size else 0.0
    if out_max != 0:
        x = x * (m / out_max)
    return x


def exponential_transform(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    m = np.max(np.abs(x)) if x.size else 0.0
    if m == 0:
        return np.ones_like(x)
    coeff = np.log(m) / m
    return np.exp(coeff * x)


def gradient_transform(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    if x.size < 2:
        return np.zeros_like(x)
    return np.abs(np.gradient(x))


def lbp_transform(x: np.ndarray, radius: int = 1) -> np.ndarray:
    """1-D local-binary-pattern analog of the reference's LBP2D/LBP3D image
    types (imageoperations.py:1094-1166; skimage 'uniform' riu2 maps uniform
    patterns to their set-bit COUNT — the natural rotation-invariant code).
    Here: value at p = number of neighbors in ±radius with intensity >= the
    center (neighbors beyond the sequence edge don't count), giving integer
    codes 0..2·radius — reflection-invariant by construction, deterministic,
    and exactly expressible relationally (lag/lead comparisons) for the
    DuckDB oracle twin."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    out = np.zeros(n)
    for d in range(1, radius + 1):
        if n > d:
            ge = x[d:] >= x[:-d]       # right neighbor >= center
            out[:-d] += ge
            le = x[:-d] >= x[d:]       # left neighbor >= center
            out[d:] += le
    return out


def _wavelet_L(x: np.ndarray) -> np.ndarray:
    from pyradiomics_spark.functions.wavelets import wavelet_L
    return wavelet_L(x)


def _wavelet_H(x: np.ndarray) -> np.ndarray:
    from pyradiomics_spark.functions.wavelets import wavelet_H
    return wavelet_H(x)


def _log_sigma2(x: np.ndarray) -> np.ndarray:
    from pyradiomics_spark.functions.wavelets import log_filter
    return log_filter(x, sigma=2.0)


def _wavelet_L2(x: np.ndarray) -> np.ndarray:
    from pyradiomics_spark.functions.wavelets import swt_level
    return swt_level(x, level=2)[0]


def _wavelet_H2(x: np.ndarray) -> np.ndarray:
    from pyradiomics_spark.functions.wavelets import swt_level
    return swt_level(x, level=2)[1]


IMAGE_TRANSFORMS = {
    "original": lambda x: np.asarray(x, dtype=np.float64),
    "square": square_transform,
    "squareroot": squareroot_transform,
    "logarithm": logarithm_transform,
    "exponential": exponential_transform,
    "gradient": gradient_transform,
    "wavelet-L": _wavelet_L,
    "wavelet-H": _wavelet_H,
    "wavelet-L2": _wavelet_L2,
    "wavelet-H2": _wavelet_H2,
    "log-sigma-2": _log_sigma2,
    "lbp-r1": lambda x: lbp_transform(x, radius=1),
    "lbp-r2": lambda x: lbp_transform(x, radius=2),
}

_WAVELET_NAME = re.compile(r"^wavelet-([LH])([0-9]*)$")
_LOG_NAME = re.compile(r"^log-sigma-([0-9]+(?:\.[0-9]+)?)$")
_LBP_NAME = re.compile(r"^lbp-r([1-9][0-9]*)$")


def parse_image_type(name: str):
    """Decompose a parameterized image-type name →
    ("wavelet", which, level) | ("log", sigma) | ("lbp", radius) | None."""
    m = _WAVELET_NAME.match(name)
    if m:
        return ("wavelet", m.group(1), int(m.group(2) or 1))
    m = _LOG_NAME.match(name)
    if m:
        return ("log", float(m.group(1)))
    m = _LBP_NAME.match(name)
    if m:
        return ("lbp", int(m.group(1)))
    return None


def apply_transform(name: str, x: np.ndarray, settings=None) -> np.ndarray:
    """Settings-aware transform dispatch: wavelet subbands honor the
    ``wavelet`` family and ``wavelet_start_level`` settings
    (imageoperations.py:899-970 kwargs analog); LoG sigma / LBP radius are
    parsed from the type name. Fixed names fall back to IMAGE_TRANSFORMS."""
    parsed = parse_image_type(name)
    if parsed is not None:
        kind = parsed[0]
        if kind == "wavelet":
            from pyradiomics_spark.functions.wavelets import swt_level

            wavelet = getattr(settings, "wavelet", "coif1") if settings else "coif1"
            start = getattr(settings, "wavelet_start_level", 0) if settings else 0
            a, d = swt_level(x, wavelet, level=parsed[2], start_level=start)
            return a if parsed[1] == "L" else d
        if kind == "log":
            from pyradiomics_spark.functions.wavelets import log_filter

            return log_filter(np.asarray(x, dtype=np.float64), sigma=parsed[1])
        if kind == "lbp":
            return lbp_transform(x, radius=parsed[1])
    return IMAGE_TRANSFORMS[name](x)


def normalize(x: np.ndarray, scale: float = 1.0, remove_outliers: float | None = None) -> np.ndarray:
    """Z-score normalize ×scale, then optional ±nσ clamp (in normalized
    units ×scale), per imageoperations.py:615-654. sitk.Normalize delegates
    to ITK's NormalizeImageFilter whose statistics use the UNBIASED N−1
    sigma, so we match that (ddof=1), not numpy's default population std.
    (Clamp-then-scale vs scale-then-clamp±nσ·s are identical for s>0.)"""
    x = np.asarray(x, dtype=np.float64)
    sigma = x.std(ddof=1) if x.size > 1 else 0.0
    mean = x.mean()
    if sigma == 0:
        out = np.zeros_like(x)
    else:
        out = (x - mean) / sigma
    out = out * scale
    if remove_outliers is not None:
        bound = remove_outliers * scale
        out = np.clip(out, -bound, bound)
    return out


def resegment_bounds(
    roi_values: np.ndarray, rng: tuple, mode: str = "absolute"
) -> tuple:
    """Threshold bounds for intensity resegmentation
    (imageoperations.py:695-711): absolute = literal; relative = ×max;
    sigma = mean ± n·σ."""
    lo, hi = (rng[0], rng[1]) if len(rng) == 2 else (rng[0], None)
    if mode == "absolute":
        return lo, hi
    if mode == "relative":
        m = float(np.max(roi_values))
        return (lo * m if lo is not None else None,
                hi * m if hi is not None else None)
    if mode == "sigma":
        mean = float(np.mean(roi_values))
        sd = float(np.std(roi_values))
        return (mean + lo * sd if lo is not None else None,
                mean + hi * sd if hi is not None else None)
    raise ValueError(f"bad resegment mode {mode}")
