"""1-D convolutional filter analogs: stationary wavelet transform (SWT) and
Laplacian-of-Gaussian, pure numpy (pywt/scipy are not available in this
environment, so the filter banks and kernels are built from their published
closed forms).

Semantics mirror the reference's filter stages
(/root/reference/radiomics/imageoperations.py:839-970 wavelet via pywt.swtn
with wrap padding + pad-to-even; :756-836 LoG):

* ``swt1``      — single-level SWT with **periodic (wrap) padding**; input
  padded to even length by wrapping the first sample (reference pads odd
  dims the same way, imageoperations.py:914-919), output cropped back;
  returns (approx 'L', detail 'H') — the 1-D analog of the reference's
  a/d → L/H subband naming (imageoperations.py:954).
* ``log_filter``— Laplacian-of-Gaussian: analytic LoG kernel
  (σ in samples), circular convolution, truncated at 4σ.

Filter banks (orthogonal, standard published coefficients): haar, db2,
coif1 (the reference's default wavelet, paramSchema default 'coif1').
High-pass via the QMF relation hi[k] = (−1)^k · lo[L−1−k].
"""

from __future__ import annotations

import numpy as np

_SQRT2 = np.sqrt(2.0)

DEC_LO = {
    "haar": np.array([1.0, 1.0]) / _SQRT2,
    "db2": np.array([
        -0.12940952255092145, 0.22414386804185735,
        0.836516303737469, 0.48296291314469025,
    ]),
    "coif1": np.array([
        -0.01565572813546454, -0.0727326195128539, 0.38486484686420286,
        0.8525720202122554, 0.3378976624578092, -0.0727326195128539,
    ]),
}


def _dec_hi(lo: np.ndarray) -> np.ndarray:
    n = lo.size
    return np.array([((-1) ** k) * lo[n - 1 - k] for k in range(n)])


def _circular_conv(x: np.ndarray, h: np.ndarray) -> np.ndarray:
    """y[n] = Σ_k h[k] · x[(n − k) mod N] — periodic convolution."""
    n = x.size
    m = h.size
    idx = (np.arange(n)[:, None] - np.arange(m)[None, :]) % n
    return (x[idx] * h[None, :]).sum(axis=1)


def swt1(x: np.ndarray, wavelet: str = "coif1"):
    """Single-level stationary wavelet transform with wrap padding.

    Returns (approx, detail), both same length as the input.
    """
    x = np.asarray(x, dtype=np.float64)
    if x.size == 0:
        return x.copy(), x.copy()
    odd = x.size % 2 == 1
    if odd:  # pad to even with wrap (imageoperations.py:914-919 analog)
        x = np.concatenate([x, x[:1]])
    lo = DEC_LO[wavelet]
    hi = _dec_hi(lo)
    a = _circular_conv(x, lo)
    d = _circular_conv(x, hi)
    if odd:
        a, d = a[:-1], d[:-1]
    return a, d


def wavelet_L(x: np.ndarray, wavelet: str = "coif1") -> np.ndarray:
    return swt1(x, wavelet)[0]


def wavelet_H(x: np.ndarray, wavelet: str = "coif1") -> np.ndarray:
    return swt1(x, wavelet)[1]


def log_kernel(sigma: float) -> np.ndarray:
    """Normalized 1-D Laplacian-of-Gaussian kernel, truncated at ±4σ."""
    r = max(int(np.ceil(4 * sigma)), 1)
    t = np.arange(-r, r + 1, dtype=np.float64)
    g = np.exp(-(t ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    lap = (t ** 2 - sigma ** 2) / sigma ** 4
    k = lap * g
    return k - k.mean()  # zero-DC so flat regions map to 0


def log_filter(x: np.ndarray, sigma: float = 2.0) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    if x.size == 0:
        return x.copy()
    k = log_kernel(sigma)
    if x.size < k.size:  # short doc: shrink kernel support
        k = log_kernel(max(x.size / 8.0, 0.5))
        if x.size < k.size:
            return np.zeros_like(x)
    r = (k.size - 1) // 2
    # center the kernel: _circular_conv delays by the kernel radius
    return np.roll(_circular_conv(x, k), -r)
