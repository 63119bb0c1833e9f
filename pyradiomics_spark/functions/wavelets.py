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


def daubechies_dec_lo(N: int) -> np.ndarray:
    """Daubechies-N decomposition low-pass filter (2N taps), computed by the
    standard spectral factorization (roots of the Daubechies polynomial
    P(y) = Σ C(N−1+k, k)·yᵏ mapped to the inside-unit-circle z-roots of
    z² − (2−4y)z + 1, times the (1+z)^N binomial part) — machine precision
    without pywt; the computed db2 equals the published bank to 1e-12
    (pinned in tests/test_wavelets.py)."""
    if N == 1:
        return np.array([1.0, 1.0]) / _SQRT2
    from math import comb

    # P(y) coefficients, highest power first
    P = np.array([comb(N - 1 + k, k) for k in range(N - 1, -1, -1)], dtype=float)
    yroots = np.roots(P)
    poly = np.array([1.0 + 0j])
    for _ in range(N):
        poly = np.convolve(poly, [1.0, 1.0])
    for y in yroots:
        c = 1.0 - 2.0 * y
        r = np.sqrt(c * c - 1.0 + 0j)
        z = c + r if abs(c + r) < 1.0 else c - r
        poly = np.convolve(poly, [1.0, -z])
    h = np.real(poly)
    h *= _SQRT2 / h.sum()
    return h[::-1]  # dec_lo is the reversed rec_lo


def _daubechies_z_groups(N: int):
    """Inside-unit-circle z-roots of the Daubechies polynomial, grouped so
    complex conjugates stay together (a symlet flip must keep coefficients
    real)."""
    from math import comb

    P = np.array([comb(N - 1 + k, k) for k in range(N - 1, -1, -1)], dtype=float)
    zin = []
    for y in np.roots(P):
        c = 1.0 - 2.0 * y
        r = np.sqrt(c * c - 1.0 + 0j)
        z = c + r if abs(c + r) < 1.0 else c - r
        zin.append(z)
    used = [False] * len(zin)
    groups = []
    for i, z in enumerate(zin):
        if used[i]:
            continue
        used[i] = True
        if abs(z.imag) < 1e-12:
            groups.append([z.real])
        else:
            for j in range(i + 1, len(zin)):
                if not used[j] and abs(zin[j] - np.conj(z)) < 1e-8:
                    used[j] = True
                    groups.append([z, zin[j]])
                    break
    return groups


def symlet_dec_lo(N: int) -> np.ndarray:
    """Symlet-N decomposition low-pass (2N taps): same spectral
    factorization as dbN, but instead of always taking the minimum-phase
    (inside-circle) roots, each conjugate root group may be flipped to its
    reciprocal pair; the selection minimizing the filter's GROUP-DELAY
    VARIANCE (Σ(k−k̄)²·h²/Σh²) is the near-linear-phase symlet.

    Orientation convention: a filter and its mirror share the delay
    variance, so the construction determines symN only up to reflection;
    we deterministically take the fewest-flips (minimum-phase-side)
    representative. This gives sym2==db2 and sym3==db3 exactly, and the
    published pywt banks up to that mirror for N ≥ 4 (pinned in tests).
    Whole-document features are unaffected either way: every aggregate in
    this engine (symmetric GLCM, runs/zones, NGTDM/GLDM neighborhoods,
    histograms) is reflection-invariant."""
    if N < 2:
        return daubechies_dec_lo(max(N, 1))
    from itertools import product as _product

    groups = _daubechies_z_groups(N)

    def build(flips):
        poly = np.array([1.0 + 0j])
        for _ in range(N):
            poly = np.convolve(poly, [1.0, 1.0])
        for g, flip in zip(groups, flips):
            for z in g:
                poly = np.convolve(poly, [1.0, -(1.0 / z if flip else z)])
        h = np.real(poly)
        h *= _SQRT2 / h.sum()
        return h

    def delay_var(h):
        k = np.arange(h.size)
        e = h * h
        mu = (k * e).sum() / e.sum()
        return ((k - mu) ** 2 * e).sum() / e.sum()

    cands = [(f, build(f)) for f in _product((False, True), repeat=len(groups))]
    dvs = [delay_var(h) for _, h in cands]
    dv_min = min(dvs)
    # a filter and its mirror share the delay variance in exact arithmetic;
    # break FP near-ties toward the minimum-phase (fewest-flips) choice so
    # sym2==db2 / sym3==db3 hold exactly
    tol = dv_min * 1e-9 + 1e-12
    best = min(
        (c for c, dv in zip(cands, dvs) if dv <= dv_min + tol),
        key=lambda c: sum(c[0]),
    )[1]
    return best[::-1]  # dec_lo is the reversed rec_lo


def get_dec_lo(wavelet: str) -> np.ndarray:
    """Filter bank lookup: the hardcoded banks plus any 'dbN'/'symN'
    computed on demand (cached into DEC_LO)."""
    bank = DEC_LO.get(wavelet)
    if bank is not None:
        return bank
    if wavelet.startswith("db") and wavelet[2:].isdigit():
        n = int(wavelet[2:])
        if 1 <= n <= 20:
            DEC_LO[wavelet] = daubechies_dec_lo(n)
            return DEC_LO[wavelet]
    if wavelet.startswith("sym") and wavelet[3:].isdigit():
        n = int(wavelet[3:])
        if 2 <= n <= 12:
            DEC_LO[wavelet] = symlet_dec_lo(n)
            return DEC_LO[wavelet]
    raise ValueError(f"unsupported wavelet {wavelet!r} "
                     f"(supported: haar, db1..db20, sym2..sym12, coif1)")


def _dec_hi(lo: np.ndarray) -> np.ndarray:
    n = lo.size
    return np.array([((-1) ** k) * lo[n - 1 - k] for k in range(n)])


def _upsample(h: np.ndarray, j: int) -> np.ndarray:
    """À trous upsampling: insert 2ʲ−1 zeros between taps (the SWT level-j
    filter; pywt.swt cascade equivalent)."""
    if j == 0:
        return h
    u = np.zeros((h.size - 1) * (2 ** j) + 1)
    u[:: 2 ** j] = h
    return u


def _circular_conv(x: np.ndarray, h: np.ndarray) -> np.ndarray:
    """y[n] = Σ_k h[k] · x[(n − k) mod N] — periodic convolution.

    Accumulates TAP BY TAP in k order — the same FP summation order as the
    batched kernel's _circ_conv_layout, so per-doc and batched outputs are
    bit-identical. (A pairwise .sum(axis=1) over an (n, m) gather differs
    by ~1 ulp for filters over 8 taps — LoG's 17, db5+, upsampled level-2
    banks — which can flip a fractional-width bin right at an edge and
    break the documented 1e-9 batch/per-doc parity on unlucky values.)"""
    n = x.size
    pos = np.arange(n)
    y = np.zeros(n)
    for k, w in enumerate(h):
        y += w * x[(pos - k) % n]
    return y


def swt1(x: np.ndarray, wavelet: str = "coif1"):
    """Single-level stationary wavelet transform with wrap padding.

    Returns (approx, detail), both same length as the input.
    """
    return swt_level(x, wavelet, level=1)


def swt_level(x: np.ndarray, wavelet: str = "coif1", level: int = 1,
              start_level: int = 0):
    """(approx, detail) at SWT level ``level`` via the à trous cascade:
    approx chains through levels start_level..level−1 with upsampled lo
    filters, then the final (lo, hi) pair — the 1-D mirror of
    pywt.swtn(..., level=..., start_level=...) as the reference drives it
    (imageoperations.py:899-970). Wrap padding to even length, output
    cropped back; both outputs are input-length."""
    x = np.asarray(x, dtype=np.float64)
    if level < 1 or start_level < 0:
        raise ValueError("level >= 1 and start_level >= 0 required")
    if x.size == 0:
        return x.copy(), x.copy()
    odd = x.size % 2 == 1
    if odd:  # pad to even with wrap (imageoperations.py:914-919 analog)
        x = np.concatenate([x, x[:1]])
    lo = get_dec_lo(wavelet)
    hi = _dec_hi(lo)
    a = x
    for j in range(start_level, start_level + level - 1):
        a = _circular_conv(a, _upsample(lo, j))
    jf = start_level + level - 1
    d = _circular_conv(a, _upsample(hi, jf))
    a = _circular_conv(a, _upsample(lo, jf))
    if odd:
        a, d = a[:-1], d[:-1]
    return a, d


def wavelet_L(x: np.ndarray, wavelet: str = "coif1") -> np.ndarray:
    return swt1(x, wavelet)[0]


def wavelet_H(x: np.ndarray, wavelet: str = "coif1") -> np.ndarray:
    return swt1(x, wavelet)[1]


def swt1_fft(x: np.ndarray, wavelet: str = "coif1"):
    """Independent FFT-based twin of ``swt1`` (circular convolution via the
    convolution theorem) — a genuinely different numerical path used as the
    parity oracle in tests, the way the reference pins wavelet output to
    pywt goldens (/root/reference/tests/test_wavelet.py:77-81)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size == 0:
        return x.copy(), x.copy()
    odd = x.size % 2 == 1
    if odd:
        x = np.concatenate([x, x[:1]])
    n = x.size
    lo = get_dec_lo(wavelet)
    hi = _dec_hi(lo)
    X = np.fft.rfft(x)

    def conv(h):
        hp = np.zeros(n)
        # y[k] = Σ h[j] x[(k−j) mod n] ⇒ kernel laid out at indices j mod n
        for j in range(h.size):
            hp[j % n] += h[j]
        return np.fft.irfft(X * np.fft.rfft(hp), n=n)

    a, d = conv(lo), conv(hi)
    if odd:
        a, d = a[:-1], d[:-1]
    return a, d


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
