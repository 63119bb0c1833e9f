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

Filter banks (orthogonal): haar plus db1..db20 / sym2..sym12 (spectral
factorization) and coif1..coif5 (coif1 published closed form; coif2..5
frozen full-precision banks derived once by Gauss-Newton from the defining
moment conditions — see `_COIF_BANKS`). coif1 is the reference's default
wavelet (paramSchema default 'coif1').
High-pass via the QMF relation hi[k] = (−1)^k · lo[L−1−k].

Biorthogonal: the full pywt bior/rbio family (bior1.1..6.8 and the
role-swapped rbio mirrors) from the closed-form CDF spline construction;
the three non-spline members (4.4 = CDF 9/7, 5.5, 6.8) via deterministic
root-splits of the Deslauriers–Dubuc dual polynomial, reproducing the
published pywt/Matlab tables to 1e-10 (pinned in tests). Biorthogonal
banks are (dec_lo, dec_hi) PAIRS — ``get_bank`` is the lookup every SWT
path uses. Not provided: dmey (a 62-tap numerically-tabulated FIR
approximation with no closed form to rebuild it from — rejected with a
clear error rather than approximated).
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


# Approximate published coifN banks (dec_lo order) — SEEDS only: the exact
# filters are recomputed to machine precision by Gauss-Newton on the
# defining coiflet conditions (orthonormality, 2N vanishing wavelet
# moments, 2N-1 vanishing scaling moments — Daubechies, "Ten Lectures",
# ch. 8). Tests pin the conditions themselves at 1e-10, so a seed digit
# being off cannot silently ship a wrong bank.
_COIF_SEEDS = {
    2: [-0.00072054944536451, -0.00182320887070299, 0.00561143481939450,
        0.02368017194633408, -0.05943441864645690, -0.07648859907830640,
        0.41700518442169254, 0.81272363544554230, 0.38611006682116220,
        -0.06737255472196302, -0.04146493678175915, 0.01638733646352211],
    3: [-3.459977283621256e-05, -7.098330313814125e-05,
        0.0004662169601128863, 0.0011175187708906016,
        -0.0025745176887502236, -0.00900797613666158,
        0.015880544863615904, 0.03455502757306163,
        -0.08230192710688598, -0.07179982161931202,
        0.42848347637761874, 0.7937772226256206,
        0.4051769024096169, -0.06112339000267287,
        -0.0657719112818555, 0.023452696141836267,
        0.007782596427325418, -0.003793512864491014],
    4: [-1.7849850030882614e-06, -3.2596802368833675e-06,
        3.1229875865345646e-05, 6.233903446100713e-05,
        -0.00025997455248771324, -0.0005890207562443383,
        0.0012665619292989445, 0.003751436157278457,
        -0.00565828668661072, -0.015211731527946259,
        0.025082261844864097, 0.03933442712333749,
        -0.09622044203398798, -0.06662747426342504,
        0.4343860564914685, 0.782238930920499,
        0.41530840703043026, -0.05607731331675481,
        -0.08126669968087875, 0.026682300156053072,
        0.016068943964776348, -0.0073461663276420935,
        -0.0016294920126017326, 0.0008923136685823146],
    5: [-9.517657273819165e-08, -1.6744288576823017e-07,
        2.0637618513646814e-06, 3.7346551751414047e-06,
        -2.1315026809955787e-05, -4.134043227251251e-05,
        0.00014054114970203437, 0.00030225958181306315,
        -0.0006381313430451114, -0.0016628637020130838,
        0.0024333732126576722, 0.006764185448053083,
        -0.009164231162481846, -0.01976177894257264,
        0.03268357426711183, 0.0412892087501817,
        -0.10557420870333893, -0.06203596396290357,
        0.4379916261718371, 0.7742896036529562,
        0.4215662066908515, -0.05204316317624377,
        -0.09192001055969624, 0.02816802897093635,
        0.023408156785839195, -0.010131117519849788,
        -0.004159358781386048, 0.0021782363581090178,
        0.00035858968789573785, -0.00021208083980379827],
}


# Frozen solved coifN banks (dec_lo order) — full-precision output of
# `_solve_coiflet` (Gauss-Newton on the defining conditions, residual
# < 3e-16 scaled at freeze time). The runtime bank is THIS table, not a
# fresh solve: lstsq's last ~1e-9 is BLAS-build-dependent and feature
# goldens must not drift across environments. `test_wavelets.py`
# re-verifies both the conditions and (loosely) the solver agreement.
_COIF_BANKS = {
    2: [
        -0.0007205494455203473, -0.0018232088709110343,
        0.005611434819368893, 0.02368017194684794,
        -0.059434418646431585, -0.07648859907828096,
        0.41700518442324025, 0.8127236354494134,
        0.3861100668227618, -0.06737255472372525,
        -0.0414649367868714, 0.016387336463203516,
    ],
    3: [
        -3.459977319732866e-05, -7.09833025065137e-05,
        0.00046621695982089755, 0.0011175187708324505,
        -0.00257451768814009, -0.009007976136750327,
        0.015880544863709194, 0.03455502757335173,
        -0.08230192710644886, -0.07179982161919887,
        0.42848347637762413, 0.7937772226260577,
        0.4051769024088933, -0.06112339000289855,
        -0.06577191128136801, 0.023452696142030677,
        0.007782596425654264, -0.003793512864370696,
    ],
    4: [
        -1.7849909149573466e-06, -3.2596479408990915e-06,
        3.1229861605013466e-05, 6.233885432570577e-05,
        -0.0002599743371561305, -0.0005890202247347388,
        0.00126656107907471, 0.003751434697875853,
        -0.005658283801336602, -0.015211728190183717,
        0.025082253343429943, 0.03933442260957347,
        -0.09622042454921814, -0.06662747236899585,
        0.43438603313330965, 0.7822389344218723,
        0.4153084269839692, -0.05607731959851636,
        -0.08126671024019429, 0.02668230466583677,
        0.016068947128848474, -0.0073461679349005075,
        -0.0016294924248692107, 0.0008923139023355122,
    ],
    5: [
        -9.604010081077881e-08, -1.6237995112924943e-07,
        2.061220393524963e-06, 3.7007277009927253e-06,
        -2.1270221633894066e-05, -4.1219861835787855e-05,
        0.00014035632793981054, 0.00030185794117504284,
        -0.0006375589255407497, -0.001661627301874966,
        0.002431575440721321, 0.006761520215521594,
        -0.009159507334320935, -0.01975839159498375,
        0.03267479946287934, 0.04128753047240166,
        -0.1055631513144548, -0.06203775158424632,
        0.4379823066870478, 0.7742936228699473,
        0.42157126669029793, -0.05204667025456385,
        -0.09192158802684279, 0.02816974426512697,
        0.023408322102656146, -0.010131584842185043,
        -0.004159312623130539, 0.0021782943761436435,
        0.0003585777406360541, -0.00021208186182896337,
    ],
}


def _coif_residuals(x: np.ndarray, N: int):
    """Residual vector + analytic Jacobian of the coiflet conditions for
    x = (h[0..6N-1], c): Σh=√2; orthonormal shifts; Σ(−1)^k k^p h = 0 for
    p<2N; Σ(k−c)^p h = 0 for 1≤p<2N (c = moment center, free unknown)."""
    L = 6 * N
    h, c = x[:L], x[L]
    k = np.arange(L, dtype=float)
    rows_r, rows_J = [], []
    # sum condition
    rows_r.append(h.sum() - np.sqrt(2.0))
    rows_J.append(np.append(np.ones(L), 0.0))
    # orthonormality: Σ h[k]h[k+2m] = δ_m0
    for m in range(3 * N):
        s = 2 * m
        r = float(np.dot(h[: L - s], h[s:])) - (1.0 if m == 0 else 0.0)
        J = np.zeros(L + 1)
        J[: L - s] += h[s:]
        J[s:L] += h[: L - s]
        rows_r.append(r)
        rows_J.append(J)
    sign = np.where(np.arange(L) % 2 == 0, 1.0, -1.0)
    # wavelet vanishing moments (center-free: vanishing up to order q about
    # any point implies about every point)
    for p in range(2 * N):
        w = sign * k**p
        rows_r.append(float(np.dot(w, h)))
        rows_J.append(np.append(w, 0.0))
    # scaling vanishing moments about the pinned center c (c column zero:
    # c is a constant of the system, not an unknown)
    d = k - c
    for p in range(1, 2 * N):
        rows_r.append(float(np.dot(d**p, h)))
        rows_J.append(np.append(d**p, 0.0))
    return np.array(rows_r), np.vstack(rows_J)


def _solve_coiflet(N: int) -> np.ndarray:
    """Gauss-Newton solve of the coiflet conditions, seeded from the
    published bank (seed keeps the solve on the standard branch). Used to
    DERIVE the frozen `_COIF_BANKS` table and to re-verify it in tests —
    the runtime path returns the frozen bank instead, because the lstsq
    fixed point moves ~1e-9 across BLAS builds (the system's Jacobian is
    mildly ill-conditioned at N=4,5), which is enough to shift feature
    goldens across environments."""
    if N not in _COIF_SEEDS:
        raise ValueError(f"coif{N} unsupported (coif1..coif5)")
    L = 6 * N
    h0 = np.array(_COIF_SEEDS[N], dtype=float)
    # moment center: the integer tap 4N−1 (support [−2N, 4N−1] with moments
    # about 0, reversed to dec order). PINNED, not solved — a free center
    # adds a near-null Jacobian direction that smears the solution by ~1e-6.
    x = np.append(h0, float(4 * N - 1))
    for _ in range(60):
        r, J = _coif_residuals(x, N)
        # row equilibration: k^p rows span ~15 orders of magnitude; solve
        # the scaled system so lstsq treats every condition equally
        s = np.maximum(np.abs(J).max(axis=1), 1e-300)
        dx = np.linalg.lstsq(J / s[:, None], -r / s, rcond=None)[0]
        x = x + dx
        if np.max(np.abs(dx)) < 1e-15:
            break
    r, J = _coif_residuals(x, N)
    s = np.maximum(np.abs(J).max(axis=1), 1e-300)
    if np.max(np.abs(r / s)) > 1e-10:
        raise RuntimeError(
            f"coif{N} solve did not converge "
            f"(max scaled residual {np.max(np.abs(r / s)):.2e})")
    return x[:L]


def coiflet_dec_lo(N: int) -> np.ndarray:
    """Coiflet-N decomposition low-pass (6N taps) from the FROZEN
    `_COIF_BANKS` table (full-precision output of `_solve_coiflet`,
    verified against the defining conditions at freeze time and again in
    tests). Frozen rather than solved at runtime for the same reason as
    `_BIOR_SPOT`: the solve's last ~1e-9 depends on the host BLAS, and
    feature goldens must be environment-stable. coif1 uses the
    closed-form hardcoded bank above."""
    if N not in _COIF_BANKS:
        raise ValueError(f"coif{N} unsupported (coif1..coif5)")
    return np.array(_COIF_BANKS[N], dtype=float)


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
    if wavelet.startswith("coif") and wavelet[4:].isdigit():
        n = int(wavelet[4:])
        if 2 <= n <= 5:
            DEC_LO[wavelet] = coiflet_dec_lo(n)
            return DEC_LO[wavelet]
    raise ValueError(f"unsupported wavelet {wavelet!r} "
                     f"(supported: haar, db1..db20, sym2..sym12, coif1..coif5)")


_BANK_CACHE: dict = {}


def get_bank(wavelet: str) -> tuple[np.ndarray, np.ndarray]:
    """(dec_lo, dec_hi) analysis bank for any supported wavelet.

    Orthogonal families derive hi from lo via the QMF relation; the
    biorthogonal families (biorN.M and the role-swapped rbioN.M) need the
    explicit filter pair. This is the lookup every SWT path uses."""
    bank = _BANK_CACHE.get(wavelet)
    if bank is not None:
        return bank
    for prefix, reverse in (("bior", False), ("rbio", True)):
        if wavelet.startswith(prefix):
            parts = wavelet[4:].split(".")
            if (len(parts) == 2 and parts[0].isdigit()
                    and parts[1].isdigit()
                    and (int(parts[0]), int(parts[1])) in _BIOR_FAMILY):
                bank = _bior_bank(int(parts[0]), int(parts[1]), reverse)
                _BANK_CACHE[wavelet] = bank
                return bank
            fam = sorted(_BIOR_FAMILY)
            raise ValueError(
                f"unsupported wavelet {wavelet!r} "
                f"({prefix} members: {['%d.%d' % nm for nm in fam]})")
    lo = get_dec_lo(wavelet)
    bank = (lo, _dec_hi(lo))
    _BANK_CACHE[wavelet] = bank
    return bank


def _dec_hi(lo: np.ndarray) -> np.ndarray:
    n = lo.size
    return np.array([((-1) ** k) * lo[n - 1 - k] for k in range(n)])


# ---------------------------------------------------------------------------
# Biorthogonal (CDF B-spline) families — biorN.M / rbioN.M
# ---------------------------------------------------------------------------
# Closed-form Cohen–Daubechies–Feauveau construction: the synthesis lowpass
# is the B-spline binomial (1+z)^N/2^N and the analysis lowpass multiplies a
# binomial by the Deslauriers–Dubuc dual factor
#   Q_K(y) = Σ_{k<K} C(K−1+k, k)·y^k,  y = sin²(ω/2),  K = (N+M)/2.
# Three family members (4.4, 5.5, 6.8 — the Matlab/pywt tables) are NOT the
# spline variant: Q_K is factored over its y-roots and the factors are split
# between analysis and synthesis (4.4 = the JPEG2000/CDF 9/7 pair; 5.5
# additionally splits the cosine powers 4/6 instead of 5/5). The splits
# below reproduce the published pywt/Matlab coefficient tables to 1e-10
# (pinned in tests/test_wavelets.py).
#
# Reference surface: /root/reference/radiomics/imageoperations.py:891-897
# accepts any pywt.wavelist() name incl. biorN.N/rbioN.N.

# (N, M) -> (dec binomial power, rec binomial power,
#            dec root-group indices when Q is factored; None = spline dual)
_BIOR_FAMILY = {
    (1, 1): None, (1, 3): None, (1, 5): None,
    (2, 2): None, (2, 4): None, (2, 6): None, (2, 8): None,
    (3, 1): None, (3, 3): None, (3, 5): None, (3, 7): None, (3, 9): None,
    (4, 4): (4, 4, (0,)),      # dec ← complex pair, rec ← real root (9/7)
    (5, 5): (4, 6, (0,)),      # cosine powers split 4/6 (Matlab quirk)
    (6, 8): (8, 6, (0, 2)),    # dec ← outer pairs, rec ← middle pair
}


def _binom_lo(M: int) -> np.ndarray:
    from math import comb

    return np.array([comb(M, k) for k in range(M + 1)], float) / 2.0 ** M


def _dd_dual_poly(K: int) -> np.ndarray:
    """Q_K(sin²(ω/2)) as centered z-coefficients (2K−1 taps)."""
    from math import comb

    q = np.zeros(2 * K - 1)
    c0 = K - 1
    term = np.array([1.0])
    base = np.array([-0.25, 0.5, -0.25])  # sin²(ω/2) in z, centered
    for k in range(K):
        q[c0 - k: c0 - k + term.size] += comb(K - 1 + k, k) * term
        term = np.convolve(term, base)
    return q


def _q_root_groups(K: int) -> list:
    """y-roots of Q_K grouped (conjugate pairs together, real roots alone),
    sorted by |root| descending — the deterministic order the split indices
    in _BIOR_FAMILY refer to."""
    from math import comb

    P = np.array([comb(K - 1 + k, k) for k in range(K - 1, -1, -1)], float)
    roots = np.roots(P)
    used = [False] * len(roots)
    groups = []
    for i, z in enumerate(roots):
        if used[i]:
            continue
        used[i] = True
        if abs(z.imag) < 1e-9:
            groups.append([z])
        else:
            for j in range(i + 1, len(roots)):
                if not used[j] and abs(roots[j] - np.conj(z)) < 1e-8:
                    used[j] = True
                    groups.append([z, roots[j]])
                    break
    groups.sort(key=lambda g: -abs(g[0]))
    if sum(len(g) for g in groups) != len(roots):
        raise ValueError(
            f"Q_{K} root grouping lost a root (numpy np.roots conjugate "
            "pairing drifted) — bior/rbio construction cannot proceed")
    return groups


def _q_factor_poly(yroots) -> np.ndarray:
    """Π (1 − y/yᵢ) over the given y-roots → centered real z-coefficients
    (normalized so the factor is 1 at ω=0, keeping Σ lo = √2)."""
    p = np.array([1.0 + 0j])
    for y in yroots:
        p = np.convolve(p, [1.0 / (4 * y), 1.0 - 1.0 / (2 * y), 1.0 / (4 * y)])
    return np.real(p)


def bior_lowpass_pair(N: int, M: int) -> tuple[np.ndarray, np.ndarray]:
    """(dec_lo, rec_lo) for biorN.M — analysis and synthesis lowpass banks.
    Spline members: dec_lo = √2·binom(M)⊛Q_K, rec_lo = √2·binom(N).
    Non-spline members (4.4/5.5/6.8): Q_K root-split per _BIOR_FAMILY."""
    spec = _BIOR_FAMILY.get((N, M), "missing")
    if spec == "missing":
        raise ValueError(f"bior{N}.{M} is not in the bior family")
    K = (N + M) // 2
    if spec is None:
        dec = _SQRT2 * np.convolve(_binom_lo(M), _dd_dual_poly(K))
        rec = _SQRT2 * _binom_lo(N)
        return dec, rec
    dec_pow, rec_pow, dec_groups = spec
    groups = _q_root_groups(K)
    dec_roots = [z for gi in dec_groups for z in groups[gi]]
    rec_roots = [z for gi in range(len(groups)) if gi not in dec_groups
                 for z in groups[gi]]
    dec = _SQRT2 * np.convolve(_binom_lo(dec_pow), _q_factor_poly(dec_roots))
    rec = _SQRT2 * np.convolve(_binom_lo(rec_pow), _q_factor_poly(rec_roots))
    # fail-fast guard: _BIOR_FAMILY's split indices refer to _q_root_groups'
    # |root|-sorted order, which ultimately rests on np.roots output. A
    # numpy change that re-orders near-equal-magnitude groups would silently
    # swap analysis/synthesis factors — so pin one published coefficient per
    # bank and refuse to construct a reordered one.
    for bank, idx, want in _BIOR_SPOT[(N, M)]:
        got = (dec if bank == "dec" else rec)[idx]
        if abs(got - want) > 1e-8:
            raise ValueError(
                f"bior{N}.{M} {bank}_lo[{idx}] = {got!r}, expected {want!r} "
                "(published table): Q-root group order drifted — re-derive "
                "the split indices in _BIOR_FAMILY")
    return dec, rec


# published spot values (pywt/Matlab tables) guarding the non-spline
# root-split members against np.roots ordering drift:
# {(N,M): ((bank, index, value), ...)}
_BIOR_SPOT = {
    (4, 4): (("dec", 0, 0.03782845550699535), ("rec", 0, -0.06453888262893856)),
    (5, 5): (("dec", 0, 0.039687088347405), ("rec", 5, 0.899506109748648)),
    (6, 8): (("dec", 0, 0.001908831736481), ("dec", 8, 0.825922997458402)),
}


def _center_pad(h: np.ndarray, L: int) -> np.ndarray:
    """Zero-pad symmetrically to length L (difference always even here)."""
    d = L - h.size
    if d == 0:
        return h
    return np.concatenate([np.zeros(d // 2), h, np.zeros(d - d // 2)])


def _bior_bank(N: int, M: int, reverse: bool) -> tuple[np.ndarray, np.ndarray]:
    """SWT analysis bank (dec_lo, dec_hi) for biorN.M (or rbioN.M when
    ``reverse`` — the role-swapped family). dec_hi[k] = (−1)^k·other_lo[k]
    (the biorthogonal QMF relation; symmetric filters make the usual time
    reversal a no-op), both filters center-padded to a common length so the
    L/H subbands stay mutually aligned under circular convolution."""
    dec_lo, rec_lo = bior_lowpass_pair(N, M)
    if reverse:
        dec_lo, rec_lo = rec_lo, dec_lo
    L = max(dec_lo.size, rec_lo.size)
    lo = _center_pad(dec_lo, L)
    other = _center_pad(rec_lo, L)
    hi = np.array([((-1) ** k) * other[k] for k in range(L)])
    return lo, hi


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
    lo, hi = get_bank(wavelet)
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
    lo, hi = get_bank(wavelet)
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
