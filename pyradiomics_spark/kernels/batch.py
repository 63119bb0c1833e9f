"""Cross-document batched kernels: one numpy reduction per FEATURE per
Arrow batch instead of per document.

The per-doc kernels spend ~90 small-array numpy calls per document
(~4 µs overhead each) — the single-thread throughput ceiling. Here every
feature is a vectorized reduction over padded per-batch tensors:

* (B, L) ragged values → concatenated array + ``np.add.reduceat`` /
  bincount with per-doc offsets;
* texture matrices on a FULL 1..G global level grid with zero mass in
  absent cells — numerically identical to the per-doc compacted matrices
  because every feature reduction multiplies by the (zero) cell mass, and
  0·log2(0+eps) = 0 (the compaction in glcm.py:149-152 etc. affects no
  normalization: denominators are mass sums);
* the only non-vectorizable pieces stay as thin per-doc loops: percentile
  interpolation indexing (pure arithmetic on a batch-sorted array) and the
  GLCM MCC eigendecomposition (compacted per doc, like the reference).

Supported settings envelope (callers fall back to the per-doc kernels
outside it): bin_width mode, distances=(1,), symmetrical GLCM, no
weighting, full-validity ROI (no resegmentation), any gldm_a.

Parity with the per-doc kernels is asserted to 1e-9 in
tests/test_batch_kernels.py over the golden fixture corpus.
"""

from __future__ import annotations

import numpy as np

from pyradiomics_spark.config import EPS


def batch_supported(settings) -> bool:
    return (
        settings.bin_count is None
        and all(int(d) >= 1 for d in settings.distances)
        and settings.symmetrical_glcm
        and settings.weighting_norm is None
        and settings.resegment_range is None
    )


# ----------------------------------------------------------------- layout

class Ragged:
    """Concatenated per-doc arrays + offsets."""

    def __init__(self, arrays):
        self.lens = np.array([a.size for a in arrays], dtype=np.int64)
        self.B = len(arrays)
        self.starts = np.zeros(self.B, dtype=np.int64)
        np.cumsum(self.lens[:-1], out=self.starts[1:])
        self.x = (np.concatenate(arrays) if arrays else np.empty(0))
        self.doc = np.repeat(np.arange(self.B), self.lens)
        self.nonempty = self.lens > 0
        # reduceat over NONEMPTY docs only (their starts are strictly
        # increasing and < size; empty docs occupy no positions, so the
        # nonempty segments are exact) — clamping empty starts instead
        # would truncate the segment before a trailing empty doc
        self._ne_starts = self.starts[self.nonempty]

    def with_x(self, new_x: np.ndarray) -> "Ragged":
        """Same layout, different values (for derived image types)."""
        clone = object.__new__(Ragged)
        clone.lens = self.lens
        clone.B = self.B
        clone.starts = self.starts
        clone.x = new_x
        clone.doc = self.doc
        clone.nonempty = self.nonempty
        clone._ne_starts = self._ne_starts
        return clone

    def reduceat(self, arr, ufunc=np.add):
        """Per-doc reduction of a concat-aligned array (0 for empty docs)."""
        out = np.zeros(self.B)
        if self.x.size == 0 or self._ne_starts.size == 0:
            return out
        out[self.nonempty] = ufunc.reduceat(arr, self._ne_starts)
        return out

    def segsum(self, arr):
        return self.reduceat(arr, np.add)

    def segmax(self, arr):
        return self.reduceat(arr, np.maximum)

    def segmin(self, arr):
        return self.reduceat(arr, np.minimum)


def discretize_batch(r: Ragged, bin_width: float) -> np.ndarray:
    """Fixed-bin-width levels: floor(x/W) − floor(min_doc/W) + 1 — the exact
    arange+digitize semantics on any grid (the FP corner where they diverge
    needs fractional widths AND values straddling a representability
    boundary; asserted equal to the per-doc kernel in tests)."""
    fl = np.floor(r.x / bin_width)
    fmin = r.segmin(fl)
    return (fl - fmin[r.doc] + 1).astype(np.int64)


# ----------------------------------------------------- derived image types

#: image types with a batched transform (wavelets/LoG need per-doc circular
#: convolution and stay on the per-doc path)
BATCH_TRANSFORMS = (
    "original", "square", "squareroot", "logarithm", "exponential", "gradient",
)


def transform_batch(r: Ragged, kind: str) -> np.ndarray:
    """Per-doc global-rescale transforms (imageoperations.py:973-1091
    semantics) vectorized over the ragged batch; returns a concat-aligned
    array (same layout as ``r.x``)."""
    x = r.x
    if kind == "original":
        return x.astype(np.float64)
    if kind == "square":
        m = r.segmax(np.abs(x))[r.doc]
        return np.where(m == 0, x, (np.where(m > 0, 1.0 / np.sqrt(np.where(m > 0, m, 1)), 0.0) * x) ** 2)
    if kind == "squareroot":
        m = r.segmax(np.abs(x))[r.doc]
        return np.where(x > 0, np.sqrt(np.abs(x) * m),
                        np.where(x < 0, -np.sqrt(np.abs(x) * m), x))
    if kind == "logarithm":
        m = r.segmax(np.abs(x))
        out = np.where(x > 0, np.log(np.abs(x) + 1),
                       np.where(x < 0, -np.log(np.abs(x) + 1), x))
        om = r.segmax(np.abs(out))
        scale = np.where(om != 0, m / np.where(om != 0, om, 1), 1.0)
        return out * scale[r.doc]
    if kind == "exponential":
        m = r.segmax(np.abs(x))
        coeff = np.where(m > 0, np.log(np.where(m > 0, m, 1)) / np.where(m > 0, m, 1), 0.0)
        out = np.exp(coeff[r.doc] * x)
        # per-doc kernel returns all-ones when max==0
        return np.where(m[r.doc] == 0, 1.0, out)
    if kind == "gradient":
        n = x.size
        grad = np.zeros(n)
        if n > 1:
            left_ok = np.zeros(n, bool)
            right_ok = np.zeros(n, bool)
            same = r.doc[:-1] == r.doc[1:]
            left_ok[1:] = same
            right_ok[:-1] = same
            xl = np.roll(x, 1)
            xr = np.roll(x, -1)
            grad = np.where(
                left_ok & right_ok, (xr - xl) / 2.0,
                np.where(right_ok & ~left_ok, xr - x,
                         np.where(left_ok & ~right_ok, x - xl, 0.0)))
        return np.abs(grad)
    raise ValueError(f"no batched transform for {kind}")


# -------------------------------------------------------------- firstorder

def firstorder_batch(r: Ragged, levels: np.ndarray, voxel_array_shift: float = 0.0) -> dict:
    B = r.B
    n = r.lens.astype(np.float64)
    safe_n = np.maximum(n, 1)

    shifted = r.x + voxel_array_shift
    energy = r.segsum(shifted * shifted)
    total = r.segsum(r.x)
    mean = total / safe_n

    # percentiles via batch sort + numpy linear interpolation arithmetic
    order = np.lexsort((r.x, r.doc))
    xs = r.x[order]
    percs = {}
    for q in (10, 25, 50, 75, 90):
        pos = (n - 1) * (q / 100.0)
        lo = np.floor(pos).astype(np.int64)
        frac = pos - lo
        lo_idx = r.starts + np.minimum(lo, np.maximum(r.lens - 1, 0))
        hi_idx = r.starts + np.minimum(lo + 1, np.maximum(r.lens - 1, 0))
        lo_idx = np.minimum(lo_idx, max(xs.size - 1, 0))
        hi_idx = np.minimum(hi_idx, max(xs.size - 1, 0))
        if xs.size == 0:
            percs[q] = np.full(B, np.nan)
        else:
            # numpy's own linear form a[lo] + (a[hi]−a[lo])·frac — EXACT on
            # tied neighbors (the (1−frac)+frac form can overshoot by 1 ulp)
            percs[q] = xs[lo_idx] + (xs[hi_idx] - xs[lo_idx]) * frac

    mn = r.segmin(r.x)
    mx = r.segmax(r.x)

    d = r.x - mean[r.doc]
    m2 = r.segsum(d * d) / safe_n
    m3 = r.segsum(d * d * d) / safe_n
    m4 = r.segsum(d * d * d * d) / safe_n
    # truly-flat docs must hit the m2==0 fixup exactly; sequential reduceat
    # sums can leave a ~1e-32 residue where numpy's pairwise mean gives an
    # exact 0 (e.g. 8 × the same irrational transform value)
    truly_flat = mn == mx
    m2 = np.where(truly_flat, 0.0, m2)
    m3 = np.where(truly_flat, 0.0, m3)
    m4 = np.where(truly_flat, 0.0, m4)
    flat = m2 == 0
    m2s = np.where(flat, 1.0, m2)
    skew = np.where(flat, 0.0, m3 / m2s ** 1.5)
    kurt = np.where(flat, 0.0, m4 / m2s ** 2.0)
    mad = r.segsum(np.abs(d)) / safe_n

    # robust MAD: two masked passes
    in_rng = (r.x >= percs[10][r.doc]) & (r.x <= percs[90][r.doc])
    rn = np.bincount(r.doc, weights=in_rng.astype(float), minlength=B)
    rsum = np.bincount(r.doc, weights=np.where(in_rng, r.x, 0.0), minlength=B)
    rmean = rsum / np.maximum(rn, 1)
    rdev = np.bincount(
        r.doc, weights=np.where(in_rng, np.abs(r.x - rmean[r.doc]), 0.0),
        minlength=B)
    rmad = np.where(rn > 0, rdev / np.maximum(rn, 1), np.nan)

    # histogram features over discretized levels
    G = int(levels.max()) if levels.size else 1
    cnt = np.bincount(r.doc * G + (levels - 1), minlength=B * G).reshape(B, G)
    p = cnt / safe_n[:, None]
    entropy = -np.sum(p * np.log2(p + EPS), axis=1)
    # p=0 cells contribute -0·log2(eps)≈+0·52≈0 exactly (0 * finite = 0)
    uniformity = np.sum(p * p, axis=1)

    out = {
        "Energy": energy,
        "TotalEnergy": energy,
        "Entropy": entropy,
        "Minimum": mn,
        "10Percentile": percs[10],
        "90Percentile": percs[90],
        "Maximum": mx,
        "Mean": mean,
        "Median": percs[50],
        "InterquartileRange": percs[75] - percs[25],
        "Range": mx - mn,
        "MeanAbsoluteDeviation": mad,
        "RobustMeanAbsoluteDeviation": rmad,
        "RootMeanSquared": np.sqrt(energy / safe_n),
        "Skewness": skew,
        "Kurtosis": kurt,
        "Variance": m2,
        "Uniformity": uniformity,
    }
    empty = ~r.nonempty
    if empty.any():
        for k in out:
            out[k] = np.where(empty, np.nan, out[k])
    return out


# -------------------------------------------------------------- GLCM

def glcm_batch(r: Ragged, levels: np.ndarray, distances: tuple = (1,)) -> dict:
    """Symmetric GLCM on the full 1..G grid per batch. Multi-distance =
    per-angle features then nanmean over angles (empty angles NaN — exactly
    the reference's delete-empty-angles-then-mean, glcm.py:187-198)."""
    if len(distances) == 1:
        return _glcm_one_distance(r, levels, int(distances[0]))
    # multi-angle: per-angle features with empty angles as NaN, then nanmean
    # (delete-empty-angles-then-mean, glcm.py:187-198)
    per_angle = [
        _glcm_one_distance(r, levels, int(d), mask_empty=True)
        for d in distances
    ]
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        out = {
            k: np.nanmean(np.stack([a[k] for a in per_angle]), axis=0)
            for k in per_angle[0]
        }
    # the <2-gray-levels MCC guard is PRE-angle in the reference
    # (glcm.py:702-703): docs with a single present level get MCC=1 even
    # when every angle is empty
    B = r.B
    G = int(levels.max()) if levels.size else 1
    n_pres = (np.bincount(
        r.doc * G + (levels - 1), minlength=B * G).reshape(B, G) > 0).sum(axis=1)
    out["MCC"] = np.where(n_pres < 2, 1.0, out["MCC"])
    return out


def _glcm_one_distance(r: Ragged, levels: np.ndarray, dist: int,
                       mask_empty: bool = False) -> dict:
    B = r.B
    G = int(levels.max()) if levels.size else 1
    n = levels.size
    if n > dist:
        same = r.doc[:-dist] == r.doc[dist:]
        li = levels[:-dist][same] - 1
        lj = levels[dist:][same] - 1
        dd = r.doc[:-dist][same]
    else:
        li = lj = dd = np.empty(0, dtype=np.int64)
    P = np.bincount(dd * G * G + li * G + lj, minlength=B * G * G).reshape(
        B, G, G).astype(np.float64)
    P = P + P.transpose(0, 2, 1)  # symmetrize
    mass = P.sum(axis=(1, 2))
    norm = np.where(mass > 0, mass, np.nan)
    P = P / norm[:, None, None]

    gl = np.arange(1, G + 1, dtype=np.float64)
    i = gl[None, :, None]
    j = gl[None, None, :]
    ng = r.segmax(levels.astype(np.float64))  # per-doc max level (B,)
    ng = np.maximum(ng, 1)

    px = P.sum(axis=2)                      # (B,G)
    py = P.sum(axis=1)
    ux = np.sum(P * i, axis=(1, 2))
    uy = np.sum(P * j, axis=(1, 2))

    # p(x+y) / p(x−y) via dense projection matrices (G², K)
    gsum = (gl[:, None] + gl[None, :]).ravel()
    gdiff = np.abs(gl[:, None] - gl[None, :]).ravel()
    Ksum = 2 * G - 1
    Msum = np.zeros((G * G, Ksum))
    Msum[np.arange(G * G), (gsum - 2).astype(int)] = 1.0
    Mdiff = np.zeros((G * G, G))
    Mdiff[np.arange(G * G), gdiff.astype(int)] = 1.0
    Pf = P.reshape(B, G * G)
    p_add = Pf @ Msum                       # (B, 2G-1), k value = idx+2
    p_sub = Pf @ Mdiff                      # (B, G),   k value = idx
    k_sum = np.arange(2, 2 * G + 1, dtype=np.float64)
    k_diff = np.arange(0, G, dtype=np.float64)

    HXY = -np.sum(P * np.log2(P + EPS), axis=(1, 2))

    uxb = ux[:, None, None]
    uyb = uy[:, None, None]
    cprom = np.sum(P * ((i + j) - uxb - uyb) ** 4, axis=(1, 2))
    cshade = np.sum(P * ((i + j) - uxb - uyb) ** 3, axis=(1, 2))
    ctend = np.sum(P * ((i + j) - uxb - uyb) ** 2, axis=(1, 2))
    contrast = np.sum(P * (i - j) ** 2, axis=(1, 2))
    autoc = np.sum(P * (i * j), axis=(1, 2))

    sigx = np.sqrt(np.sum(P * (i - uxb) ** 2, axis=(1, 2)))
    sigy = np.sqrt(np.sum(P * (j - uyb) ** 2, axis=(1, 2)))
    corm = np.sum(P * (i - uxb) * (j - uyb), axis=(1, 2))
    with np.errstate(invalid="ignore"):
        corr = corm / (sigx * sigy + EPS)
    corr = np.where(sigx * sigy == 0, 1.0, corr)

    diffavg = p_sub @ k_diff
    diffent = -np.sum(p_sub * np.log2(p_sub + EPS), axis=1)
    diffvar = np.sum(p_sub * (k_diff[None, :] - diffavg[:, None]) ** 2, axis=1)
    jener = np.sum(P * P, axis=(1, 2))

    HX = -np.sum(px * np.log2(px + EPS), axis=1)
    HY = -np.sum(py * np.log2(py + EPS), axis=1)
    pxy = px[:, :, None] * py[:, None, :]
    HXY1 = -np.sum(P * np.log2(pxy + EPS), axis=(1, 2))
    HXY2 = -np.sum(pxy * np.log2(pxy + EPS), axis=(1, 2))
    div = np.fmax(HX, HY)
    with np.errstate(invalid="ignore"):
        imc1 = np.where(div != 0, (HXY - HXY1) / np.where(div != 0, div, 1.0), 0.0)
        imc2 = np.sqrt(np.maximum(1 - np.exp(-2.0 * (HXY2 - HXY)), 0.0))
    imc2 = np.where(HXY2 == HXY, 0.0, imc2)

    idm = np.sum(p_sub / (1 + k_diff[None, :] ** 2), axis=1)
    idmn = np.sum(p_sub / (1 + k_diff[None, :] ** 2 / (ng ** 2)[:, None]), axis=1)
    idcol = np.sum(p_sub / (1 + k_diff[None, :]), axis=1)
    idn = np.sum(p_sub / (1 + k_diff[None, :] / ng[:, None]), axis=1)
    with np.errstate(divide="ignore"):
        invvar = np.sum(p_sub[:, 1:] / k_diff[None, 1:] ** 2, axis=1)
    # reference: k range is 1..Ng_doc−1, an EMPTY slice when Ng_doc == 1 →
    # sum over empty = 0.0 (even for pairless docs where other features NaN)
    invvar = np.where(ng == 1, 0.0, invvar)
    maxprob = P.reshape(B, -1).max(axis=1)
    sumavg = p_add @ k_sum
    sument = -np.sum(p_add * np.log2(p_add + EPS), axis=1)
    sumsq = np.sum(P * (i - uxb) ** 2, axis=(1, 2))

    # MCC: eigen on the compacted present-level submatrix. Most docs have
    # CONTIGUOUS present levels 1..ng (token lengths are dense), so we group
    # them by ng and run ONE stacked eigvals per group; non-contiguous docs
    # fall back to the per-doc loop.
    mcc = np.full(B, 1.0)
    present = np.bincount(
        r.doc * G + (levels - 1), minlength=B * G).reshape(B, G) > 0
    n_pres = present.sum(axis=1)
    first_n_all = np.array(
        [present[b, : n_pres[b]].all() for b in range(B)])
    finite = np.isfinite(mass) & (mass > 0)

    def _mcc_from_stack(Ps: np.ndarray) -> np.ndarray:
        pxa = Ps.sum(axis=2)
        pya = Ps.sum(axis=1)
        R = Ps / (pxa[:, :, None] * pya[:, None, :] + EPS)
        Q = np.einsum("bik,bjk->bij", R, Ps)
        ev = np.linalg.eigvals(Q)
        ev.sort(axis=1)
        return np.real(np.sqrt(ev[:, -2]))

    for ng_doc in np.unique(n_pres):
        sel = (n_pres == ng_doc) & first_n_all & finite
        if ng_doc < 2 or not sel.any():
            continue  # <2 levels → MCC 1.0 (already)
        idx = np.flatnonzero(sel)
        mcc[idx] = _mcc_from_stack(P[idx][:, :ng_doc, :ng_doc])
    # stragglers: non-contiguous present levels (rare) → per-doc compaction
    for b in np.flatnonzero(~first_n_all & (n_pres >= 2) & finite):
        pres = np.flatnonzero(present[b])
        Pb = P[b][np.ix_(pres, pres)]
        mcc[b] = _mcc_from_stack(Pb[None, :, :])[0]
    # pairless docs can't have ≥2 present levels at distance 1, but keep the
    # per-doc NaN semantics for that (dead-in-practice) corner
    mcc[~finite & (n_pres >= 2)] = np.nan

    out = {
        "Autocorrelation": autoc, "JointAverage": ux,
        "ClusterProminence": cprom, "ClusterShade": cshade,
        "ClusterTendency": ctend, "Contrast": contrast,
        "Correlation": corr, "DifferenceAverage": diffavg,
        "DifferenceEntropy": diffent, "DifferenceVariance": diffvar,
        "JointEnergy": jener, "JointEntropy": HXY,
        "Imc1": imc1, "Imc2": imc2, "Idm": idm, "MCC": mcc,
        "Idmn": idmn, "Id": idcol, "Idn": idn, "InverseVariance": invvar,
        "MaximumProbability": maxprob, "SumAverage": sumavg,
        "SumEntropy": sument, "SumSquares": sumsq,
    }
    # multi-angle only: pair-less docs at this distance → the whole angle
    # is NaN so the nanmean skips it (delete-empty-angle semantics); the
    # guards above gave MCC=1 / Imc=0 / invvar=0 which would wrongly
    # survive the nanmean. Single-angle keeps those per-doc guard values.
    empty = ~(mass > 0)
    if mask_empty and empty.any():
        for k in out:
            v = np.asarray(out[k], dtype=np.float64).copy()
            v[empty] = np.nan
            out[k] = v
    return out


# -------------------------------------------------- runs (GLRLM + GLSZM)

def _runs_batch(r: Ragged, levels: np.ndarray):
    """RLE across the concatenated batch; doc boundaries break runs.
    Returns (run_doc, run_level, run_len)."""
    n = levels.size
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    brk = np.ones(n, dtype=bool)
    brk[1:] = (levels[1:] != levels[:-1]) | (r.doc[1:] != r.doc[:-1])
    starts = np.flatnonzero(brk)
    lens = np.diff(np.append(starts, n))
    return r.doc[starts], levels[starts], lens


def _rlm_features(P, iv, jv, kind: str) -> dict:
    """Shared GLRLM/GLSZM reductions over (B, Gi, Gj) count tensors."""
    nr = P.sum(axis=(1, 2))
    nr_safe = np.where(nr > 0, nr, np.nan)
    pr = P.sum(axis=1)  # (B, J)
    pg = P.sum(axis=2)  # (B, G)
    jv2 = jv ** 2
    iv2 = iv ** 2

    sre = (pr / jv2[None, :]).sum(axis=1) / nr_safe
    lre = (pr * jv2[None, :]).sum(axis=1) / nr_safe
    gln = (pg ** 2).sum(axis=1) / nr_safe
    glnn = (pg ** 2).sum(axis=1) / nr_safe ** 2
    rln = (pr ** 2).sum(axis=1) / nr_safe
    rlnn = (pr ** 2).sum(axis=1) / nr_safe ** 2
    np_vox = (pr * jv[None, :]).sum(axis=1)
    rp = nr / np.where(np_vox > 0, np_vox, np.nan)

    pg_n = pg / nr_safe[:, None]
    u_i = (pg_n * iv[None, :]).sum(axis=1)
    glv = (pg_n * (iv[None, :] - u_i[:, None]) ** 2).sum(axis=1)
    pr_n = pr / nr_safe[:, None]
    u_j = (pr_n * jv[None, :]).sum(axis=1)
    rv = (pr_n * (jv[None, :] - u_j[:, None]) ** 2).sum(axis=1)
    Pn = P / nr_safe[:, None, None]
    re = -np.sum(Pn * np.log2(Pn + EPS), axis=(1, 2))

    lgl = (pg / iv2[None, :]).sum(axis=1) / nr_safe
    hgl = (pg * iv2[None, :]).sum(axis=1) / nr_safe
    ii = iv2[None, :, None]
    jj = jv2[None, None, :]
    srl = (P / (ii * jj)).sum(axis=(1, 2)) / nr_safe
    srh = (P * ii / jj).sum(axis=(1, 2)) / nr_safe
    lrl = (P * jj / ii).sum(axis=(1, 2)) / nr_safe
    lrh = (P * ii * jj).sum(axis=(1, 2)) / nr_safe

    if kind == "glrlm":
        return {
            "ShortRunEmphasis": sre, "LongRunEmphasis": lre,
            "GrayLevelNonUniformity": gln, "GrayLevelNonUniformityNormalized": glnn,
            "RunLengthNonUniformity": rln, "RunLengthNonUniformityNormalized": rlnn,
            "RunPercentage": rp, "GrayLevelVariance": glv, "RunVariance": rv,
            "RunEntropy": re, "LowGrayLevelRunEmphasis": lgl,
            "HighGrayLevelRunEmphasis": hgl,
            "ShortRunLowGrayLevelEmphasis": srl,
            "ShortRunHighGrayLevelEmphasis": srh,
            "LongRunLowGrayLevelEmphasis": lrl,
            "LongRunHighGrayLevelEmphasis": lrh,
        }
    return {
        "SmallAreaEmphasis": sre, "LargeAreaEmphasis": lre,
        "GrayLevelNonUniformity": gln, "GrayLevelNonUniformityNormalized": glnn,
        "SizeZoneNonUniformity": rln, "SizeZoneNonUniformityNormalized": rlnn,
        "ZonePercentage": rp, "GrayLevelVariance": glv, "ZoneVariance": rv,
        "ZoneEntropy": re, "LowGrayLevelZoneEmphasis": lgl,
        "HighGrayLevelZoneEmphasis": hgl,
        "SmallAreaLowGrayLevelEmphasis": srl,
        "SmallAreaHighGrayLevelEmphasis": srh,
        "LargeAreaLowGrayLevelEmphasis": lrl,
        "LargeAreaHighGrayLevelEmphasis": lrh,
    }


def runs_batch_features(r: Ragged, levels: np.ndarray):
    """GLRLM + GLSZM feature dicts (identical matrices in 1-D)."""
    run_doc, run_level, run_len = _runs_batch(r, levels)
    B = r.B
    G = int(levels.max()) if levels.size else 1
    jvals = np.unique(run_len) if run_len.size else np.array([1], dtype=np.int64)
    J = jvals.size
    ji = np.searchsorted(jvals, run_len)
    P = np.bincount(
        run_doc * G * J + (run_level - 1) * J + ji, minlength=B * G * J
    ).reshape(B, G, J).astype(np.float64)
    iv = np.arange(1, G + 1, dtype=np.float64)
    jv = jvals.astype(np.float64)
    return _rlm_features(P, iv, jv, "glrlm"), _rlm_features(P, iv, jv, "glszm")


# -------------------------------------------------------------- NGTDM

def ngtdm_batch(r: Ragged, levels: np.ndarray, distances: tuple = (1,)) -> dict:
    B = r.B
    G = int(levels.max()) if levels.size else 1
    n = levels.size
    lv = levels.astype(np.float64)
    nbr_sum = np.zeros(n)
    nbr_cnt = np.zeros(n)
    for d in distances:
        d = int(d)
        if n > d:
            same = r.doc[:-d] == r.doc[d:]
            nbr_sum[:-d] += np.where(same, lv[d:], 0.0)
            nbr_cnt[:-d] += same
            nbr_sum[d:] += np.where(same, lv[:-d], 0.0)
            nbr_cnt[d:] += same
    counted = nbr_cnt > 0
    with np.errstate(invalid="ignore", divide="ignore"):
        mean_nbr = np.where(counted, nbr_sum / np.maximum(nbr_cnt, 1), 0.0)
    diffs = np.where(counted, np.abs(lv - mean_nbr), 0.0)

    idx = r.doc * G + (levels - 1)
    n_i = np.bincount(idx, weights=counted.astype(float), minlength=B * G
                      ).reshape(B, G)
    s_i = np.bincount(idx, weights=diffs, minlength=B * G).reshape(B, G)

    nvp = n_i.sum(axis=1)
    nvp_safe = np.where(nvp > 0, nvp, np.nan)
    p_i = n_i / nvp_safe[:, None]
    ngp = (n_i > 0).sum(axis=1)
    iv = np.arange(1, G + 1, dtype=np.float64)

    sum_coarse = (p_i * s_i).sum(axis=1)
    coarse = np.where(sum_coarse != 0, 1.0 / np.where(sum_coarse != 0, sum_coarse, 1), 1e6)

    div = ngp * (ngp - 1)
    dmat = (iv[:, None] - iv[None, :]) ** 2
    quad = np.einsum("bi,bj,ij->b", p_i, p_i, dmat)
    contrast = np.where(
        div != 0, quad * s_i.sum(axis=1) / nvp_safe / np.where(div != 0, div, 1), 0.0)

    # p_zero masking: zero-p rows/cols contribute 0 automatically for
    # Busyness numerator terms |i·pᵢ − j·pⱼ| ONLY if masked explicitly
    pmask = (p_i > 0).astype(np.float64)  # (B,G)
    i_pi = iv[None, :] * p_i
    absdiff = np.abs(i_pi[:, :, None] - i_pi[:, None, :])
    mm = pmask[:, :, None] * pmask[:, None, :]
    denom = (absdiff * mm).sum(axis=(1, 2))
    busy = np.where(denom != 0, sum_coarse / np.where(denom != 0, denom, 1), 0.0)

    pi_si = p_i * s_i
    numer = (pi_si[:, :, None] + pi_si[:, None, :]) * mm
    divis = p_i[:, :, None] + p_i[:, None, :]
    divis = np.where(divis == 0, 1.0, divis)
    absdiff_iv = np.abs(iv[:, None] - iv[None, :])[None, :, :]
    complexity = (absdiff_iv * numer / divis).sum(axis=(1, 2)) / nvp_safe

    sum_s = s_i.sum(axis=1)
    strength_num = ((p_i[:, :, None] + p_i[:, None, :]) * mm
                    * (iv[:, None] - iv[None, :])[None, :, :] ** 2).sum(axis=(1, 2))
    strength = np.where(sum_s != 0, strength_num / np.where(sum_s != 0, sum_s, 1), 0.0)

    out = {"Coarseness": coarse, "Contrast": contrast, "Busyness": busy,
           "Complexity": complexity, "Strength": strength}
    bad = ~(nvp > 0)
    if bad.any():
        for k in out:
            out[k] = np.where(bad, 0.0, out[k])
    return out


# -------------------------------------------------------------- GLDM

def gldm_batch(r: Ragged, levels: np.ndarray, alpha: float = 0.0,
               distances: tuple = (1,)) -> dict:
    B = r.B
    G = int(levels.max()) if levels.size else 1
    n = levels.size
    dep = np.zeros(n, dtype=np.int64)
    for d in distances:
        d = int(d)
        if n > d:
            same = r.doc[:-d] == r.doc[d:]
            ok = same & (np.abs(levels[:-d] - levels[d:]) <= alpha)
            dep[:-d] += ok
            dep[d:] += ok
    D = 2 * len(distances) + 1  # dep ∈ {0..2·Nd}
    P = np.bincount(
        r.doc * G * D + (levels - 1) * D + dep, minlength=B * G * D
    ).reshape(B, G, D).astype(np.float64)
    iv = np.arange(1, G + 1, dtype=np.float64)
    jv = np.arange(1, D + 1, dtype=np.float64)  # dep d ↔ j = d+1

    nz = P.sum(axis=(1, 2))
    nz_safe = np.where(nz > 0, nz, np.nan)
    pd_ = P.sum(axis=1)
    pg = P.sum(axis=2)
    jv2 = jv ** 2
    iv2 = iv ** 2

    out = {
        "SmallDependenceEmphasis": (pd_ / jv2[None, :]).sum(axis=1) / nz_safe,
        "LargeDependenceEmphasis": (pd_ * jv2[None, :]).sum(axis=1) / nz_safe,
        "GrayLevelNonUniformity": (pg ** 2).sum(axis=1) / nz_safe,
        "DependenceNonUniformity": (pd_ ** 2).sum(axis=1) / nz_safe,
        "DependenceNonUniformityNormalized": (pd_ ** 2).sum(axis=1) / nz_safe ** 2,
    }
    pg_n = pg / nz_safe[:, None]
    u_i = (pg_n * iv[None, :]).sum(axis=1)
    out["GrayLevelVariance"] = (pg_n * (iv[None, :] - u_i[:, None]) ** 2).sum(axis=1)
    pd_n = pd_ / nz_safe[:, None]
    u_j = (pd_n * jv[None, :]).sum(axis=1)
    out["DependenceVariance"] = (pd_n * (jv[None, :] - u_j[:, None]) ** 2).sum(axis=1)
    Pn = P / nz_safe[:, None, None]
    out["DependenceEntropy"] = -np.sum(Pn * np.log2(Pn + EPS), axis=(1, 2))
    out["LowGrayLevelEmphasis"] = (pg / iv2[None, :]).sum(axis=1) / nz_safe
    out["HighGrayLevelEmphasis"] = (pg * iv2[None, :]).sum(axis=1) / nz_safe
    ii = iv2[None, :, None]
    jj = jv2[None, None, :]
    out["SmallDependenceLowGrayLevelEmphasis"] = (P / (ii * jj)).sum(axis=(1, 2)) / nz_safe
    out["SmallDependenceHighGrayLevelEmphasis"] = (P * ii / jj).sum(axis=(1, 2)) / nz_safe
    out["LargeDependenceLowGrayLevelEmphasis"] = (P * jj / ii).sum(axis=(1, 2)) / nz_safe
    out["LargeDependenceHighGrayLevelEmphasis"] = (P * ii * jj).sum(axis=(1, 2)) / nz_safe
    return out
