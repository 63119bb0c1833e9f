"""Kernel correctness vs independent brute-force oracles.

The oracles here are written loop-style (deliberately different code shape
from the vectorized kernels) directly from the published formulas, giving a
two-implementation cross-check analogous to the reference's golden-CSV
regression (/root/reference/tests/test_features.py).
"""

import math

import numpy as np
import pytest

from pyradiomics_spark.config import EPS
from pyradiomics_spark.kernels import (
    bin_edges, discretize, firstorder_features,
    glcm_matrix, glcm_features,
    glrlm_matrix, glrlm_features,
    glszm_matrix, glszm_features,
    ngtdm_matrix, ngtdm_features,
    gldm_matrix, gldm_features,
)
from pyradiomics_spark.kernels.glrlm import run_lengths


# ---------------- binning ----------------

def test_bin_edges_docstring_example():
    # reference docstring: values 54..166, W=25 → edges [50,75,100,125,150,175]
    vals = np.array([54, 60, 100, 166.0])
    edges = bin_edges(vals, bin_width=25)
    assert edges[0] == 50
    assert 175 in edges  # top value must land in a half-open bin
    lv = discretize(vals, bin_width=25)
    assert lv.min() == 1
    # floor(x/W) - floor(min/W) + 1
    expect = np.floor(vals / 25) - math.floor(54 / 25) + 1
    np.testing.assert_array_equal(lv, expect.astype(int))


def test_bin_max_divisible_by_width_gets_own_bin():
    vals = np.array([0.0, 25.0, 50.0])
    lv = discretize(vals, bin_width=25)
    # max (50) exactly on an edge → its own bin (digitize semantics)
    np.testing.assert_array_equal(lv, [1, 2, 3])


def test_bin_flat_region_single_bin():
    vals = np.array([50.0, 50.0, 50.0])
    lv = discretize(vals, bin_width=25)
    np.testing.assert_array_equal(lv, [1, 1, 1])


def test_bin_count_mode_top_edge():
    vals = np.array([1.0, 2.0, 3.0, 4.0])
    lv = discretize(vals, bin_count=4)
    np.testing.assert_array_equal(lv, [1, 2, 3, 4])  # max joins top bin


# ---------------- firstorder ----------------

def test_firstorder_against_direct_formulas(rng):
    x = rng.integers(1, 200, size=500).astype(float)
    f = firstorder_features(x, bin_width=25)

    assert f["Mean"] == pytest.approx(x.mean())
    assert f["Minimum"] == x.min()
    assert f["Maximum"] == x.max()
    assert f["Range"] == x.max() - x.min()
    assert f["Energy"] == pytest.approx((x ** 2).sum())
    assert f["RootMeanSquared"] == pytest.approx(np.sqrt((x ** 2).mean()))
    assert f["Variance"] == pytest.approx(x.var())
    assert f["Median"] == pytest.approx(np.median(x))
    assert f["10Percentile"] == pytest.approx(np.percentile(x, 10))
    assert f["InterquartileRange"] == pytest.approx(
        np.percentile(x, 75) - np.percentile(x, 25))
    assert f["MeanAbsoluteDeviation"] == pytest.approx(np.abs(x - x.mean()).mean())

    # skewness/kurtosis: population moments
    m = x.mean()
    m2 = ((x - m) ** 2).mean()
    m3 = ((x - m) ** 3).mean()
    m4 = ((x - m) ** 4).mean()
    assert f["Skewness"] == pytest.approx(m3 / m2 ** 1.5)
    assert f["Kurtosis"] == pytest.approx(m4 / m2 ** 2)  # NOT excess

    # histogram features on discretized levels
    lv = discretize(x, bin_width=25)
    _, cnt = np.unique(lv, return_counts=True)
    p = cnt / cnt.sum()
    assert f["Entropy"] == pytest.approx(-(p * np.log2(p + EPS)).sum())
    assert f["Uniformity"] == pytest.approx((p ** 2).sum())

    # robust MAD
    p10, p90 = np.percentile(x, [10, 90])
    sub = x[(x >= p10) & (x <= p90)]
    assert f["RobustMeanAbsoluteDeviation"] == pytest.approx(
        np.abs(sub - sub.mean()).mean())


def test_firstorder_flat_region():
    x = np.full(10, 42.0)
    f = firstorder_features(x)
    assert f["Skewness"] == 0.0
    assert f["Kurtosis"] == 0.0
    assert f["Variance"] == 0.0
    assert f["Entropy"] == pytest.approx(-np.log2(1 + EPS))
    assert f["Uniformity"] == 1.0


def test_firstorder_voxel_shift():
    x = np.array([1.0, 2.0, 3.0])
    f = firstorder_features(x, voxel_array_shift=10)
    assert f["Energy"] == pytest.approx(sum((v + 10) ** 2 for v in x))
    # shift affects only Energy/TotalEnergy/RMS
    assert f["Mean"] == 2.0


# ---------------- GLCM ----------------

def brute_glcm_counts(levels, d, valid=None):
    """Loop-style directed pair counting."""
    n = len(levels)
    if valid is None:
        valid = [True] * n
    gls = sorted(set(l for l, v in zip(levels, valid) if v))
    pos = {g: k for k, g in enumerate(gls)}
    P = np.zeros((len(gls), len(gls)))
    for p in range(n - d):
        if valid[p] and valid[p + d]:
            P[pos[levels[p]], pos[levels[p + d]]] += 1
    return P, gls


def test_glcm_matrix_counts(rng):
    levels = rng.integers(1, 6, size=100).tolist()
    P, gl, ng = glcm_matrix(np.array(levels), distances=(1,), symmetric=False)
    B, gls = brute_glcm_counts(levels, 1)
    Bn = B / B.sum()
    np.testing.assert_allclose(P[:, :, 0], Bn, atol=1e-12)
    assert list(gl) == gls


def test_glcm_symmetric():
    levels = np.array([1, 2, 1, 3, 3, 2])
    P, gl, ng = glcm_matrix(levels, distances=(1,), symmetric=True)
    M = P[:, :, 0]
    np.testing.assert_allclose(M, M.T)
    assert M.sum() == pytest.approx(1.0)


def test_glcm_masked_positions_break_pairs():
    levels = np.array([1, 2, 3, 4])
    valid = np.array([True, False, True, True])
    P, gl, ng = glcm_matrix(levels, distances=(1,), symmetric=False, valid=valid)
    # only (3,4) pair survives; compacted gray levels = [1,3,4]
    assert list(gl) == [1, 3, 4]
    M = P[:, :, 0]
    assert M[1, 2] == 1.0  # normalized single pair
    assert M.sum() == pytest.approx(1.0)


def test_glcm_features_direct(rng):
    levels = rng.integers(1, 8, size=400)
    f = glcm_features(levels, distances=(1,), symmetric=True)
    P, gl, ng = glcm_matrix(levels, distances=(1,), symmetric=True)
    M = P[:, :, 0]
    i = gl[:, None]
    j = gl[None, :]
    assert f["JointEnergy"] == pytest.approx((M ** 2).sum())
    assert f["JointEntropy"] == pytest.approx(-(M * np.log2(M + EPS)).sum())
    assert f["Contrast"] == pytest.approx((M * (i - j) ** 2).sum())
    assert f["Autocorrelation"] == pytest.approx((M * i * j).sum())
    assert f["MaximumProbability"] == pytest.approx(M.max())
    ux = (i * M).sum()
    uy = (j * M).sum()
    assert f["JointAverage"] == pytest.approx(ux)
    assert f["ClusterTendency"] == pytest.approx((M * (i + j - ux - uy) ** 2).sum())
    # correlation via direct standardized covariance
    sx = np.sqrt((M * (i - ux) ** 2).sum())
    sy = np.sqrt((M * (j - uy) ** 2).sum())
    cov = (M * (i - ux) * (j - uy)).sum()
    assert f["Correlation"] == pytest.approx(cov / (sx * sy + EPS))
    # symmetric GLCM ⇒ SumAverage == 2·JointAverage (reference glcm.py:802-812)
    assert f["SumAverage"] == pytest.approx(2 * ux)


def test_glcm_flat_region():
    levels = np.ones(20, dtype=int)
    f = glcm_features(levels)
    assert f["Correlation"] == 1.0
    assert f["MCC"] == 1.0
    assert f["Imc1"] == 0.0
    assert f["Imc2"] == 0.0
    assert f["JointEnergy"] == pytest.approx(1.0)
    assert f["Contrast"] == 0.0


def test_glcm_multi_distance_mean():
    levels = np.array([1, 2, 1, 2, 1, 2, 3, 1])
    f12 = glcm_features(levels, distances=(1, 2))
    f1 = glcm_features(levels, distances=(1,))
    f2 = glcm_features(levels, distances=(2,))
    assert f12["Contrast"] == pytest.approx((f1["Contrast"] + f2["Contrast"]) / 2)


# ---------------- GLRLM / GLSZM ----------------

def brute_runs(levels, valid=None):
    n = len(levels)
    if valid is None:
        valid = [True] * n
    runs = []
    p = 0
    while p < n:
        if not valid[p]:
            p += 1
            continue
        q = p
        while q + 1 < n and valid[q + 1] and levels[q + 1] == levels[p]:
            q += 1
        runs.append((levels[p], q - p + 1))
        p = q + 1
    return runs


def test_run_lengths(rng):
    levels = rng.integers(1, 4, size=200).tolist()
    valid = (rng.random(200) > 0.2).tolist()
    rl, ln = run_lengths(np.array(levels), np.array(valid))
    expect = brute_runs(levels, valid)
    assert list(zip(rl.tolist(), ln.tolist())) == expect


def test_glrlm_features_direct():
    levels = np.array([1, 1, 2, 2, 2, 3, 1, 1, 1, 1])
    f = glrlm_features(levels)
    # runs: (1,2),(2,3),(3,1),(1,4) → Nr=4, Np=10
    assert f["RunPercentage"] == pytest.approx(4 / 10)
    # SRE = Σ pr(j)/j² / Nr : lengths {1:1, 2:1, 3:1, 4:1}
    assert f["ShortRunEmphasis"] == pytest.approx((1 / 1 + 1 / 4 + 1 / 9 + 1 / 16) / 4)
    assert f["LongRunEmphasis"] == pytest.approx((1 + 4 + 9 + 16) / 4)
    # GLN: level counts {1:2 runs, 2:1, 3:1} → (4+1+1)/4
    assert f["GrayLevelNonUniformity"] == pytest.approx(6 / 4)
    assert f["HighGrayLevelRunEmphasis"] == pytest.approx((2 * 1 + 1 * 4 + 1 * 9) / 4)


def test_glszm_equals_glrlm_runs_in_1d(rng):
    levels = rng.integers(1, 5, size=100)
    Pr, ivr, jvr = glrlm_matrix(levels)
    Pz, ivz, jvz = glszm_matrix(levels)
    np.testing.assert_array_equal(Pr, Pz)
    np.testing.assert_array_equal(ivr, ivz)


def test_glszm_features_direct():
    levels = np.array([1, 1, 2, 2, 2, 3])
    f = glszm_features(levels)
    # zones: (1,2),(2,3),(3,1); Nz=3, Np=6
    assert f["ZonePercentage"] == pytest.approx(3 / 6)
    assert f["SmallAreaEmphasis"] == pytest.approx((1 / 4 + 1 / 9 + 1) / 3)
    assert f["LargeAreaEmphasis"] == pytest.approx((4 + 9 + 1) / 3)
    assert f["LowGrayLevelZoneEmphasis"] == pytest.approx((1 / 1 + 1 / 4 + 1 / 9) / 3)


# ---------------- NGTDM ----------------

def brute_ngtdm(levels, valid=None, dists=(1,)):
    n = len(levels)
    if valid is None:
        valid = [True] * n
    out = {}
    for p in range(n):
        if not valid[p]:
            continue
        nbrs = []
        for d in dists:
            for s in (-d, d):
                q = p + s
                if 0 <= q < n and valid[q]:
                    nbrs.append(levels[q])
        if not nbrs:
            continue
        lvl = levels[p]
        ni, si = out.get(lvl, (0, 0.0))
        out[lvl] = (ni + 1, si + abs(lvl - sum(nbrs) / len(nbrs)))
    return out


def test_ngtdm_matrix(rng):
    levels = rng.integers(1, 5, size=60).tolist()
    valid = (rng.random(60) > 0.15).tolist()
    n_i, s_i, iv = ngtdm_matrix(np.array(levels), valid=np.array(valid))
    expect = brute_ngtdm(levels, valid)
    for k, (ni, si) in sorted(expect.items()):
        idx = list(iv).index(k)
        assert n_i[idx] == ni
        assert s_i[idx] == pytest.approx(si)


def test_ngtdm_flat_region():
    f = ngtdm_features(np.ones(10, dtype=int))
    assert f["Coarseness"] == 1e6
    assert f["Contrast"] == 0.0
    assert f["Busyness"] == 0.0
    assert f["Strength"] == 0.0


def test_ngtdm_features_direct():
    levels = np.array([1, 2, 1, 2])
    # voxel 0: nbr mean 2 → |1-2|=1 ; voxel 1: (1+1)/2=1 → 1 ; voxel 2: 2 → 1; voxel 3: 1 → 1
    n_i, s_i, iv = ngtdm_matrix(levels)
    np.testing.assert_array_equal(n_i, [2, 2])
    np.testing.assert_allclose(s_i, [2.0, 2.0])
    f = ngtdm_features(levels)
    # p = [.5,.5]; coarseness = 1/(0.5*2+0.5*2) = 0.5
    assert f["Coarseness"] == pytest.approx(0.5)
    # contrast = [ΣΣ p_i p_j (i-j)²/(Ngp(Ngp-1))] * [Σs_i/Nvp] = (2*0.25*1/2) * (4/4)
    assert f["Contrast"] == pytest.approx(0.25)


# ---------------- GLDM ----------------

def brute_gldm(levels, alpha=0.0, valid=None, dists=(1,)):
    n = len(levels)
    if valid is None:
        valid = [True] * n
    cells = {}
    for p in range(n):
        if not valid[p]:
            continue
        dep = 0
        for d in dists:
            for s in (-d, d):
                q = p + s
                if 0 <= q < n and valid[q] and abs(levels[p] - levels[q]) <= alpha:
                    dep += 1
        cells[(levels[p], dep)] = cells.get((levels[p], dep), 0) + 1
    return cells


def test_gldm_matrix(rng):
    levels = rng.integers(1, 5, size=80).tolist()
    valid = (rng.random(80) > 0.2).tolist()
    P, iv, jv = gldm_matrix(np.array(levels), alpha=0.0, valid=np.array(valid))
    expect = brute_gldm(levels, 0.0, valid)
    total = sum(expect.values())
    assert P.sum() == total
    for (lvl, dep), cnt in expect.items():
        gi = list(iv).index(lvl)
        ji = list(jv).index(dep + 1)
        assert P[gi, ji] == cnt


def test_gldm_features_direct():
    levels = np.array([1, 1, 2, 2, 2, 3])
    # deps (α=0): p0:1, p1:1, p2:1, p3:2, p4:1, p5:0
    f = gldm_features(levels)
    P, iv, jv = gldm_matrix(levels)
    nz = P.sum()
    assert nz == 6
    pd = P.sum(axis=0)
    assert f["SmallDependenceEmphasis"] == pytest.approx(np.sum(pd / jv ** 2) / nz)
    assert f["LargeDependenceEmphasis"] == pytest.approx(np.sum(pd * jv ** 2) / nz)


def test_gldm_alpha():
    levels = np.array([1, 2, 3, 4])
    f0 = gldm_matrix(levels, alpha=0.0)[0]
    f9 = gldm_matrix(levels, alpha=9.0)[0]
    assert f0.sum() == f9.sum() == 4
    # α=9: every neighbor is dependent → deps [1,2,2,1]
    P, iv, jv = gldm_matrix(levels, alpha=9.0)
    assert list(jv) == [2.0, 3.0]


# ---------------- seqshape ----------------

def test_seqshape_solid_mask():
    from pyradiomics_spark.kernels.seqshape import seqshape_features
    f = seqshape_features(10)
    assert f["NTokens"] == 10
    assert f["ValidFraction"] == 1.0
    assert f["Compactness"] == 1.0
    assert f["NRuns"] == 1
    assert f["SpanLength"] == 10
    assert f["CenterOfMass"] == pytest.approx(0.5)


def test_seqshape_gappy_mask():
    from pyradiomics_spark.kernels.seqshape import seqshape_features
    valid = np.array([False, True, True, False, False, True, False, True])
    f = seqshape_features(8, valid)
    assert f["NTokens"] == 8
    assert f["ValidFraction"] == 0.5
    assert f["SpanStart"] == 1 and f["SpanEnd"] == 7
    assert f["SpanLength"] == 7
    assert f["NRuns"] == 3
    assert f["MaxRunLength"] == 2
    assert f["MeanRunLength"] == pytest.approx(4 / 3)
    assert f["Compactness"] == pytest.approx(4 / 7)


def test_seqshape_empty():
    from pyradiomics_spark.kernels.seqshape import seqshape_features
    f = seqshape_features(0)
    assert all(np.isnan(v) for v in f.values())
