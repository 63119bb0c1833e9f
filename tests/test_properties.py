"""Property-based tests (hypothesis) for kernel invariants — beyond the
reference's example-based suite (SURVEY.md §5 'our test strategy')."""

import numpy as np
from hypothesis import given, settings as hsettings, strategies as st

from pyradiomics_spark.kernels import discretize, firstorder_features
from pyradiomics_spark.kernels.glrlm import run_lengths
from pyradiomics_spark.kernels.glcm import glcm_matrix
from pyradiomics_spark.kernels.gldm import gldm_matrix
from pyradiomics_spark.kernels.ngtdm import ngtdm_matrix

floats = st.floats(min_value=-1e6, max_value=1e6,
                   allow_nan=False, allow_infinity=False)
arrays = st.lists(floats, min_size=1, max_size=200).map(np.array)
level_arrays = st.lists(
    st.integers(min_value=1, max_value=12), min_size=1, max_size=200
).map(lambda v: np.array(v, dtype=np.int64))


@given(arrays, st.floats(min_value=0.01, max_value=100))
@hsettings(max_examples=200, deadline=None)
def test_batched_discretize_exact_parity_fbw(x, w):
    """The batched correction-loop discretizer == per-doc arange+digitize
    EXACTLY, for arbitrary floats and fractional widths (the round-2 claim
    that removed the integer-width gate)."""
    from pyradiomics_spark.kernels.batch import Ragged, discretize_batch

    expect = discretize(x, bin_width=w)
    got = discretize_batch(Ragged([x.astype(np.float64)]), w)
    np.testing.assert_array_equal(got, expect)


@given(arrays, st.integers(min_value=1, max_value=32))
@hsettings(max_examples=200, deadline=None)
def test_batched_discretize_exact_parity_fbn(x, k):
    """FBN mode: batched == np.histogram-edges+digitize exactly, including
    the flat-doc (v±0.5 range expansion) and max-joins-top-bin corners."""
    from pyradiomics_spark.kernels.batch import Ragged, discretize_batch

    expect = discretize(x, bin_count=k)
    got = discretize_batch(Ragged([x.astype(np.float64)]), 25.0, bin_count=k)
    np.testing.assert_array_equal(got, expect)


@given(arrays, st.floats(min_value=0.01, max_value=100))
@hsettings(max_examples=200, deadline=None)
def test_binning_laws(x, w):
    lv = discretize(x, bin_width=w)
    assert lv.min() >= 1                      # 1-based levels
    # order-preserving: x1 <= x2 ⇒ level(x1) <= level(x2)
    order = np.argsort(x, kind="mergesort")
    assert (np.diff(lv[order]) >= 0).all()
    if x.min() == x.max():
        # flat region → a single level (==1 on integer grids; FP remainder
        # in the reference's lowBound arithmetic can shift it for
        # fractional widths — we replicate that faithfully)
        assert np.unique(lv).size == 1


@given(
    st.lists(st.integers(min_value=-1000, max_value=1000),
             min_size=1, max_size=200).map(lambda v: np.array(v, dtype=float)),
    st.integers(min_value=1, max_value=50),
)
@hsettings(max_examples=200, deadline=None)
def test_binning_floor_formula_integer_grid(x, w):
    # the documented identity X_b = floor(x/W) − floor(min/W) + 1
    # (imageoperations.py docstring) holds exactly on integer grids;
    # for fractional widths the reference's arange+digitize path (which we
    # replicate) is authoritative and can differ by FP rounding
    lv = discretize(x, bin_width=float(w))
    if x.min() != x.max():
        expect = np.floor(x / w) - np.floor(x.min() / w) + 1
        np.testing.assert_array_equal(lv, expect.astype(np.int64))


@given(arrays)
@hsettings(max_examples=100, deadline=None)
def test_firstorder_invariants(x):
    f = firstorder_features(x, bin_width=25.0)

    def le(a, b):  # ordered up to 1-ulp-ish FP slack: numpy's pairwise mean
        return a <= b or abs(a - b) <= 1e-12 * max(1.0, abs(a), abs(b))
        # can land 1 ulp outside [min, max] for near-identical values

    assert le(f["Minimum"], f["Mean"]) and le(f["Mean"], f["Maximum"])
    assert le(f["Minimum"], f["Median"]) and le(f["Median"], f["Maximum"])
    assert f["Variance"] >= 0
    assert f["Range"] >= 0
    assert f["InterquartileRange"] >= -1e-9
    assert 0 <= f["Uniformity"] <= 1 + 1e-12
    assert f["Entropy"] >= -1e-9
    m2 = ((x - x.mean()) ** 2).mean()
    # m2² can underflow to 0 for subnormal spreads, and EXACTLY constant
    # inputs can leave a ~1e-31 mean residue → kernels apply the
    # deterministic flat fixup (Kurtosis 0) instead of inf/nan or FP-noise
    if x.size > 1 and m2 ** 2 > 0 and x.min() != x.max():
        assert f["Kurtosis"] >= 1 - 1e-9  # population kurtosis ≥ 1 always
    elif x.size > 1:
        assert f["Kurtosis"] == 0.0 and f["Skewness"] == 0.0


@given(level_arrays, st.lists(st.booleans(), min_size=1, max_size=200))
@hsettings(max_examples=200, deadline=None)
def test_run_length_conservation(levels, valid):
    n = levels.size
    v = np.array((valid * n)[:n], dtype=bool)
    if not v.any():
        return
    rl, ln = run_lengths(levels, v)
    # conservation: run lengths sum to the number of valid positions
    assert ln.sum() == v.sum()
    assert (ln >= 1).all()
    # number of runs ≤ valid positions
    assert rl.size <= v.sum()


@given(level_arrays)
@hsettings(max_examples=100, deadline=None)
def test_glcm_probability_law(levels):
    if levels.size < 2:
        return
    P, gl, ng = glcm_matrix(levels, distances=(1,), symmetric=True)
    M = P[:, :, 0]
    if np.isnan(M).all():
        return  # no pairs
    assert abs(M.sum() - 1.0) < 1e-9          # normalized
    np.testing.assert_allclose(M, M.T, atol=1e-12)  # symmetric


@given(level_arrays, st.integers(min_value=0, max_value=3))
@hsettings(max_examples=100, deadline=None)
def test_gldm_conservation(levels, alpha):
    P, iv, jv = gldm_matrix(levels, alpha=float(alpha))
    # every valid voxel contributes exactly one count
    assert P.sum() == levels.size
    # dependence bounded by neighborhood size (2 for distance 1)
    assert jv.max() - 1 <= 2


@given(level_arrays)
@hsettings(max_examples=100, deadline=None)
def test_ngtdm_counts_bounded(levels):
    if levels.size < 2:
        return
    n_i, s_i, iv = ngtdm_matrix(levels)
    assert n_i.sum() <= levels.size
    assert (s_i >= 0).all()


# ---- dual-path GLCM invariant: dense and sparse arms agree on ANY corpus

_doc_levels_strategy = st.lists(
    st.lists(st.integers(min_value=1, max_value=9), min_size=0, max_size=25),
    min_size=1, max_size=12)


@given(_doc_levels_strategy)
@hsettings(max_examples=150, deadline=None)
def test_glcm_dense_sparse_arms_agree_property(docs):
    """Hypothesis fuzz of the GLCM dual path: the dense tensor sweeps and
    the sparse cell gathers must agree (1e-9 rel / NaN-for-NaN) on
    arbitrary ragged batches — empty docs, single tokens, flat docs,
    holes in the level set."""
    import numpy as np

    from pyradiomics_spark.kernels import batch as B

    arrays = [np.array(d, dtype=np.int64) for d in docs]
    r = B.Ragged([a.astype(np.float64) for a in arrays])
    levels = (np.concatenate(arrays) if any(a.size for a in arrays)
              else np.empty(0, dtype=np.int64))
    dense = B.glcm_batch(r, levels)
    orig = B._GLCM_DENSE_MAX_SLOTS
    try:
        B._GLCM_DENSE_MAX_SLOTS = 0
        sparse = B.glcm_batch(r, levels)
    finally:
        B._GLCM_DENSE_MAX_SLOTS = orig
    for k in dense:
        dv, sv = np.asarray(dense[k]), np.asarray(sparse[k])
        ok = np.isclose(dv, sv, rtol=1e-9, atol=1e-12) | (
            np.isnan(dv) & np.isnan(sv))
        assert ok.all(), (k, dv, sv)
