"""Wavelet/LoG filter invariants (no pywt in env, so we test mathematical
properties of the published filter banks instead of cross-library parity —
the analog of /root/reference/tests/test_wavelet.py's golden check)."""

import numpy as np
import pytest

from pyradiomics_spark.functions.wavelets import (
    DEC_LO, _dec_hi, swt1, log_filter, log_kernel)
from pyradiomics_spark.functions.intensity import IMAGE_TRANSFORMS


@pytest.mark.parametrize("w", ["haar", "db2", "coif1"])
def test_filterbank_orthogonality(w):
    lo = DEC_LO[w]
    hi = _dec_hi(lo)
    assert lo @ lo == pytest.approx(1.0)          # unit energy
    assert lo.sum() == pytest.approx(np.sqrt(2))  # DC gain √2
    assert hi.sum() == pytest.approx(0.0, abs=1e-12)  # highpass kills DC
    assert lo @ hi == pytest.approx(0.0, abs=1e-12)   # orthogonal pair


@pytest.mark.parametrize("w", ["haar", "db2", "coif1"])
def test_swt_flat_signal(w):
    x = np.full(16, 5.0)
    a, d = swt1(x, w)
    np.testing.assert_allclose(a, np.full(16, 5.0 * np.sqrt(2)), atol=1e-12)
    np.testing.assert_allclose(d, np.zeros(16), atol=1e-12)


@pytest.mark.parametrize("w", ["haar", "db2", "coif1"])
def test_swt_energy_preservation(w, rng):
    x = rng.normal(size=64)
    a, d = swt1(x, w)
    # orthogonal SWT (undecimated): ||a||² + ||d||² == 2·||x||²
    assert (a @ a + d @ d) == pytest.approx(2 * (x @ x))


def test_swt_odd_length_wrap_pad(rng):
    x = rng.normal(size=17)
    a, d = swt1(x, "haar")
    assert a.size == d.size == 17


def test_haar_detail_is_scaled_diff():
    x = np.array([1.0, 3.0, 7.0, 2.0])
    a, d = swt1(x, "haar")
    # haar: d[n] = (x[n] - x[n-1])/√2 up to convention sign/shift
    diffs = np.abs(d) * np.sqrt(2)
    expect = np.abs(x - np.roll(x, 1))
    np.testing.assert_allclose(sorted(diffs), sorted(expect), atol=1e-12)


def test_log_kernel_zero_dc_and_flat():
    k = log_kernel(2.0)
    assert k.sum() == pytest.approx(0.0, abs=1e-12)
    out = log_filter(np.full(50, 7.0), sigma=2.0)
    np.testing.assert_allclose(out, np.zeros(50), atol=1e-10)


def test_log_detects_blob(rng):
    x = np.zeros(100)
    x[45:55] = 1.0  # a blob of width ~ 2*sigma
    out = log_filter(x, sigma=3.0)
    # LoG response: strong extremum at blob center
    assert np.argmax(np.abs(out)) in range(40, 60)


def test_image_transforms_registry_complete():
    from pyradiomics_spark.config import ALL_IMAGE_TYPES
    for it in ALL_IMAGE_TYPES:
        assert it in IMAGE_TRANSFORMS
        out = IMAGE_TRANSFORMS[it](np.array([1.0, 2.0, 3.0, 4.0]))
        assert out.shape == (4,)
        assert np.isfinite(out).all()
