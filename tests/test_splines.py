"""B-spline subsystem parity vs scipy.signal.

Note on tolerances: scipy's own cubic-smoothing implementations disagree
internally — its Python path (cspline1d, _hc/_hs closed-form boundary
sums) and its C path (symiirorder2's truncated ICs) differ by ~2e-3 on a
60x64 image at lamb=3 (measured in this environment). Our implementation
uses the closed-form sums with scipy's truncation horizons, so 1-D
results match scipy at float32-recursion level (~1e-5) and 2-D smoothing
results sit inside scipy's own inter-path band (tolerance 5e-3).
"""

import numpy as np
import pytest
import scipy.signal as sps

from digital_signal_processsing_tpu.ops import splines


@pytest.fixture(scope="module")
def sig():
    return np.random.default_rng(0).standard_normal(200)


@pytest.fixture(scope="module")
def img():
    return np.random.default_rng(1).standard_normal((60, 64))


def test_gauss_spline(sig):
    got = np.asarray(splines.gauss_spline(sig[:50], 3))
    assert np.allclose(got, sps.gauss_spline(sig[:50], 3), atol=1e-6)


def test_interpolating_coefficients(sig):
    assert np.max(np.abs(splines.cspline1d(sig) - sps.cspline1d(sig))) < 1e-5
    assert np.max(np.abs(splines.qspline1d(sig) - sps.qspline1d(sig))) < 1e-5
    short = sig[:5]
    assert np.max(np.abs(splines.cspline1d(short) - sps.cspline1d(short))) < 1e-6
    with pytest.raises(ValueError):
        splines.qspline1d(sig, lamb=1.0)


@pytest.mark.parametrize("lam", [0.1, 2.0, 10.0])
def test_smoothing_coefficients_1d(sig, lam):
    got = splines.cspline1d(sig, lam)
    ref = sps.cspline1d(sig, lamb=lam)
    assert np.max(np.abs(got - ref)) < 1e-5


def test_symiirorder1_matches_scipy(sig):
    got = splines.symiirorder1(sig, 2.0, 0.5)
    assert np.max(np.abs(got - sps.symiirorder1(sig, 2.0, 0.5))) < 1e-5
    xb = np.random.default_rng(2).standard_normal((3, 150))
    got2 = splines.symiirorder1(xb, -1.5, 0.33)
    assert np.max(np.abs(got2 - sps.symiirorder1(xb, -1.5, 0.33))) < 1e-5
    with pytest.raises(ValueError):
        splines.symiirorder1(sig, 1.0, 1.5)
    with pytest.raises(ValueError):
        # too short for the boundary sum to converge (scipy error parity)
        splines.symiirorder1(sig[:10], 2.0, 0.9, precision=1e-12)


def test_symiirorder2_matches_scipy(sig):
    got = splines.symiirorder2(sig, 0.5, 0.3)
    assert np.max(np.abs(got - sps.symiirorder2(sig, 0.5, 0.3))) < 1e-5


def test_spline_evals(sig):
    cj = splines.cspline1d(sig)
    newx = np.linspace(-5, 210, 777)  # crosses both mirror boundaries
    assert np.max(
        np.abs(splines.cspline1d_eval(cj, newx) - sps.cspline1d_eval(cj, newx))
    ) < 1e-10
    qj = splines.qspline1d(sig)
    assert np.max(
        np.abs(splines.qspline1d_eval(qj, newx) - sps.qspline1d_eval(qj, newx))
    ) < 1e-10
    got = splines.cspline1d_eval(cj, newx, dx=0.5, x0=3)
    ref = sps.cspline1d_eval(cj, newx, dx=0.5, x0=3)
    assert np.max(np.abs(got - ref)) < 1e-10
    with pytest.raises(ValueError):
        splines.cspline1d_eval(np.zeros(0), newx)


def test_spline_reconstruction_round_trip(sig):
    # mirror-convolving the coefficients with [1,4,1]/6 recovers the
    # signal (HALF-sample mirror: c[-1] = c[0], matching the filter ICs)
    cj = splines.cspline1d(sig)
    ext = np.r_[cj[0], cj, cj[-1]]
    rec = np.convolve(ext, [1 / 6, 4 / 6, 1 / 6], mode="valid")
    assert np.max(np.abs(rec - sig)) < 1e-4


def test_2d_coefficients(img):
    assert np.max(np.abs(splines.cspline2d(img) - sps.cspline2d(img))) < 1e-5
    assert np.max(np.abs(splines.qspline2d(img) - sps.qspline2d(img))) < 1e-5
    # smoothing case: inside scipy's own inter-path band (see module doc)
    assert np.max(
        np.abs(splines.cspline2d(img, 3.0) - sps.cspline2d(img, 3.0))
    ) < 5e-3
    with pytest.raises(ValueError):
        splines.qspline2d(img, lamb=1.0)


def test_spline_filter(img):
    got = splines.spline_filter(img, 5.0)
    ref = sps.spline_filter(img, 5.0)
    assert np.max(np.abs(got - ref)) < 5e-3
    # it actually smooths: high-frequency energy drops
    def hf(a):
        return float(np.mean(np.diff(a, axis=-1) ** 2))
    assert hf(got) < 0.5 * hf(img)
