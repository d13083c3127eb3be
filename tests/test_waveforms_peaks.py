"""scipy parity: waveform generators, FFT-domain resample, peak finding."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal as sps

from digital_signal_processsing_tpu.ops.peaks import (
    find_peaks,
    peak_mask,
    peak_prominences,
)
from digital_signal_processsing_tpu.ops.resample import resample_fft
from digital_signal_processsing_tpu.ops.signal import gausspulse, sawtooth, square


def _away_from_edges(frac, margin=1e-3):
    """Mask of samples whose cycle phase is away from every discontinuity
    (float phase rounding legitimately flips the side a tie lands on)."""
    return (np.abs(frac - np.round(frac)) > margin)


@pytest.mark.parametrize("duty", [0.25, 0.5, 0.8])
def test_square_matches_scipy_away_from_edges(duty):
    f, t = 0.013, 3000
    n = np.arange(t)
    got = np.asarray(square(f, t, duty=duty))
    want = sps.square(2 * np.pi * f * n, duty=duty)
    ok = _away_from_edges(f * n) & _away_from_edges(f * n - duty)
    np.testing.assert_array_equal(got[ok], want[ok])
    assert (got[~ok] != want[~ok]).sum() <= 8  # ties only


@pytest.mark.parametrize("width", [0.5, 1.0, 0.0])
def test_sawtooth_matches_scipy(width):
    f, t = 0.0137, 3000
    n = np.arange(t)
    got = np.asarray(sawtooth(f, t, width=width))
    want = sps.sawtooth(2 * np.pi * f * n, width=width)
    ok = _away_from_edges(f * n) & _away_from_edges(f * n - width)
    np.testing.assert_allclose(got[ok], want[ok], atol=1e-4)


def test_gausspulse_matches_scipy():
    t = np.linspace(-0.01, 0.01, 1001).astype(np.float32)
    got = np.asarray(gausspulse(jnp.asarray(t), fc=1000.0, bw=0.5))
    want = sps.gausspulse(t.astype(np.float64), fc=1000, bw=0.5)
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize(
    "t,num", [(1000, 1500), (1000, 640), (1024, 2048), (999, 1501), (1000, 501)]
)
def test_resample_fft_matches_scipy(rng, t, num):
    x = rng.normal(size=t).astype(np.float32)
    got = np.asarray(resample_fft(x, num))
    want = sps.resample(x.astype(np.float64), num)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resample_fft_planar(rng):
    x = rng.normal(size=(3, 1000)).astype(np.float32)
    got = np.asarray(resample_fft(x, 750))
    want = sps.resample(x.astype(np.float64), 750, axis=-1)
    assert got.shape == (3, 750)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resample_fft_preserves_bandlimited_tone():
    n = np.arange(1024, dtype=np.float64)
    x = np.sin(2 * np.pi * 8 * n / 1024).astype(np.float32)
    y = np.asarray(resample_fft(x, 2048))
    m = np.arange(2048, dtype=np.float64)
    np.testing.assert_allclose(y, np.sin(2 * np.pi * 8 * m / 2048), atol=1e-4)


def test_find_peaks_matches_scipy(rng):
    x = rng.normal(size=2000)
    for kwargs in [
        {},
        {"height": 0.5},
        {"threshold": 0.1},
        {"distance": 10},
        {"prominence": 1.0},
        {"height": 0.0, "distance": 25, "prominence": 0.5},
    ]:
        got, gp = find_peaks(x, **kwargs)
        want, wp = sps.find_peaks(x, **kwargs)
        np.testing.assert_array_equal(got, want)
        for k in wp:
            np.testing.assert_allclose(gp[k], wp[k])


def test_find_peaks_plateau_midpoint():
    y = np.zeros(50)
    y[10:13] = 1.0
    y[30] = 2.0
    got, _ = find_peaks(y)
    want, _ = sps.find_peaks(y)
    np.testing.assert_array_equal(got, want)


def test_peak_prominences_matches_scipy(rng):
    x = rng.normal(size=500)
    peaks, _ = sps.find_peaks(x)
    got, glb, grb = peak_prominences(x, peaks)
    want, wlb, wrb = sps.peak_prominences(x, peaks)
    np.testing.assert_allclose(got, want)
    np.testing.assert_array_equal(glb, wlb)
    np.testing.assert_array_equal(grb, wrb)


def test_peak_mask_is_strict_maxima(rng):
    x = rng.normal(size=(2, 300)).astype(np.float32)
    m = np.asarray(peak_mask(x))
    want = np.zeros_like(m)
    want[:, 1:-1] = (x[:, 1:-1] > x[:, :-2]) & (x[:, 1:-1] > x[:, 2:])
    np.testing.assert_array_equal(m, want)
    mh = np.asarray(peak_mask(x, height=0.5))
    np.testing.assert_array_equal(mh, want & (x >= 0.5))
