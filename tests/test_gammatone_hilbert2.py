"""Gammatone auditory filter and 2-D analytic signal — scipy parity."""

import numpy as np
import pytest
import scipy.signal as sps

from digital_signal_processsing_tpu.ops import fft, iir_design


@pytest.mark.parametrize(
    "fs,f0",
    [(16000, 440.0), (16000, 3000.0), (8000, 100.0), (2.0, 0.44), (1000, 180.0)],
)
def test_gammatone_matches_scipy(fs, f0):
    br, ar = sps.gammatone(f0, "iir", fs=fs)
    bg, ag = iir_design.gammatone(f0, "iir", fs=fs)
    assert np.allclose(ag, ar, rtol=1e-9)
    assert np.allclose(bg, br, rtol=1e-4)
    brf, _ = sps.gammatone(f0, "fir", fs=fs)
    bgf, agf = iir_design.gammatone(f0, "fir", fs=fs)
    assert bgf.shape == brf.shape
    assert np.allclose(bgf, brf, rtol=1e-9, atol=1e-12)
    assert np.array_equal(agf, [1.0])


def test_gammatone_validates():
    with pytest.raises(ValueError):
        iir_design.gammatone(9000.0, "iir", fs=16000)  # above Nyquist
    with pytest.raises(ValueError):
        iir_design.gammatone(440.0, "butter", fs=16000)
    with pytest.raises(ValueError):
        iir_design.gammatone(440.0, "iir", order=4, fs=16000)


def test_gammatone_iir_is_unit_gain_bandpass():
    b, a = iir_design.gammatone(440.0, "iir", fs=16000)
    w, h = sps.freqz(b, a, worN=[2 * np.pi * 440.0 / 16000])
    assert abs(abs(h[0]) - 1.0) < 1e-3
    w, hoff = sps.freqz(b, a, worN=[2 * np.pi * 4000.0 / 16000])
    assert abs(hoff[0]) < 0.05


@pytest.mark.parametrize(
    "shape", [(16, 20), (15, 21), (16, 21), (15, 20)]
)
def test_hilbert2_matches_scipy(shape):
    x = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
    got = np.asarray(fft.hilbert2(x))
    ref = sps.hilbert2(x)
    assert np.max(np.abs(got - ref)) < 1e-4


def test_hilbert2_batched_and_validates():
    x = np.random.default_rng(1).standard_normal((2, 3, 8, 10)).astype(
        np.float32
    )
    got = np.asarray(fft.hilbert2(x))
    assert got.shape == x.shape
    assert np.max(np.abs(got[1, 2] - sps.hilbert2(x[1, 2]))) < 1e-4
    with pytest.raises(ValueError):
        fft.hilbert2(np.zeros(5))
