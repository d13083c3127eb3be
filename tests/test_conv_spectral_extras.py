"""Round-3 analysis-surface extras: convolve family, upfirdn, CZT/zoom-FFT,
kaiserord/minimum_phase, peak_widths — scipy parity + engine dispatch.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal as sps

from digital_signal_processsing_tpu.ops.correlate import (
    convolve,
    fftconvolve,
    oaconvolve,
)
from digital_signal_processsing_tpu.ops.fft import czt, zoomfft
from digital_signal_processsing_tpu.ops.fir import kaiserord, minimum_phase
from digital_signal_processsing_tpu.ops.peaks import find_peaks, peak_widths
from digital_signal_processsing_tpu.ops.resample import upfirdn

RNG = np.random.default_rng(42)


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
@pytest.mark.parametrize("fn", [fftconvolve, oaconvolve, convolve])
def test_convolve_family_matches_scipy(mode, fn):
    x = RNG.normal(0, 1, (3, 2048)).astype(np.float32)
    h = RNG.normal(0, 1, 65).astype(np.float32)
    got = np.asarray(fn(jnp.asarray(x), jnp.asarray(h), mode))
    want = sps.fftconvolve(
        x.astype(np.float64), h[None, :].astype(np.float64), mode=mode, axes=-1
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_oaconvolve_long_kernel_fallback():
    x = RNG.normal(0, 1, 4096).astype(np.float32)
    h = RNG.normal(0, 1, 3000).astype(np.float32)
    got = np.asarray(oaconvolve(jnp.asarray(x), jnp.asarray(h), "same"))
    want = sps.fftconvolve(x.astype(np.float64), h.astype(np.float64), "same")
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_convolve_valid_rejects_short_stream():
    with pytest.raises(ValueError):
        fftconvolve(jnp.ones(8), jnp.ones(16), "valid")


@pytest.mark.parametrize(
    "t,k,up,down",
    [(100, 7, 3, 2), (1000, 31, 1, 4), (257, 16, 5, 3), (64, 9, 1, 1), (500, 21, 4, 1)],
)
def test_upfirdn_matches_scipy(t, k, up, down):
    x = RNG.normal(0, 1, t).astype(np.float32)
    h = RNG.normal(0, 1, k).astype(np.float32)
    got = np.asarray(upfirdn(h, jnp.asarray(x), up, down))
    want = sps.upfirdn(h.astype(np.float64), x.astype(np.float64), up, down)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_upfirdn_batched_and_rejections():
    x = RNG.normal(0, 1, (4, 200)).astype(np.float32)
    h = RNG.normal(0, 1, 11).astype(np.float32)
    got = np.asarray(upfirdn(h, jnp.asarray(x), 2, 3))
    want = np.stack(
        [sps.upfirdn(h.astype(np.float64), r.astype(np.float64), 2, 3) for r in x]
    )
    np.testing.assert_allclose(got, want, atol=1e-4)
    with pytest.raises(ValueError):
        upfirdn(h, jnp.asarray(x), 0, 1)
    with pytest.raises(ValueError):
        upfirdn(np.ones((2, 2)), jnp.asarray(x), 1, 1)


class TestCzt:
    def test_default_is_dft(self):
        x = RNG.normal(0, 1, 1024).astype(np.float32)
        got = np.asarray(czt(jnp.asarray(x)))
        want = np.fft.fft(x.astype(np.float64))
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-5

    def test_zoomfft_matches_scipy(self):
        x = RNG.normal(0, 1, 1024).astype(np.float32)
        got = np.asarray(zoomfft(jnp.asarray(x), [0.1, 0.3], 256))
        want = sps.zoom_fft(x.astype(np.float64), [0.1, 0.3], 256)
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-5

    def test_complex_input(self):
        xc = (RNG.normal(size=512) + 1j * RNG.normal(size=512)).astype(np.complex64)
        got = np.asarray(czt(jnp.asarray(xc), 128))
        want = sps.czt(xc.astype(np.complex128), 128)
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-5

    def test_off_circle_spiral_vs_definition(self):
        # direct-summation oracle: scipy's Bluestein loses ~3e-3 relative
        # accuracy off the unit circle, the dense-matmul spelling doesn't
        x = RNG.normal(0, 1, 256)
        m, w, a = 64, 0.999 * np.exp(-2j * np.pi / 100), 1.001 * np.exp(0.3j)
        n = np.arange(256)[:, None]
        M = (a ** (-n)) * (w ** (n * np.arange(m)[None, :]))
        want = x @ M
        got = np.asarray(czt(jnp.asarray(x.astype(np.float32)), m, w, a))
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-4

    def test_bluestein_path_beyond_matmul_cap(self):
        x = RNG.normal(0, 1, 1 << 13).astype(np.float32)
        got = np.asarray(czt(jnp.asarray(x), 1 << 11))
        want = sps.czt(x.astype(np.float64), 1 << 11)
        assert got.shape == want.shape
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-5

    def test_batched(self):
        xb = RNG.normal(0, 1, (4, 512)).astype(np.float32)
        got = np.asarray(czt(jnp.asarray(xb), 128))
        want = np.stack([sps.czt(r.astype(np.float64), 128) for r in xb])
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-5

    def test_zoomfft_rejections(self):
        with pytest.raises(ValueError):
            zoomfft(jnp.ones(64), [0.5, 0.2], 16)
        with pytest.raises(ValueError):
            czt(jnp.ones(64), 0)


@pytest.mark.parametrize("ripple,width", [(60.0, 0.1), (40.0, 0.05), (21.5, 0.2)])
def test_kaiserord_matches_scipy(ripple, width):
    assert kaiserord(ripple, width) == sps.kaiserord(ripple, width)


def test_kaiserord_rejections():
    with pytest.raises(ValueError):
        kaiserord(5.0, 0.1)
    with pytest.raises(ValueError):
        kaiserord(60.0, 1.5)


@pytest.mark.parametrize(
    "taps",
    [
        sps.firwin(151, 0.3),
        sps.firwin(100, [0.2, 0.5], pass_zero=False),
        sps.remez(101, [0, 0.2, 0.3, 1], [1, 0], fs=2),
    ],
    ids=["lp151", "bp100", "remez101"],
)
def test_minimum_phase_matches_scipy(taps):
    got = minimum_phase(taps)
    want = sps.minimum_phase(taps, method="homomorphic")
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_minimum_phase_magnitude_preserved():
    # |H_min(w)|^2 ~ |H(w)| on a fine grid (half-length sqrt factor)
    h = sps.firwin(101, 0.4)
    hm = minimum_phase(h)
    w, H = sps.freqz(h, worN=512)
    _, Hm = sps.freqz(hm, worN=512)
    # 6.5e-3 band-edge deviation is inherent to the homomorphic
    # factorization (scipy's own output shows the identical error)
    np.testing.assert_allclose(np.abs(Hm) ** 2, np.abs(H), atol=2e-2)


def test_peak_widths_matches_scipy():
    x = np.convolve(RNG.normal(0, 1, 4000), np.ones(20) / 20, "same")
    pk, _ = find_peaks(x, prominence=0.1)
    assert len(pk) > 50
    for rh in (0.5, 0.75, 1.0):
        got = peak_widths(x, pk, rel_height=rh)
        want = sps.peak_widths(x, pk, rel_height=rh)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-9)


def test_peak_widths_rejections():
    with pytest.raises(ValueError):
        peak_widths(np.ones(16), np.array([5]), rel_height=-0.1)
