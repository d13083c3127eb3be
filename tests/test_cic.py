"""CIC filters: integrator-comb oracle parity, response math, compensator."""

import jax.numpy as jnp
import numpy as np
import pytest

from digital_signal_processsing_tpu.ops import cic


def _ref_cic_decimate(x, rate, n_stages, diff_delay):
    """Textbook Hogenauer cascade in exact int64 arithmetic."""
    acc = x.astype(np.int64)
    for _ in range(n_stages):
        acc = np.cumsum(acc)
    d = acc[::rate]
    for _ in range(n_stages):
        d = d - np.concatenate([np.zeros(diff_delay, np.int64), d[:-diff_delay]])
    return d


def _ref_cic_interpolate(x, rate, n_stages, diff_delay):
    up = np.zeros(x.size * rate, np.float64)
    up[::rate] = x
    h = cic.cic_taps(rate, n_stages, diff_delay).astype(np.float64)
    return np.convolve(up, h)[: x.size * rate]


def test_taps_are_boxcar_power_and_sum_to_gain():
    h = cic.cic_taps(4, n_stages=1, diff_delay=1)
    np.testing.assert_array_equal(h, np.ones(4, np.int64))
    h2 = cic.cic_taps(3, n_stages=2, diff_delay=2)
    assert h2.size == 2 * (6 - 1) + 1
    assert h2.sum() == cic.cic_gain(3, 2, 2) == 36
    # Triangle shape for N=2.
    np.testing.assert_array_equal(h2[:6], np.arange(1, 7))


@pytest.mark.parametrize(
    "rate,n_stages,diff_delay", [(8, 3, 1), (4, 4, 2), (16, 2, 1), (5, 1, 1)]
)
def test_decimate_matches_integrator_comb_oracle(rate, n_stages, diff_delay):
    rng = np.random.default_rng(0)
    x = rng.integers(-8, 8, 1000).astype(np.float32)
    ref = _ref_cic_decimate(x, rate, n_stages, diff_delay)
    got = np.asarray(
        cic.cic_decimate(
            jnp.asarray(x), rate, n_stages=n_stages, diff_delay=diff_delay,
            normalize=False,
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref.astype(np.float64), rtol=1e-5, atol=1e-3)


def test_decimate_normalized_dc():
    x = jnp.ones(512, jnp.float32)
    y = np.asarray(cic.cic_decimate(x, 8, n_stages=4))
    # After the filter ramp (len(h) high-rate samples), DC passes at 1.
    np.testing.assert_allclose(y[8:], 1.0, atol=1e-5)


@pytest.mark.parametrize("rate,n_stages,diff_delay", [(4, 3, 1), (8, 2, 2)])
def test_interpolate_matches_zero_stuff_oracle(rate, n_stages, diff_delay):
    rng = np.random.default_rng(1)
    x = rng.standard_normal(300).astype(np.float32)
    ref = _ref_cic_interpolate(x, rate, n_stages, diff_delay)
    got = np.asarray(
        cic.cic_interpolate(
            jnp.asarray(x), rate, n_stages=n_stages, diff_delay=diff_delay,
            normalize=False,
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_interpolate_normalized_dc_and_batch():
    x = jnp.ones((3, 200), jnp.float32)
    y = np.asarray(cic.cic_interpolate(x, 4, n_stages=3))
    assert y.shape == (3, 800)
    np.testing.assert_allclose(y[:, 50:], 1.0, atol=1e-5)


def test_response_matches_taps_dft():
    rate, n, m = 8, 4, 1
    h = cic.cic_taps(rate, n, m).astype(np.float64) / cic.cic_gain(rate, n, m)
    nfft = 4096
    mag = np.abs(np.fft.rfft(h, nfft))
    f = np.arange(nfft // 2 + 1) / nfft
    np.testing.assert_allclose(mag, cic.cic_response(f, rate, n, m), atol=1e-9)
    # First null at f = 1/(R*M).
    assert cic.cic_response(1.0 / (rate * m), rate, n, m) < 1e-12


def test_alias_null_rejection_and_passband_survival():
    rate, n = 8, 4
    t = np.arange(4096)
    keep = np.cos(2 * np.pi * 0.004 * t).astype(np.float32)  # in passband
    kill = np.cos(2 * np.pi * (1.0 / rate) * t).astype(np.float32)  # at null
    yk = np.asarray(cic.cic_decimate(jnp.asarray(keep), rate, n_stages=n))
    yx = np.asarray(cic.cic_decimate(jnp.asarray(kill), rate, n_stages=n))
    assert np.abs(yk[64:]).max() > 0.8
    assert np.abs(yx[64:]).max() < 1e-3


def test_compensator_flattens_droop():
    rate, n = 16, 4
    comp = cic.design_cic_compensator(
        64, rate, n_stages=n, passband=0.5, transition=0.2
    )
    x = np.linspace(0.0, 0.45, 200)
    droop = cic.cic_response(x / (2.0 * rate), rate, n)
    w = np.pi * x
    hcomp = np.abs(
        np.exp(-1j * np.outer(w, np.arange(comp.size))) @ comp.astype(np.float64)
    )
    total = droop * hcomp
    assert np.abs(total - 1.0).max() < 0.03, np.abs(total - 1.0).max()


def test_validation():
    with pytest.raises(ValueError):
        cic.cic_taps(1)
    with pytest.raises(ValueError):
        cic.cic_decimate(jnp.ones(16), 4, n_stages=0)
    with pytest.raises(ValueError):
        cic.design_cic_compensator(32, 8, passband=1.5)
    with pytest.raises(ValueError):
        cic.design_cic_compensator(32, 8, passband=0.5, transition=0.6)
