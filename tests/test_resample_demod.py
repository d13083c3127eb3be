"""Polyphase resampling and demodulation: DSP-level correctness."""

import numpy as np
import pytest

from digital_signal_processsing_tpu.ops.demod import (
    am_demodulate,
    fm_demodulate,
    fm_modulate,
    frequency_translate,
)
from digital_signal_processsing_tpu.ops.fir import design_lowpass
from digital_signal_processsing_tpu.ops.resample import (
    decimate,
    interpolate,
    resample_poly,
)


def np_causal_fir(x, h):
    return np.convolve(x.astype(np.float64), h.astype(np.float64))[: x.shape[0]]


@pytest.mark.parametrize("q", [2, 4, 8])
def test_decimate_equals_filter_then_downsample(rng, q):
    x = rng.normal(size=4096).astype(np.float32)
    taps = design_lowpass(8 * q, 0.8 / q)
    got = np.asarray(decimate(x, q, taps=taps))
    want = np_causal_fir(x, taps)[::q]
    np.testing.assert_allclose(got, want[: got.shape[0]], rtol=1e-3, atol=1e-5)


def test_decimate_preserves_low_tone(rng):
    # a tone far below the new Nyquist must survive decimation
    t = np.arange(8192)
    x = np.sin(2 * np.pi * 0.01 * t).astype(np.float32)
    y = np.asarray(decimate(x, 4))
    ty = np.arange(y.shape[0])
    # correlate against the expected decimated tone (ignore filter delay)
    spec = np.abs(np.fft.rfft(y[100:]))
    peak = np.argmax(spec)
    expected_bin = round(0.04 * (y.shape[0] - 100) / 2 * 2)  # 0.04 cyc/sample
    assert abs(peak - 0.04 * (y.shape[0] - 100)) < 3


@pytest.mark.parametrize("p", [2, 3])
def test_interpolate_zero_stuff_equivalence(rng, p):
    x = rng.normal(size=1024).astype(np.float32)
    taps = design_lowpass(8 * p, 0.8 / p) * p
    got = np.asarray(interpolate(x, p, taps=taps))
    stuffed = np.zeros(1024 * p, np.float32)
    stuffed[::p] = x
    want = np_causal_fir(stuffed, taps)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_resample_poly_rate(rng):
    x = rng.normal(size=3000).astype(np.float32)
    y = np.asarray(resample_poly(x, 3, 2))
    assert y.shape[0] == 4500


def test_fm_loopback(rng):
    msg = np.sin(2 * np.pi * 0.003 * np.arange(20000)).astype(np.float32)
    iq = np.asarray(fm_modulate(msg, deviation=0.4))
    rec = np.asarray(fm_demodulate(iq, gain=1.0 / 0.4))
    # skip the first sample (no previous); recovery should be tight
    np.testing.assert_allclose(rec[1:], msg[1:], atol=1e-3)


def test_fm_demod_multichannel_shape(rng):
    iq = (rng.normal(size=(3, 500)) + 1j * rng.normal(size=(3, 500))).astype(
        np.complex64
    )
    out = np.asarray(fm_demodulate(iq))
    assert out.shape == (3, 500)
    assert out.dtype == np.float32


def test_am_envelope(rng):
    t = np.arange(30000)
    msg = 0.5 * np.sin(2 * np.pi * 0.001 * t)
    carrier = (1.0 + msg) * np.exp(2j * np.pi * 0.1 * t)
    rec = np.asarray(am_demodulate(carrier.astype(np.complex64)))
    np.testing.assert_allclose(rec, msg - msg.mean(), atol=5e-3)


def test_frequency_translate_moves_tone():
    t = np.arange(4096)
    x = np.exp(2j * np.pi * 0.2 * t).astype(np.complex64)
    y = np.asarray(frequency_translate(x, 0.2))
    # after mixing down by its own frequency the tone is DC
    assert np.abs(np.mean(y)) > 0.99


def test_decimate_validation(rng):
    with pytest.raises(ValueError):
        decimate(rng.normal(size=100).astype(np.float32), 0)


def test_oscillator_bank_exact_phase():
    # the factored oscillator must stay phase-accurate at offsets where the
    # naive f32 product f*(t0+n) has lost the mantissa entirely
    from digital_signal_processsing_tpu.ops.demod import oscillator_bank

    for f, t, t0 in [(0.373, 200_000, 0), (-0.4, 100_000, 7), (0.05, 4096, 123_456_789)]:
        c, s = oscillator_bank(np.array([f], np.float32), t, t0)
        n = t0 + np.arange(t, dtype=np.float64)
        th = -2 * np.pi * ((np.float64(np.float32(f)) * n) % 1.0)
        np.testing.assert_allclose(np.asarray(c[0]), np.cos(th), atol=2e-5)
        np.testing.assert_allclose(np.asarray(s[0]), np.sin(th), atol=2e-5)


def test_frequency_translate_rejects_freq_bank_on_1d():
    import jax.numpy as jnp

    from digital_signal_processsing_tpu.ops.demod import frequency_translate

    with pytest.raises(ValueError, match="one frequency"):
        frequency_translate(jnp.ones(16), jnp.array([0.1, 0.2]))


def test_oscillator_bank_huge_t0_no_int32_wrap():
    from digital_signal_processsing_tpu.ops.demod import oscillator_bank

    t0 = 2_147_000_000  # t0 + t would wrap int32 if added into the iota
    c, s = oscillator_bank(np.array([0.373], np.float32), 4096, t0)
    n = t0 + np.arange(4096, dtype=np.float64)
    th = -2 * np.pi * ((np.float64(np.float32(0.373)) * n) % 1.0)
    np.testing.assert_allclose(np.asarray(c[0]), np.cos(th), atol=2e-5)


def test_resample_poly_applies_one_filter(rng):
    # user taps must be applied ONCE (gain-compensated), never per stage —
    # equivalent to causal interpolate with taps*up then plain subsampling
    from digital_signal_processsing_tpu.ops.fir import design_lowpass
    from digital_signal_processsing_tpu.ops.resample import interpolate

    x = rng.normal(size=3000).astype(np.float32)
    up, down = 3, 2
    h = design_lowpass(49, 0.8 / 3)
    got = np.asarray(resample_poly(x, up, down, taps=h))
    want = np.asarray(interpolate(x, up, taps=h * up))[::down]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_resample_poly_tone_gain(rng):
    # a passband tone survives a 3/2 rate change at ~unity amplitude
    t = np.arange(12000)
    x = np.sin(2 * np.pi * 0.02 * t).astype(np.float32)
    y = np.asarray(resample_poly(x, 3, 2))
    assert y.shape[0] == 18000
    amp = np.abs(y[2000:-2000]).max()
    assert 0.95 < amp < 1.05
