"""Signal generators: spectral placement and phase accuracy."""

import numpy as np

from digital_signal_processsing_tpu.ops.fft import tone_power, welch
from digital_signal_processsing_tpu.ops.signal import chirp, tone, white_noise


def test_tone_exact_at_offset():
    t0 = 123_456_789
    x = np.asarray(tone(0.1234, 10_000, t0=t0))
    n = t0 + np.arange(10_000, dtype=np.float64)
    want = np.sin(2 * np.pi * ((np.float64(np.float32(0.1234)) * n) % 1.0))
    np.testing.assert_allclose(x, want, atol=2e-5)


def test_tone_power_roundtrip():
    x = np.asarray(tone(0.2, 65536, amplitude=0.7))
    p = float(np.asarray(tone_power(x, np.array([0.2], np.float32)))[0])
    assert abs(p - 0.7**2 / 2) < 1e-3


def test_chirp_sweeps_band():
    t = 1 << 16
    x = np.asarray(chirp(0.05, 0.2, t))
    psd = np.asarray(welch(x, nfft=512))
    f = np.arange(psd.size) / 512
    in_band = psd[(f >= 0.05) & (f <= 0.2)].mean()
    out_band = psd[(f > 0.3)].mean()
    assert in_band > 100 * out_band


def test_white_noise_stats():
    x = np.asarray(white_noise(100_000, amplitude=2.0, seed=1))
    assert abs(float(x.mean())) < 0.05
    assert abs(float(x.std()) - 2.0) < 0.05
