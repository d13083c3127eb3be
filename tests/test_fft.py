"""FFT stage: wrapper parity with NumPy, STFT framing, periodogram peaks."""

import numpy as np
import pytest

from digital_signal_processsing_tpu.ops.fft import (
    fft,
    ifft,
    irfft,
    power_spectrum,
    rfft,
    stft,
)


def test_fft_matches_numpy(rng):
    x = rng.normal(size=(4, 1024)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(fft(x)), np.fft.fft(x), rtol=1e-4, atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(rfft(x)), np.fft.rfft(x), rtol=1e-4, atol=1e-2
    )


def test_fft_roundtrip(rng):
    x = rng.normal(size=512).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(irfft(rfft(x), 512)), x, rtol=1e-5, atol=1e-5
    )
    z = np.asarray(ifft(fft(x)))
    np.testing.assert_allclose(z.real, x, rtol=1e-5, atol=1e-5)


def test_stft_shapes_and_content(rng):
    t = np.arange(8192)
    x = np.sin(2 * np.pi * 0.05 * t).astype(np.float32)
    s = np.asarray(stft(x, nfft=512, hop=128))
    assert s.shape == ((8192 - 512) // 128 + 1, 257)
    # tone at 0.05 cyc/sample -> bin 0.05*512 = 25.6
    peak = np.argmax(np.abs(s).mean(axis=0))
    assert peak in (25, 26)
    # multichannel keeps the channel axis
    s2 = np.asarray(stft(np.stack([x, x]), nfft=512, hop=128))
    assert s2.shape == (2, (8192 - 512) // 128 + 1, 257)


def test_stft_framing_matches_direct(rng):
    # the gather-free framing must produce exactly x[i*hop : i*hop+nfft]
    x = rng.normal(size=4000).astype(np.float32)
    s = np.asarray(stft(x, nfft=256, hop=100, window="rect"))
    for i in (0, 7, 37):
        want = np.fft.rfft(x[i * 100 : i * 100 + 256])
        np.testing.assert_allclose(s[i], want, rtol=1e-4, atol=1e-2)


def test_power_spectrum_peak(rng):
    t = np.arange(1 << 14)
    x = (np.sin(2 * np.pi * 0.1 * t) + 0.01 * rng.normal(size=t.size)).astype(
        np.float32
    )
    p = np.asarray(power_spectrum(x, nfft=1024))
    assert abs(int(np.argmax(p[1:])) + 1 - round(0.1 * 1024)) <= 1


def test_stft_rejects_unknown_window(rng):
    with pytest.raises(ValueError):
        stft(rng.normal(size=1024).astype(np.float32), window="kaiser")
