"""Phase vocoder: identity, duration scaling, pitch preservation/shift.

North-star audio scope (no reference analog; SURVEY.md §2) — validates
the batched phase-propagation design on the STFT/ISTFT engines.
"""

import numpy as np
import pytest
import scipy.signal as sps

from digital_signal_processsing_tpu.ops.phase_vocoder import (
    pitch_shift,
    time_stretch,
)


def _tone(f, n=1 << 16):
    return np.sin(2 * np.pi * f * np.arange(n)).astype(np.float32)


def _peak_freq(y, nperseg=8192):
    f, p = sps.welch(y[4096:-4096], nperseg=nperseg)
    return f[np.argmax(p)]


def test_rate_one_is_near_identity():
    x = _tone(0.05)
    y = np.asarray(time_stretch(x, 1.0))
    n = min(len(x), len(y))
    core = slice(4096, n - 4096)
    assert np.abs(y[:n][core] - x[:n][core]).max() < 2e-2


@pytest.mark.parametrize("rate,tol", [(0.5, 0.04), (2.0, 0.04)])
def test_duration_scales_pitch_stays(rate, tol):
    x = _tone(0.05)
    y = np.asarray(time_stretch(x, rate))
    assert abs(len(y) * rate / len(x) - 1.0) < tol
    assert abs(_peak_freq(y) - 0.05) < 1e-3


def test_pitch_shift_moves_tone_keeps_duration():
    x = _tone(0.05)
    y = np.asarray(pitch_shift(x, 1.5))
    assert abs(len(y) / len(x) - 1.0) < 0.05
    assert abs(_peak_freq(y) - 0.075) < 1e-3


def test_batched_channels():
    x = np.stack([_tone(0.03, 1 << 14), _tone(0.11, 1 << 14)])
    y = np.asarray(time_stretch(x, 0.5, nfft=1024))
    assert y.shape[0] == 2
    assert abs(_peak_freq(y[0], 4096) - 0.03) < 2e-3
    assert abs(_peak_freq(y[1], 4096) - 0.11) < 2e-3


def test_validation():
    x = _tone(0.05, 1 << 14)
    with pytest.raises(ValueError):
        time_stretch(x, 0.0)
    with pytest.raises(ValueError):
        time_stretch(x[:100], 1.0)
    with pytest.raises(ValueError):
        pitch_shift(x, -1.0)
    with pytest.raises(ValueError):
        time_stretch(x, 1.0, window="hann")


def test_streaming_matches_one_shot_on_padded_stream():
    # streaming stft zero-pads the stream head, so the one-shot equivalent
    # is time_stretch of the zero-prepended input; equivalence is at
    # vocoder tolerance (princarg wrap flips at +-pi cost benign constant
    # phase offsets; the synthesis cumsum re-associates across chunks)
    from digital_signal_processsing_tpu.ops import phase_vocoder as pv

    t = np.arange(1 << 15)
    x = (
        np.sin(2 * np.pi * 0.05 * t) + 0.3 * np.sin(2 * np.pi * 0.13 * t)
    ).astype(np.float32)[None]
    rate, nfft = 0.5, 1024
    ha = max(1, round(nfft // 4 * rate))
    xt = x[:, : x.shape[-1] // ha * ha]
    xpad = np.concatenate(
        [np.zeros((1, nfft - ha), np.float32), xt], axis=-1
    )
    want = np.asarray(pv.time_stretch(xpad, rate, nfft=nfft))
    st = pv.time_stretch_init(rate, nfft=nfft, channels=1)
    chunks = []
    third = (xt.shape[-1] // (3 * ha)) * ha
    pos = 0
    for cl in (third, third, xt.shape[-1] - 2 * third):
        st, y = pv.time_stretch_chunk(st, xt[:, pos : pos + cl], rate=rate, nfft=nfft)
        chunks.append(np.asarray(y))
        pos += cl
    chunks.append(np.asarray(pv.time_stretch_flush(st)))
    got = np.concatenate(chunks, axis=-1)
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 2e-2


def test_streaming_validation():
    from digital_signal_processsing_tpu.ops import phase_vocoder as pv

    with pytest.raises(ValueError):
        pv.time_stretch_init(0.0)
    st = pv.time_stretch_init(1.0, nfft=1024)
    with pytest.raises(ValueError):
        # chunk not a multiple of the analysis hop
        pv.time_stretch_chunk(st, np.zeros((1, 100), np.float32), rate=1.0, nfft=1024)


def test_spectral_subtract_improves_snr():
    from digital_signal_processsing_tpu.ops.phase_vocoder import (
        spectral_subtract,
    )

    rng = np.random.default_rng(0)
    n = 1 << 15
    t = np.arange(n)
    clean = 0.5 * np.sin(2 * np.pi * 0.07 * t).astype(np.float32)
    noise = 0.2 * rng.standard_normal(n).astype(np.float32)
    # noise-only head for the estimate, then tone + noise
    x = np.concatenate([noise[: 8 * 512], (clean + noise)[8 * 512 :]]).astype(
        np.float32
    )
    y = np.asarray(spectral_subtract(x, nfft=1024, noise_frames=8))
    m = min(len(y), n)
    seg = slice(12000, m - 2048)

    def snr(v):
        return 10 * np.log10(
            np.mean(clean[seg] ** 2) / np.mean((v[seg] - clean[seg]) ** 2)
        )

    assert snr(y) > snr(x) + 6.0  # at least 6 dB of noise reduction
    with pytest.raises(ValueError):
        spectral_subtract(x, floor=1.5)
    with pytest.raises(ValueError):
        spectral_subtract(x[:2048], nfft=1024, noise_frames=8)
