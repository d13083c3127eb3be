"""Mel features: scale math, filterbank oracle, DCT vs scipy, MFCC sanity."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.fft

from digital_signal_processsing_tpu.ops import mel
from digital_signal_processsing_tpu.ops.fft import spectrogram


@pytest.mark.parametrize("htk", [False, True])
def test_mel_hz_roundtrip(htk):
    f = np.linspace(0.0, 22050.0, 257)
    np.testing.assert_allclose(
        mel.mel_to_hz(mel.hz_to_mel(f, htk=htk), htk=htk), f, atol=1e-8
    )


def test_slaney_knee_and_htk_values():
    # Slaney: linear below 1 kHz at 200/3 Hz per mel; 1 kHz = 15 mels.
    np.testing.assert_allclose(mel.hz_to_mel(1000.0), 15.0)
    np.testing.assert_allclose(mel.hz_to_mel(200.0 / 3.0), 1.0)
    # HTK closed form.
    np.testing.assert_allclose(
        mel.hz_to_mel(700.0, htk=True), 2595.0 * np.log10(2.0)
    )


def _fb_oracle(n_mels, nfft, sr, fmin, fmax, htk, norm):
    """Per-element triangle formula, loops and all."""
    edges = mel.mel_frequencies(n_mels + 2, fmin=fmin, fmax=fmax, htk=htk)
    freqs = np.arange(nfft // 2 + 1) * (sr / nfft)
    w = np.zeros((n_mels, freqs.size))
    for m in range(n_mels):
        lo, c, hi = edges[m], edges[m + 1], edges[m + 2]
        for b, f in enumerate(freqs):
            w[m, b] = max(0.0, min((f - lo) / (c - lo), (hi - f) / (hi - c)))
        if norm == "slaney":
            w[m] *= 2.0 / (hi - lo)
    return w


@pytest.mark.parametrize("htk", [False, True])
@pytest.mark.parametrize("norm", ["slaney", None])
def test_filterbank_matches_triangle_oracle(htk, norm):
    fb = mel.mel_filterbank(20, 512, 16000.0, fmin=50.0, htk=htk, norm=norm)
    ref = _fb_oracle(20, 512, 16000.0, 50.0, 8000.0, htk, norm)
    np.testing.assert_allclose(fb, ref, atol=1e-6)


def test_filterbank_partition_of_unity_unnormed():
    fb = mel.mel_filterbank(40, 1024, 16000.0, norm=None)
    freqs = np.arange(513) * (16000.0 / 1024)
    centers = mel.mel_frequencies(42, fmin=0.0, fmax=8000.0)
    interior = (freqs >= centers[1]) & (freqs <= centers[-2])
    np.testing.assert_allclose(fb.sum(axis=0)[interior], 1.0, atol=1e-6)


def test_dct_matrix_matches_scipy_and_is_orthonormal():
    m = mel.dct_matrix(13, 40)
    x = np.random.default_rng(0).standard_normal(40)
    ref = scipy.fft.dct(x, type=2, norm="ortho")[:13]
    np.testing.assert_allclose(m @ x, ref, rtol=1e-5, atol=1e-6)
    sq = mel.dct_matrix(40, 40).astype(np.float64)
    np.testing.assert_allclose(sq @ sq.T, np.eye(40), atol=1e-6)


def test_melspectrogram_wiring_and_tone_localization():
    sr, nfft, hop, n_mels = 16000.0, 512, 128, 32
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    ms = mel.melspectrogram(
        x, sample_rate=sr, nfft=nfft, hop=hop, n_mels=n_mels
    )
    p = np.asarray(spectrogram(x, nfft=nfft, hop=hop))
    fb = mel.mel_filterbank(n_mels, nfft, sr)
    np.testing.assert_allclose(np.asarray(ms), p @ fb.T, rtol=1e-5, atol=1e-7)
    assert ms.shape == (2, (4096 - nfft) // hop + 1, n_mels)
    # A pure tone at filter 10's center lands its energy in mel bin 10.
    centers = mel.mel_frequencies(n_mels + 2, fmax=sr / 2)
    t = np.arange(4096) / sr
    tone = jnp.asarray(np.sin(2 * np.pi * centers[11] * t).astype(np.float32))
    mt = np.asarray(
        mel.melspectrogram(tone, sample_rate=sr, nfft=nfft, hop=hop, n_mels=n_mels)
    )
    assert np.argmax(mt.mean(axis=0)) == 10


def test_mfcc_constant_spectrum_is_c0_only():
    # White constant mel energy -> log-mel constant per frame -> DCT puts
    # everything in coefficient 0.
    sr = 16000.0
    x = jnp.asarray(np.random.default_rng(2).standard_normal(8192).astype(np.float32))
    c = mel.mfcc(x, sample_rate=sr, n_mfcc=8, nfft=512, hop=256, n_mels=24)
    lm = mel.log_melspectrogram(x, sample_rate=sr, nfft=512, hop=256, n_mels=24)
    d = mel.dct_matrix(8, 24)
    np.testing.assert_allclose(
        np.asarray(c), np.asarray(lm) @ d.T, rtol=1e-5, atol=1e-5
    )
    flat = jnp.ones_like(lm)  # constant log-mel
    cf = np.asarray(flat @ jnp.asarray(d).T)
    assert np.abs(cf[..., 1:]).max() < 1e-6


def test_mfcc_lifter_scaling():
    sr = 16000.0
    x = jnp.asarray(np.random.default_rng(3).standard_normal(4096).astype(np.float32))
    base = np.asarray(mel.mfcc(x, sample_rate=sr, n_mfcc=13, nfft=512, n_mels=26))
    lift = np.asarray(
        mel.mfcc(x, sample_rate=sr, n_mfcc=13, nfft=512, n_mels=26, lifter=22.0)
    )
    k = np.arange(13)
    expect = 1.0 + 11.0 * np.sin(np.pi * (k + 1) / 22.0)
    np.testing.assert_allclose(lift, base * expect, rtol=1e-4, atol=1e-5)


def test_delta_linear_ramp_interior_slope():
    frames = np.arange(20.0, dtype=np.float32)[:, None] * np.ones((1, 4), np.float32)
    d = np.asarray(mel.delta(jnp.asarray(frames), width=9))
    np.testing.assert_allclose(d[4:-4], 1.0, atol=1e-6)
    # Batched leading axis and odd-width validation.
    d2 = np.asarray(mel.delta(jnp.asarray(frames[None]), width=5))
    np.testing.assert_allclose(d2[0, 2:-2], 1.0, atol=1e-6)
    with pytest.raises(ValueError):
        mel.delta(jnp.asarray(frames), width=4)


def test_mfcc_chunk_matches_primed_one_shot():
    sr, nfft, hop, n_mels, n_mfcc = 16000.0, 512, 128, 24, 10
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    state = mel.mfcc_init(nfft, hop, channels=2)
    outs = []
    kw = dict(
        sample_rate=sr, n_mfcc=n_mfcc, nfft=nfft, hop=hop, n_mels=n_mels,
        lifter=22.0,
    )
    for lo, hi in [(0, 1024), (1024, 1152), (1152, 4096)]:
        state, c = mel.mfcc_chunk(state, jnp.asarray(x[:, lo:hi]), **kw)
        outs.append(np.asarray(c))
    streamed = np.concatenate(outs, axis=1)
    primed = np.concatenate([np.zeros((2, nfft - hop), np.float32), x], axis=-1)
    ref = np.asarray(mel.mfcc(jnp.asarray(primed), window="hann", **kw))
    np.testing.assert_allclose(streamed, ref, rtol=1e-4, atol=1e-4)


def test_stream_mfcc_over_multiple_wavs(tmp_path):
    from digital_signal_processsing_tpu.io.wav import write_wav
    from digital_signal_processsing_tpu.serve import stream_mfcc

    sr, nfft, hop = 8000, 256, 64
    rng = np.random.default_rng(6)
    parts = [
        (rng.standard_normal(2 * n) * 9000).astype(np.int16)
        for n in (1000, 700)  # neither a hop multiple: crosses boundaries
    ]
    paths = []
    for j, p in enumerate(parts):
        path = tmp_path / f"part{j}.wav"
        write_wav(path, p, sr, 2)
        paths.append(path)
    out = stream_mfcc(
        paths, tmp_path / "feats.npy", n_mfcc=8, nfft=nfft, hop=hop,
        n_mels=20, chunk_samples=512,
    )
    full = np.concatenate(
        [p.reshape(-1, 2).T.astype(np.float32) / 32768.0 for p in parts],
        axis=-1,
    )
    pad = (-full.shape[-1]) % hop
    primed = np.concatenate(
        [
            np.zeros((2, nfft - hop), np.float32),
            full,
            np.zeros((2, pad), np.float32),
        ],
        axis=-1,
    )
    ref = np.asarray(
        mel.mfcc(
            jnp.asarray(primed), sample_rate=float(sr), n_mfcc=8, nfft=nfft,
            hop=hop, n_mels=20, window="hann",
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    saved = np.load(tmp_path / "feats.npy")
    np.testing.assert_array_equal(saved, out)


def test_validation_errors():
    with pytest.raises(ValueError):
        mel.mel_filterbank(0, 512, 16000.0)
    with pytest.raises(ValueError):
        mel.mel_filterbank(10, 512, 16000.0, fmin=9000.0)
    with pytest.raises(ValueError):
        mel.mel_filterbank(10, 512, 16000.0, norm="area")
    with pytest.raises(ValueError):
        mel.mfcc(
            jnp.zeros(2048), sample_rate=16000.0, n_mfcc=99, nfft=512, n_mels=24
        )
