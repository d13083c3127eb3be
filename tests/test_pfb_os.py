"""2x-oversampled PFB: brute-force parity, designed-prototype reconstruction."""

import jax.numpy as jnp
import numpy as np

from digital_signal_processsing_tpu.ops.fir import design_lowpass
from digital_signal_processsing_tpu.ops.pfb_os import (
    design_pr_prototype,
    pfb_analyze_os,
    pfb_synthesize_os,
)


def _brute_analyze(x, h, n):
    d = n // 2
    s = x.size // d
    k_len = h.size
    y = np.zeros((n, s), complex)
    for k in range(n):
        for m in range(s):
            acc = 0.0
            for j in range(k_len):
                u = d * m - j
                if u >= 0:
                    acc += h[j] * x[u] * np.exp(-2j * np.pi * k * u / n)
            y[k, m] = acc
    return y


def test_analysis_matches_brute_force(rng):
    n, p = 8, 4
    x = rng.normal(size=(n // 2) * 48).astype(np.float32)
    h = np.asarray(design_lowpass(p * n, 1.0 / n), np.float64)
    yi, yq = pfb_analyze_os(x, n, jnp.asarray(h, jnp.float32))
    want = _brute_analyze(x.astype(np.float64), h, n)
    np.testing.assert_allclose(np.asarray(yi), want.real, atol=1e-5)
    np.testing.assert_allclose(np.asarray(yq), want.imag, atol=1e-5)


def _roundtrip_snr(h, n, rng, blocks=4096):
    d = n // 2
    k = np.asarray(h).size
    x = rng.normal(size=d * blocks).astype(np.float32)
    yi, yq = pfb_analyze_os(x, n, jnp.asarray(h, jnp.float32))
    rec = np.asarray(
        pfb_synthesize_os(yi, yq, n, jnp.asarray(np.asarray(h) * d, jnp.float32))
    )
    a = rec[k:]
    b = x[: a.size]
    g = 2 * k
    err = a[g:-g] - b[g:-g]
    return 10 * np.log10(np.sum(b[g:-g] ** 2) / np.sum(err**2))


def test_designed_prototype_reconstructs_full_band(rng):
    n, p = 8, 8
    h_opt = design_pr_prototype(n, p, steps=600)
    snr = _roundtrip_snr(h_opt, n, rng)
    assert snr > 45, f"designed prototype: {snr:.1f} dB"
    # and it still behaves like a channel filter: stopband below -25 dB
    w = np.fft.rfft(h_opt, 4096)
    f = np.linspace(0, 1, w.size)
    sb = 20 * np.log10(np.max(np.abs(w[f > 2.2 / n])) / np.max(np.abs(w)))
    assert sb < -25, f"stopband peak {sb:.1f} dB"


def test_sinc_prototype_is_aliasing_limited(rng):
    # documents WHY the designer exists: the closed-form lowpass cannot
    # reconstruct a full-band signal through the bank
    n, p = 8, 8
    snr = _roundtrip_snr(design_lowpass(p * n, 1.0 / n), n, rng)
    assert snr < 25


def test_tone_lands_in_its_channel(rng):
    n = 8
    d = n // 2
    h = design_pr_prototype(n, 8, steps=200)
    t = d * 2048
    idx = np.arange(t)
    x = np.cos(2 * np.pi * (3 / n) * idx).astype(np.float32)
    yi, yq = pfb_analyze_os(x, n, jnp.asarray(h))
    power = np.mean(np.asarray(yi) ** 2 + np.asarray(yq) ** 2, axis=1)
    assert np.argmax(power) in (3, n - 3)
