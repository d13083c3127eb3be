"""Tone purity metrics: analytic THD/SNR/ENOB cases, folding, spurs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from digital_signal_processsing_tpu.ops import metrics

N = 8192
T = np.arange(N)


def _tone(k, amp=1.0, phase=0.3):
    return amp * np.sin(2 * np.pi * k * T / N + phase)


def test_f0_and_clean_tone():
    m = metrics.tone_metrics(jnp.asarray(_tone(400), jnp.float32))
    assert abs(float(m["f0"]) - 400 / N) < 1e-9
    assert float(m["thd_db"]) < -100.0
    assert float(m["snr_db"]) > 100.0


def test_thd_exact_harmonic_level():
    # 2nd harmonic at exactly -40 dBc.
    x = _tone(400) + _tone(800, amp=0.01, phase=1.1)
    m = metrics.tone_metrics(jnp.asarray(x, jnp.float32))
    assert abs(float(m["thd_db"]) + 40.0) < 0.2
    assert abs(float(m["sfdr_db"]) - 40.0) < 0.2
    # Harmonics excluded from SNR, included in SINAD.
    assert float(m["snr_db"]) > 80.0
    assert abs(float(m["sinad_db"]) - 40.0) < 0.2


def test_harmonic_folding_past_nyquist():
    # f0 = 0.3: the 2nd harmonic (0.6) folds to 0.4.
    k0 = int(0.3 * N)
    x = _tone(k0) + _tone(N - 2 * k0, amp=0.02, phase=0.7)  # 0.4 = folded 0.6
    m = metrics.tone_metrics(jnp.asarray(x, jnp.float32))
    assert abs(float(m["thd_db"]) - 20 * np.log10(0.02)) < 0.3


def test_snr_matches_white_noise_level():
    rng = np.random.default_rng(0)
    for sigma in (1e-3, 2e-3):
        x = _tone(501) + sigma * rng.standard_normal(N)
        want = 10 * np.log10(0.5 / sigma**2)
        got = metrics.snr_tone(jnp.asarray(x, jnp.float32))
        assert abs(got - want) < 0.8, (got, want)


def test_enob_of_quantized_sine():
    for bits in (8, 10):
        q = 2.0 ** (bits - 1)
        x = np.round(_tone(501) * q) / q
        e = metrics.enob(jnp.asarray(x, jnp.float32))
        assert abs(e - bits) < 0.5, (bits, e)


def test_sfdr_non_harmonic_spur():
    # Spur at a non-harmonic bin: THD barely moves, SFDR sees it.
    x = _tone(400) + _tone(1371, amp=0.003, phase=0.2)
    m = metrics.tone_metrics(jnp.asarray(x, jnp.float32))
    assert abs(float(m["sfdr_db"]) - 20 * np.log10(1 / 0.003)) < 0.3
    assert float(m["thd_db"]) < -80.0


def test_wrappers_and_jit():
    x = jnp.asarray(_tone(300) + 0.01 * _tone(600), jnp.float32)
    assert abs(metrics.thd(x) + 40.0) < 0.2
    assert abs(metrics.sinad(x) - 40.0) < 0.2
    assert metrics.sfdr(x) > 39.0
    jitted = jax.jit(lambda v: metrics.tone_metrics(v)["thd_db"])
    assert abs(float(jitted(x)) + 40.0) < 0.2


def test_rejects_batched_input():
    with pytest.raises(ValueError):
        metrics.tone_metrics(jnp.zeros((2, 128), jnp.float32))
