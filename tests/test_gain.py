"""Gain/conditioning ops: DC blocker, AGC, soft clip, dB."""

import numpy as np
import pytest

from digital_signal_processsing_tpu.ops.gain import agc, db, dc_block, soft_clip


def _dc_block_ref(x, pole):
    y = np.zeros_like(x, dtype=np.float64)
    prev_x = 0.0
    prev_y = 0.0
    for i, v in enumerate(x.astype(np.float64)):
        prev_y = v - prev_x + pole * prev_y
        prev_x = v
        y[i] = prev_y
    return y


def test_dc_block_matches_reference_recurrence(rng):
    x = rng.normal(size=500).astype(np.float32) + 3.0
    got = np.asarray(dc_block(x, 0.99))
    want = _dc_block_ref(x, 0.99)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dc_block_removes_offset(rng):
    x = (rng.normal(size=20000) + 5.0).astype(np.float32)
    y = np.asarray(dc_block(x))
    # steady-state mean ~0 (ignore the settling transient)
    assert abs(np.mean(y[5000:])) < 0.05
    assert abs(np.mean(x)) > 4.5


def test_agc_levels_a_quiet_and_loud_burst(rng):
    t = np.arange(40000)
    x = np.sin(2 * np.pi * 0.01 * t).astype(np.float32)
    x[:20000] *= 0.01  # quiet half
    y = np.asarray(agc(x, target=0.5, attack=0.005))
    # after settling, both halves sit near the same envelope
    q = np.abs(y[15000:19000]).max()
    l = np.abs(y[35000:39000]).max()
    assert 0.3 < q / l < 3.0
    assert q > 0.2  # the quiet half was actually lifted (input peak 0.01)


def test_agc_batched_shapes(rng):
    x = rng.normal(size=(3, 1000)).astype(np.float32)
    assert np.asarray(agc(x)).shape == (3, 1000)
    with pytest.raises(ValueError):
        agc(x, attack=2.0)


def test_soft_clip_bounds(rng):
    x = rng.normal(size=1000).astype(np.float32) * 10
    y = np.asarray(soft_clip(x, 0.8))
    assert np.all(np.abs(y) <= 0.8 + 1e-6)  # tanh saturates to 1.0 in f32
    small = np.asarray(soft_clip(np.array([0.01], np.float32), 1.0))
    np.testing.assert_allclose(small, [0.01], atol=1e-5)


def test_db():
    np.testing.assert_allclose(
        np.asarray(db(np.array([1.0, 0.1, 0.0], np.float32)))[:2], [0.0, -20.0],
        atol=1e-4,
    )
    assert float(np.asarray(db(np.zeros(1, np.float32)))[0]) == -200.0


def test_agc_no_startup_spike(rng):
    # the debiased envelope must not overshoot at stream start
    t = np.arange(8000)
    x = (0.25 * np.sin(2 * np.pi * 0.01 * t)).astype(np.float32)
    y = np.asarray(agc(x, target=0.5, attack=0.01))
    assert np.abs(y[:200]).max() < 3.0 * np.abs(y[4000:]).max()
