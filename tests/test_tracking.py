"""Multi-target tracker: association oracle parity, KF scenarios, e2e radar."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from digital_signal_processsing_tpu.models import radar, tracking
from digital_signal_processsing_tpu.models.radar import RadarConfig
from digital_signal_processsing_tpu.models.tracking import (
    TrackerConfig,
    extract_measurements,
    track_cpis,
    track_detections,
    tracker_init,
    tracker_step,
)


def _np_greedy(cost):
    c = cost.copy()
    n_t, n_m = c.shape
    assign = -np.ones(n_t, np.int32)
    used = np.zeros(n_m, bool)
    for _ in range(min(n_t, n_m)):
        if not np.isfinite(c).any():
            break
        t, m = np.unravel_index(np.argmin(c), c.shape)
        assign[t] = m
        used[m] = True
        c[t, :] = np.inf
        c[:, m] = np.inf
    return assign, used


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("shape", [(4, 4), (6, 3), (3, 7)])
def test_greedy_assign_matches_numpy_oracle(seed, shape):
    rng = np.random.default_rng(seed)
    cost = rng.uniform(0.0, 10.0, shape).astype(np.float32)
    cost[rng.uniform(size=shape) < 0.4] = np.inf  # infeasible pairs
    assign, used = tracking._greedy_assign(
        jnp.asarray(cost), min(shape[0], shape[1])
    )
    ref_assign, ref_used = _np_greedy(cost)
    np.testing.assert_array_equal(np.asarray(assign), ref_assign)
    np.testing.assert_array_equal(np.asarray(used), ref_used)


def test_extract_measurements_peaks_and_velocity_scale():
    n_dop, n_rng = 8, 16
    power = np.zeros((n_dop, n_rng), np.float32)
    det = np.zeros((n_dop, n_rng), bool)
    # A blob around (6, 3): only the peak cell must survive.
    power[5:8, 2:5] = 1.0
    power[6, 3] = 5.0
    det[5:8, 2:5] = True
    # A second, weaker isolated peak at (2, 10).
    power[2, 10] = 3.0
    det[2, 10] = True
    z, valid = extract_measurements(
        jnp.asarray(det), jnp.asarray(power), max_meas=4, vel_scale=16.0
    )
    z = np.asarray(z)
    valid = np.asarray(valid)
    assert valid.tolist() == [True, True, False, False]
    # Strongest first: range bin 3, doppler (6-4)/8 = 0.25 -> velocity 4.0.
    np.testing.assert_allclose(z[0], [3.0, 4.0])
    # Then range bin 10, doppler (2-4)/8 = -0.25 -> velocity -4.0.
    np.testing.assert_allclose(z[1], [10.0, -4.0])


def _measurement_stream(tracks, n_cpis, max_meas, sigma=0.0, seed=0):
    """tracks: list of (r0, v, t_on, t_off) -> (zs, valids) arrays."""
    rng = np.random.default_rng(seed)
    zs = np.zeros((n_cpis, max_meas, 2), np.float32)
    valids = np.zeros((n_cpis, max_meas), bool)
    for k in range(n_cpis):
        j = 0
        for r0, v, t_on, t_off in tracks:
            if t_on <= k < t_off:
                zs[k, j] = [
                    r0 + v * k + sigma * rng.standard_normal(),
                    v + sigma * rng.standard_normal(),
                ]
                valids[k, j] = True
                j += 1
    return jnp.asarray(zs), jnp.asarray(valids)


def test_single_target_converges_and_confirms():
    cfg = TrackerConfig(max_tracks=4, max_meas=4, sigma_r=0.5, sigma_v=0.1)
    zs, valids = _measurement_stream(
        [(50.0, 2.0, 0, 12)], 12, cfg.max_meas, sigma=0.2, seed=1
    )
    state, hist = track_cpis(cfg, zs, valids)
    confirmed = np.asarray(hist["confirmed"])
    assert confirmed[-1].sum() == 1
    assert confirmed[cfg.confirm_hits - 1].sum() == 1  # confirms on time
    slot = int(np.argmax(confirmed[-1]))
    x = np.asarray(hist["x"])[-1, slot]
    np.testing.assert_allclose(x, [50.0 + 2.0 * 11, 2.0], atol=0.5)
    # One stable id across the whole track.
    tids = np.asarray(hist["tid"])[:, slot]
    assert (tids == tids[-1]).all()


def test_track_drop_after_max_misses():
    cfg = TrackerConfig(max_tracks=4, max_meas=4, max_misses=2)
    zs, valids = _measurement_stream([(30.0, 1.0, 0, 6)], 12, cfg.max_meas)
    _, hist = track_cpis(cfg, zs, valids)
    active = np.asarray(hist["active"])
    assert active[5].sum() == 1
    # Misses accumulate at CPIs 6,7,8 (> max_misses=2 on the third).
    assert active[7].sum() == 1
    assert active[8].sum() == 0


def test_crossing_targets_keep_identity():
    # Two targets whose ranges cross mid-stream; velocity measurements
    # separate them, so gating keeps each id on its own motion.
    cfg = TrackerConfig(
        max_tracks=4, max_meas=4, sigma_r=0.3, sigma_v=0.05, gate=13.8
    )
    zs, valids = _measurement_stream(
        [(40.0, 2.0, 0, 16), (70.0, -2.0, 0, 16)], 16, cfg.max_meas, 0.1, 7
    )
    _, hist = track_cpis(cfg, zs, valids)
    confirmed = np.asarray(hist["confirmed"])[-1]
    assert confirmed.sum() == 2
    x = np.asarray(hist["x"])[-1]
    vels = sorted(float(x[s, 1]) for s in np.flatnonzero(confirmed))
    np.testing.assert_allclose(vels, [-2.0, 2.0], atol=0.3)
    # Ids never swapped: each confirmed slot kept one tid throughout.
    tids = np.asarray(hist["tid"])
    for s in np.flatnonzero(confirmed):
        live = tids[:, s][np.asarray(hist["active"])[:, s]]
        assert (live == live[-1]).all()


def test_spawn_rank_matching_fills_free_slots_in_order():
    cfg = TrackerConfig(max_tracks=3, max_meas=4)
    z = jnp.asarray(
        [[10.0, 0.0], [20.0, 1.0], [30.0, -1.0], [40.0, 0.5]], jnp.float32
    )
    valid = jnp.asarray([True, True, True, True])
    state, out = tracker_step(cfg, tracker_init(cfg), z, valid)
    # Only 3 slots: the first three measurements spawn, ids 1..3 in order.
    assert np.asarray(state.active).all()
    np.testing.assert_array_equal(np.asarray(state.tid), [1, 2, 3])
    np.testing.assert_allclose(np.asarray(state.x), np.asarray(z)[:3])
    assert int(state.next_id) == 4
    assert not np.asarray(out["confirmed"]).any()


def test_radar_end_to_end_two_targets():
    rcfg = RadarConfig(
        n_pulses=32, n_range=256, pulse_len=32, guard=(1, 2), train=(3, 6),
        pfa=1e-5,
    )
    # vel_scale=16: doppler 0.125 -> +2 bins/CPI, -0.0625 -> -1 bin/CPI.
    tcfg = TrackerConfig(
        max_tracks=8, max_meas=8, vel_scale=16.0, sigma_r=0.7, sigma_v=0.3,
        confirm_hits=3, gate=13.8,
    )
    n_cpis = 10
    i = np.zeros((n_cpis, rcfg.n_pulses, rcfg.n_range), np.float32)
    q = np.zeros_like(i)
    for k in range(n_cpis):
        i[k], q[k] = radar.synthesize(
            rcfg,
            [(50 + 2 * k, 0.125, 1.0), (180 - k, -0.0625, 0.8)],
            noise_power=0.05,
            seed=100 + k,
        )
    state, hist = track_detections(rcfg, tcfg, jnp.asarray(i), jnp.asarray(q))
    confirmed = np.asarray(hist["confirmed"])[-1]
    x = np.asarray(hist["x"])[-1]
    assert confirmed.sum() == 2
    got = sorted(
        (float(x[s, 0]), float(x[s, 1])) for s in np.flatnonzero(confirmed)
    )
    # Truth at the last CPI (k=9): (68, +2) and (171, -1).
    np.testing.assert_allclose(got[0], [68.0, 2.0], atol=1.0)
    np.testing.assert_allclose(got[1], [171.0, -1.0], atol=1.0)


def test_pure_noise_confirms_nothing():
    rcfg = RadarConfig(
        n_pulses=32, n_range=256, pulse_len=32, guard=(1, 2), train=(3, 6),
        pfa=1e-6,
    )
    tcfg = TrackerConfig(max_tracks=8, max_meas=8, vel_scale=16.0)
    n_cpis = 6
    i = np.zeros((n_cpis, rcfg.n_pulses, rcfg.n_range), np.float32)
    q = np.zeros_like(i)
    for k in range(n_cpis):
        i[k], q[k] = radar.synthesize(
            rcfg, [], noise_power=1.0, seed=200 + k
        )
    _, hist = track_detections(rcfg, tcfg, jnp.asarray(i), jnp.asarray(q))
    assert not np.asarray(hist["confirmed"]).any()


def test_tracker_step_jits_once_across_cpis():
    cfg = TrackerConfig(max_tracks=4, max_meas=4)
    zs, valids = _measurement_stream([(10.0, 1.0, 0, 8)], 8, cfg.max_meas)
    state = tracker_init(cfg)
    with jax.log_compiles():
        for k in range(8):
            state, _ = tracker_step(cfg, state, zs[k], valids[k])
    assert int(state.active.sum()) == 1
