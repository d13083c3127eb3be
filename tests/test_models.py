"""Models: zoo registry, flagship chain, adaptive FIR training."""

import dataclasses

import numpy as np
import optax
import pytest

from digital_signal_processsing_tpu.models import (
    AVERAGER_ZOO,
    ChainConfig,
    DspChain,
    make_sharded_train_step,
    run_variant,
)
from digital_signal_processsing_tpu.models.adaptive import identify_system
from digital_signal_processsing_tpu.golden import moving_average_golden
from digital_signal_processsing_tpu.ops.demod import fm_modulate
from digital_signal_processsing_tpu.parallel import make_mesh
from tests.conftest import make_interleaved


def test_zoo_covers_all_reference_binaries():
    files = {f for v in AVERAGER_ZOO.values() for f in v.reference_files}
    # all nine reference executables accounted for (SURVEY.md §0)
    assert files == {
        "basics/profilable_moving_averager.cpp",
        "basics/profilable_parallel_averager.cu",
        "basics/profilable_sm_averager.cu",
        "basics/profilable_sm_vload2.cu",
        "basics/profilable_sm_vload4.cu",
        "basics/hillis_steele_averager.cu",
        "basics/hillis_steele_vloaded_averager.cu",
        "basics/blelloch_scan_averager.cu",
        "basics/blelloch_scan_vloaded_averager.cu",
    }


def test_run_variant_parity(rng):
    x = make_interleaved(rng, 3000, 2)
    want = moving_average_golden(x, 16, 2)
    for key in ("scan", "direct", "xla_scan"):
        np.testing.assert_array_equal(
            np.asarray(run_variant(key, x, 16, 2)), want
        )
    with pytest.raises(KeyError):
        run_variant("nope", x, 16, 2)


def test_chain_shapes_and_recovery():
    cfg = ChainConfig(channels=4, decimation=4, channel_taps=65, audio_taps=33)
    chain = DspChain(cfg)
    t = 1 << 14
    # put a real FM tone on channel 2's LO frequency
    msg_f = 0.002
    n = np.arange(t)
    msg = np.sin(2 * np.pi * msg_f * n).astype(np.float32)
    iq_base = np.asarray(fm_modulate(msg, deviation=0.05))
    lo = cfg.lo_frequencies()
    rng = np.random.default_rng(0)
    iq = (0.01 * (rng.normal(size=(4, t)) + 1j * rng.normal(size=(4, t)))).astype(
        np.complex64
    )
    iq[2] += iq_base * np.exp(2j * np.pi * lo[2] * n)
    out = np.asarray(chain(iq))
    assert out.shape == (4, t // 4)
    # channel 2 should contain the tone at msg_f * decimation cyc/sample
    seg = out[2, 200:]
    spec = np.abs(np.fft.rfft(seg - seg.mean()))
    peak = np.argmax(spec)
    expected = msg_f * 4 * seg.shape[0]
    assert abs(peak - expected) < 3
    # the tone must stand far above channel 2's own noise floor
    floor = np.median(spec)
    assert spec[peak] > 20 * floor
    # other channels demodulate noise: flat spectra, no peak at the tone bin
    for ch in (0, 1, 3):
        s2 = np.abs(np.fft.rfft(out[ch, 200:] - out[ch, 200:].mean()))
        assert abs(int(np.argmax(s2)) - peak) > 3


def test_chain_jit_stability():
    chain = DspChain(ChainConfig(channels=2, decimation=2, channel_taps=33, audio_taps=17))
    x = chain.example_input(t=4096)
    a = np.asarray(chain(x))
    b = np.asarray(chain(x))
    np.testing.assert_array_equal(a, b)


def test_adaptive_fir_identifies_system():
    true = np.array([0.5, -0.3, 0.2, 0.1, -0.05], np.float32)
    taps, loss = identify_system(true, steps=300, batch=(4, 2048), lr=2e-2)
    assert loss < 1e-4
    np.testing.assert_allclose(taps, true, atol=2e-2)


def test_sharded_train_step_matches_single_device():
    mesh = make_mesh(n_time=4, n_channel=2)
    tx = optax.adam(2e-2)
    step = make_sharded_train_step(mesh, tx)
    true = np.array([0.8, -0.4, 0.1], np.float32)
    taps_sh, loss_sh = identify_system(
        true, steps=60, batch=(8, 4096), train_step=step, tx=tx, seed=5
    )
    taps_1d, loss_1d = identify_system(
        true, steps=60, batch=(8, 4096), lr=2e-2, seed=5, tx=optax.adam(2e-2)
    )
    # same data order, same optimizer: sharded == single-device (float tol)
    np.testing.assert_allclose(taps_sh, taps_1d, atol=1e-5)


def test_fused_frontend_chain():
    # same tone-recovery behavior with the fused polyphase channelizer
    cfg = ChainConfig(
        channels=4, decimation=4, channel_taps=64, audio_taps=33,
        fused_frontend=True,
    )
    chain = DspChain(cfg)
    t = 1 << 14
    msg_f = 0.002
    n = np.arange(t)
    msg = np.sin(2 * np.pi * msg_f * n).astype(np.float32)
    iq_base = np.asarray(fm_modulate(msg, deviation=0.05))
    lo = cfg.lo_frequencies()
    rng = np.random.default_rng(0)
    iq = (0.01 * (rng.normal(size=(4, t)) + 1j * rng.normal(size=(4, t)))).astype(
        np.complex64
    )
    iq[2] += iq_base * np.exp(2j * np.pi * lo[2] * n)
    out = np.asarray(chain(iq))
    seg = out[2, 200:]
    spec = np.abs(np.fft.rfft(seg - seg.mean()))
    peak = np.argmax(spec)
    assert abs(peak - msg_f * 4 * seg.shape[0]) < 3


def test_fused_chain_sharded_parity(rng):
    from digital_signal_processsing_tpu.parallel import make_mesh
    from digital_signal_processsing_tpu.parallel.pipeline import sharded_chain

    mesh = make_mesh(n_time=4, n_channel=2)
    cfg = ChainConfig(
        channels=4, decimation=4, channel_taps=64, audio_taps=33,
        fused_frontend=True,
    )
    chain = DspChain(cfg)
    t = 1 << 14
    iq = (rng.normal(size=(4, t)) + 1j * rng.normal(size=(4, t))).astype(np.complex64)
    want = np.asarray(chain(iq))
    got = np.asarray(sharded_chain(chain, iq, mesh))
    ramp = (cfg.channel_taps + 8 * cfg.decimation) // cfg.decimation + cfg.audio_taps
    np.testing.assert_allclose(got[:, ramp:], want[:, ramp:], rtol=1e-3, atol=1e-4)


def test_chain_stream_chunks_match_one_shot(rng):
    from digital_signal_processsing_tpu.models.chain import (
        ChainConfig,
        DspChain,
        chain_stream_chunk,
        chain_stream_init,
    )

    cfg = ChainConfig(channels=4, decimation=4, channel_taps=65, audio_taps=33)
    chain = DspChain(cfg)
    t = 1 << 13
    i = rng.normal(size=(4, t)).astype(np.float32)
    q = rng.normal(size=(4, t)).astype(np.float32)
    want = np.asarray(chain.forward_planar(i, q))

    state = chain_stream_init(chain)
    outs = []
    for a, b in [(0, 2048), (2048, 2048 + 1024), (2048 + 1024, t)]:
        state, y = chain_stream_chunk(chain, state, i[:, a:b], q[:, a:b])
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=-1)
    assert got.shape == want.shape
    # skip the global ramp-up where near-zero FM phasors amplify float noise
    ramp = (cfg.channel_taps + 8 * cfg.decimation) // cfg.decimation + cfg.audio_taps
    np.testing.assert_allclose(got[:, ramp:], want[:, ramp:], rtol=1e-3, atol=1e-4)


def test_chain_locks_to_non_integer_audio_rate(rng):
    # BASELINE configs[4] north star: the chain output locked to a rate that
    # is NOT an integer divisor of the input (e.g. 44.1k from 256k)
    from digital_signal_processsing_tpu.models.chain import ChainConfig, DspChain
    from digital_signal_processsing_tpu.ops.farrow import (
        farrow_output_len,
        resample_farrow,
    )

    rate = (441, 2560)  # 44.1 kHz from 256 kHz
    cfg = ChainConfig(
        channels=2, decimation=4, channel_taps=33, audio_taps=17,
        audio_resample=rate,
    )
    chain = DspChain(cfg)
    t = 1 << 13
    i = rng.normal(size=(2, t)).astype(np.float32)
    q = rng.normal(size=(2, t)).astype(np.float32)
    got = np.asarray(chain.forward_planar(i, q))
    assert got.shape == (2, farrow_output_len(t // 4, rate))
    # identical to resampling the unlocked chain's audio (same ops)
    base = DspChain(dataclasses.replace(cfg, audio_resample=None))
    want = np.asarray(resample_farrow(base.forward_planar(i, q), rate))
    # one jit vs two: XLA fusion across the boundary shifts the last ulp
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestSampleRecursiveAdaptive:
    """NLMS / RLS: golden-loop parity and system identification."""

    def _sysid(self, rng):
        p = 8
        h = rng.standard_normal(p) * np.exp(-0.3 * np.arange(p))
        n = 4000
        x = rng.standard_normal(n).astype(np.float32)
        d = (
            np.convolve(x, h)[:n] + 0.01 * rng.standard_normal(n)
        ).astype(np.float32)
        return h, x, d, p

    def test_nlms_matches_golden_and_identifies(self, rng):
        from digital_signal_processsing_tpu.models.adaptive import nlms

        h, x, d, p = self._sysid(rng)

        w_ref = np.zeros(p)
        u = np.zeros(p)
        for t in range(x.size):
            u = np.concatenate([[x[t]], u[:-1]])
            e = d[t] - w_ref @ u
            w_ref = w_ref + 0.5 * e / (1e-6 + u @ u) * u
        _, _, w = nlms(x, d, p)
        assert np.max(np.abs(np.asarray(w) - w_ref)) < 1e-3
        assert np.max(np.abs(np.asarray(w) - h)) < 0.05

    def test_rls_converges_fast(self, rng):
        from digital_signal_processsing_tpu.models.adaptive import rls

        h, x, d, p = self._sysid(rng)
        _, e, w = rls(x, d, p, forget=0.999)
        assert np.max(np.abs(np.asarray(w) - h)) < 5e-3
        # locked within ~2p samples: tiny residual power early on
        assert float(np.mean(np.asarray(e)[100:300] ** 2)) < 1e-3

    def test_batched_streams(self, rng):
        from digital_signal_processsing_tpu.models.adaptive import nlms, rls

        h, x, d, p = self._sysid(rng)
        xb = rng.standard_normal((3, x.size)).astype(np.float32)
        db = np.stack([np.convolve(r, h)[: x.size] for r in xb]).astype(
            np.float32
        )
        for algo in (nlms, rls):
            _, _, w = algo(xb, db, p)
            assert np.asarray(w).shape == (3, p)
            assert np.max(np.abs(np.asarray(w) - h)) < 0.05

    def test_rls_stable_on_long_runs(self, rng):
        # float32 RLS without symmetrization diverges past ~10k samples;
        # the per-step re-symmetrization must keep it locked
        from digital_signal_processsing_tpu.models.adaptive import rls

        h, _, _, p = self._sysid(rng)
        n = 32000
        x = rng.standard_normal(n).astype(np.float32)
        d = (
            np.convolve(x, h)[:n] + 0.003 * rng.standard_normal(n)
        ).astype(np.float32)
        _, e, w = rls(x, d, p, forget=0.999)
        assert float(np.mean(np.asarray(e)[-4000:] ** 2)) < 1e-4
        assert np.max(np.abs(np.asarray(w) - h)) < 5e-3


class TestKalman:
    def _cv_setup(self, rng):
        dt = 0.1
        F = np.array([[1, dt], [0, 1]])
        H = np.array([[1.0, 0.0]])
        Q = np.array([[dt**3 / 3, dt**2 / 2], [dt**2 / 2, dt]]) * 0.1
        R = np.array([[4.0]])
        T = 300
        true_x = np.zeros((T, 2))
        v, pos = 1.0, 0.0
        for t in range(T):
            pos += v * dt + rng.normal(0, 0.05)
            v += rng.normal(0, 0.1)
            true_x[t] = [pos, v]
        z = true_x[:, :1] + rng.normal(0, 2.0, (T, 1))
        return F, H, Q, R, z, true_x

    def test_filter_matches_float64_golden(self, rng):
        from digital_signal_processsing_tpu.models import kalman

        F, H, Q, R, z, _ = self._cv_setup(rng)
        x0, P0 = np.zeros(2), np.eye(2) * 1e3
        x, P = x0.copy(), P0.copy()
        xs, Ps = [], []
        for t in range(len(z)):
            x = F @ x
            P = F @ P @ F.T + Q
            K = P @ H.T @ np.linalg.inv(H @ P @ H.T + R)
            x = x + K @ (z[t] - H @ x)
            P = (np.eye(2) - K @ H) @ P
            xs.append(x.copy())
            Ps.append(P.copy())
        xg, Pg = kalman.kalman_filter(F, H, Q, R, z, x0=x0, P0=P0)
        assert np.max(np.abs(np.asarray(xg) - np.array(xs))) < 1e-2
        assert np.max(np.abs(np.asarray(Pg) - np.array(Ps))) < 5e-3

    def test_smoother_beats_filter(self, rng):
        from digital_signal_processsing_tpu.models import kalman

        F, H, Q, R, z, true_x = self._cv_setup(rng)
        xg, Pg = kalman.kalman_filter(F, H, Q, R, z)
        xs, _ = kalman.rts_smoother(F, Q, xg, Pg)
        ef = np.mean((np.asarray(xg)[50:, 0] - true_x[50:, 0]) ** 2)
        es = np.mean((np.asarray(xs)[50:, 0] - true_x[50:, 0]) ** 2)
        assert es < 0.5 * ef

    def test_batched_streams(self, rng):
        from digital_signal_processsing_tpu.models import kalman

        F, H, Q, R, z, _ = self._cv_setup(rng)
        zb = np.stack([z, z + 1.0], 0)
        xg, _ = kalman.kalman_filter(F, H, Q, R, z)
        xgb, _ = kalman.kalman_filter(F, H, Q, R, zb)
        assert np.asarray(xgb).shape == (2,) + np.asarray(xg).shape
        assert np.max(np.abs(np.asarray(xgb)[0] - np.asarray(xg))) < 1e-4
