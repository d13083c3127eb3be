"""Wideband PFB receiver: FM recovery, squelch, shapes."""

import numpy as np

from digital_signal_processsing_tpu.models.wideband import (
    WidebandConfig,
    WidebandFmReceiver,
)


def _fm_wideband(n, k, msg_f, dev, t):
    idx = np.arange(t)
    msg = np.sin(2 * np.pi * msg_f * idx)
    phase = 2 * np.pi * (k / n) * idx + dev * 2 * np.pi * np.cumsum(msg)
    return np.cos(phase).astype(np.float32), msg


def test_wideband_fm_recovery():
    n, k = 16, 5
    rx = WidebandFmReceiver(WidebandConfig(n_channels=n, audio_taps=33))
    t = n * 4096
    msg_f = 0.002
    x, _ = _fm_wideband(n, k, msg_f, dev=0.1 / n, t=t)
    audio = np.asarray(rx(x))
    assert audio.shape == (n, t // n)
    a = audio[k, 256:] - audio[k, 256:].mean()
    spec = np.abs(np.fft.rfft(a * np.hanning(a.size)))
    peak = int(np.argmax(spec))
    assert peak == round(msg_f * n * a.size)  # message tone at channel rate
    assert spec[peak] > 100 * np.median(spec)


def test_wideband_squelch_mutes_empty_channels():
    n, k = 16, 5
    rx = WidebandFmReceiver(WidebandConfig(n_channels=n, audio_taps=33, squelch=0.2))
    x, _ = _fm_wideband(n, k, 0.002, dev=0.1 / n, t=n * 2048)
    audio = np.asarray(rx(x))
    power = np.mean(audio[:, 256:] ** 2, axis=1)
    # only the occupied channel (and its conjugate image) survive the gate
    live = set(np.nonzero(power > 1e-12)[0].tolist())
    assert k in live
    assert live <= {k, n - k}


def test_wideband_example_input_runs():
    rx = WidebandFmReceiver(WidebandConfig(n_channels=8, audio_taps=17))
    x = rx.example_input(t=8 * 256)
    assert np.asarray(rx(x)).shape == (8, 256)


def test_wideband_time_sharded_matches_unsharded(rng):
    # no hand-written collectives needed: a time-sharded input propagates
    # through reshape -> PFB conv (GSPMD halo) -> IFFT -> demod -> FIR
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from digital_signal_processsing_tpu.parallel import make_mesh

    mesh = make_mesh()
    rx = WidebandFmReceiver(WidebandConfig(n_channels=16, audio_taps=33))
    x = rng.normal(size=16 * 2048).astype(np.float32)
    want = np.asarray(rx(x))
    got_dev = rx(jax.device_put(x, NamedSharding(mesh, P("t"))))
    assert "'t'" in str(got_dev.sharding.spec) or "t" in str(got_dev.sharding.spec)
    np.testing.assert_allclose(np.asarray(got_dev), want, rtol=1e-4, atol=1e-5)
