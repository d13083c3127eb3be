"""OFDM receiver: sync, CFO, demod, EQ against a host-side oracle chain."""

import numpy as np
import pytest

from digital_signal_processsing_tpu.models.ofdm import (
    OfdmConfig,
    OfdmReceiver,
    ofdm_modulate,
    qpsk_demod,
    qpsk_mod,
)


def make_burst(cfg, rng):
    bits = rng.integers(0, 2, 2 * cfg.active * cfg.n_symbols)
    i, q = ofdm_modulate(cfg, bits)
    return bits, i, q


def channel(i, q, *, delay=0, phase=0.0, cfo=0.0, snr_db=None, rng=None, gain=1.0):
    x = (i + 1j * q) * gain * np.exp(1j * phase)
    if cfo:
        x = x * np.exp(2j * np.pi * cfo * np.arange(x.size))
    x = np.concatenate([np.zeros(delay, complex), x, np.zeros(32, complex)])
    if snr_db is not None:
        p = np.mean(np.abs(x) ** 2)
        n = rng.normal(size=(x.size, 2)) @ np.array([1, 1j]) * np.sqrt(
            p / 2 * 10 ** (-snr_db / 10)
        )
        x = x + n
    return x.real.astype(np.float32), x.imag.astype(np.float32)


def test_qpsk_roundtrip(rng):
    bits = rng.integers(0, 2, 256)
    np.testing.assert_array_equal(qpsk_demod(qpsk_mod(bits)), bits)


def test_clean_burst_zero_errors(rng):
    cfg = OfdmConfig()
    bits, i, q = make_burst(cfg, rng)
    rx = OfdmReceiver(cfg)
    ci, cq = channel(i, q, delay=5, phase=1.1, gain=0.7)
    got = rx.receive_bits(ci, cq)
    np.testing.assert_array_equal(got, bits)


def test_sync_finds_timing_and_cfo(rng):
    cfg = OfdmConfig()
    _, i, q = make_burst(cfg, rng)
    rx = OfdmReceiver(cfg)
    true_cfo = 0.003
    ci, cq = channel(i, q, delay=11, cfo=true_cfo)
    d, cfo = rx.synchronize(np.asarray(ci), np.asarray(cq))
    # the CP correlator peaks where a cyclic prefix aligns: delay mod symbol
    assert int(d) % cfg.symbol_len == 11
    assert abs(float(cfo) - true_cfo) < 2e-4


def test_cfo_corrected_burst_zero_errors(rng):
    cfg = OfdmConfig()
    bits, i, q = make_burst(cfg, rng)
    rx = OfdmReceiver(cfg)
    ci, cq = channel(i, q, delay=3, phase=0.4, cfo=0.002)
    got = rx.receive_bits(ci, cq)
    np.testing.assert_array_equal(got, bits)


def test_noisy_burst_low_ber(rng):
    cfg = OfdmConfig()
    bits, i, q = make_burst(cfg, rng)
    rx = OfdmReceiver(cfg)
    ci, cq = channel(i, q, delay=7, phase=-0.9, snr_db=20, rng=rng)
    got = rx.receive_bits(ci, cq)
    ber = np.mean(got != bits)
    assert ber < 1e-3, ber


def test_modulator_validates_bit_count():
    cfg = OfdmConfig()
    with pytest.raises(ValueError, match="bits"):
        ofdm_modulate(cfg, np.zeros(10, np.int8))
