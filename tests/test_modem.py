"""Single-carrier QAM modem (models/modem.py): pulse, mapping, full link.

The oracle chain is host numpy (transmit/channel); the device-under-test
is the fully jitted receive path. High-SNR links must be bit-exact; the
AWGN link must sit within an implementation-loss band of the QPSK theory
curve BER = Q(sqrt(Es/N0)).
"""

from __future__ import annotations

import numpy as np
import pytest

from digital_signal_processsing_tpu.models import modem
from digital_signal_processsing_tpu.ops.fir import design_rrc


def test_rrc_unit_energy_and_nyquist():
    sps, span = 8, 12
    h = design_rrc(span * sps + 1, 0.35, sps)
    assert h.dtype == np.float32
    np.testing.assert_allclose(np.sum(h * h), 1.0, rtol=1e-6)
    # TX RRC * RX RRC = raised cosine: unit peak, ~zero ISI at symbol taps
    rc = np.convolve(h.astype(np.float64), h.astype(np.float64))
    center = span * sps
    np.testing.assert_allclose(rc[center], 1.0, rtol=1e-6)
    isi = rc[center % sps :: sps].copy()
    isi[center // sps] = 0.0
    assert np.max(np.abs(isi)) < 2e-3  # truncation floor of a 12-symbol span
    # symmetric (linear phase)
    np.testing.assert_allclose(h, h[::-1], rtol=0, atol=1e-9)


def test_rrc_validation():
    with pytest.raises(ValueError):
        design_rrc(64, 0.35, 8)  # even taps
    with pytest.raises(ValueError):
        design_rrc(65, 0.0, 8)  # beta out of range
    with pytest.raises(ValueError):
        design_rrc(65, 0.35, 1)  # sps too small


@pytest.mark.parametrize("bps", [1, 2, 4, 6])
def test_map_demap_roundtrip(bps):
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 240 * bps)
    syms = modem.map_bits(bits, bps)
    # unit average energy
    np.testing.assert_allclose(np.mean(np.abs(syms) ** 2), 1.0, atol=0.15)
    back = np.asarray(
        modem.demap_symbols(
            np.float32(syms.real), np.float32(syms.imag), bps
        )
    )
    np.testing.assert_array_equal(back, bits)


def test_gray_mapping_adjacent_levels_differ_by_one_bit():
    # nearest-neighbor symbol errors must cost exactly one bit per axis
    bps = 4
    k = bps // 2
    levels = {}
    for g in range(1 << k):
        bits = [(g >> (k - 1 - j)) & 1 for j in range(k)] + [0] * k
        levels[modem.map_bits(np.array(bits), bps).real[0]] = g
    amps = sorted(levels)
    for a, b in zip(amps, amps[1:]):
        assert bin(levels[a] ^ levels[b]).count("1") == 1


CLEAN_CASES = [
    # (bps, delay, cfo, phase, taps)
    (1, 5, 1e-4, 0.3, None),
    (2, 13, 5e-4, 0.7, None),
    (4, 13, 1e-4, -0.4, [1.0] + [0.0] * 7 + [0.25 + 0.1j]),
    (6, 2, 0.0, 1.1, None),
]


@pytest.mark.parametrize("bps,delay,cfo,phase,taps", CLEAN_CASES)
def test_link_noiseless_bit_exact(bps, delay, cfo, phase, taps):
    rng = np.random.default_rng(bps)
    cfg = modem.ModemConfig(bits_per_symbol=bps, sps=8)
    n_payload = 600
    bits = rng.integers(0, 2, n_payload * bps)
    i, q = modem.transmit(cfg, bits)
    ci, cq = modem.channel(i, q, delay=delay, cfo=cfo, phase=phase, taps=taps)
    out, diag = modem.receive(cfg, ci, cq, n_payload)
    np.testing.assert_array_equal(np.asarray(out), bits)
    # MF peak sits at (rrc_num_taps - 1 + delay) mod sps
    want_phase = (cfg.rrc_num_taps - 1 + delay) % cfg.sps
    assert int(diag["timing_phase"]) == want_phase
    assert float(diag["evm"]) < 0.1


def test_link_high_snr_multipath_16qam():
    rng = np.random.default_rng(7)
    cfg = modem.ModemConfig(bits_per_symbol=4, sps=8)
    n_payload = 800
    bits = rng.integers(0, 2, n_payload * 4)
    i, q = modem.transmit(cfg, bits)
    ci, cq = modem.channel(
        i, q, delay=13, cfo=2e-4, phase=0.7,
        taps=[1.0, 0.1 + 0.05j], symbol_snr_db=25.0, seed=1,
    )
    out, _ = modem.receive(cfg, ci, cq, n_payload)
    assert np.mean(np.asarray(out) != bits) < 1e-3


def test_cfo_estimate_accuracy():
    rng = np.random.default_rng(11)
    cfg = modem.ModemConfig(bits_per_symbol=2, sps=8)
    n_payload = 600
    bits = rng.integers(0, 2, n_payload * 2)
    i, q = modem.transmit(cfg, bits)
    true_cfo = 4.2e-4
    ci, cq = modem.channel(i, q, delay=9, cfo=true_cfo, phase=0.2)
    _, diag = modem.receive(cfg, ci, cq, n_payload)
    est = (
        float(diag["cfo_coarse"]) + float(diag["cfo_fine_per_symbol"])
    ) / cfg.sps
    assert abs(est - true_cfo) < 2e-5


def _q(x: float) -> float:
    from math import erfc, sqrt

    return 0.5 * erfc(x / sqrt(2.0))


def test_qpsk_awgn_ber_near_theory():
    """Full chain at Es/N0 = 7 dB vs BER = Q(sqrt(Es/N0)); the band allows
    the measured ~2x implementation loss (64-symbol LS EQ noise
    enhancement + decision-directed tracking jitter) but catches anything
    broken (a sync slip or scaling bug costs orders of magnitude)."""
    rng = np.random.default_rng(23)
    cfg = modem.ModemConfig(bits_per_symbol=2, sps=8)
    n_payload = 4000
    bits = rng.integers(0, 2, n_payload * 2)
    i, q = modem.transmit(cfg, bits)
    snr_db = 7.0
    ci, cq = modem.channel(i, q, delay=6, cfo=1e-4, symbol_snr_db=snr_db, seed=5)
    out, _ = modem.receive(cfg, ci, cq, n_payload)
    ber = np.mean(np.asarray(out) != bits)
    theory = _q(np.sqrt(10.0 ** (snr_db / 10.0)))
    assert theory * 0.5 < ber < theory * 4.0, (ber, theory)


def test_receive_is_jit_cached():
    # second call with the same static config must not retrace
    import jax

    rng = np.random.default_rng(2)
    cfg = modem.ModemConfig(bits_per_symbol=2, sps=8)
    bits = rng.integers(0, 2, 200 * 2)
    i, q = modem.transmit(cfg, bits)
    with jax.log_compiles(False):
        out1, _ = modem.receive(cfg, i, q, 200)
        n0 = modem.receive._cache_size()
        out2, _ = modem.receive(cfg, i * 1.0, q * 1.0, 200)
        assert modem.receive._cache_size() == n0
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
