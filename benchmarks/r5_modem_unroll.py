"""Probe: the modem row is scan-bound — how much is the DD tracking loop,
and does lax.scan unroll buy it back?

BENCH_NOTES round-5 family rows: modem 16QAM receive = 0.109 GS/s
(4.80 ms/call at 65536 payload symbols), attributed to _dd_phase_track's
2050 sequential 32-symbol blocks. unroll=N keeps the exact op sequence
(outputs must be BIT-IDENTICAL) while cutting loop-machinery iterations
N-fold. Measures:

1. the tracker standalone at the row's shapes, unroll 1/4/8/16;
2. receive() end-to-end at the same unrolls;
3. bit-equality of payload bits across every unroll (hard assert).

Usage: python benchmarks/r5_modem_unroll.py   (serial TPU client only)
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from digital_signal_processsing_tpu.models import modem

K_SMALL, K_BIG = 4, 12
REPEATS = 3
UNROLLS = (1, 4, 8, 16)


def k_diff(name, make_fn, arg, work_items):
    fns = {}
    for k in (K_SMALL, K_BIG):
        t0 = time.perf_counter()
        f = make_fn(k)
        np.asarray(jax.tree_util.tree_leaves(f(arg))[0].ravel()[:8])
        fns[k] = f
        print(f"  compiled {name} k={k}: {time.perf_counter()-t0:.1f}s", flush=True)
    best = {k: float("inf") for k in fns}
    for _ in range(REPEATS):
        for k, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(f(arg))[0].ravel()[:8])
            best[k] = min(best[k], time.perf_counter() - t0)
    per = (best[K_BIG] - best[K_SMALL]) / (K_BIG - K_SMALL)
    print(
        f"{name}: {work_items / per / 1e9:.3f} GS/s ({per*1e3:.2f} ms/iter)",
        flush=True,
    )
    return per


def main() -> None:
    cfg = modem.ModemConfig(bits_per_symbol=4, sps=8)
    n_payload = 65536
    rng = np.random.default_rng(5)
    bits_tx = rng.integers(0, 2, n_payload * cfg.bits_per_symbol)
    ti, tq = modem.transmit(cfg, bits_tx)
    ci, cq = modem.channel(
        ti, tq, delay=37, cfo=2.4e-4, phase=0.8, symbol_snr_db=22.0, seed=1
    )
    i = jnp.asarray(ci)
    q = jnp.asarray(cq)
    n_samp = ci.size

    # ---- bit-equality anchor across unrolls ------------------------------
    ref_bits = None
    for u in UNROLLS:
        c = modem.ModemConfig(bits_per_symbol=4, sps=8, dd_unroll=u)
        bits, diag = modem.receive(c, i, q, n_payload)
        bits = np.asarray(bits)
        ber = float(np.mean(bits != bits_tx))
        if ref_bits is None:
            ref_bits = bits
        ident = bool(np.array_equal(bits, ref_bits))
        print(f"anchor unroll={u}: BER={ber:.2e} bits==unroll1: {ident}", flush=True)
        assert ber == 0.0 and ident, f"unroll={u} changed the answer"

    # ---- tracker standalone (row shapes: seg_len = p_len + n_payload) ----
    p_len = cfg.preamble_len
    seg_len = p_len + n_payload
    rng2 = np.random.default_rng(7)
    sym_i = rng2.integers(0, 4, seg_len) * 2 - 3
    sym_q = rng2.integers(0, 4, seg_len) * 2 - 3
    drift = np.exp(1j * 2 * np.pi * 2.4e-4 * np.arange(seg_len))
    eq_c = ((sym_i + 1j * sym_q) / np.sqrt(10) * drift).astype(np.complex64)
    # planar transfer: complex64 host<->device is unimplemented on the axon
    # tunnel (the repo-wide caveat) — form the complex value inside jit
    eq_r = jnp.asarray(eq_c.real.astype(np.float32))
    eq_i = jnp.asarray(eq_c.imag.astype(np.float32))
    # HOST numpy constants: closed-over device arrays need a device->host
    # copy at trace time (mlir.ir_constant), which the axon tunnel reports
    # Unimplemented for; host arrays embed directly
    kr = np.zeros(seg_len, np.float32)
    ki = np.zeros(seg_len, np.float32)
    km = np.arange(seg_len) < p_len

    for u in UNROLLS:
        def mk_trk(k, u=u):
            @jax.jit
            def chained(arg):
                yr, yi = arg

                def body(_, cc):
                    vr, vi = cc
                    t = modem._dd_phase_track(
                        jax.lax.complex(vr, vi), kr, ki, km, 4, cfg.dd_block, u
                    )
                    return vr + 0.0 * jnp.real(t), vi

                return jax.lax.fori_loop(0, k, body, (yr, yi))

            return chained

        k_diff(f"tracker unroll={u}", mk_trk, (eq_r, eq_i), seg_len)

    # ---- end-to-end receive at each unroll --------------------------------
    for u in UNROLLS:
        c = modem.ModemConfig(bits_per_symbol=4, sps=8, dd_unroll=u)

        def mk(k, c=c):
            @jax.jit
            def chained(arg):
                vi, vq = arg

                def body(_, cc):
                    yi, yq = cc
                    bits, diag = modem.receive(c, yi, yq, n_payload)
                    s = 0.0 * (jnp.sum(bits.astype(jnp.float32)) + diag["evm"])
                    return yi + s, yq

                return jax.lax.fori_loop(0, k, body, (vi, vq))

            return chained

        k_diff(f"receive unroll={u}", mk, (i, q), n_samp)


if __name__ == "__main__":
    main()
