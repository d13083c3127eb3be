"""Waterfall A/B + timing: serial DD tracker vs the parallel VV engine.

The decision for ModemConfig.tracker's default. The parallel engine
(_vv_phase_track: smoothed power-4 coarse phase + cumsum unwrap +
parallel DD refine) must match the serial scan's BER at EVERY waterfall
point (16QAM, SNR 12..22 x 3 seeds x 2 CFOs, 65536-symbol payload) —
cycle-slip statistics are exactly what a parallel respelling can get
wrong, so the acceptance bar is the full waterfall, not one anchor.

Usage: python benchmarks/r5_modem_vv.py   (serial TPU client only)
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
SNRS = (12.0, 14.0, 16.0, 18.0, 22.0)
SEEDS = (1, 2, 3)
CFOS = (2.4e-4, -1.1e-4)
N_PAYLOAD = 65536


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
    rng0 = np.random.default_rng(5)
    bits_tx = rng0.integers(0, 2, N_PAYLOAD * 4)
    base = modem.ModemConfig(bits_per_symbol=4, sps=8)
    ti, tq = modem.transmit(base, bits_tx)

    print("BER waterfall dd vs vv (16QAM, 65536 syms):", flush=True)
    worst = 0.0
    fails = []
    for snr in SNRS:
        row = []
        for seed in SEEDS:
            for cfo in CFOS:
                ci, cq = modem.channel(
                    ti, tq, delay=37, cfo=cfo, phase=0.8,
                    symbol_snr_db=snr, seed=seed,
                )
                i = jnp.asarray(ci)
                q = jnp.asarray(cq)
                bers = {}
                for trk in ("dd", "vv"):
                    cfg = modem.ModemConfig(
                        bits_per_symbol=4, sps=8, tracker=trk
                    )
                    bits, _ = modem.receive(cfg, i, q, N_PAYLOAD)
                    bers[trk] = float(np.mean(np.asarray(bits) != bits_tx))
                delta = bers["vv"] - bers["dd"]
                worst = max(worst, delta)
                if delta > max(2e-4, 0.1 * max(bers["dd"], 1e-9)):
                    fails.append((snr, seed, cfo, bers["dd"], bers["vv"]))
                row.append(f"{bers['dd']:.1e}/{bers['vv']:.1e}")
        print(f"  snr{snr:g}: " + "  ".join(row), flush=True)
    print(f"worst vv-dd delta: {worst:+.2e}; fails: {fails or 'none'}", flush=True)

    # timing at the family-row channel
    ci, cq = modem.channel(
        ti, tq, delay=37, cfo=2.4e-4, phase=0.8, symbol_snr_db=22.0, seed=1
    )
    i = jnp.asarray(ci)
    q = jnp.asarray(cq)
    for trk in ("dd", "vv"):
        cfg = modem.ModemConfig(bits_per_symbol=4, sps=8, tracker=trk)

        def mk(k, cfg=cfg):
            @jax.jit
            def chained(arg):
                vi, vq = arg

                def body(_, cc):
                    yi, yq = cc
                    bits, diag = modem.receive(cfg, yi, yq, N_PAYLOAD)
                    s = 0.0 * (jnp.sum(bits.astype(jnp.float32)) + diag["evm"])
                    return yi + s, yq

                return jax.lax.fori_loop(0, k, body, (vi, vq))

            return chained

        k_diff(f"receive tracker={trk}", mk, (i, q), ci.size)


if __name__ == "__main__":
    main()
