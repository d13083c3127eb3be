"""Probe: DD tracking block size — the step COUNT is the modem's cost.

r5_modem_unroll showed the 2050-step block=32 tracker is 91% of the modem
row and unroll=4 banked 1.84x; the remaining cost is per-step launch
latency x step count. Larger dd_block divides the step count directly but
widens the tracking interval (more phase drift between corrections) — an
accuracy/speed tradeoff, so the decision needs a BER waterfall, not a
single anchor: 16QAM across SNR 12..22 dB x 3 seeds x 2 CFOs for each
block size, THEN the timing. A block size only qualifies for the default
if its BER matches block=32 at EVERY waterfall point.

Usage: python benchmarks/r5_modem_block.py   (serial TPU client only)
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
BLOCKS = (32, 64, 128, 256)
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

    # ---- BER waterfall per block size --------------------------------------
    # one compile per block size (seed/SNR/CFO are data)
    print("BER waterfall (16QAM, 65536 syms):", flush=True)
    bad = set()
    ber_ref: dict[tuple, float] = {}
    for blk in BLOCKS:
        cfg = modem.ModemConfig(bits_per_symbol=4, sps=8, dd_block=blk)
        worst_delta = 0.0
        for snr in SNRS:
            for seed in SEEDS:
                for cfo in CFOS:
                    ci, cq = modem.channel(
                        ti, tq, delay=37, cfo=cfo, phase=0.8,
                        symbol_snr_db=snr, seed=seed,
                    )
                    bits, _ = modem.receive(
                        cfg, jnp.asarray(ci), jnp.asarray(cq), N_PAYLOAD
                    )
                    ber = float(np.mean(np.asarray(bits) != bits_tx))
                    key = (snr, seed, cfo)
                    if blk == 32:
                        ber_ref[key] = ber
                    else:
                        delta = ber - ber_ref[key]
                        worst_delta = max(worst_delta, delta)
                        if delta > max(2e-4, 0.1 * max(ber_ref[key], 1e-9)):
                            bad.add(blk)
        row = " ".join(
            f"snr{snr:g}:{np.mean([ber_ref[(snr, s, c)] for s in SEEDS for c in CFOS]):.2e}"
            for snr in SNRS
        ) if blk == 32 else f"worst BER delta vs block32: {worst_delta:+.2e}"
        print(f"  block={blk}: {row}", flush=True)
    print(f"  blocks failing the waterfall: {sorted(bad) or 'none'}", flush=True)

    # ---- timing (family-row channel) --------------------------------------
    ci, cq = modem.channel(
        ti, tq, delay=37, cfo=2.4e-4, phase=0.8, symbol_snr_db=22.0, seed=1
    )
    i = jnp.asarray(ci)
    q = jnp.asarray(cq)
    for blk in BLOCKS:
        cfg = modem.ModemConfig(bits_per_symbol=4, sps=8, dd_block=blk)

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

        k_diff(f"receive block={blk}", mk, (i, q), ci.size)


if __name__ == "__main__":
    main()
