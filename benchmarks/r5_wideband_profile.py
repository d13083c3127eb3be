"""Stage split of the wideband scanner row (6.25 GS/s whole-model).

The family-rows roofline note calls the scanner PFB-bound, but the n=64
fused_raw channelizer reads 13.1 GS/s standalone — the model runs at less
than half that. Split the 33.5M-sample pipeline into its stages at the row
config and K-diff each:

  PFB -> FM discriminator -> 63-tap audio FIR -> squelch gate

Each stage runs on the real intermediate shapes ((64, 523k) planes), so
the sum is directly comparable against the end-to-end row.

Usage: python benchmarks/r5_wideband_profile.py   (serial TPU client only)
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from digital_signal_processsing_tpu.models.wideband import (
    WidebandConfig,
    WidebandFmReceiver,
)
from digital_signal_processsing_tpu.ops.channelizer import pfb_channelize_planar
from digital_signal_processsing_tpu.ops.demod import fm_demodulate
from digital_signal_processsing_tpu.ops.fir import fir_direct, fir_filter

K_SMALL, K_BIG = 4, 12
REPEATS = 3
T = 33_554_432  # 64 x 524288 — the family-row config


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
    rx = WidebandFmReceiver(WidebandConfig())
    c = rx.config
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=T).astype(np.float32))

    # end-to-end (the shipped row, re-measured this session)
    def mk_e2e(k):
        @jax.jit
        def chained(v):
            def body(_, y):
                audio = rx(y)
                return y + 0.0 * jnp.sum(audio[:, :4])

            return jax.lax.fori_loop(0, k, body, v)

        return chained

    e2e = k_diff("scanner e2e", mk_e2e, x, T)

    # stage 1: PFB alone (real input -> planar channels)
    def mk_pfb(k):
        @jax.jit
        def chained(v):
            def body(_, y):
                i, q = pfb_channelize_planar(y, c.n_channels, rx.prototype)
                return y + 0.0 * (jnp.sum(i[:, :4]) + jnp.sum(q[:, :4]))

            return jax.lax.fori_loop(0, k, body, v)

        return chained

    pfb = k_diff("PFB alone", mk_pfb, x, T)

    # intermediates at the real shapes
    iv, qv = jax.jit(
        lambda v: pfb_channelize_planar(v, c.n_channels, rx.prototype)
    )(x)
    iv = jax.block_until_ready(iv)
    qv = jax.block_until_ready(qv)

    # stage 2: FM discriminator on (N, T/N) planes
    def mk_fm(k):
        @jax.jit
        def chained(arg):
            vi, vq = arg

            def body(_, cc):
                yi, yq = cc
                a = fm_demodulate(jax.lax.complex(yi, yq), gain=c.fm_gain)
                return yi + 0.0 * jnp.sum(a[:, :4]), yq

            return jax.lax.fori_loop(0, k, body, (vi, vq))

        return chained

    fm = k_diff("FM demod", mk_fm, (iv, qv), T)

    audio0 = jax.jit(
        lambda a: fm_demodulate(jax.lax.complex(a[0], a[1]), gain=c.fm_gain)
    )((iv, qv))
    audio0 = jax.block_until_ready(audio0)

    # stage 3: audio FIR — shipped fir_direct vs the auto fir_filter ladder
    for label, fn in (
        ("audio FIR (fir_direct, shipped)", lambda y: fir_direct(y, rx.audio_taps)),
        ("audio FIR (fir_filter auto)", lambda y: fir_filter(y, rx.audio_taps)),
    ):
        def mk_fir(k, fn=fn):
            @jax.jit
            def chained(v):
                def body(_, y):
                    o = fn(y)
                    return y + 0.0 * jnp.sum(o[:, :4])

                return jax.lax.fori_loop(0, k, body, v)

            return chained

        k_diff(label, mk_fir, audio0, T)

    # stage 4: squelch gate
    def mk_sq(k):
        @jax.jit
        def chained(arg):
            vi, vq = arg

            def body(_, cc):
                yi, yq = cc
                level = jnp.mean(jnp.sqrt(yi * yi + yq * yq), axis=-1)
                gate = level >= c.squelch * jnp.max(level)
                return yi + 0.0 * jnp.sum(gate.astype(jnp.float32)), yq

            return jax.lax.fori_loop(0, k, body, (vi, vq))

        return chained

    sq = k_diff("squelch gate", mk_sq, (iv, qv), T)

    print(
        f"\nsum of stages vs e2e: PFB {pfb*1e3:.2f} + FM {fm*1e3:.2f} + "
        f"squelch {sq*1e3:.2f} (+FIR above) vs e2e {e2e*1e3:.2f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
