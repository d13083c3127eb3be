"""Round-4: spectral auto-dispatch measurements + hilbert (16,4M) cliff.

VERDICT r3 items 2/3: the MXU fft_large engine LOSES to XLA's FFT at
(16,4M) (3.12 vs 4.10 GS/s, logs/r3_onchip/r3_fftlarge_probe.log) yet
_resolve_fft_method("auto") routes large on-grid sizes to mxu; and the
hilbert exact mxu-large path collapses to 0.06 GS/s at (16,4M) vs 1.55 at
(16,1M) — a 25x unexplained cliff sitting on the default auto path.

This probe (a) decomposes _hilbert_fft_large stage by stage at (16,4M) to
find the cliff, (b) measures the XLA and FIR hilbert spellings at the same
shape so auto can be set from data, (c) rechecks the (1,64M) long-stream
point. Each row is crash-isolated (reference run_benchmarks.py:93-97
behavior). Run serially — never in parallel with another TPU client.
"""

from __future__ import annotations

import sys
import time
import traceback

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

CRASHES = 0


def row(name, fn):
    global CRASHES
    try:
        fn()
    except Exception:
        CRASHES += 1
        print(f"CRASH {name}:", flush=True)
        traceback.print_exc()


def k_diff(name, fn, x, work, klo=2, khi=6, reps=3):
    """Chained K-differential (BENCH_NOTES Methodology): fn must map a
    pytree arg to something reducible; we fold to a scalar accumulator so
    the loop carries no growing state."""
    fns = {}
    for k in (klo, khi):

        @jax.jit
        def chained(v, k=k):
            def body(i, acc):
                # i-dependent perturbation prevents loop-invariant hoisting
                out = fn(v + i.astype(jnp.float32) * 1e-12)
                leaves = jax.tree_util.tree_leaves(out)
                return acc + sum(jnp.sum(jnp.abs(l[..., :8])) for l in leaves)

            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

        t0 = time.perf_counter()
        np.asarray(chained(x))
        print(f"  compiled {name} k={k}: {time.perf_counter()-t0:.1f}s", flush=True)
        fns[k] = chained
    best = {k: float("inf") for k in fns}
    for _ in range(reps):
        for k, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f(x))
            best[k] = min(best[k], time.perf_counter() - t0)
    per = (best[khi] - best[klo]) / (khi - klo)
    print(
        f"{name}: {work/per/1e9:.3f} GS/s (t{klo}={best[klo]:.3f}s t{khi}={best[khi]:.3f}s)",
        flush=True,
    )


def main() -> None:
    assert jax.default_backend() == "tpu"
    from digital_signal_processsing_tpu.ops import fft as fft_ops
    from digital_signal_processsing_tpu.ops import fft_mxu

    rng = np.random.default_rng(0)
    C, T = 16, 4_194_304  # the cliff shape; T = 2^22 on the 16384 grid
    x = jax.device_put(rng.normal(size=(C, T)).astype(np.float32))
    work = C * T

    # -- (a) decompose the mxu-large hilbert at the cliff shape ------------
    def fwd(v):
        return fft_mxu.fft_large(v, None)

    def fwd_mask(v):
        fr, fi = fft_mxu.fft_large(v, None)
        idx = jax.lax.broadcasted_iota(jnp.int32, (T,), 0)
        half = T // 2
        mult = jnp.where(
            (idx == 0) | (idx == half), 1.0, jnp.where(idx < half, 2.0, 0.0)
        ).astype(jnp.float32)
        return fr * mult, fi * mult

    def inv_only(v):
        # inverse four-step from planar complex (v reused as both planes —
        # same cost shape as the real hilbert inverse)
        return fft_mxu.fft_large(v, v * 0.5, inverse=True)

    def full(v):
        return fft_ops._hilbert_fft_large(v)

    row("fwd (16x4M)", lambda: k_diff("fft_large fwd (16x4M)", fwd, x, work))
    row("fwd+mask (16x4M)", lambda: k_diff("fft_large fwd+mask (16x4M)", fwd_mask, x, work))
    row("inv complex (16x4M)", lambda: k_diff("fft_large inv complex (16x4M)", inv_only, x, work))
    row("hilbert mxu-large full (16x4M)", lambda: k_diff("hilbert mxu-large full (16x4M)", full, x, work))

    # -- (b) the competing hilbert spellings at the same shape -------------
    def xla_hilbert(v):
        return fft_ops._hilbert_fft(v)

    def fir_hilbert(v):
        return fft_ops.hilbert_fir(v)

    row("hilbert xla (16x4M)", lambda: k_diff("hilbert xla (16x4M)", xla_hilbert, x, work))
    row("hilbert fir (16x4M)", lambda: k_diff("hilbert fir (16x4M)", fir_hilbert, x, work))

    # xla plain fft at (16x1M) and (16x8M) to bracket the large-engine rule
    x1 = jax.device_put(rng.normal(size=(16, 1_048_576)).astype(np.float32))
    x8 = jax.device_put(rng.normal(size=(16, 8_388_608)).astype(np.float32))

    def xla_fft(v):
        f = jnp.fft.fft(jax.lax.complex(v, jnp.zeros_like(v)))
        return jnp.real(f), jnp.imag(f)

    def mxu_fft(v):
        return fft_mxu.fft_large(v, None)

    row("xla fft (16x1M)", lambda: k_diff("xla fft (16x1M)", xla_fft, x1, 16 * 1_048_576))
    row("mxu fft_large (16x1M)", lambda: k_diff("mxu fft_large (16x1M)", mxu_fft, x1, 16 * 1_048_576))
    row("xla fft (16x8M)", lambda: k_diff("xla fft (16x8M)", xla_fft, x8, 16 * 8_388_608))
    row("mxu fft_large (16x8M)", lambda: k_diff("mxu fft_large (16x8M)", mxu_fft, x8, 16 * 8_388_608))

    print(f"DONE crashes={CRASHES}", flush=True)


if __name__ == "__main__":
    main()
