"""Probe the fft_large (16, 4M) pathology seen in r3_spectral_rows.

The four-step engine measured 0.06 GS/s at (16, 4M) vs 1.55 at (16, 1M)
and 1.24 at (1, 64M) — same-order element counts, 25x apart. Suspect: the
balanced 2048x2048 split at 4M (two dft_factored(2048) stages whose inner
stage-2 contraction is only 16 wide). Probe unbalanced splits and the XLA
FFT comparator at the same shape.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

C, T = 16, 4_194_304  # 4M on the 16384 grid


def k_diff(name, fn, x, klo=2, khi=6):
    fns = {}
    for k in (klo, khi):
        @jax.jit
        def chained(v, k=k):
            def body(i, acc):
                r, im = fn(v + i.astype(jnp.float32) * 1e-12)
                return acc + jnp.sum(jnp.abs(r)) + jnp.sum(jnp.abs(im))
            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
        t0 = time.perf_counter()
        np.asarray(chained(x))
        print(f"  compiled {name} k={k}: {time.perf_counter()-t0:.1f}s", flush=True)
        fns[k] = chained
    best = {k: float("inf") for k in fns}
    for _ in range(3):
        for k, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f(x))
            best[k] = min(best[k], time.perf_counter() - t0)
    per = (best[khi] - best[klo]) / (khi - klo)
    print(f"{name}: {C*T/per/1e9:.2f} GS/s (t{klo}={best[klo]:.3f}s t{khi}={best[khi]:.3f}s)",
          flush=True)


def main():
    assert jax.default_backend() == "tpu"
    from digital_signal_processsing_tpu.ops import fft_mxu

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.normal(size=(C, T)).astype(np.float32))

    def with_n1(n1):
        orig = fft_mxu._pick_large_factor
        def fn(v):
            fft_mxu._pick_large_factor = lambda n: n1
            try:
                return fft_mxu.fft_large(v, None)
            finally:
                fft_mxu._pick_large_factor = orig
        return fn

    for n1 in (2048, 16384, 512):
        k_diff(f"fft_large n1={n1} (16x4M)", with_n1(n1), x)

    # XLA comparator at the same shape (compile may be minutes; time it)
    def xla(v):
        f = jnp.fft.fft(jax.lax.complex(v, jnp.zeros_like(v)))
        return jnp.real(f), jnp.imag(f)

    k_diff("xla fft (16x4M)", xla, x)


if __name__ == "__main__":
    main()
