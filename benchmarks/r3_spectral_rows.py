"""Round-3 on-chip rows: MXU spectral engine vs XLA FFT (VERDICT item 2).

stft + exact hilbert at production sizes, both engines, K-differential.
The exact-hilbert 64M row was deferred in rounds 1-2 because XLA's TPU FFT
path either OOMed (jnp.cumsum spelling) or took minutes of remote compile.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from digital_signal_processsing_tpu.ops.fft import hilbert, stft

C, T = 16, 4_000_000


def kdiff_sum(fn, x, klo=2, khi=8):
    """K-diff via accumulated slices (output shape != input shape)."""
    def chained(k):
        @jax.jit
        def f(v):
            def body(i, acc):
                return acc + fn(v + i.astype(jnp.float32) * 1e-12)
            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
        return f

    fs = {k: chained(k) for k in (klo, khi)}
    for k, g in fs.items():
        np.asarray(g(x))
    out = {}
    for k, g in fs.items():
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(g(x))
            best = min(best, time.perf_counter() - t0)
        out[k] = best
    return (out[khi] - out[klo]) / (khi - klo)


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.normal(size=(C, T)).astype(np.float32))

    for method in ("mxu", "xla"):
        t0 = time.perf_counter()
        dt = kdiff_sum(
            lambda v: jnp.sum(jnp.abs(stft(v, nfft=1024, hop=512, method=method))),
            x,
        )
        print(
            f"stft nfft=1024 {method}: {C*T/dt/1e9:.2f} GS/s "
            f"(setup {time.perf_counter()-t0:.0f}s)",
            flush=True,
        )

    # exact hilbert (method='fft' rides fft_large on the 16384 grid);
    # the XLA comparator runs at (16, 1M) — its 4M/64M compiles take
    # minutes (the round-1/2 lesson), which is the point of the MXU engine
    t0 = time.perf_counter()
    dt = kdiff_sum(lambda v: jnp.sum(jnp.abs(hilbert(v, method="fft"))), x)
    print(
        f"hilbert exact mxu-large (16x4M): {C*T/dt/1e9:.2f} GS/s "
        f"(setup {time.perf_counter()-t0:.0f}s)",
        flush=True,
    )
    from digital_signal_processsing_tpu.ops.fft import _hilbert_fft, _hilbert_fft_large

    x1 = x[:, : 1 << 20]
    for name, fn in (("mxu-large", _hilbert_fft_large), ("xla-fft", _hilbert_fft)):
        t0 = time.perf_counter()
        dt = kdiff_sum(lambda v: jnp.sum(jnp.abs(fn(v))), x1)
        print(
            f"hilbert exact {name} (16x1M): {C*(1<<20)/dt/1e9:.2f} GS/s "
            f"(setup {time.perf_counter()-t0:.0f}s)",
            flush=True,
        )

    # the long-deferred 64M single-stream exact row
    x64 = jax.device_put(
        rng.normal(size=(1, 64 * 1024 * 1024)).astype(np.float32)
    )
    t0 = time.perf_counter()
    dt = kdiff_sum(lambda v: jnp.sum(jnp.abs(hilbert(v, method="fft"))), x64, 2, 4)
    print(
        f"hilbert exact mxu-large (1x64M): {64*1024*1024/dt/1e9:.2f} GS/s "
        f"(setup {time.perf_counter()-t0:.0f}s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
