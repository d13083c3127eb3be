"""Round-3 on-chip row: fused vs composed PFB channelizer (VERDICT item 3).

64-channel critically-sampled PFB over a 64M-sample real stream, 8 taps/
branch prototype — the wideband-scanner front-end shape. Interleaved
same-session K-differential (see BENCH_NOTES.md Methodology).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from digital_signal_processsing_tpu.ops.channelizer import (
    design_prototype,
    pfb_channelize,
)

N = 64_000_000
NCH = 64
TAPS_PER_BRANCH = 8
K_SMALL, K_BIG = 2, 8
REPEATS = 3


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.normal(size=N).astype(np.float32))
    proto = jnp.asarray(design_prototype(NCH, TAPS_PER_BRANCH))

    def make(method, k):
        @jax.jit
        def f(v):
            def body(i, acc):
                y = pfb_channelize(
                    v + i.astype(jnp.float32) * 1e-12, NCH, proto, method=method
                )
                return acc + jnp.sum(jnp.abs(jnp.real(y)) + jnp.abs(jnp.imag(y)))

            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

        return f

    fns = {}
    for method in ("composed", "fused"):
        for k in (K_SMALL, K_BIG):
            t0 = time.perf_counter()
            f = make(method, k)
            np.asarray(f(x))
            fns[(method, k)] = f
            print(
                f"compiled {method} k={k}: {time.perf_counter()-t0:.1f}s",
                flush=True,
            )

    best = {key: float("inf") for key in fns}
    for _ in range(REPEATS):
        for key, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f(x))
            best[key] = min(best[key], time.perf_counter() - t0)

    for method in ("composed", "fused"):
        per = (best[(method, K_BIG)] - best[(method, K_SMALL)]) / (
            K_BIG - K_SMALL
        )
        print(
            f"pfb_channelize {NCH}ch {method}: {N / per / 1e9:.2f} GS/s "
            f"(t{K_SMALL}={best[(method, K_SMALL)]:.3f}s "
            f"t{K_BIG}={best[(method, K_BIG)]:.3f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
