"""A/B: fused_raw at n = 256/512/1024 (round-5 wide extension) vs the
u-tensor fused path those sizes used to fall back to.

VERDICT r4 item 3 / ROADMAP candidate 5: a wideband scanner uses
n=256-1024; under round 4's envelope those silently took the ~4x slower
`fused` path. The extension makes the tile width n itself (B = 1, no lane
rolls) with the commutator folded into per-lane constants as before.

Parity (vs the composed XLA oracle) prints before timing; K-differential.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

K_SMALL, K_BIG = 4, 12
REPEATS = 3


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
    print(f"{name}: {work_items / per / 1e9:.3f} GS/s ({per*1e3:.2f} ms/iter)", flush=True)


def main() -> None:
    from digital_signal_processsing_tpu.ops.channelizer import (
        design_prototype,
        pfb_channelize_planar,
        pfb_channelize,
    )

    rng = np.random.default_rng(0)

    for n in (256, 512, 1024):
        t = 1 << 26  # 64M, matching the r4 channelizer row
        x = jnp.asarray(rng.standard_normal(t), jnp.float32)
        proto = jnp.asarray(design_prototype(n, 8))

        # parity on a short slice, on chip (planar fetch: complex64 host
        # transfer is unimplemented on the axon tunnel)
        xs = x[: n * 64]
        za = pfb_channelize(xs, n, proto, method="composed")
        zb = pfb_channelize(xs, n, proto, method="fused_raw")
        a = np.asarray(jnp.real(za)) + 1j * np.asarray(jnp.imag(za))
        b = np.asarray(jnp.real(zb)) + 1j * np.asarray(jnp.imag(zb))
        err = np.max(np.abs(a - b)) / np.max(np.abs(a))
        print(f"parity n={n}: {err:.2e}", flush=True)

        def mk(method):
            def make(k):
                @jax.jit
                def chained(v):
                    def body(_, y):
                        z = pfb_channelize(y, n, proto, method=method)
                        return y + 0.0 * (jnp.real(z).sum() + jnp.imag(z).sum())

                    return jax.lax.fori_loop(0, k, body, v)

                return chained

            return make

        k_diff(f"pfb n={n} fused_raw (64M)", mk("fused_raw"), x, t)
        k_diff(f"pfb n={n} fused     (64M)", mk("fused"), x, t)


if __name__ == "__main__":
    main()
