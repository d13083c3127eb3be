"""Bisect the 415 s sosfilt_tv chained-wrapper cold compile (VERDICT r4
item 8). One mode per PROCESS (in-process caches would hide the cost):

    python benchmarks/r5_tv_compile_probe.py <mode>

modes: plain (one sosfilt_tv call), fori1/fori2/fori4 (the surface-row
fori_loop wrapper at trip count k), scan4 (lax.scan respelling), frames4
(the round-5 frame-aware kernel under fori k=4). Set
JAX_COMPILATION_CACHE_DIR to probe the persistent-cache serving fix.
Prints: mode, trace+compile seconds, steady per-call ms.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

cache = os.environ.get("JAX_COMPILATION_CACHE_DIR")
import jax

if cache:
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from digital_signal_processsing_tpu.ops import iir


def main() -> None:
    mode = sys.argv[1]
    c, t = 16, 4_000_000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((c, t)), jnp.float32)
    r = 0.5 + 0.4 * np.sin(np.linspace(0, 20, t))
    th = 0.3 + 0.2 * np.cos(np.linspace(0, 15, t))
    coef_row = np.stack(
        [np.full(t, 0.3), 0.1 * np.sin(np.linspace(0, 5, t)),
         np.full(t, 0.05), np.ones(t), -2 * r * np.cos(th), r * r], -1
    )
    sos_t = jnp.asarray(np.stack([coef_row] * 4, 0), jnp.float32)

    if mode == "plain":
        @jax.jit
        def fn(arg):
            v, s = arg
            return iir.sosfilt_tv(s, v, method="fused")

    elif mode.startswith("fori"):
        k = int(mode[4:])

        @jax.jit
        def fn(arg):
            v, s = arg

            def body(i, y):
                return iir.sosfilt_tv(s, y, method="fused")

            return jax.lax.fori_loop(0, k, body, v)

    elif mode == "scan4":
        @jax.jit
        def fn(arg):
            v, s = arg

            def step(y, _):
                return iir.sosfilt_tv(s, y, method="fused"), None

            out, _ = jax.lax.scan(step, v, None, length=4)
            return out

    elif mode == "frames4":
        # frame-wise automation (frame 1024) through the r5 frames kernel
        fr = jnp.asarray(
            np.stack([coef_row[::1024]] * 4, 0), jnp.float32
        )

        @jax.jit
        def fn(arg):
            v, s = arg

            def body(i, y):
                return iir.sosfilt_tv_frames(fr, y, 1024)

            return jax.lax.fori_loop(0, k_default, body, v)

        k_default = 4
    else:
        raise SystemExit(f"unknown mode {mode}")

    t0 = time.perf_counter()
    np.asarray(fn((x, sos_t)).ravel()[:8])
    t_first = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn((x, sos_t)).ravel()[:8])
        best = min(best, time.perf_counter() - t0)
    print(
        f"{mode}: first-call {t_first:.1f}s, steady {best*1e3:.1f} ms"
        + (f" (cache={cache})" if cache else ""),
        flush=True,
    )


if __name__ == "__main__":
    main()
