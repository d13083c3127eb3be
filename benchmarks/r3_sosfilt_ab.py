"""Round-3 A/B: fused scalar-A sosfilt kernel vs the round-2 tile-scan kernel.

K-differential protocol (BENCH_NOTES.md): jit a fori_loop applying the op K
times feeding output back to input, force completion with a tiny fetch,
time at two K values, take the slope. A/B strictly interleaved in one
session. Run on the real chip: `python benchmarks/r3_sosfilt_ab.py`.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import scipy.signal as sps

from digital_signal_processsing_tpu.ops.iir import (
    sosfilt_pallas,
    sosfilt_pallas_fused,
)

C, T = 16, 4_000_000
N_SEC = 4
K_LO, K_HI = 8, 40


def chained(fn, k, x, sos):
    def body(_, y):
        return fn(sos, y)

    return jax.lax.fori_loop(0, k, body, x)


def measure(fn, x, sos, k):
    f = jax.jit(lambda xx: chained(fn, k, xx, sos))
    out = f(x)
    np.asarray(out[:1, :8])  # force completion
    t0 = time.perf_counter()
    out = f(x)
    np.asarray(out[:1, :8])
    return time.perf_counter() - t0


def kdiff(fn, x, sos):
    lo = measure(fn, x, sos, K_LO)
    hi = measure(fn, x, sos, K_HI)
    per_call = (hi - lo) / (K_HI - K_LO)
    return per_call


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    sos = sps.butter(2 * N_SEC, 0.2, output="sos").astype(np.float32)
    x = jnp.asarray(rng.normal(size=(C, T)).astype(np.float32))

    fns = {
        "fused_scalarA": sosfilt_pallas_fused,
        "tile_scan_r2": sosfilt_pallas,
    }
    # warm compiles first (remote compiles are slow; keep them out of timing)
    for name, fn in fns.items():
        t0 = time.perf_counter()
        np.asarray(fn(sos, x)[:1, :8])
        print(f"compile+first {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    # parity on chip
    ref = np.asarray(sps.sosfilt(sos.astype(np.float64), np.asarray(x[:2, :100000], np.float64)))
    got = np.asarray(sosfilt_pallas_fused(sos, x[:2, :100000]))
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    print(f"on-chip scipy parity (fused): {err:.2e}", flush=True)

    # interleaved A/B, 3 rounds
    for rep in range(3):
        row = {}
        for name, fn in fns.items():
            dt = kdiff(fn, x, sos)
            gs = C * T / dt / 1e9
            row[name] = gs
        print(
            f"rep {rep}: " + "  ".join(f"{k}={v:.2f} GS/s" for k, v in row.items()),
            flush=True,
        )


if __name__ == "__main__":
    main()
