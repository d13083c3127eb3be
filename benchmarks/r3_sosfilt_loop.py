"""Round-3: fori_loop-sections fused kernel — compile time + throughput.

Also reports the r2-protocol (K=4/16) number for comparability with the
BENCH_NOTES r2 sosfilt row (3.75 GS/s), and the seeded chunk path.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import scipy.signal as sps

from digital_signal_processsing_tpu.ops.iir import (
    sosfilt_chunk_pallas_fused,
    sosfilt_init,
    sosfilt_pallas_fused,
)

C, T = 16, 4_000_000


def kdiff(fn, x, klo, khi):
    def chained(k):
        return jax.jit(
            lambda v: jax.lax.fori_loop(0, k, lambda i, y: fn(y), v)
        )

    out = {}
    fs = {k: chained(k) for k in (klo, khi)}
    for k, g in fs.items():
        np.asarray(g(x)[:1, :8])
    for k, g in fs.items():
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(g(x)[:1, :8])
            best = min(best, time.perf_counter() - t0)
        out[k] = best
    return (out[khi] - out[klo]) / (khi - klo)


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    sos = sps.butter(8, 0.2, output="sos").astype(np.float32)  # 4 sections
    x = jax.device_put(rng.normal(size=(C, T)).astype(np.float32))

    t0 = time.perf_counter()
    y = sosfilt_pallas_fused(sos, x)
    np.asarray(y[:1, :8])
    print(f"loop-kernel compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    # second filter, same structure: must not recompile
    sos2 = sps.cheby1(8, 1.0, 0.3, output="sos").astype(np.float32)
    t0 = time.perf_counter()
    np.asarray(sosfilt_pallas_fused(sos2, x)[:1, :8])
    print(f"second filter (no recompile): {time.perf_counter() - t0:.2f}s", flush=True)

    ref = sps.sosfilt(sos.astype(np.float64), np.asarray(x[:2, :100000], np.float64))
    got = np.asarray(sosfilt_pallas_fused(sos, x[:2, :100000]))
    print(
        f"on-chip parity: {np.max(np.abs(got - ref)) / np.max(np.abs(ref)):.2e}",
        flush=True,
    )

    for klo, khi, tag in [(8, 40, "wide"), (4, 16, "r2proto")]:
        dt = kdiff(lambda v: sosfilt_pallas_fused(sos, v), x, klo, khi)
        print(f"loop fused {tag} K={klo}/{khi}: {C*T/dt/1e9:.2f} GS/s", flush=True)

    # seeded chunk path (serving)
    st = sosfilt_init(sos, (C,))
    t0 = time.perf_counter()
    st2, yc = sosfilt_chunk_pallas_fused(st, sos, x)
    np.asarray(yc[:1, :8])
    print(f"seeded chunk compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    dt = kdiff(
        lambda v: sosfilt_chunk_pallas_fused(st, sos, v)[1], x, 4, 16
    )
    print(f"seeded chunk r2proto: {C*T/dt/1e9:.2f} GS/s", flush=True)


if __name__ == "__main__":
    main()
