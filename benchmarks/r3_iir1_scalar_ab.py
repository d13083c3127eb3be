"""Round-3 A/B: first-order IIR kernels — tile (r2, alpha+beta full
tiles) vs scalar-A composition vs scalar-A + compact row pass.
K-differential, strictly interleaved; (16, 4M) f32 like the sosfilt rows."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

from digital_signal_processsing_tpu.ops.iir import (
    iir_first_order,
    iir_first_order_pallas,
)

C, T = 16, 4_000_000
A, B = 0.995, 0.005


def kdiff(fn, x, klo=8, khi=40):
    def chained(k):
        return jax.jit(
            lambda v: jax.lax.fori_loop(0, k, lambda i, y: fn(y), v)
        )

    fs = {k: chained(k) for k in (klo, khi)}
    for k, g in fs.items():
        np.asarray(g(x)[:1, :8])
    out = {}
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
    x = jax.device_put(rng.normal(size=(C, T)).astype(np.float32))

    fns = {
        "scalar+compact": lambda v: iir_first_order_pallas(
            v, A, B, kernel="scalar", row_pass="compact"
        ),
        "scalar+bcast": lambda v: iir_first_order_pallas(
            v, A, B, kernel="scalar"
        ),
        "tile (r2)": lambda v: iir_first_order_pallas(v, A, B),
    }
    for name, fn in fns.items():
        t0 = time.perf_counter()
        np.asarray(fn(x)[:1, :8])
        print(f"compile+first {name}: {time.perf_counter()-t0:.1f}s", flush=True)

    want = np.asarray(
        iir_first_order(x[:2, :100000], A, B, method="xla_scan")
    )
    got = np.asarray(
        iir_first_order_pallas(
            x[:2, :100000], A, B, kernel="scalar", row_pass="compact"
        )
    )
    err = np.max(np.abs(got - want)) / np.max(np.abs(want))
    print(f"scalar+compact on-chip parity: {err:.2e}", flush=True)

    for rep in range(3):
        row = {n: C * T / kdiff(f, x) / 1e9 for n, f in fns.items()}
        print(
            f"rep {rep}: "
            + "  ".join(f"{k}={v:.2f} GS/s" for k, v in row.items()),
            flush=True,
        )


if __name__ == "__main__":
    main()
