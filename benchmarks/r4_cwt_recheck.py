"""Round-4: CWT bank after the lane-blocked bank conv.

The feature-stacked NCHW bank measured 0.078 GS/s at 16 widths x 1M
(r4_surface_rows) — W/128 MXU utilization and batch 1. The blocked
spelling (ops/wavelets._bank_conv_blocked) folds every (reversed) bank
row into a banded 128-lane tap matrix: one conv with W*128 output
features. This row re-measures the same config + an on-chip parity
check vs the float64-bank NumPy oracle.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main() -> None:
    assert jax.default_backend() == "tpu"
    from digital_signal_processsing_tpu.ops import wavelets

    rng = np.random.default_rng(0)
    n = 1_000_000
    widths = list(range(1, 17))
    xc = jnp.asarray(rng.standard_normal(n), jnp.float32)

    # parity on a short probe vs numpy float64 correlation
    ns = 4096
    xs = np.asarray(xc[:ns])
    got = np.asarray(wavelets.cwt(xs, wavelets.ricker, widths))
    for i, wdt in enumerate(widths):
        length = int(min(10 * wdt, ns))
        k = np.asarray(wavelets.ricker(length, wdt), np.float64)
        want = np.convolve(xs.astype(np.float64), k[::-1], mode="same")
        err = np.max(np.abs(got[i] - want)) / (np.abs(want).max() + 1e-12)
        assert err < 1e-4, (wdt, err)
    print("on-chip parity vs numpy float64 bank: OK (<1e-4 all widths)")

    def make(k):
        @jax.jit
        def chained(v):
            def body(i, y):
                out = wavelets.cwt(y, wavelets.ricker, widths)
                return out[0] * 0.0 + y

            return jax.lax.fori_loop(0, k, body, v)

        return chained

    fns = {}
    for k in (4, 12):
        t0 = time.perf_counter()
        f = make(k)
        np.asarray(f(xc).ravel()[:8])
        fns[k] = f
        print(f"  compiled cwt k={k}: {time.perf_counter()-t0:.1f}s", flush=True)
    best = {k: float("inf") for k in fns}
    for _ in range(3):
        for k, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f(xc).ravel()[:8])
            best[k] = min(best[k], time.perf_counter() - t0)
    per = (best[12] - best[4]) / 8
    print(
        f"cwt ricker x16 (1M) blocked: {n * 16 / per / 1e9:.3f} GS/s "
        f"(t4={best[4]:.3f}s t12={best[12]:.3f}s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
