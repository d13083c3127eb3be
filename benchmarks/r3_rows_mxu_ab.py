"""A/B: VPU roll-add vs MXU banded-matmul row-window-sum (ROADMAP item 2).

Interleaved same-session K-differential rows at the headline config
(64M int16 stereo, k=1024 => hr=16) so the ratio is trustworthy through
axon-tunnel session drift. See BENCH_NOTES.md Methodology.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from digital_signal_processsing_tpu.ops.pallas_scan import (
    windowed_averager_pallas,
)

N = 64_000_000
WINDOW = 1024
CHANNELS = 2
K_SMALL, K_BIG = 8, 40
REPEATS = 3


def make_chained(k: int, rows_via_mxu: bool):
    @jax.jit
    def chained(v):
        def body(i, y):
            return windowed_averager_pallas(
                y, WINDOW, CHANNELS, rows_via_mxu=rows_via_mxu
            )

        return jax.lax.fori_loop(0, k, body, v)

    return chained


def main() -> None:
    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32768, size=N, dtype=np.int16)
    xd = jax.device_put(x)

    fns = {}
    for mxu in (False, True):
        for k in (K_SMALL, K_BIG):
            t0 = time.perf_counter()
            f = make_chained(k, mxu)
            np.asarray(f(xd)[:8])
            fns[(mxu, k)] = f
            print(f"compiled mxu={mxu} k={k}: {time.perf_counter()-t0:.1f}s", flush=True)

    # parity on chip first
    a = np.asarray(fns[(False, K_SMALL)](xd))
    b = np.asarray(fns[(True, K_SMALL)](xd))
    print("on-chip parity:", "EXACT" if np.array_equal(a, b) else "MISMATCH")
    del a, b

    best = {key: float("inf") for key in fns}
    for _ in range(REPEATS):
        for key, f in fns.items():  # interleaved
            t0 = time.perf_counter()
            np.asarray(f(xd)[:8])
            best[key] = min(best[key], time.perf_counter() - t0)

    for mxu in (False, True):
        per = (best[(mxu, K_BIG)] - best[(mxu, K_SMALL)]) / (K_BIG - K_SMALL)
        print(
            f"rows_via_mxu={mxu}: {N / per / 1e9:.2f} GS/s "
            f"(t{K_SMALL}={best[(mxu, K_SMALL)]:.3f}s t{K_BIG}={best[(mxu, K_BIG)]:.3f}s)"
        )


if __name__ == "__main__":
    main()
