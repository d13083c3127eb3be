"""Round-3 re-measure: fir_filter direct vs fused overlap-save crossover.

After the 3-factor nfft split + block tuning (VERDICT item 3), where does
the fused engine overtake the lane-blocked direct conv? (16, 4.2M) f32,
tap counts bracketing the r2 crossover (~6000).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from digital_signal_processsing_tpu.ops.fir import fir_filter

C, T = 16, 4_194_304
KS = [1025, 2049, 3073, 4097, 6145, 8193]
K_SMALL, K_BIG = 2, 8
REPEATS = 3


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.normal(size=(C, T)).astype(np.float32))

    def make(k_taps, method, k):
        h = jnp.asarray(
            np.hanning(k_taps).astype(np.float32) / (k_taps / 2)
        )

        @jax.jit
        def f(v):
            def body(i, acc):
                y = fir_filter(
                    v + i.astype(jnp.float32) * 1e-12, h, method=method
                )
                return acc + jnp.sum(jnp.abs(y))

            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

        return f

    for k_taps in KS:
        row = {}
        for method in ("direct", "overlap_save_fused"):
            fns = {}
            try:
                for k in (K_SMALL, K_BIG):
                    t0 = time.perf_counter()
                    f = make(k_taps, method, k)
                    np.asarray(f(x))
                    fns[k] = f
                    print(
                        f"  compiled k_taps={k_taps} {method} chain={k}: "
                        f"{time.perf_counter()-t0:.1f}s",
                        flush=True,
                    )
            except Exception as e:
                print(f"  k_taps={k_taps} {method}: {type(e).__name__} {e}",
                      flush=True)
                continue
            best = {k: float("inf") for k in fns}
            for _ in range(REPEATS):
                for k, f in fns.items():
                    t0 = time.perf_counter()
                    np.asarray(f(x))
                    best[k] = min(best[k], time.perf_counter() - t0)
            per = (best[K_BIG] - best[K_SMALL]) / (K_BIG - K_SMALL)
            row[method] = per
            print(
                f"k_taps={k_taps} {method}: {per*1e3:.1f} ms/iter "
                f"({C*T/per/1e9:.2f} GS/s)",
                flush=True,
            )
        if len(row) == 2:
            faster = min(row, key=row.get)
            print(
                f"==> k_taps={k_taps}: {faster} wins "
                f"({row['direct']*1e3:.1f} vs fused {row["overlap_save_fused"]*1e3:.1f} ms)",
                flush=True,
            )


if __name__ == "__main__":
    main()
