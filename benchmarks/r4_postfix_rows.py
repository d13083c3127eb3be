"""Round-4: re-measure the rows whose spelling changed with the
ragged-pad miscompile guard.

- cwt ricker x16 (1M): ext = 1M + 159 is ragged -> the barrier now sits
  in its jitted path (r4_cwt_recheck measured 17.124 pre-guard).
- correlate_complex direct tv=128 (64, 1M) + radar detect: the direct
  path now pads to whole frames instead of n = ta + tv - 1 (ragged), so
  the compiled program differs from the r4_correlate_direct_ab rows.
Run serially.
"""

from __future__ import annotations

import sys
import time
import traceback

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

CRASHES = 0


def row(name, fn):
    global CRASHES
    try:
        fn()
    except Exception:
        CRASHES += 1
        print(f"CRASH {name}:", flush=True)
        traceback.print_exc()


def k_diff(name, make, x, work, klo=2, khi=6, reps=3):
    fns = {}
    for k in (klo, khi):
        f = make(k)
        t0 = time.perf_counter()
        np.asarray(f(x))
        print(f"  compiled {name} k={k}: {time.perf_counter()-t0:.1f}s", flush=True)
        fns[k] = f
    best = {k: float("inf") for k in fns}
    for _ in range(reps):
        for k, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f(x))
            best[k] = min(best[k], time.perf_counter() - t0)
    per = (best[khi] - best[klo]) / (khi - klo)
    print(
        f"{name}: {work/per/1e9:.3f} GS/s (t{klo}={best[klo]:.3f}s "
        f"t{khi}={best[khi]:.3f}s)",
        flush=True,
    )


def main() -> None:
    assert jax.default_backend() == "tpu"
    from digital_signal_processsing_tpu.ops import correlate as C
    from digital_signal_processsing_tpu.ops import wavelets

    rng = np.random.default_rng(5)

    # --- cwt (guarded ragged path) ----------------------------------------
    n = 1_000_000
    widths = list(range(1, 17))
    xc = jnp.asarray(rng.standard_normal(n), jnp.float32)

    def make_cwt(k):
        @jax.jit
        def chained(v):
            def body(i, y):
                out = wavelets.cwt(y, wavelets.ricker, widths)
                return out[0] * 0.0 + y

            return jax.lax.fori_loop(0, k, body, v)

        return chained

    row(
        "cwt ricker x16 (1M) guarded",
        lambda: k_diff(
            "cwt ricker x16 (1M) guarded", make_cwt, xc, n * len(widths),
            klo=4, khi=12,
        ),
    )

    # --- correlate direct tv=128 (whole-frame pad) -------------------------
    B, T = 64, 1 << 20
    ar = jnp.asarray(rng.standard_normal((B, T)), jnp.float32)
    ai = jnp.asarray(rng.standard_normal((B, T)), jnp.float32)
    vr = jnp.asarray(rng.standard_normal(128), jnp.float32)
    vi = jnp.asarray(rng.standard_normal(128), jnp.float32)

    def make_cc(k):
        @jax.jit
        def chained(arg):
            x, y = arg

            def body(i, acc):
                fr, fi = C.correlate_complex(
                    x + i.astype(jnp.float32) * 1e-12, y, vr, vi, "valid",
                    method="direct",
                )
                return acc + jnp.sum(jnp.abs(fr[..., :8])) + jnp.sum(
                    jnp.abs(fi[..., :8])
                )

            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

        return chained

    row(
        "cc tv=128 direct wholeframe (64x1M)",
        lambda: k_diff(
            "cc tv=128 direct wholeframe (64x1M)", make_cc, (ar, ai), B * T
        ),
    )

    # --- radar detect end to end -------------------------------------------
    from digital_signal_processsing_tpu.models import radar

    cfg = radar.RadarConfig(
        n_pulses=64, n_range=1 << 20, pulse_len=128, guard=(2, 4), train=(4, 16)
    )

    def make_radar(k):
        @jax.jit
        def chained(arg):
            v, q = arg

            def body(i, y):
                det, power, _ = radar.detect(cfg, y, q)
                return y + 0.0 * jnp.pad(
                    power, ((0, 0), (0, cfg.n_range - cfg.n_bins))
                )

            return jax.lax.fori_loop(0, k, body, v)

        return chained

    row(
        "radar detect (64x1M) wholeframe",
        lambda: k_diff(
            "radar detect (64x1M) wholeframe", make_radar, (ar, ai),
            cfg.n_pulses * cfg.n_range, klo=4, khi=12,
        ),
    )

    print(f"DONE crashes={CRASHES}", flush=True)


if __name__ == "__main__":
    main()
