"""Round-4: LPC synthesis — two-pass Pallas kernel vs the scan spelling.

The surface row (r4_surface_rows) read 0.744 GS/s for the scan spelling at
128 streams x 512 frames x 256 samples / p=12: the zero-input basis W is
an 800 MB materialization and the 256-step lax.scan carries ~3 GB of state
round trips. The kernel holds the p-deep history in VMEM across a
sequential time grid (pass 1 zero-state ends -> exact log-depth frame
compose -> pass 2 seeded). On-chip parity vs the scan spelling + A/B.
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


def k_diff(name, make, x, work, klo=4, khi=12, reps=3):
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
        f"{name}: {work/per/1e9:.3f} GS/s = {per*1e3:.2f} ms/call "
        f"(t{klo}={best[klo]:.3f}s t{khi}={best[khi]:.3f}s)",
        flush=True,
    )


def main() -> None:
    assert jax.default_backend() == "tpu"
    from digital_signal_processsing_tpu.ops import lpc

    rng = np.random.default_rng(7)
    S, F, L, p = 128, 512, 256, 12
    # STABLE per-frame polynomials (the first run used raw uniform
    # coefficients — 7% of those frames had poles OUTSIDE the unit
    # circle, an unphysical regime where every engine legitimately
    # diverges; levinson-produced LPC polynomials are minimum-phase, so
    # the bench draws poles with radius <= 0.93 like a real vocoder)
    radii = rng.uniform(0.5, 0.93, (S, F, p // 2))
    angs = rng.uniform(0.05, np.pi - 0.05, (S, F, p // 2))
    poles = radii * np.exp(1j * angs)
    a = np.empty((S, F, p + 1), np.float32)
    flat = poles.reshape(-1, p // 2)
    coeffs = np.empty((flat.shape[0], p + 1))
    for i in range(flat.shape[0]):
        coeffs[i] = np.poly(np.concatenate([flat[i], flat[i].conj()])).real
    a[:] = coeffs.reshape(S, F, p + 1).astype(np.float32)
    g = rng.uniform(0.5, 2.0, (S, F)).astype(np.float32)
    e = rng.standard_normal((S, F * L)).astype(np.float32)
    ad, gd, ed = jnp.asarray(a), jnp.asarray(g), jnp.asarray(e)
    e = np.asarray(e)
    work = S * F * L

    def parity():
        # vs the float64 sequential golden on a small slice — comparing
        # engines to each other is meaningless where the compose path
        # (scan/pallas) hits its documented f32 conditioning wall (at
        # L=256 even radius-0.93 companion powers overflow; BENCH_NOTES
        # "LPC synthesis rebuilt"). refine must hit the f32 floor; the
        # compose engines' errors are REPORTED, not asserted.
        S2, F2 = 2, 16
        a2, g2, e2 = a[:S2, :F2], g[:S2, :F2], e[:S2, : F2 * L]
        refs = np.stack(
            [lpc.lpc_synthesis_ref(a2[s_], g2[s_], e2[s_], L) for s_ in range(S2)]
        )
        scale = np.abs(refs).max()
        for m in ("refine", "pallas", "scan"):
            got = np.asarray(
                lpc.lpc_synthesis(
                    jnp.asarray(a2), jnp.asarray(g2), jnp.asarray(e2), L,
                    method=m,
                )
            )
            err = np.abs(got - refs).max() / scale
            print(f"on-chip {m}-vs-float64-golden: {err:.2e}", flush=True)
            if m == "refine":
                # the sequential f32 filter itself reads 6.2e-4 vs f64 at
                # this radius-0.93/p=12 resonance (CPU check) — that is
                # the floor refine must sit at, not 1e-5-land
                assert err < 5e-3, (m, err)

    row("parity", parity)

    def make(method):
        def mk(k):
            @jax.jit
            def chained(v):
                def body(i, acc):
                    y = lpc.lpc_synthesis(
                        ad, gd, v + i.astype(jnp.float32) * 1e-12, L,
                        method=method,
                    )
                    return acc + jnp.sum(jnp.abs(y[..., :8]))

                return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

            return chained

        return mk

    for method in ("pallas", "refine", "scan"):
        row(
            f"lpc_synthesis {method}",
            lambda m=method: k_diff(
                f"lpc_synthesis p=12 (128x512x256) {m}", make(m), ed, work
            ),
        )

    print(f"DONE crashes={CRASHES}", flush=True)


if __name__ == "__main__":
    main()
