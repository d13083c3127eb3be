"""Round-4: direct (banded-MXU conv) vs FFT correlate, on chip.

The matched-filter primitive (ops.correlate.correlate_complex) always ran
ONE padded pow2 DFT round trip — nfft = 2M for the radar CPI's (64, 1M)
fast-time axis with a 128-tap chirp, i.e. three 2M-point transforms for a
template 16384x shorter than the stream. The direct path lowers the
reversed conjugated template onto ops.fir.blocked_causal_conv (the
lane-blocked banded spelling that took the CWT bank 0.078 -> 17.1 GS/s).
This A/B sets DIRECT_MAX_TAPS / DIRECT_MIN_STREAM from measurement and
re-measures the radar detect chain end to end on the new auto. Also
includes small-shape parity probes (a scratch CPU-parity script that
accidentally ran against the chip read a wrong direct result at
(3, 300)/k=7 — resolve whether that reproduces under a clean client).
Crash-isolated per row; run serially, never beside another TPU client.
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

    rng = np.random.default_rng(5)

    # --- parity probes (direct vs float64 numpy), small + large ----------
    def parity():
        for ta, tv, batch in [(300, 7, 3), (1024, 128, 2), (65536 * 4, 128, 2)]:
            a = rng.standard_normal((batch, ta)).astype(np.float32)
            v = rng.standard_normal(tv).astype(np.float32)
            for mode in ("full", "same", "valid"):
                want = np.stack(
                    [
                        np.correlate(
                            r.astype(np.float64), v.astype(np.float64), mode
                        )
                        for r in a
                    ]
                )
                got = np.asarray(
                    C.correlate(
                        jnp.asarray(a), jnp.asarray(v), mode, method="direct"
                    )
                )
                err = np.abs(got - want).max() / (np.abs(want).max() + 1e-12)
                assert err < 5e-6, (ta, tv, mode, err)
        ac = rng.standard_normal((2, 100000)) + 1j * rng.standard_normal((2, 100000))
        vc = rng.standard_normal(128) + 1j * rng.standard_normal(128)
        want = np.stack([np.correlate(r, vc, "valid") for r in ac])
        fr, fi = C.correlate_complex(
            jnp.asarray(ac.real, jnp.float32),
            jnp.asarray(ac.imag, jnp.float32),
            jnp.asarray(vc.real, jnp.float32),
            jnp.asarray(vc.imag, jnp.float32),
            "valid",
            method="direct",
        )
        got = np.asarray(fr) + 1j * np.asarray(fi)
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-12)
        assert err < 5e-6, ("complex valid", err)
        print("on-chip direct parity vs numpy float64: OK (incl. (3,300)/k=7)")

    row("parity", parity)

    # --- throughput: complex correlate, radar-class shapes ----------------
    B, T = 64, 1 << 20
    ar = jnp.asarray(rng.standard_normal((B, T)), jnp.float32)
    ai = jnp.asarray(rng.standard_normal((B, T)), jnp.float32)

    def make_cc(tv, method):
        vr = jnp.asarray(rng.standard_normal(tv), jnp.float32)
        vi = jnp.asarray(rng.standard_normal(tv), jnp.float32)

        def mk(k):
            @jax.jit
            def chained(arg):
                x, y = arg

                def body(i, acc):
                    fr, fi = C.correlate_complex(
                        x + i.astype(jnp.float32) * 1e-12,
                        y,
                        vr,
                        vi,
                        "valid",
                        method=method,
                    )
                    return acc + jnp.sum(jnp.abs(fr[..., :8])) + jnp.sum(
                        jnp.abs(fi[..., :8])
                    )

                return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

            return chained

        return mk

    for tv in (128, 1024, 4096):
        for method in ("direct", "xla"):
            row(
                f"cc tv={tv} {method} (64x1M)",
                lambda tv=tv, m=method: k_diff(
                    f"cc tv={tv} {m} (64x1M)", make_cc(tv, m), (ar, ai), B * T
                ),
            )

    # --- throughput: real correlate (16, 4M), tv=257 ----------------------
    xr = jnp.asarray(rng.standard_normal((16, 1 << 22)), jnp.float32)

    def make_rc(tv, method):
        v = jnp.asarray(rng.standard_normal(tv), jnp.float32)

        def mk(k):
            @jax.jit
            def chained(x):
                def body(i, acc):
                    out = C.correlate(
                        x + i.astype(jnp.float32) * 1e-12, v, "same",
                        method=method,
                    )
                    return acc + jnp.sum(jnp.abs(out[..., :8]))

                return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

            return chained

        return mk

    for method in ("direct", "xla"):
        row(
            f"rc tv=257 {method} (16x4M)",
            lambda m=method: k_diff(
                f"rc tv=257 {m} (16x4M)", make_rc(257, m), xr, 16 * (1 << 22)
            ),
        )

    # --- radar detect end to end on the new auto ---------------------------
    from digital_signal_processsing_tpu.models import radar

    cfg = radar.RadarConfig(
        n_pulses=64, n_range=1 << 20, pulse_len=128, guard=(2, 4), train=(4, 16)
    )
    ri = jnp.asarray(rng.standard_normal((cfg.n_pulses, cfg.n_range)), jnp.float32)
    rq = jnp.asarray(rng.standard_normal((cfg.n_pulses, cfg.n_range)), jnp.float32)

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
        "radar detect (64x1M) new auto",
        lambda: k_diff(
            "radar detect (64x1M) new auto",
            make_radar,
            (ri, rq),
            cfg.n_pulses * cfg.n_range,
            klo=4,
            khi=12,
        ),
    )

    print(f"DONE crashes={CRASHES}", flush=True)


if __name__ == "__main__":
    main()
