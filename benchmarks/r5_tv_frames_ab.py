"""Round-5 item 1: frame-aware TV-coefficient kernel vs the expanded path.

The r4 roofline table's slowest row is sosfilt_tv (0.54-0.90 GS/s, 8% of
the copy ceiling), HBM-bound on 5 per-sample coefficient planes (20 of
28 B/sample) — and `sosfilt_tv_frames` (the common vocoder/LPC-envelope
automation case) literally jnp.repeat-ed per-frame rows into those
planes. The frame-aware kernel ships one 640-lane row per frame and
expands in VMEM (one exact selection matmul per section per tile),
cutting mandatory coefficient traffic frame_len/128 x.

A/B at the verdict's config: (16, 4M) x 4 sections, frame-wise schedule
(frame_len=1024). K-diff protocol (lax.scan-chained reps, slope between
k_lo/k_hi). Run serially, under timeout.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def make_frame_schedule(nsec, nf, seed):
    rng = np.random.default_rng(seed)
    f = np.linspace(0, 3, nf)
    rows = []
    for s in range(nsec):
        r = 0.5 + 0.4 * np.sin(f + s)
        th = 0.3 + 0.2 * np.cos(2 * f + s)
        rows.append(
            np.stack(
                [
                    np.full(nf, 0.3),
                    0.1 * np.sin(5 * f),
                    np.full(nf, 0.05),
                    np.full(nf, 1.0),
                    -2 * r * np.cos(th),
                    r**2,
                ],
                -1,
            )
        )
    return np.stack(rows, 0).astype(np.float32)


def k_diff(name, make, x, work, klo=2, khi=6, reps=3):
    fns = {}
    for k in (klo, khi):
        f = make(k)
        t0 = time.perf_counter()
        np.asarray(f(x))
        print(
            f"  compiled {name} k={k}: {time.perf_counter()-t0:.1f}s",
            flush=True,
        )
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
    return work / per / 1e9


def main() -> None:
    assert jax.default_backend() == "tpu"
    from digital_signal_processsing_tpu.ops import iir

    C, T, S, FL = 16, 4 * 1024 * 1024, 4, 1024
    NF = T // FL
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32))
    sos_fr = jnp.asarray(make_frame_schedule(S, NF, 0))
    work = C * T

    # parity first (single calls)
    import functools

    @functools.partial(jax.jit, static_argnames=("method",))
    def one(x, method):
        return iir.sosfilt_tv_frames(sos_fr, x, FL, method=method)

    t0 = time.perf_counter()
    y_f = np.asarray(one(x, "frames"))
    print(f"frames cold call: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    y_e = np.asarray(one(x, "expand"))
    print(f"expand cold call: {time.perf_counter()-t0:.1f}s", flush=True)
    scale = np.max(np.abs(y_e)) + 1e-9
    err = np.max(np.abs(y_f - y_e)) / scale
    print(f"parity frames vs expand: {err:.3e}", flush=True)
    assert err < 1e-5, err
    del y_f, y_e

    def make(method):
        def build(k):
            @jax.jit
            def f(x):
                def body(y, _):
                    return (
                        iir.sosfilt_tv_frames(sos_fr, y, FL, method=method),
                        None,
                    )

                y, _ = jax.lax.scan(body, x, None, length=k)
                return y

            return f

        return build

    g_f = k_diff("tv_frames[frames]", make("frames"), x, work)
    g_e = k_diff("tv_frames[expand]", make("expand"), x, work)
    print(f"SPEEDUP frames/expand: {g_f/g_e:.2f}x", flush=True)


if __name__ == "__main__":
    main()
