"""Round-5: where does the frame-aware TV kernel's time go?

The first A/B (r5_tv_frames_ab.log) read 0.675 GS/s frames vs 0.449
expand (1.50x) at (16, 4M)/4 sections/frame 1024 — short of the >=2x
target, and SLOWER than the r4 per-sample-planes row (0.90), meaning the
in-kernel machinery, not coefficient DMA, binds. Variants probed here:

  - concat-matmul expansion (one (rows, fpt) @ (fpt, S*640) selection
    matmul per tile instead of one per section)
  - row_pass compact vs bcast for the frames kernel
  - tile_rows 256 / 512 / 1024 (grid-step amortization)
  - frame_len 32768 (fpt = 1: expansion is a broadcast, no matmul at
    all — isolates the expansion matmul's cost)
  - anchor: sosfilt_tv on per-sample rows (the r4 0.90 GS/s row)

Run serially, under timeout.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def make_frame_schedule(nsec, nf, seed=0):
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


def k_diff(name, build, x, work, klo=2, khi=6, reps=3):
    import traceback

    try:
        fns = {}
        for k in (klo, khi):
            f = build(k)
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
            f"{name}: {work/per/1e9:.3f} GS/s = {per*1e3:.2f} ms/call",
            flush=True,
        )
        return work / per / 1e9
    except Exception:
        print(f"CRASH {name}:", flush=True)
        traceback.print_exc()
        return float("nan")


def main() -> None:
    assert jax.default_backend() == "tpu"
    from digital_signal_processsing_tpu.ops import iir

    C, T, S = 16, 4 * 1024 * 1024, 4
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32))
    work = C * T

    def frames_build(fl, tile_rows, row_pass):
        sos_fr = jnp.asarray(make_frame_schedule(S, T // fl))

        def build(k):
            @jax.jit
            def f(x):
                def body(y, _):
                    return (
                        iir.sosfilt_tv_frames(
                            sos_fr, y, fl, tile_rows=tile_rows,
                            method="frames", row_pass=row_pass,
                        ),
                        None,
                    )

                y, _ = jax.lax.scan(body, x, None, length=k)
                return y

            return f

        return build

    # anchor: per-sample planes (the r4 row)
    sos_t = jnp.asarray(
        np.repeat(make_frame_schedule(S, T // 1024), 1024, axis=1)
    )

    def persample_build(k):
        @jax.jit
        def f(x):
            def body(y, _):
                return iir.sosfilt_tv(sos_t, y), None

            y, _ = jax.lax.scan(body, x, None, length=k)
            return y

        return f

    results = {}
    results["frames fl=1024 tr=256 compact"] = k_diff(
        "frames fl=1024 tr=256 compact", frames_build(1024, 256, "compact"),
        x, work,
    )
    results["frames fl=1024 tr=256 bcast"] = k_diff(
        "frames fl=1024 tr=256 bcast", frames_build(1024, 256, "bcast"),
        x, work,
    )
    results["frames fl=1024 tr=512 compact"] = k_diff(
        "frames fl=1024 tr=512 compact", frames_build(1024, 512, "compact"),
        x, work,
    )
    results["frames fl=1024 tr=1024 compact"] = k_diff(
        "frames fl=1024 tr=1024 compact",
        frames_build(1024, 1024, "compact"), x, work,
    )
    results["frames fl=32768 tr=256 compact (fpt=1)"] = k_diff(
        "frames fl=32768 tr=256 compact (fpt=1)",
        frames_build(32768, 256, "compact"), x, work,
    )
    results["persample planes (r4 anchor)"] = k_diff(
        "persample planes (r4 anchor)", persample_build, x, work
    )
    print("\nSUMMARY GS/s:", flush=True)
    for k, v in results.items():
        print(f"  {k}: {v:.3f}", flush=True)


if __name__ == "__main__":
    main()
