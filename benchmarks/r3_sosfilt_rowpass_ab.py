"""Round-3 A/B: fused sosfilt COMPACT row pass (scan on a (rows/128, 128)
relayout) vs the broadcast-tile row pass, crossed with both lane passes.
K-differential, strictly interleaved. The broadcast pass runs log2(rows)
doubling levels on full (rows, 128) tiles carrying one scalar pair per
row — at rows=512 the kernel's largest VPU term — so the compact pass is
the remaining structural lever after the r3 tile sweep (BENCH_NOTES)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import scipy.signal as sps

from digital_signal_processsing_tpu.ops.iir import sosfilt_pallas_fused

C, T = 16, 4_000_000


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
    sos = sps.butter(8, 0.2, output="sos").astype(np.float32)
    x = jax.device_put(rng.normal(size=(C, T)).astype(np.float32))

    fns = {
        "vpu+compact": lambda v: sosfilt_pallas_fused(
            sos, v, row_pass="compact"
        ),
        "vpu+bcast": lambda v: sosfilt_pallas_fused(sos, v),
        "mxu+compact": lambda v: sosfilt_pallas_fused(
            sos, v, lane_pass="mxu", row_pass="compact"
        ),
        "mxu+bcast": lambda v: sosfilt_pallas_fused(sos, v, lane_pass="mxu"),
    }
    for name, fn in fns.items():
        t0 = time.perf_counter()
        np.asarray(fn(x)[:1, :8])
        print(f"compile+first {name}: {time.perf_counter()-t0:.1f}s", flush=True)

    ref = sps.sosfilt(
        sos.astype(np.float64), np.asarray(x[:2, :100000], np.float64)
    )
    for lp in ("vpu", "mxu"):
        got = np.asarray(
            sosfilt_pallas_fused(
                sos, x[:2, :100000], lane_pass=lp, row_pass="compact"
            )
        )
        err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        print(f"{lp}+compact on-chip parity: {err:.2e}", flush=True)

    for rep in range(3):
        row = {n: C * T / kdiff(f, x) / 1e9 for n, f in fns.items()}
        print(
            f"rep {rep}: "
            + "  ".join(f"{k}={v:.2f} GS/s" for k, v in row.items()),
            flush=True,
        )

    # --- time-varying cascade: same A/B at a smaller config (the 5S
    # coefficient planes multiply HBM traffic; (4, 1M)/2 sections)
    from digital_signal_processsing_tpu.ops.iir import sosfilt_tv_fused

    Ct, Tt = 4, 1_000_000
    rr = 0.5 + 0.3 * np.sin(np.linspace(0, 6, Tt))
    rowc = np.stack(
        [np.full(Tt, 0.3), np.full(Tt, 0.1), np.full(Tt, 0.05),
         np.ones(Tt), -1.6 * rr, rr * rr], -1
    ).astype(np.float32)
    sos_t = np.stack([rowc, 0.9 * rowc], 0)
    xt = jax.device_put(rng.normal(size=(Ct, Tt)).astype(np.float32))
    tv_fns = {
        "tv+compact": lambda v: sosfilt_tv_fused(
            sos_t, v, row_pass="compact"
        ),
        "tv+bcast": lambda v: sosfilt_tv_fused(sos_t, v),
    }
    for name, fn in tv_fns.items():
        t0 = time.perf_counter()
        np.asarray(fn(xt)[:1, :8])
        print(f"compile+first {name}: {time.perf_counter()-t0:.1f}s", flush=True)
    for rep in range(3):
        row = {n: Ct * Tt / kdiff(f, xt) / 1e9 for n, f in tv_fns.items()}
        print(
            f"tv rep {rep}: "
            + "  ".join(f"{k}={v:.2f} GS/s" for k, v in row.items()),
            flush=True,
        )


if __name__ == "__main__":
    main()
