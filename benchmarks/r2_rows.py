"""Round-2 on-chip measurement rows: dispatched IIR, hilbert, farrow, ring.

One chip session, K-differential timing throughout (see bench.py). Emits a
JSON row per measurement; results land in BENCH_NOTES.md.

Usage: python benchmarks/r2_rows.py [--rows sosfilt,iir1,hilbert,farrow,ring,osave]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

K_SMALL, K_BIG = 4, 16
REPEATS = 4


def diff_time(fn, xd, k_small=K_SMALL, k_big=K_BIG, repeats=REPEATS):
    import jax

    def chained(k):
        @jax.jit
        def f(v):
            def body(i, y):
                return fn(y)

            return jax.lax.fori_loop(0, k, body, v)

        return f

    def fetch(r):
        np.asarray(r[:8] if r.ndim == 1 else r[0, :8])

    out = {}
    fs = {k: chained(k) for k in (k_small, k_big)}
    for k, g in fs.items():
        fetch(g(xd))  # compile + warm
    for k, g in fs.items():
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            fetch(g(xd))
            best = min(best, time.perf_counter() - t0)
        out[k] = best
    per = (out[k_big] - out[k_small]) / (k_big - k_small)
    return per if per > 0 else out[k_big] / k_big


def row(metric, value, unit, **kw):
    print(json.dumps({"metric": metric, "value": value, "unit": unit, **kw}), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default="sosfilt,iir1,hilbert,farrow,ring,osave")
    args = ap.parse_args()
    rows = set(args.rows.split(","))

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    if "sosfilt" in rows:
        # VERDICT #1 done-criterion: (16, 4M) compiles in seconds, matches
        # scipy, and gains a perf row
        from digital_signal_processsing_tpu.ops.iir import (
            design_butterworth_band,
            sosfilt,
        )

        sos = design_butterworth_band(2, 0.1, 0.4)  # 4 sections
        x = rng.normal(size=(16, 4_000_000)).astype(np.float32)
        xd = jax.device_put(x)
        t0 = time.perf_counter()
        y = sosfilt(sos, xd)
        np.asarray(y[0, :8])
        compile_s = time.perf_counter() - t0
        row("sosfilt_16x4M_compile", round(compile_s, 1), "s")
        try:
            import scipy.signal as sps

            want = sps.sosfilt(sos.astype(np.float64), x[:2], axis=-1)
            got = np.asarray(y[:2])
            rel = float(
                np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
            )
            row("sosfilt_16x4M_scipy_rel_err", rel, "rel")
        except Exception as e:  # pragma: no cover
            row("sosfilt_parity", str(e), "error")
        per = diff_time(lambda v: sosfilt(sos, v), xd)
        row(
            "sosfilt_4sec_16x4M",
            round(16 * 4_000_000 / per / 1e9, 2),
            "GS/s",
            ms=round(per * 1e3, 2),
        )

        from digital_signal_processsing_tpu.ops.iir import sosfilt_pallas

        xf = rng.normal(size=64_000_000).astype(np.float32)
        xfd = jax.device_put(xf)
        per = diff_time(lambda v: sosfilt_pallas(sos, v), xfd)
        row("sosfilt_4sec_64M_flat", round(64e6 / per / 1e9, 2), "GS/s")

    if "iir1" in rows:
        from digital_signal_processsing_tpu.ops.iir import iir_first_order

        xf = rng.normal(size=64_000_000).astype(np.float32)
        xfd = jax.device_put(xf)
        per = diff_time(lambda v: iir_first_order(v, 0.995), xfd)
        row("iir1_dispatched_64M", round(64e6 / per / 1e9, 2), "GS/s")

    if "hilbert" in rows:
        from digital_signal_processsing_tpu.ops.fft import hilbert

        xf = rng.normal(size=64_000_000).astype(np.float32)
        xfd = jax.device_put(xf)
        t0 = time.perf_counter()
        z = hilbert(xfd)  # auto -> fir at 64M
        np.asarray(jnp.real(z)[:8])
        row("hilbert_fir_64M_compile", round(time.perf_counter() - t0, 1), "s")

        def h_im(v):  # feed imag back as input to keep the chain honest
            return jnp.imag(hilbert(v))

        per = diff_time(h_im, xfd)
        row("hilbert_fir_64M", round(64e6 / per / 1e9, 2), "GS/s")

    if "farrow" in rows:
        from digital_signal_processsing_tpu.ops.farrow import resample_farrow

        xf = rng.normal(size=16_000_000).astype(np.float32)
        xfd = jax.device_put(xf)

        for label, rate, method in (
            ("160_147_matmul", (160, 147), "matmul"),
            ("441_2560_matmul", (441, 2560), "matmul"),
            ("160_147_gather", (160, 147), "gather"),
        ):
            def f(v, rate=rate, method=method):
                y = resample_farrow(v, rate, method=method)
                return y[: v.shape[0]] if y.shape[0] >= v.shape[0] else jnp.pad(
                    y, (0, v.shape[0] - y.shape[0])
                )

            per = diff_time(f, xfd)
            row(f"farrow_{label}_16M", round(16e6 / per / 1e9, 2), "GS/s (in)")

    if "ring" in rows:
        # fused in-kernel RDMA vs ppermute halo on the degenerate 1-chip mesh
        from digital_signal_processsing_tpu.parallel.mesh import make_time_mesh
        from digital_signal_processsing_tpu.parallel.sharded_scan import (
            sharded_moving_average,
        )

        tmesh = make_time_mesh()
        x16 = rng.integers(-32768, 32768, size=64_000_000, dtype=np.int16)
        xd = jax.device_put(x16)
        for impl in ("ppermute", "fused_ring"):
            per = diff_time(
                lambda v, impl=impl: sharded_moving_average(
                    v, 1024, 2, mesh=tmesh, halo_impl=impl
                ),
                xd,
            )
            row(f"sharded_windowed_{impl}_64M_k1024", round(64e6 / per / 1e9, 2), "GS/s")

    if "osave_mxu" in rows:
        from digital_signal_processsing_tpu.ops.fft_mxu import overlap_save_mxu
        from digital_signal_processsing_tpu.ops.fir import _pick_block, fir_direct

        sig = rng.normal(size=(16, 4_194_304)).astype(np.float32)
        sd = jax.device_put(sig)
        for k in (1024, 2048, 4096, 8192):
            taps = jnp.asarray(rng.normal(size=k).astype(np.float32))
            per = diff_time(
                lambda v, taps=taps, k=k: overlap_save_mxu(
                    v, taps, block=_pick_block(k)
                ),
                sd,
            )
            row(f"osave_mxu_16x4M_k{k}", round(per * 1e3, 2), "ms")
            per_d = diff_time(lambda v, taps=taps: fir_direct(v, taps), sd)
            row(f"fir_direct_16x4M_k{k}", round(per_d * 1e3, 2), "ms")

    if "osave_fused" in rows:
        from digital_signal_processsing_tpu.ops.fft_mxu import overlap_save_fused
        from digital_signal_processsing_tpu.ops.fir import _pick_block

        sig = rng.normal(size=(16, 4_194_304)).astype(np.float32)
        sd = jax.device_put(sig)
        import jax as _jax

        del _jax, overlap_save_fused  # dispatcher picks the capped block
        from digital_signal_processsing_tpu.ops.fir import fir_filter

        for k in (4096, 8192):
            taps = rng.normal(size=k).astype(np.float32)
            per = diff_time(
                lambda v, taps=taps: fir_filter(
                    v, taps, method="overlap_save_fused"
                ),
                sd,
            )
            row(f"osave_fused_16x4M_k{k}", round(per * 1e3, 2), "ms")

    if "sosfilt_compile" in rows:
        # SMEM-coefficient kernels: compile must be seconds, not 260 s
        from digital_signal_processsing_tpu.ops.iir import (
            design_butterworth_band,
            sosfilt,
        )

        sos = design_butterworth_band(2, 0.1, 0.4)
        x = rng.normal(size=(16, 4_000_000)).astype(np.float32)
        xd = jax.device_put(x)
        t0 = time.perf_counter()
        np.asarray(sosfilt(sos, xd)[0, :8])
        row("sosfilt_smem_16x4M_compile", round(time.perf_counter() - t0, 1), "s")
        # a DIFFERENT filter must reuse the compiled kernel (no recompile)
        sos2 = design_butterworth_band(2, 0.2, 0.3)
        t0 = time.perf_counter()
        np.asarray(sosfilt(sos2, xd)[0, :8])
        row("sosfilt_smem_second_filter", round(time.perf_counter() - t0, 1), "s")

    if "osave" in rows:
        # component profile of the overlap-save FIR (why flat ~38 ms?)
        from digital_signal_processsing_tpu.ops.fir import (
            _next_pow2_overlap,
            _pick_block,
            fir_overlap_save,
        )
        from digital_signal_processsing_tpu.utils.layout import overlapping_frames

        sig = rng.normal(size=(16, 4_194_304)).astype(np.float32)
        sd = jax.device_put(sig)
        for k in (1024, 8192):
            taps = jnp.asarray(rng.normal(size=k).astype(np.float32))
            per = diff_time(lambda v, taps=taps: fir_overlap_save(v, taps), sd)
            row(f"osave_16x4M_k{k}", round(per * 1e3, 2), "ms")

            # pieces: segs build / rfft / pointwise / irfft
            L = _pick_block(k)
            nfft = L + _next_pow2_overlap(k)
            nblocks = -(-sig.shape[-1] // L)

            @jax.jit
            def segs_only(v, L=L, nfft=nfft, nblocks=nblocks, k=k):
                pad = jnp.pad(v, ((0, 0), (k - 1, nfft)))
                return overlapping_frames(pad, nblocks, L, nfft)

            def seg_probe(v, segs_only=segs_only):
                # shape-preserving for the chained timer; the 1e-20-scaled
                # reduction keeps the frames build from being DCE'd
                s = segs_only(v)
                return v + jnp.sum(s, axis=(1, 2))[:, None] * jnp.float32(1e-20)

            per_s = diff_time(seg_probe, sd, k_small=2, k_big=6)
            row(f"osave_segs_k{k}", round(per_s * 1e3, 2), "ms")

            segs = segs_only(sd)

            @jax.jit
            def fft_only(s):
                return jnp.fft.irfft(jnp.fft.rfft(s, axis=-1), n=s.shape[-1], axis=-1)

            per_f = diff_time(fft_only, segs, k_small=2, k_big=6)
            row(f"osave_fftpair_k{k}", round(per_f * 1e3, 2), "ms",
                nfft=nfft, nblocks=nblocks)


if __name__ == "__main__":
    main()
