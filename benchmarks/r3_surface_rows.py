"""On-chip throughput rows for the round-3 surface additions.

K-differential protocol (BENCH_NOTES Methodology): two chained jit
lengths per config, fetch-fenced, slope = per-iteration time. Configs:

- sosfilt_tv: 4-section time-varying cascade at (16, 4M) — measures the
  5-plane coefficient traffic premium over the fused fixed-coefficient
  kernel (same shape baseline in BENCH_r02/r03 rows).
- lpc_synthesis: order-12, 256-sample frames, 16M total samples — the
  frame-parallel all-pole path.
- cwt: ricker bank, 16 widths, 1M samples — the batched MXU correlation
  bank.

Run serially after r3_onchip_all.sh (never in parallel with another TPU
client).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

K_SMALL, K_BIG = 4, 12
REPEATS = 3
CRASHES = 0


def row(name, fn, *args):
    """Per-row crash isolation (reference run_benchmarks.py:93-97): one
    failing config must not cost the remaining rows — the r3 run lost six
    rows to a single HTTP 413 (logs/r3_onchip/summary.log)."""
    global CRASHES
    import traceback

    try:
        fn(name, *args)
    except Exception:
        CRASHES += 1
        print(f"CRASH {name}:", flush=True)
        traceback.print_exc()


def k_diff(name, make_fn, arg, work_items):
    fns = {}
    for k in (K_SMALL, K_BIG):
        t0 = time.perf_counter()
        f = make_fn(k)
        np.asarray(jax.tree_util.tree_leaves(f(arg))[0].ravel()[:8])
        fns[k] = f
        print(f"  compiled {name} k={k}: {time.perf_counter()-t0:.1f}s", flush=True)
    best = {k: float("inf") for k in fns}
    for _ in range(REPEATS):
        for k, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(f(arg))[0].ravel()[:8])
            best[k] = min(best[k], time.perf_counter() - t0)
    per = (best[K_BIG] - best[K_SMALL]) / (K_BIG - K_SMALL)
    print(
        f"{name}: {work_items / per / 1e9:.3f} GS/s "
        f"(t{K_SMALL}={best[K_SMALL]:.3f}s t{K_BIG}={best[K_BIG]:.3f}s)",
        flush=True,
    )


def main() -> None:
    from digital_signal_processsing_tpu.ops import iir, lpc, wavelets

    rng = np.random.default_rng(0)

    # --- sosfilt_tv ------------------------------------------------------
    c, t = 16, 4_000_000
    x = jnp.asarray(rng.standard_normal((c, t)), jnp.float32)
    r = 0.5 + 0.4 * np.sin(np.linspace(0, 20, t))
    th = 0.3 + 0.2 * np.cos(np.linspace(0, 15, t))
    coef_row = np.stack(
        [np.full(t, 0.3), 0.1 * np.sin(np.linspace(0, 5, t)),
         np.full(t, 0.05), np.ones(t), -2 * r * np.cos(th), r * r], -1
    )
    sos_t = jnp.asarray(np.stack([coef_row] * 4, 0), jnp.float32)

    def make_tv(method):
        # sos_t is 384 MB — MUST ride as a jit argument, not a closure
        # constant (closure constants are embedded in the program and blow
        # the remote-compile request past HTTP 413).
        def mk(k):
            @jax.jit
            def chained(arg):
                v, s = arg
                def body(i, y):
                    return iir.sosfilt_tv(s, y, method=method)

                return jax.lax.fori_loop(0, k, body, v)

            return chained

        return mk

    # interleaved A/B: fused cascade (default) vs per-section scan anchor
    row("sosfilt_tv 4sec fused (16,4M)", k_diff, make_tv("fused"), (x, sos_t), c * t)
    row("sosfilt_tv 4sec scan  (16,4M)", k_diff, make_tv("scan"), (x, sos_t), c * t)

    # --- lpc_synthesis ---------------------------------------------------
    order, frame, nf, streams = 12, 256, 512, 128  # 16.8M samples total
    poles = 0.9 * np.exp(1j * rng.uniform(0.1, np.pi - 0.1, (streams, nf, order // 2)))
    a = np.stack(
        [
            [np.poly(np.concatenate([p, p.conj()])).real for p in stream]
            for stream in poles
        ]
    ).astype(np.float32)
    gain = np.ones((streams, nf), np.float32)
    e = jnp.asarray(rng.standard_normal((streams, nf * frame)), jnp.float32)
    aj, gj = jnp.asarray(a), jnp.asarray(gain)

    def make_lpc(k):
        @jax.jit
        def chained(v):
            def body(i, y):
                return lpc.lpc_synthesis(aj, gj, y, frame)

            return jax.lax.fori_loop(0, k, body, v)

        return chained

    row(
        f"lpc_synthesis p={order} ({streams}x{nf}x{frame})",
        k_diff,
        make_lpc,
        e,
        streams * nf * frame,
    )

    # --- cwt ricker bank -------------------------------------------------
    n = 1_000_000
    widths = list(range(1, 17))
    xc = jnp.asarray(rng.standard_normal(n), jnp.float32)

    def make_cwt(k):
        @jax.jit
        def chained(v):
            def body(i, y):
                out = wavelets.cwt(y, wavelets.ricker, widths)
                return out[0] * 0.0 + y  # keep signature; force the bank

            return jax.lax.fori_loop(0, k, body, v)

        return chained

    row(f"cwt ricker x{len(widths)} (1M)", k_diff, make_cwt, xc, n * len(widths))

    # --- radar detect chain ----------------------------------------------
    # One CPI: 64 pulses x 1M range samples (row width kept ~1M — the conv
    # planner pathology bound, BENCH_NOTES r2). Full chain = batched MXU
    # matched filter + Doppler FFT + 2-D box-sum CFAR.
    from digital_signal_processsing_tpu.models import radar

    cfg = radar.RadarConfig(
        n_pulses=64, n_range=1 << 20, pulse_len=128, guard=(2, 4), train=(4, 16)
    )
    ri = jnp.asarray(rng.standard_normal((cfg.n_pulses, cfg.n_range)), jnp.float32)
    rq = jnp.asarray(rng.standard_normal((cfg.n_pulses, cfg.n_range)), jnp.float32)

    def make_radar(k):
        # rq is 256 MB — jit argument, not a closure constant (HTTP 413)
        @jax.jit
        def chained(arg):
            v, q = arg
            def body(i, y):
                det, power, _ = radar.detect(cfg, y, q)
                # fold the result back so the loop carries the input shape
                return y + 0.0 * jnp.pad(
                    power, ((0, 0), (0, cfg.n_range - cfg.n_bins))
                )

            return jax.lax.fori_loop(0, k, body, v)

        return chained

    row(
        f"radar detect ({cfg.n_pulses}x{cfg.n_range})",
        k_diff,
        make_radar,
        (ri, rq),
        cfg.n_pulses * cfg.n_range,
    )

    # --- mfcc feature extraction ------------------------------------------
    # 8 channels x 2M samples, nfft=512/hop=256/80 mels/13 ceps — the
    # ASR front-end config class; spectrogram rides the MXU DFT, mel+DCT
    # are two dense matmuls.
    from digital_signal_processsing_tpu.ops import mel

    cm, tm = 8, 2_000_000
    xm = jnp.asarray(rng.standard_normal((cm, tm)), jnp.float32)

    def make_mfcc(k):
        @jax.jit
        def chained(v):
            def body(i, y):
                c13 = mel.mfcc(
                    y, sample_rate=16000.0, n_mfcc=13, nfft=512, hop=256,
                    n_mels=80,
                )
                return y + 0.0 * c13.sum()

            return jax.lax.fori_loop(0, k, body, v)

        return chained

    row(f"mfcc nfft=512 ({cm}x{tm})", k_diff, make_mfcc, xm, cm * tm)

    # --- cic decimation -----------------------------------------------------
    # 16x CIC (N=4) over 2x16M — the DDC first stage as one boxcar^4 FIR
    # (k=61 taps, direct MXU engine) + strided slice.
    from digital_signal_processsing_tpu.ops import cic as _cic

    cc, tc2 = 2, 16_000_000
    xcic = jnp.asarray(rng.standard_normal((cc, tc2)), jnp.float32)

    def make_cic(k):
        @jax.jit
        def chained(v):
            def body(i, y):
                out = _cic.cic_decimate(y, 16, n_stages=4)
                return y + 0.0 * out.sum()

            return jax.lax.fori_loop(0, k, body, v)

        return chained

    row(f"cic_decimate R=16 N=4 ({cc}x{tc2})", k_diff, make_cic, xcic, cc * tc2)

    print(f"DONE crashes={CRASHES}", flush=True)


if __name__ == "__main__":
    main()
