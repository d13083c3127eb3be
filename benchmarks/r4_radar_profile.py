"""Round-4: radar detect stage profile + re-measure after separable CFAR.

After the correlate-direct flip the chain read 1.309 GS/s (51 ms/call at
64x1M): matched filter ~15 ms, leaving ~36 ms in doppler+CFAR+|.|^2. The
round-3 ca_cfar ran FOUR dense 2-D convs (533 taps at this config)
through a single-feature conv — the 1/128-MXU pattern the CWT fix
removed elsewhere. Now: separable banded-matmul x boxcar-FIR sums +
closed-form counts. Stages + end-to-end, same session. Run serially.
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
    from digital_signal_processsing_tpu.models import radar

    rng = np.random.default_rng(5)
    cfg = radar.RadarConfig(
        n_pulses=64, n_range=1 << 20, pulse_len=128, guard=(2, 4), train=(4, 16)
    )
    ri = jnp.asarray(rng.standard_normal((cfg.n_pulses, cfg.n_range)), jnp.float32)
    rq = jnp.asarray(rng.standard_normal((cfg.n_pulses, cfg.n_range)), jnp.float32)
    work = cfg.n_pulses * cfg.n_range

    # parity: detections identical to a CPU-golden threshold on a slice
    def parity():
        sl = (slice(None), slice(0, 4096))
        rc = radar.pulse_compress(cfg, ri[:, :8192], rq[:, :8192])
        power = radar.doppler_map(cfg, rc)
        det, thr = radar.ca_cfar(
            power, guard=cfg.guard, train=cfg.train, pfa=cfg.pfa
        )
        # golden: float64 dense 2-D box sums on host
        pw = np.asarray(power).astype(np.float64)
        d, r = pw.shape
        gd, gr = cfg.guard
        td, tr = cfg.train

        def box(a, hd, hr):
            out = np.zeros_like(a)
            for i in range(d):
                lo, hi = max(0, i - hd), min(d, i + hd + 1)
                seg = a[lo:hi].sum(0)
                c = np.cumsum(np.concatenate([[0.0], seg]))
                idx = np.arange(r)
                out[i] = c[np.minimum(idx + hr + 1, r)] - c[np.maximum(idx - hr, 0)]
            return out

        zs = box(pw, gd + td, gr + tr) - box(pw, gd, gr)
        ns = box(np.ones_like(pw), gd + td, gr + tr) - box(np.ones_like(pw), gd, gr)
        alpha = ns * (cfg.pfa ** (-1.0 / ns) - 1.0)
        thr_g = alpha * zs / ns
        rel = np.abs(np.asarray(thr) - thr_g).max() / thr_g.max()
        det_g = pw > thr_g
        mism = (np.asarray(det) != det_g).mean()
        print(
            f"on-chip CFAR threshold vs float64 golden: rel {rel:.2e}, "
            f"detection mismatch frac {mism:.2e}",
            flush=True,
        )
        assert rel < 1e-4, rel

    row("parity", parity)

    def wrap(fn):
        def mk(k):
            @jax.jit
            def chained(arg):
                v, q = arg

                def body(i, acc):
                    out = fn(v + i.astype(jnp.float32) * 1e-12, q)
                    leaves = jax.tree_util.tree_leaves(out)
                    s = jnp.zeros((), jnp.float32)
                    for l in leaves:
                        s = s + jnp.sum(l.astype(jnp.float32).ravel()[:4])
                    return acc + s

                return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

            return chained

        return mk

    def mf(v, q):
        return radar.pulse_compress(cfg, v, q)

    def dop(v, q):
        rc = radar.pulse_compress(cfg, v, q)
        return radar.doppler_map(cfg, rc)

    def full(v, q):
        det, power, thr = radar.detect(cfg, v, q)
        return power

    for name, fn in [("matched filter", mf), ("mf+doppler", dop), ("detect full", full)]:
        row(name, lambda n=name, f=fn: k_diff(f"radar {n} (64x1M)", wrap(f), (ri, rq), work))

    print(f"DONE crashes={CRASHES}", flush=True)


if __name__ == "__main__":
    main()
