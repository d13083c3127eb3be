"""A/B: round-5 radar detect (full-width masked CFAR, end slice) vs the
round-4 spelling (power slice then sliced-map CFAR), plus the Gauss
3-multiplication matched filter — same session, interleaved.

VERDICT r4 item 6: detect closed round 4 at 18.2 ms (3.69 GS/s) vs a ~13
ms stage sum — ~5 ms of power/slice traffic unaccounted (the CFAR ran on
the offset-127 misaligned sliced map), and the matched filter ran complex
correlation as 4 real convs where Gauss's identity needs 3.

Also checks the cost of the round-5 ragged-pad fusion fence
(optimization_barrier on correlate's pad) on this chain: the r4 number
was measured WITHOUT the fence, so the r4-spelling row here re-baselines
it fenced.

Detections compared across all variants on the same echoes (count + map
equality) before timing. K-differential; run alone on the chip.
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

K_SMALL, K_BIG = 4, 12
REPEATS = 3


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
    print(f"{name}: {work_items / per / 1e9:.3f} GS/s ({per*1e3:.2f} ms/iter)", flush=True)


def main() -> None:
    from digital_signal_processsing_tpu.models import radar
    from digital_signal_processsing_tpu.ops.correlate import correlate_complex

    cfg = radar.RadarConfig(
        n_pulses=64, n_range=1 << 20, pulse_len=128, guard=(2, 4), train=(4, 16)
    )
    rng = np.random.default_rng(0)
    ri = jnp.asarray(rng.standard_normal((cfg.n_pulses, cfg.n_range)), jnp.float32)
    rq = jnp.asarray(rng.standard_normal((cfg.n_pulses, cfg.n_range)), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("cfg", "mf_method"))
    def detect_r4(cfg, i, q, mf_method="direct"):
        pr, pi_ = radar.lfm_pulse(cfg)
        c_re, c_im = correlate_complex(
            i.astype(jnp.float32), q.astype(jnp.float32),
            jnp.asarray(pr), jnp.asarray(pi_), mode="full", method=mf_method,
        )
        rc = jax.lax.complex(c_re, c_im)
        lo = cfg.pulse_len - 1
        power = radar.doppler_map(cfg, rc)[:, lo : lo + cfg.n_bins]
        det, thresh = radar.ca_cfar(
            power, guard=cfg.guard, train=cfg.train, pfa=cfg.pfa
        )
        return det, power, thresh

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def detect_r5_gauss(cfg, i, q):
        """round-5 detect with the Gauss 3-mult matched filter."""
        pr, pi_ = radar.lfm_pulse(cfg)
        c_re, c_im = correlate_complex(
            i.astype(jnp.float32), q.astype(jnp.float32),
            jnp.asarray(pr), jnp.asarray(pi_), mode="full", method="direct_gauss",
        )
        rc = jax.lax.complex(c_re, c_im)
        full = radar.doppler_map(cfg, rc)
        lo, nb = cfg.pulse_len - 1, cfg.n_bins
        col = jnp.arange(full.shape[-1])
        p_masked = jnp.where((col >= lo) & (col < lo + nb), full, 0.0)
        gd, gr = cfg.guard
        td, tr = cfg.train
        w = full.shape[-1]
        det_f, thresh_f = radar._cfar_core(
            p_masked, cfg.guard, cfg.train, cfg.pfa,
            (radar._count1d(cfg.n_pulses, gd + td), radar._count1d(cfg.n_pulses, gd)),
            (radar._count1d_window(w, lo, nb, gr + tr),
             radar._count1d_window(w, lo, nb, gr)),
        )
        sl = slice(lo, lo + nb)
        return det_f[:, sl], full[:, sl], thresh_f[:, sl]

    # ---- detection parity on the same echoes, before any timing -------
    d5, p5, _ = radar.detect(cfg, ri, rq)
    d4, p4, _ = detect_r4(cfg, ri, rq)
    dg, pg, _ = detect_r5_gauss(cfg, ri, rq)
    n5, n4, ng = int(d5.sum()), int(d4.sum()), int(dg.sum())
    same45 = bool(jnp.all(d5 == d4))
    sameg = bool(jnp.all(d5 == dg))
    flips_g = int(jnp.sum(d5 != dg))
    print(
        f"parity: det r5 {n5} / r4 {n4} / gauss {ng}; "
        f"r5==r4 {same45}; gauss flips {flips_g}; "
        f"power r5-vs-r4 maxdiff {float(jnp.max(jnp.abs(p5 - p4))):.3e}, "
        f"gauss power maxdiff {float(jnp.max(jnp.abs(pg - p5))):.3e}",
        flush=True,
    )

    def mk(det_fn):
        def make(k):
            @jax.jit
            def chained(arg):
                v, q = arg

                def body(_, y):
                    det, power, _ = det_fn(cfg, y, q)
                    return y + 0.0 * jnp.pad(
                        power, ((0, 0), (0, cfg.n_range - cfg.n_bins))
                    )

                return jax.lax.fori_loop(0, k, body, v)

            return chained

        return make

    work = cfg.n_pulses * cfg.n_range
    # interleaved A/B/C
    k_diff("detect r5 fullwidth-CFAR (64x1M)", mk(radar.detect), (ri, rq), work)
    k_diff("detect r4 sliced-CFAR   (64x1M)", mk(detect_r4), (ri, rq), work)
    k_diff("detect r5 + gauss MF    (64x1M)", mk(detect_r5_gauss), (ri, rq), work)


if __name__ == "__main__":
    main()
