"""Precision A/B for the framed dense stft — is HIGHEST still "free"?

Round-4 recorded "HIGHEST costs ~4% over HIGH" for rfft_dense — but that
A/B folded only out[..., :4] into the loop carry, letting XLA slice the
DFT rhs (r4_stft_dense_ab.py wrap); with the FULL spectrum forced the
HIGHEST matmul is the binding cost at nfft=512: 2*(nfft/hop)*h ~ 1028
MACs/sample x 6 bf16 passes ~ 16 GS/s MXU bound — exactly where the r5
framed row (14.8) sits. This A/B forces the full output (sum over all
bins) and interleaves HIGHEST vs HIGH for the framed engine, plus the
nfft=1024 old-path regression probe.
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
    from digital_signal_processsing_tpu.ops.fft import spectral_window
    from digital_signal_processsing_tpu.ops.fft_mxu import (
        rfft_dense,
        rfft_dense_framed,
    )
    from digital_signal_processsing_tpu.utils.layout import overlapping_frames

    rng = np.random.default_rng(0)
    c, t = 8, 2_000_000
    x = jnp.asarray(rng.standard_normal((c, t)), jnp.float32)

    # parity of HIGH vs HIGHEST vs XLA rfft, on chip, small slice
    from digital_signal_processsing_tpu.ops import fft as F

    xs = x[:, :200_000]
    s_ref = F.stft(xs, nfft=512, hop=256, method="xla")
    # complex64 host transfer is unimplemented on the axon tunnel —
    # fetch planar
    ref = np.asarray(jnp.real(s_ref)) + 1j * np.asarray(jnp.imag(s_ref))
    scale = np.max(np.abs(ref))
    for prec in ("HIGHEST", "HIGH", "DEFAULT"):
        p = getattr(jax.lax.Precision, prec)
        nframes = (200_000 - 512) // 256 + 1
        fr, fi = rfft_dense_framed(
            xs, nframes, 256, 512, spectral_window("hann", 512), precision=p
        )
        got = np.asarray(fr) + 1j * np.asarray(fi)
        print(
            f"parity framed {prec}: {np.max(np.abs(got - ref)) / scale:.2e}",
            flush=True,
        )

    for nfft, hop in ((512, 256), (1024, 512)):
        nframes = (t - nfft) // hop + 1
        w = spectral_window("hann", nfft)

        def mk_framed(k, prec, nfft=nfft, hop=hop, nframes=nframes, w=w):
            @jax.jit
            def chained(v):
                def body(_, y):
                    fr, fi = rfft_dense_framed(
                        y, nframes, hop, nfft, w, precision=prec
                    )
                    return y + 0.0 * (fr.sum() + fi.sum())

                return jax.lax.fori_loop(0, k, body, v)

            return chained

        def mk_old(k, prec, nfft=nfft, hop=hop, nframes=nframes, w=w):
            wj = jnp.asarray(w)

            @jax.jit
            def chained(v):
                def body(_, y):
                    segs = overlapping_frames(y, nframes, hop, nfft)
                    fr, fi = rfft_dense(segs * wj, precision=prec)
                    return y + 0.0 * (fr.sum() + fi.sum())

                return jax.lax.fori_loop(0, k, body, v)

            return chained

        hp = jax.lax.Precision.HIGHEST
        hi = jax.lax.Precision.HIGH
        k_diff(f"framed {nfft} HIGHEST", lambda k: mk_framed(k, hp), x, c * t)
        k_diff(f"framed {nfft} HIGH   ", lambda k: mk_framed(k, hi), x, c * t)
        k_diff(f"old    {nfft} HIGHEST", lambda k: mk_old(k, hp), x, c * t)
        k_diff(f"old    {nfft} HIGH   ", lambda k: mk_old(k, hi), x, c * t)


if __name__ == "__main__":
    main()
