"""Probe: packed 256-column dense rfft vs the 257-column spelling.

The (n, h = n/2+1) DFT matrices have 257 output columns at nfft=512 —
three 128-lane MXU groups where 256 needs two (1.5x the matmul work for
one bin). Both DC and Nyquist rows are purely real, so the imaginary
matrix's column 0 is identically zero: pack the Nyquist COSINE column
there, matmul at 256 columns, and unpack with two concats. If the matmul
is really the binding cost (r5_stft_prec_ab), this should approach
x1.3-1.4 at nfft=512.
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


def packed_consts(n, hop, w):
    """(hop-slice) banded matrices with Nyquist cosine packed into the
    zero column of the imaginary matrix. Returns [(ar_j, ai_j)] per j."""
    h = n // 2 + 1
    k = np.arange(h)
    wm = np.exp(-2j * np.pi * np.outer(np.arange(n), k) / n)
    cr = wm.real.astype(np.float64)
    ci = wm.imag.astype(np.float64)
    # packed: drop column 256 from cr; move it into ci[:, 0] (all zeros)
    crp = cr[:, : h - 1].copy()
    cip = ci[:, : h - 1].copy()
    cip[:, 0] = cr[:, h - 1]
    out = []
    j_max = n // hop
    for j in range(j_max):
        band = slice(j * hop, (j + 1) * hop)
        wj = w[band, None].astype(np.float64)
        out.append(
            (
                jnp.asarray((wj * crp[band]).astype(np.float32)),
                jnp.asarray((wj * cip[band]).astype(np.float32)),
            )
        )
    return out


def main() -> None:
    from digital_signal_processsing_tpu.ops.fft import spectral_window
    from digital_signal_processsing_tpu.ops.fft_mxu import rfft_dense_framed

    rng = np.random.default_rng(0)
    c, t = 8, 2_000_000
    x = jnp.asarray(rng.standard_normal((c, t)), jnp.float32)
    hi = jax.lax.Precision.HIGH

    for nfft, hop in ((512, 256), (1024, 512)):
        nframes = (t - nfft) // hop + 1
        w = spectral_window("hann", nfft)
        consts = packed_consts(nfft, hop, w)
        nb = nframes + nfft // hop - 1

        def packed(y, nf=None):
            nf = nframes if nf is None else nf
            x2 = y.reshape(*y.shape[:-1], y.shape[-1] // hop, hop)
            re = im = None
            for j, (ar, ai) in enumerate(consts):
                seg = x2[..., j : j + nf, :]
                r = jnp.matmul(seg, ar, precision=hi)
                s = jnp.matmul(seg, ai, precision=hi)
                re = r if re is None else re + r
                im = s if im is None else im + s
            # unpack: true re = [re | im[..., :1]], true im has 0 at DC/Nyq
            fr = jnp.concatenate([re, im[..., :1]], axis=-1)
            fi = jnp.concatenate(
                [jnp.zeros_like(im[..., :1]), im[..., 1:],
                 jnp.zeros_like(im[..., :1])], axis=-1
            )
            return fr, fi

        # parity on a slice, on chip
        xs = x[:, : nb * hop][:, : 200_000 // hop * hop]
        nf_s = (xs.shape[-1] - nfft) // hop + 1
        fr_p, fi_p = jax.jit(
            lambda v: packed(v[:, : (nf_s + nfft // hop - 1) * hop], nf_s)
        )(xs)
        fr_r, fi_r = rfft_dense_framed(xs, nf_s, hop, nfft, w, precision=hi)
        scale = float(jnp.max(jnp.abs(fr_r)))
        print(
            f"parity nfft={nfft}: re "
            f"{float(jnp.max(jnp.abs(fr_p - fr_r)))/scale:.2e} "
            f"im {float(jnp.max(jnp.abs(fi_p - fi_r)))/scale:.2e}",
            flush=True,
        )

        def mk_packed(k):
            @jax.jit
            def chained(v):
                def body(_, y):
                    fr, fi = packed(y[:, : nb * hop])
                    return y + 0.0 * (fr.sum() + fi.sum())

                return jax.lax.fori_loop(0, k, body, v)

            return chained

        def mk_framed(k):
            @jax.jit
            def chained(v):
                def body(_, y):
                    fr, fi = rfft_dense_framed(y, nframes, hop, nfft, w, precision=hi)
                    return y + 0.0 * (fr.sum() + fi.sum())

                return jax.lax.fori_loop(0, k, body, v)

            return chained

        k_diff(f"packed {nfft}", mk_packed, x, c * t)
        k_diff(f"framed {nfft}", mk_framed, x, c * t)


if __name__ == "__main__":
    main()
