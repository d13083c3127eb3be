"""MXU-factorized DFT: the FFT stage as two batched matmul passes.

On-chip profiling of the overlap-save FIR (benchmarks/r2_rows.py, v5e)
puts XLA's TPU rfft+irfft pair at 29 ms of the 36 ms total on 16x4M/k=1024
— ~10 GB/s effective, far off the MXU's capability. A DFT of composite
length N = N1*N2 factors (Cooley-Tukey) into

    X[k1 + N1*k2] = sum_n2 W_N^(n2*k1) * W_N2^(n2*k2)
                            * sum_n1 x[N2*n1 + n2] * W_N1^(n1*k1)

i.e. a batched (N2, N1) @ (N1, N1) matmul, an elementwise twiddle, and a
batched (N1-many) (N2) @ (N2, N2) contraction — all MXU work at ~N1+N2
MACs/point instead of XLA's FFT lowering. Complex arithmetic is planar
(re, im) real matmuls (complex64 is a second-class citizen on this
backend), with HIGH precision (bf16x3 passes) giving ~1e-6 relative error
— two orders below the FIR design ripple that dominates any filtering use.

Used by ops/fir.py's ``fir_overlap_save(engine="mxu")`` block convolution;
the thin jnp.fft wrappers in ops/fft.py remain the general-purpose API.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pick_factored_nfft(min_n: int, n1: int = 128) -> int:
    """Smallest multiple of ``n1`` >= min_n (the factored-DFT length grid)."""
    return -(-min_n // n1) * n1


def _stage_consts(n: int, n1: int, inverse: bool):
    """numpy planar constants: (W1 (n1,n1), twiddle (n2,n1), W2 (n2,n2))."""
    n2 = n // n1
    sign = 2j if inverse else -2j
    k1 = np.arange(n1)
    w1 = np.exp(sign * np.pi * np.outer(k1, k1) / n1)
    tw = np.exp(sign * np.pi * np.outer(np.arange(n2), k1) / n)
    k2 = np.arange(n2)
    w2 = np.exp(sign * np.pi * np.outer(k2, k2) / n2)

    def planar(w):
        return w.real.astype(np.float32), w.imag.astype(np.float32)

    return planar(w1), planar(tw), planar(w2)


def dft_factored(
    x_re: jax.Array,
    x_im: jax.Array | None,
    *,
    n1: int = 128,
    inverse: bool = False,
    precision=jax.lax.Precision.HIGH,
) -> tuple[jax.Array, jax.Array]:
    """Planar complex DFT over the last axis via two matmul stages.

    ``x_im=None`` marks a real input (halves the first stage's matmuls).
    Returns planar ``(re, im)``; the inverse applies the 1/N scale. The
    last axis length must be a multiple of ``n1``.
    """
    n = x_re.shape[-1]
    if n % n1 != 0:
        raise ValueError(f"factored DFT needs len % {n1} == 0, got {n}")
    n2 = n // n1
    (w1r_, w1i_), (twr_, twi_), (w2r_, w2i_) = _stage_consts(n, n1, inverse)
    w1r, w1i = jnp.asarray(w1r_), jnp.asarray(w1i_)
    twr, twi = jnp.asarray(twr_), jnp.asarray(twi_)
    w2r, w2i = jnp.asarray(w2r_), jnp.asarray(w2i_)

    def mm(a, b):
        return jnp.matmul(a, b, precision=precision)

    # x[..., N2*n1 + n2] -> x2[..., n2, n1]
    def to2(v):
        return jnp.swapaxes(v.reshape(v.shape[:-1] + (n1, n2)), -1, -2)

    x2r = to2(x_re)
    # stage A: contract n1 against W1 -> A[..., n2, k1]
    if x_im is None:
        ar, ai = mm(x2r, w1r), mm(x2r, w1i)
    else:
        x2i = to2(x_im)
        ar = mm(x2r, w1r) - mm(x2i, w1i)
        ai = mm(x2r, w1i) + mm(x2i, w1r)
    # twiddle: elementwise (n2, k1) complex multiply
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr
    # stage B: contract n2 against W2 -> X[..., k2, k1]; einsum keeps k1
    # batched so the contraction is one (..., k1, n2) @ (n2, k2) matmul
    def stage2(r, i):
        return (
            jnp.einsum("...nk,nm->...mk", r, w2r, precision=precision)
            - jnp.einsum("...nk,nm->...mk", i, w2i, precision=precision),
            jnp.einsum("...nk,nm->...mk", r, w2i, precision=precision)
            + jnp.einsum("...nk,nm->...mk", i, w2r, precision=precision),
        )

    xr, xi = stage2(br, bi)
    # X[..., k2, k1] flattens to k = k1 + N1*k2 (k2-major) directly
    out_r = xr.reshape(xr.shape[:-2] + (n,))
    out_i = xi.reshape(xi.shape[:-2] + (n,))
    if inverse:
        s = jnp.float32(1.0 / n)
        return out_r * s, out_i * s
    return out_r, out_i


def overlap_save_mxu(
    x: jax.Array,
    taps: jax.Array,
    *,
    block: int,
    n1: int = 128,
) -> jax.Array:
    """Causal FIR via overlap-save with the MXU-factorized DFT.

    Same semantics as ops/fir.py's ``fir_overlap_save``; ``block`` is the
    useful samples per segment, nfft = block rounded with the k-1 overlap
    onto the n1 grid. Concrete taps get a host-side float64 numpy FFT for
    the frequency response; traced taps compute it on device with the same
    factored DFT.
    """
    k = int(taps.shape[0])
    nfft = pick_factored_nfft(block + k, n1)
    if isinstance(taps, jax.core.Tracer):
        tp = jnp.pad(taps.astype(jnp.float32), (0, nfft - k))
        hr, hi = dft_factored(tp[None, :], None, n1=n1)
        hr, hi = hr[0], hi[0]
    else:
        h_f = np.fft.fft(np.asarray(taps, np.float64), n=nfft)
        hr = jnp.asarray(h_f.real.astype(np.float32))
        hi = jnp.asarray(h_f.imag.astype(np.float32))
    return _overlap_save_mxu_jit(x, hr, hi, k=k, block=block, n1=n1)


@functools.partial(jax.jit, static_argnames=("k", "block", "n1"))
def _overlap_save_mxu_jit(x, hr, hi, *, k: int, block: int, n1: int):
    from ..utils.layout import overlapping_frames
    from .fir import _as_planar

    xp, squeeze = _as_planar(x)
    c, t = xp.shape
    nfft = hr.shape[-1]
    nblocks = -(-t // block)
    pad_r = nblocks * block - t
    xpad = jnp.pad(
        xp.astype(jnp.float32),
        ((0, 0), (k - 1, pad_r + (nfft - block - (k - 1)))),
    )
    segs = overlapping_frames(xpad, nblocks, block, nfft)  # (c, nb, nfft)
    fr, fi = dft_factored(segs, None, n1=n1)
    yr = fr * hr - fi * hi
    yi = fr * hi + fi * hr
    out_r, _ = dft_factored(yr, yi, n1=n1, inverse=True)
    y = out_r[:, :, k - 1 : k - 1 + block].reshape(c, nblocks * block)[:, :t]
    return y[0] if squeeze else y


__all__ = ["dft_factored", "overlap_save_mxu", "pick_factored_nfft"]
