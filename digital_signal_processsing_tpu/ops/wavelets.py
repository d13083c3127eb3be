"""Continuous wavelet transform and unevenly-sampled spectra, TPU-first.

``cwt`` is a bank of batched MXU correlations (one VALID conv per width
over centered symmetric padding — the widths axis is a static Python
loop, each iteration a full-tile MXU pass; TPU gathers and dynamic shapes
are avoided throughout). ``lombscargle`` is two dense trig outer-product
contractions — the (freqs x samples) structure is exactly an MXU matmul.
Wavelet generators are host-side numpy design functions like the FIR/IIR
designers. Parity target: scipy.signal (``cwt``/``ricker``/``morlet2``/
``lombscargle``); no reference analog (the CUDA study has no wavelet or
irregular-sampling surface).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def ricker(points: int, a: float) -> np.ndarray:
    """Ricker (mexican-hat) wavelet (scipy.signal.ricker)."""
    A = 2.0 / (np.sqrt(3.0 * a) * np.pi**0.25)
    vec = np.arange(points) - (points - 1.0) / 2.0
    xsq = vec**2
    mod = 1.0 - xsq / a**2
    return (A * mod * np.exp(-xsq / (2.0 * a**2))).astype(np.float64)


def morlet2(points: int, s: float, w: float = 5.0) -> np.ndarray:
    """Complex Morlet wavelet normalized for :func:`cwt`
    (scipy.signal.morlet2)."""
    x = (np.arange(points) - (points - 1.0) / 2.0) / s
    return (
        np.exp(1j * w * x) * np.exp(-0.5 * x**2) * np.pi**-0.25 * s**-0.5
    ).astype(np.complex128)


def _correlate_same(xb: jax.Array, k: np.ndarray) -> jax.Array:
    """Batched 1-D 'same' correlation on the MXU (scipy convolve-'same'
    of data with the REVERSED conjugated kernel, i.e. scipy.cwt's inner
    step, spelled directly as correlation with the kernel)."""
    n = k.size
    # convolve(data, g, 'same') with g = conj(k[::-1]) equals
    # correlate(data, conj(k), 'same'); centered pad for the even case
    # follows the convolution split (extra BEFORE) because scipy slices
    # the convolution's full output
    before, after = n // 2, (n - 1) // 2
    ext = jnp.pad(xb, ((0, 0), (before, after)))
    return jax.lax.conv_general_dilated(
        ext[:, None, None, :],
        jnp.asarray(k, jnp.float32)[None, None, None, :],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )[:, 0, 0, :]


def cwt(
    data: jax.Array,
    wavelet,
    widths,
    *,
    dtype=None,
    w: float | None = None,
) -> jax.Array:
    """Continuous wavelet transform (scipy.signal.cwt semantics).

    ``wavelet(length, width)`` is called host-side per width with
    ``length = min(10 * width, n)``; complex wavelets (e.g.
    :func:`morlet2`) run as two planar real passes (complex64 transport is
    unimplemented on this TPU platform — BENCH_NOTES r1) and return a
    complex numpy-compatible array via ``lax.complex``. Extra ``w`` is
    forwarded to the wavelet (morlet2's center frequency).

    Returns ``(..., len(widths), n)``.
    """
    xf = jnp.asarray(data, jnp.float32)
    n = xf.shape[-1]
    batch = xf.shape[:-1]
    xb = xf.reshape(-1, n)
    rows_re, rows_im = [], []
    complex_out = False
    for width in np.atleast_1d(widths):
        length = int(min(10 * float(width), n))
        wv = (
            wavelet(length, float(width))
            if w is None
            else wavelet(length, float(width), w)
        )
        wv = np.conj(np.asarray(wv))
        if np.iscomplexobj(wv):
            complex_out = True
            rows_re.append(_correlate_same(xb, wv.real))
            rows_im.append(_correlate_same(xb, wv.imag))
        else:
            rows_re.append(_correlate_same(xb, wv.astype(np.float64)))
            rows_im.append(None)
    out_re = jnp.stack(rows_re, axis=-2)
    if complex_out:
        out_im = jnp.stack(
            [
                r if r is not None else jnp.zeros_like(rows_re[0])
                for r in rows_im
            ],
            axis=-2,
        )
        out = jax.lax.complex(out_re, out_im)
    else:
        out = out_re
    if dtype is not None:
        out = out.astype(dtype)
    return out.reshape(batch + out.shape[-2:])


@functools.partial(jax.jit, static_argnames=("precenter", "normalize"))
def lombscargle(
    x: jax.Array,
    y: jax.Array,
    freqs: jax.Array,
    *,
    precenter: bool = False,
    normalize: bool = False,
) -> jax.Array:
    """Lomb-Scargle periodogram for UNEVENLY sampled data
    (scipy.signal.lombscargle, tau-shifted form).

    ``x``: sample times ``(n,)``; ``y``: values ``(n,)``; ``freqs``:
    angular frequencies ``(f,)``. Every term is a dense (f, n) trig
    matrix contracted over samples — two MXU einsums per statistic.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    freqs = jnp.asarray(freqs, jnp.float32)
    if precenter:
        y = y - jnp.mean(y)
    arg = freqs[:, None] * x[None, :]  # (f, n)
    s2 = jnp.sum(jnp.sin(2.0 * arg), -1)
    c2 = jnp.sum(jnp.cos(2.0 * arg), -1)
    tau_arg = 0.5 * jnp.arctan2(s2, c2)  # omega * tau
    carg = jnp.cos(arg - tau_arg[:, None])
    sarg = jnp.sin(arg - tau_arg[:, None])
    cy = carg @ y
    sy = sarg @ y
    cc = jnp.sum(carg * carg, -1)
    ss = jnp.sum(sarg * sarg, -1)
    pgram = 0.5 * (cy * cy / cc + sy * sy / ss)
    if normalize:
        pgram = pgram * (2.0 / jnp.sum(y * y))
    return pgram


__all__ = ["ricker", "morlet2", "cwt", "lombscargle"]
