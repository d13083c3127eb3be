"""Polyphase resampling: decimate / interpolate / rational resample.

North-star stage (BASELINE.json: "polyphase decimate"). TPU-first shape: the
polyphase decomposition is a reshape — phase p of the signal is column p of
the (time/q, q) view — so each phase convolution is a batched MXU conv and
no strided gathers survive to runtime.

Conventions match ops/fir.py: planar ``(channels, time)`` float32, causal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .fir import _as_planar, design_lowpass


@functools.partial(jax.jit, static_argnames=("factor",))
def _poly_decimate(x: jax.Array, taps: jax.Array, factor: int) -> jax.Array:
    """y[m] = sum_j h[j] x[m*q - j], via q phase convolutions.

    Phase decomposition: x_p[n] = x[n*q + p], h_p[n] = h[n*q + p]; then
    y[m] = sum_p (x_p * h_p_flipped aligned)[m]. Implemented as a single
    grouped correlation on the (time/q, q) view.
    """
    c, t = x.shape
    q = factor
    k = taps.shape[0]
    kq = -(-k // q) * q  # taps padded to whole phases
    h = jnp.pad(taps.astype(jnp.float32), (0, kq - k))
    tq = t // q
    xv = x[:, : tq * q].reshape(c, tq, q)  # xv[:, n, p] = x[nq + p]
    # y[m] = sum_{j} h[j] x[mq - j] = sum_{p} sum_{n} h[nq+p] x[(m-n)q - p]
    # x[(m-n)q - p] = xv[:, m-n-1, q-p] for p>0; = xv[:, m-n, 0] for p=0.
    hv = h.reshape(kq // q, q)  # hv[n, p] = h[nq + p]
    out = jnp.zeros((c, tq), jnp.float32)
    for p in range(q):
        hp = hv[:, p]  # taps of phase p, length kq//q
        if p == 0:
            xp = xv[:, :, 0]
            shift = 0
        else:
            xp = xv[:, :, q - p]
            shift = 1  # x[(m-n)q - p] lives one frame earlier
        lhs = xp[:, None, :]
        rhs = hp[::-1][None, None, :]
        npad = hp.shape[0] - 1 + shift
        yp = jax.lax.conv_general_dilated(
            lhs,
            rhs,
            window_strides=(1,),
            padding=((npad, -shift if shift else 0),),
            dimension_numbers=("NCW", "OIW", "NCW"),
        )[:, 0, :]
        out = out + yp
    return out


def decimate(
    x: jax.Array,
    factor: int,
    *,
    taps: jax.Array | np.ndarray | None = None,
    taps_per_phase: int = 8,
) -> jax.Array:
    """Anti-aliased downsampling by an integer factor (polyphase).

    Default filter: windowed-sinc lowpass at 0.8/factor Nyquist with
    ``taps_per_phase * factor`` taps.
    """
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    xp, squeeze = _as_planar(x)
    if factor == 1:
        return xp[0] if squeeze else xp
    if taps is None:
        taps = design_lowpass(taps_per_phase * factor, 0.8 / factor)
    y = _poly_decimate(xp.astype(jnp.float32), jnp.asarray(taps), factor)
    return y[0] if squeeze else y


@functools.partial(jax.jit, static_argnames=("factor",))
def _poly_interpolate(x: jax.Array, taps: jax.Array, factor: int) -> jax.Array:
    """Zero-stuff by `factor` then lowpass — as q independent phase filters."""
    c, t = x.shape
    q = factor
    k = taps.shape[0]
    kq = -(-k // q) * q
    h = jnp.pad(taps.astype(jnp.float32), (0, kq - k)).reshape(kq // q, q)
    # y[mq + p] = sum_n h[nq + p] x[m - n]  (phase-p output = conv(x, h_p))
    outs = []
    for p in range(q):
        hp = h[:, p]
        lhs = x[:, None, :].astype(jnp.float32)
        rhs = hp[::-1][None, None, :]
        yp = jax.lax.conv_general_dilated(
            lhs,
            rhs,
            window_strides=(1,),
            padding=((hp.shape[0] - 1, 0),),
            dimension_numbers=("NCW", "OIW", "NCW"),
        )[:, 0, :]
        outs.append(yp)
    return jnp.stack(outs, axis=-1).reshape(c, t * q)  # interleave phases


def interpolate(
    x: jax.Array,
    factor: int,
    *,
    taps: jax.Array | np.ndarray | None = None,
    taps_per_phase: int = 8,
) -> jax.Array:
    """Anti-imaged upsampling by an integer factor (polyphase zero-stuff)."""
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    xp, squeeze = _as_planar(x)
    if factor == 1:
        return xp[0] if squeeze else xp
    if taps is None:
        # gain `factor` compensates the zero-stuffing energy loss
        taps = design_lowpass(taps_per_phase * factor, 0.8 / factor) * factor
    y = _poly_interpolate(xp.astype(jnp.float32), jnp.asarray(taps), factor)
    return y[0] if squeeze else y


def resample_poly(x: jax.Array, up: int, down: int, **kw) -> jax.Array:
    """Rational-rate resample: interpolate by `up`, decimate by `down`."""
    g = np.gcd(up, down)
    up, down = up // g, down // g
    y = interpolate(x, up, **kw) if up > 1 else x
    return decimate(y, down, **kw) if down > 1 else y
