"""Linear Kalman filtering and RTS smoothing.

State estimation over the state-space systems the LTI surface builds
(``ops.lti.tf2ss``/``cont2discrete``): one ``lax.scan`` over time with
the (tiny) state and covariance carried on device and independent
measurement streams vectorized over the leading batch axes — the same
"batch across lanes, scan along time" shape as the sample-recursive
adaptive filters. No reference analog (the CUDA study has no estimation
layer); the oracle in tests is a float64 numpy transliteration of the
textbook equations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def kalman_filter(F, H, Q, R, z, *, x0=None, P0=None):
    """Forward Kalman filter over measurements ``z``.

    ``F`` (n, n) transition, ``H`` (m, n) observation, ``Q``/(n, n) and
    ``R``/(m, m) noises; ``z``: (..., T, m) measurement streams (leading
    axes batch). Returns ``(x_filt, P_filt)`` with shapes
    ``(..., T, n)`` and ``(T, n, n)`` (covariances are
    measurement-independent, so they are shared across the batch).
    """
    F = jnp.asarray(F, jnp.float32)
    H = jnp.atleast_2d(jnp.asarray(H, jnp.float32))
    Q = jnp.asarray(Q, jnp.float32)
    R = jnp.atleast_2d(jnp.asarray(R, jnp.float32))
    z = jnp.asarray(z, jnp.float32)
    if z.ndim == 1:
        z = z[:, None]
    batch = z.shape[:-2]
    t_len, m = z.shape[-2], z.shape[-1]
    n = F.shape[0]
    zb = z.reshape((-1, t_len, m))
    b = zb.shape[0]
    x = (
        jnp.zeros((b, n), jnp.float32)
        if x0 is None
        else jnp.broadcast_to(jnp.asarray(x0, jnp.float32), (b, n))
    )
    P = (
        jnp.eye(n, dtype=jnp.float32) * 1e3
        if P0 is None
        else jnp.asarray(P0, jnp.float32)
    )

    def step(carry, zt):
        x, P = carry
        # predict
        xp = x @ F.T
        Pp = F @ P @ F.T + Q
        # update (batched innovation, shared gain)
        S = H @ Pp @ H.T + R
        K = jnp.linalg.solve(S, H @ Pp).T  # (n, m)
        innov = zt - xp @ H.T
        xf = xp + innov @ K.T
        Pf = (jnp.eye(n, dtype=jnp.float32) - K @ H) @ Pp
        Pf = 0.5 * (Pf + Pf.T)  # keep symmetric in float32
        return (xf, Pf), (xf, Pf)

    (_, _), (xs, Ps) = jax.lax.scan(step, (x, P), jnp.moveaxis(zb, 1, 0))
    x_filt = jnp.moveaxis(xs, 0, 1).reshape(batch + (t_len, n))
    return x_filt, Ps


@functools.partial(jax.jit, static_argnames=())
def rts_smoother(F, Q, x_filt, P_filt):
    """Rauch-Tung-Striebel fixed-interval smoother over
    :func:`kalman_filter` outputs. Returns ``(x_smooth, P_smooth)``."""
    F = jnp.asarray(F, jnp.float32)
    Q = jnp.asarray(Q, jnp.float32)
    x_filt = jnp.asarray(x_filt, jnp.float32)
    squeeze = x_filt.ndim == 2
    xb = x_filt[None] if squeeze else x_filt.reshape(
        (-1,) + x_filt.shape[-2:]
    )
    batch = x_filt.shape[:-2]
    t_len, n = xb.shape[-2], xb.shape[-1]

    def step(carry, inp):
        x_next, P_next = carry
        xf, Pf = inp
        Pp = F @ Pf @ F.T + Q
        G = jnp.linalg.solve(Pp, F @ Pf).T  # (n, n) smoother gain
        xs = xf + (x_next - xf @ F.T) @ G.T
        Ps = Pf + G @ (P_next - Pp) @ G.T
        return (xs, Ps), (xs, Ps)

    x_rev = jnp.moveaxis(xb, 1, 0)[::-1]  # (T, B, n), reversed
    P_rev = P_filt[::-1]
    init = (x_rev[0], P_rev[0])
    (_, _), (xs, Ps) = jax.lax.scan(
        step, init, (x_rev[1:], P_rev[1:])
    )
    xs = jnp.concatenate([x_rev[:1], xs], axis=0)[::-1]
    Ps = jnp.concatenate([P_rev[:1], Ps], axis=0)[::-1]
    out = jnp.moveaxis(xs, 0, 1)
    out = out[0] if squeeze else out.reshape(batch + (t_len, n))
    return out, Ps


__all__ = ["kalman_filter", "rts_smoother"]
