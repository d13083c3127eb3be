"""Gain control and conditioning: AGC, DC blocker, soft clipper, dB utils.

Beyond-reference framework ops (the reference has no level management), all
built on the O(log T) parallel first-order recurrence in ops/iir.py so
nothing here serializes on the time axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .iir import iir_first_order


# pole is static so it reaches the iir dispatcher as a concrete float — the
# Pallas block-scan path (long streams) bakes coefficients into the kernel
@functools.partial(jax.jit, static_argnames=("pole",))
def dc_block(x: jax.Array, pole: float = 0.995) -> jax.Array:
    """One-pole DC blocker: y[n] = x[n] - x[n-1] + pole*y[n-1].

    Standard radio/audio conditioning stage; ~unity gain in the passband,
    null at DC. ``pole`` in (0, 1): closer to 1 = lower cutoff.
    """
    xf = x.astype(jnp.float32)
    prev = jnp.pad(xf[..., :-1], [(0, 0)] * (xf.ndim - 1) + [(1, 0)])
    return iir_first_order(xf - prev, pole)


@functools.partial(jax.jit, static_argnames=("target", "attack", "floor"))
def agc(
    x: jax.Array,
    *,
    target: float = 0.5,
    attack: float = 0.01,
    floor: float = 1e-6,
) -> jax.Array:
    """Feedforward automatic gain control over the last axis.

    The instantaneous envelope |x| is smoothed by a one-pole tracker with
    coefficient ``1 - attack`` (the parallel scan form, so the whole stream
    is O(log T)); the output is x scaled toward ``target`` RMS-ish level.
    ``floor`` bounds the gain during silence.
    """
    if not 0.0 < attack < 1.0:
        raise ValueError(f"attack must be in (0,1), got {attack}")
    xf = x.astype(jnp.float32)
    env = iir_first_order(jnp.abs(xf), 1.0 - attack, b=attack)
    # debias the zero-initialized EMA (its mass at sample n is
    # 1-(1-attack)^(n+1)); without this the startup gain overshoots by
    # ~1/attack and every stream begins with a full-scale spike
    n = jnp.arange(xf.shape[-1], dtype=jnp.float32)
    env = env / (1.0 - (1.0 - attack) ** (n + 1.0))
    return xf * (target / jnp.maximum(env, floor))


@jax.jit
def soft_clip(x: jax.Array, limit: float = 1.0) -> jax.Array:
    """tanh soft limiter scaled so |y| < limit; ~linear for |x| << limit."""
    xf = x.astype(jnp.float32)
    return jnp.tanh(xf / limit) * limit


@jax.jit
def db(x: jax.Array, floor_db: float = -200.0) -> jax.Array:
    """Amplitude -> dBFS-style 20*log10(|x|), floored for zeros."""
    a = jnp.abs(x.astype(jnp.float32))
    return jnp.maximum(20.0 * jnp.log10(jnp.maximum(a, 1e-30)), floor_db)


__all__ = ["dc_block", "agc", "soft_clip", "db"]


@functools.partial(jax.jit, static_argnames=("type",))
def detrend(x: jax.Array, *, type: str = "linear") -> jax.Array:
    """Remove a constant or least-squares linear trend over the last axis
    (scipy.signal.detrend semantics).

    The linear fit uses the closed-form normal equations on centered time
    indices (diagonal system — no lstsq in the graph), so it fuses into
    whatever follows under jit.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    if type == "constant":
        return xf - mean
    if type != "linear":
        raise ValueError(f"type must be 'linear' or 'constant', got {type!r}")
    t = xf.shape[-1]
    n = jnp.arange(t, dtype=jnp.float32) - (t - 1) / 2.0  # centered: sum n = 0
    slope = jnp.sum(xf * n, axis=-1, keepdims=True) / float((np.arange(t) - (t - 1) / 2.0) @ (np.arange(t) - (t - 1) / 2.0))
    return xf - mean - slope * n
