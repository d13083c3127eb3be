"""Demodulators: FM (quadrature discriminator), AM envelope, frequency xlate.

North-star stage (BASELINE.json: "FM demod"). Pure VPU elementwise math —
XLA fuses the whole discriminator into its producers, so these never need a
hand kernel. Complex baseband convention: planar ``(channels, time)``
complex64 (or a float32 I/Q pair).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _to_c64(x: jax.Array) -> jax.Array:
    """float -> complex64 without complex constants (PJRT-portable)."""
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        return x.astype(jnp.complex64)
    xf = x.astype(jnp.float32)
    return jax.lax.complex(xf, jnp.zeros_like(xf))


@jax.jit
def fm_demodulate(iq: jax.Array, gain: float = 1.0) -> jax.Array:
    """Quadrature discriminator: angle(z[n] * conj(z[n-1])) * gain.

    The instantaneous frequency of the complex baseband, in radians/sample;
    the first output sample is 0 (prev is zero-padded: angle(z*conj(0)) =
    atan2(0,0) = 0 — the same zero-history convention as every causal stage,
    which keeps time-sharded halos consistent with the unsharded chain).
    """
    z = _to_c64(iq)
    prev = jnp.pad(z[..., :-1], [(0, 0)] * (z.ndim - 1) + [(1, 0)])
    d = z * jnp.conj(prev)
    return jnp.arctan2(jnp.imag(d), jnp.real(d)).astype(jnp.float32) * gain


@jax.jit
def am_demodulate(iq: jax.Array) -> jax.Array:
    """Envelope detector: |z| with the DC carrier removed per channel."""
    env = jnp.abs(_to_c64(iq)).astype(jnp.float32)
    return env - jnp.mean(env, axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=())
def frequency_translate(x: jax.Array, freq_norm: jax.Array | float) -> jax.Array:
    """Mix a signal down/up by freq (cycles/sample): x * exp(-2πi f n)."""
    t = x.shape[-1]
    n = jnp.arange(t, dtype=jnp.float32)
    theta = -2.0 * jnp.pi * jnp.asarray(freq_norm, jnp.float32) * n
    lo = jax.lax.complex(jnp.cos(theta), jnp.sin(theta))
    return _to_c64(x) * lo


@jax.jit
def fm_modulate(msg: jax.Array, deviation: float = 0.5) -> jax.Array:
    """Inverse of fm_demodulate (for test loopback): z = exp(i·cumsum(msg·dev))."""
    phase = jnp.cumsum(msg.astype(jnp.float32) * deviation, axis=-1)
    return jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
