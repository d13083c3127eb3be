"""Signal generators: tones, chirps, noise — exact-phase, any length.

Beyond-reference utilities (the reference generated test WAVs with numpy
on the host); these run on device, use the exact fractional-phase
oscillator (ops/demod.py) so phase stays accurate at any stream offset,
and exist mostly so tests/examples/benchmarks stop hand-rolling them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .demod import _frac_mul_int


@functools.partial(jax.jit, static_argnames=("t",))
def tone(
    freq: float | jax.Array,
    t: int,
    *,
    amplitude: float = 1.0,
    phase: float = 0.0,
    t0: jax.Array | int = 0,
) -> jax.Array:
    """amplitude * sin(2π f (t0+n) + phase).

    Phase from the exact fractional multiply — accurate for any offset that
    fits int32 (t0 < 2^31; reduce larger offsets modulo 2^24/f yourself).
    """
    f = jnp.asarray(freq, jnp.float32).reshape(1, 1)
    p0 = _frac_mul_int(f, jnp.asarray(t0, jnp.int32))
    pn = _frac_mul_int(f, jnp.arange(t, dtype=jnp.int32)[None, :])
    theta = 2.0 * jnp.pi * (p0 + pn) + phase
    return (amplitude * jnp.sin(theta))[0]


@functools.partial(jax.jit, static_argnames=("t",))
def chirp(
    f0: float,
    f1: float,
    t: int,
    *,
    amplitude: float = 1.0,
) -> jax.Array:
    """Linear chirp sweeping f0 -> f1 cycles/sample over t samples.

    Instantaneous frequency f(n) = f0 + (f1-f0) n/t; phase is its integral
    2π (f0 n + (f1-f0) n^2 / (2t)). The linear term uses the exact
    fractional multiply (accurate at any length); the quadratic term is
    f32 (worst-case phase error ~ |f1-f0| * t * 2^-25 cycles — below 0.01
    cycles for t up to ~4M; prefer shorter segments beyond that).
    """
    n = jnp.arange(t, dtype=jnp.float32)
    # phase cycles = f0*n + k*n^2 with k = (f1-f0)/(2t); reduce each term
    a = jnp.asarray(f0, jnp.float32).reshape(1, 1)
    p_lin = _frac_mul_int(a, jnp.arange(t, dtype=jnp.int32)[None, :])[0]
    k = (f1 - f0) / (2.0 * t)
    nsq = n * n
    p_quad = k * nsq
    p_quad = p_quad - jnp.floor(p_quad)
    phase = p_lin + p_quad
    return amplitude * jnp.sin(2.0 * jnp.pi * (phase - jnp.floor(phase)))


def white_noise(t: int, *, amplitude: float = 1.0, seed: int = 0) -> jax.Array:
    """Gaussian white noise on device (jax.random; static shape)."""
    key = jax.random.PRNGKey(seed)
    return amplitude * jax.random.normal(key, (t,), jnp.float32)


__all__ = ["tone", "chirp", "white_noise"]
