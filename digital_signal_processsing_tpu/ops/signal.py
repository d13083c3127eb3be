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


@functools.partial(jax.jit, static_argnames=("t", "duty"))
def square(
    freq: float | jax.Array,
    t: int,
    *,
    duty: float = 0.5,
    t0: jax.Array | int = 0,
) -> jax.Array:
    """Square wave: +1 for the first ``duty`` of each cycle, -1 after
    (scipy.signal.square semantics on phase 2*pi*freq*n). Exact fractional
    phase, so the edges don't drift at long lengths."""
    f = jnp.asarray(freq, jnp.float32).reshape(1, 1)
    p0 = _frac_mul_int(f, jnp.asarray(t0, jnp.int32))
    pn = _frac_mul_int(f, jnp.arange(t, dtype=jnp.int32)[None, :])
    frac = (p0 + pn)[0]
    frac = frac - jnp.floor(frac)
    return jnp.where(frac < duty, 1.0, -1.0).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("t", "width"))
def sawtooth(
    freq: float | jax.Array,
    t: int,
    *,
    width: float = 1.0,
    t0: jax.Array | int = 0,
) -> jax.Array:
    """Sawtooth/triangle wave (scipy.signal.sawtooth semantics): rises
    -1 -> 1 over the first ``width`` of each cycle, falls back over the
    rest. ``width=1`` pure saw, ``width=0.5`` symmetric triangle."""
    if not 0.0 <= width <= 1.0:
        raise ValueError(f"width must be in [0, 1], got {width}")
    f = jnp.asarray(freq, jnp.float32).reshape(1, 1)
    p0 = _frac_mul_int(f, jnp.asarray(t0, jnp.int32))
    pn = _frac_mul_int(f, jnp.arange(t, dtype=jnp.int32)[None, :])
    frac = (p0 + pn)[0]
    frac = frac - jnp.floor(frac)
    rise = -1.0 + 2.0 * frac / max(width, 1e-30)
    fall = 1.0 - 2.0 * (frac - width) / max(1.0 - width, 1e-30)
    return jnp.where(frac < width, rise, fall).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("fc", "bw", "bwr"))
def gausspulse(
    t: jax.Array,
    *,
    fc: float = 1000.0,
    bw: float = 0.5,
    bwr: float = -6.0,
) -> jax.Array:
    """Gaussian-modulated sinusoid (scipy.signal.gausspulse): a cosine at
    ``fc`` Hz under a Gaussian envelope whose fractional bandwidth ``bw``
    is measured at ``bwr`` dB. ``t`` in seconds, any shape."""
    if fc < 0 or bw <= 0 or bwr >= 0:
        raise ValueError(f"need fc >= 0, bw > 0, bwr < 0; got {fc}, {bw}, {bwr}")
    import numpy as np

    ref = float(np.power(10.0, bwr / 20.0))
    a = -((np.pi * fc * bw) ** 2) / (4.0 * np.log(ref))
    tf = t.astype(jnp.float32)
    return jnp.exp(-a * tf * tf) * jnp.cos(2.0 * jnp.pi * fc * tf)


__all__ = ["tone", "chirp", "white_noise", "square", "sawtooth", "gausspulse"]
