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


def sweep_poly(t: jax.Array, poly, phi: float = 0.0) -> jax.Array:
    """Frequency sweep following a polynomial f(t)
    (scipy.signal.sweep_poly): phase is the exact antiderivative, no
    cumulative numeric integration."""
    import numpy as np

    c = np.atleast_1d(np.asarray(poly, np.float64))
    # antiderivative of f(t) (descending coefficients)
    integ = np.concatenate([c / np.arange(c.size, 0, -1), [0.0]])
    tf = jnp.asarray(t, jnp.float32)
    phase = jnp.polyval(jnp.asarray(integ, jnp.float32), tf)
    return jnp.cos(2.0 * jnp.pi * phase + jnp.float32(np.pi * phi / 180.0))


def unit_impulse(shape, idx=None, dtype=jnp.float32) -> jax.Array:
    """Unit impulse (scipy.signal.unit_impulse): 1 at ``idx`` (default 0;
    'mid' = center), 0 elsewhere."""
    import numpy as np

    shape = (shape,) if np.ndim(shape) == 0 else tuple(shape)
    if idx is None:
        idx = (0,) * len(shape)
    elif idx == "mid":
        idx = tuple(s // 2 for s in shape)
    elif np.ndim(idx) == 0:
        idx = (idx,) * len(shape)
    out = np.zeros(shape, np.float32)
    out[tuple(idx)] = 1.0
    return jnp.asarray(out, dtype)


def max_len_seq(nbits: int, state=None, length: int | None = None, taps=None):
    """Maximum-length (pseudorandom) sequence via an LFSR
    (scipy.signal.max_len_seq): returns ``(seq, final_state)`` of 0/1
    int8. Host-side generation (a bit-serial recurrence is the one DSP
    primitive with NO parallel spelling worth the transport; sequences are
    design-time artifacts like filter taps)."""
    import numpy as np

    default_taps = {
        2: [1], 3: [2], 4: [3], 5: [3], 6: [5], 7: [6], 8: [7, 6, 1],
        9: [5], 10: [7], 11: [9], 12: [11, 10, 4], 13: [12, 11, 8],
        14: [13, 12, 2], 15: [14], 16: [15, 13, 4], 17: [14], 18: [11],
        19: [18, 17, 14], 20: [17], 21: [19], 22: [21], 23: [18],
        24: [23, 22, 17], 25: [22], 26: [25, 24, 20], 27: [26, 25, 22],
        28: [25], 29: [27], 30: [29, 28, 7], 31: [28], 32: [31, 30, 10],
    }
    if taps is None:
        if nbits not in default_taps:
            raise ValueError(f"nbits must be in 2..32 without taps, got {nbits}")
        taps = default_taps[nbits]
    taps = np.unique(np.asarray(taps, int))[::-1]
    if np.any(taps < 0) or np.any(taps > nbits - 1):
        raise ValueError("taps must be in [0, nbits)")
    n_out = (1 << nbits) - 1 if length is None else int(length)
    if state is None:
        st = np.ones(nbits, np.int8)
    else:
        st = np.asarray(state, np.int8).copy()
        if st.size != nbits or not np.any(st):
            raise ValueError("state must be nbits long and not all zero")
    # scipy's register convention: emit state[0], feedback = state[0] xor
    # the tap states, shift LEFT, feedback enters at the top
    seq = np.empty(n_out, np.int8)
    for i in range(n_out):
        fb = st[0]
        seq[i] = fb
        for tp in taps:
            fb ^= st[tp]
        st[:-1] = st[1:]
        st[-1] = fb
    return seq, st
