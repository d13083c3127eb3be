"""FFT stage: thin, typed wrappers over XLA's TPU FFT + a streaming STFT.

XLA ships tuned TPU FFT lowerings; wrapping (rather than hand-kerneling)
is the right TPU-native call — the win is in layout discipline (time on the
minor axis, batch on sublanes) and in the sharded variants (parallel/),
not in re-deriving radix butterflies.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n", "axis"))
def fft(a, n=None, axis=-1):
    return jnp.fft.fft(a, n=n, axis=axis)


@functools.partial(jax.jit, static_argnames=("n", "axis"))
def ifft(a, n=None, axis=-1):
    return jnp.fft.ifft(a, n=n, axis=axis)


@functools.partial(jax.jit, static_argnames=("n", "axis"))
def rfft(a, n=None, axis=-1):
    return jnp.fft.rfft(a, n=n, axis=axis)


@functools.partial(jax.jit, static_argnames=("n", "axis"))
def irfft(a, n=None, axis=-1):
    return jnp.fft.irfft(a, n=n, axis=axis)


def spectral_window(window: str, nfft: int) -> np.ndarray:
    """PERIODIC analysis window (the scipy.signal spectral convention —
    np.hanning's symmetric form biases every PSD bin ~0.3%)."""
    k = np.arange(nfft)
    if window == "hann":
        return (0.5 - 0.5 * np.cos(2 * np.pi * k / nfft)).astype(np.float32)
    if window == "sqrt_hann":
        # analysis*synthesis = hann, which overlap-adds to a constant at
        # hop = nfft/2: the WOLA perfect-reconstruction pair
        return np.sqrt(0.5 - 0.5 * np.cos(2 * np.pi * k / nfft)).astype(
            np.float32
        )
    if window == "hamming":
        return (0.54 - 0.46 * np.cos(2 * np.pi * k / nfft)).astype(np.float32)
    if window == "rect":
        return np.ones(nfft, np.float32)
    raise ValueError(f"unknown window {window!r}")


@functools.partial(jax.jit, static_argnames=("nfft", "hop", "window"))
def stft(
    x: jax.Array, *, nfft: int = 1024, hop: int = 256, window: str = "hann"
) -> jax.Array:
    """Short-time FT of (channels, time) -> (channels, frames, nfft//2+1)."""
    if hop < 1:
        raise ValueError(f"hop must be >= 1, got {hop}")
    xp = x if x.ndim == 2 else x[None, :]
    c, t = xp.shape
    nframes = max(0, (t - nfft) // hop + 1)
    from ..utils.layout import overlapping_frames

    segs = overlapping_frames(xp.astype(jnp.float32), nframes, hop, nfft)
    w = jnp.asarray(spectral_window(window, nfft))
    out = jnp.fft.rfft(segs * w, axis=-1)
    return out if x.ndim == 2 else out[0]


@functools.partial(jax.jit, static_argnames=("nfft", "hop", "window"))
def istft(
    s: jax.Array, *, nfft: int = 1024, hop: int = 512, window: str = "sqrt_hann"
) -> jax.Array:
    """Inverse STFT by windowed overlap-add — the WOLA synthesis bank.

    With ``window='sqrt_hann'`` and ``hop = nfft // 2`` this is the exact
    inverse of :func:`stft` with the same arguments (analysis x synthesis
    window = periodic hann, which overlap-adds to 1 at 50% overlap): STFT-
    domain processing pipelines reconstruct perfectly away from the edges.
    Requires ``nfft % hop == 0``; the OLA is R-1 shifted adds (R = ratio),
    never a scatter.

    ``s``: (..., frames, nfft//2+1) complex -> (..., (frames-1)*hop + nfft).
    """
    if hop < 1 or nfft % hop != 0:
        raise ValueError(f"need hop >= 1 dividing nfft, got hop={hop} nfft={nfft}")
    r = nfft // hop
    squeeze = s.ndim == 2
    sp = s[None] if squeeze else s
    frames = jnp.fft.irfft(sp, n=nfft, axis=-1) * jnp.asarray(
        spectral_window(window, nfft)
    )
    c, f, _ = frames.shape
    t_out = (f - 1) * hop + nfft
    # OLA without scatter: frame j contributes its part i (hop samples) to
    # output segment j+i; sum R shifted (frames, hop) planes
    parts = frames.reshape(c, f, r, hop)
    out = jnp.zeros((c, f + r - 1, hop), jnp.float32)
    for i in range(r):
        out = out.at[:, i : i + f, :].add(parts[:, :, i, :])
    y = out.reshape(c, (f + r - 1) * hop)[:, :t_out]
    return y[0] if squeeze else y


@functools.partial(jax.jit, static_argnames=("nfft",))
def power_spectrum(x: jax.Array, *, nfft: int = 1024) -> jax.Array:
    """Mean periodogram over whole frames of the signal."""
    s = stft(x, nfft=nfft, hop=nfft, window="rect")
    return jnp.mean(jnp.abs(s) ** 2, axis=-2)


@functools.partial(jax.jit, static_argnames=("nfft", "hop", "window", "scaling"))
def welch(
    x: jax.Array,
    *,
    nfft: int = 1024,
    hop: int | None = None,
    window: str = "hann",
    fs: float = 1.0,
    scaling: str = "density",
) -> jax.Array:
    """Welch PSD estimate of (channels, time) or (time,) -> (..., nfft//2+1).

    Mean of windowed-overlapped periodograms (default 50% overlap),
    normalized like scipy.signal.welch: "density" divides by fs*sum(w^2),
    one-sided doubling of the interior bins.
    """
    if hop is None:
        hop = nfft // 2
    if hop < 1:
        raise ValueError(f"hop must be >= 1, got {hop}")
    s = stft(x, nfft=nfft, hop=hop, window=window)
    w = spectral_window(window, nfft)  # same array the STFT applied
    if scaling == "density":
        norm = fs * float((w**2).sum())
    elif scaling == "spectrum":
        norm = float(w.sum()) ** 2
    else:
        raise ValueError(f"unknown scaling {scaling!r}")
    p = jnp.mean(jnp.abs(s) ** 2, axis=-2) / norm
    # one-sided: double everything but DC (and Nyquist when nfft is even)
    scale = np.full(nfft // 2 + 1, 2.0, np.float32)
    scale[0] = 1.0
    if nfft % 2 == 0:
        scale[-1] = 1.0
    return p * jnp.asarray(scale)


@functools.partial(jax.jit, static_argnames=("nfft", "hop", "window"))
def spectrogram(
    x: jax.Array, *, nfft: int = 1024, hop: int = 256, window: str = "hann"
) -> jax.Array:
    """Power spectrogram |STFT|^2: (..., frames, nfft//2+1), float32."""
    s = stft(x, nfft=nfft, hop=hop, window=window)
    return (jnp.abs(s) ** 2).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=())
def tone_power(x: jax.Array, freqs: jax.Array) -> jax.Array:
    """Power of x at EXACT (non-bin) frequencies — the Goertzel use case.

    ``freqs``: (K,) in cycles/sample. Returns (..., K) mean-square
    amplitude estimates (a unit-amplitude sine at freq f reports ~0.25 +
    0.25 = |a/2|^2 x 2... normalized so it reports (amplitude/2)^2 * 2 =
    amplitude^2/2, the tone's mean power). On TPU the classic Goertzel
    recurrence is the wrong shape — a dot against the exact-phase
    oscillator bank (ops/demod.py) is one MXU/VPU reduction per frequency
    and stays phase-accurate at any length.
    """
    from .demod import oscillator_bank

    t = x.shape[-1]
    f = jnp.atleast_1d(jnp.asarray(freqs, jnp.float32))
    c, s = oscillator_bank(f, t)  # (K, t)
    xf = x.astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    re = jnp.tensordot(xf, c, axes=((-1,), (1,)), precision=hp) / t
    im = jnp.tensordot(xf, s, axes=((-1,), (1,)), precision=hp) / t
    return 2.0 * (re**2 + im**2)


# Full-length-FFT hilbert stops being viable somewhere past ~4M on the
# remote-compile tunnel (minutes of compile, BENCH_NOTES round 1 "deferred");
# the blocked FIR spelling compiles in seconds at any length.
HILBERT_BLOCKED_MIN_T = 1 << 22


def hilbert(x: jax.Array, *, method: str = "auto", num_taps: int = 513) -> jax.Array:
    """Analytic signal of a real input over the last axis.

    ``method='fft'``: exact one-shot spectral method (zero the negative
    frequencies, double the positive ones) — the textbook definition, used
    for short/medium signals. ``method='fir'``: the production-scale blocked
    spelling — a windowed ideal-Hilbert-kernel FIR transformer on the
    lane-blocked MXU conv (ops/fir.py), group-delay aligned, which compiles
    at 64M where the full-length FFT cannot; approximation error is the
    FIR's ripple (~1e-4 mid-band at the default 513 Kaiser taps, degrading
    near DC/Nyquist like every FIR Hilbert). ``auto`` switches to ``fir``
    at T >= HILBERT_BLOCKED_MIN_T.
    """
    if method == "auto":
        method = "fir" if x.shape[-1] >= HILBERT_BLOCKED_MIN_T else "fft"
    from ..utils.dispatch import record_choice

    record_choice("hilbert", method)
    if method == "fir":
        return hilbert_fir(x, num_taps=num_taps)
    if method != "fft":
        raise ValueError(f"unknown method {method!r}; options ('auto','fft','fir')")
    return _hilbert_fft(x)


@jax.jit
def _hilbert_fft(x: jax.Array) -> jax.Array:
    t = x.shape[-1]
    xf = jnp.fft.fft(
        jax.lax.complex(x.astype(jnp.float32), jnp.zeros_like(x, jnp.float32))
    )
    h = np.zeros(t, np.float32)
    h[0] = 1.0
    if t % 2 == 0:
        h[t // 2] = 1.0
        h[1 : t // 2] = 2.0
    else:
        h[1 : (t + 1) // 2] = 2.0
    return jnp.fft.ifft(xf * jnp.asarray(h))


def design_hilbert_fir(num_taps: int, *, beta: float = 8.0) -> np.ndarray:
    """Kaiser-windowed ideal-Hilbert-kernel FIR (type III: odd, antisymmetric).

    h[m] = 2/(pi*m) for odd offsets m from center, 0 for even — the ideal
    transformer's impulse response — windowed to ``num_taps``. Frequency
    response approximates -j*sign(f) over the band, rolling off near DC and
    Nyquist (inherent to every FIR Hilbert).
    """
    if num_taps % 2 == 0 or num_taps < 3:
        raise ValueError(f"hilbert FIR needs odd num_taps >= 3, got {num_taps}")
    mid = (num_taps - 1) // 2
    m = np.arange(num_taps) - mid
    with np.errstate(divide="ignore"):
        h = np.where(m % 2 != 0, 2.0 / (np.pi * m), 0.0)
    h[mid] = 0.0
    return (h * np.kaiser(num_taps, beta)).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("num_taps", "row_len"))
def hilbert_fir(
    x: jax.Array, *, num_taps: int = 513, row_len: int = 1 << 20
) -> jax.Array:
    """Blocked analytic signal: FIR Hilbert transformer + delay alignment.

    Lane-blocked causal MXU convs (fir.py:blocked_causal_conv) with the
    imaginary part shifted back by the group delay so it aligns with the
    real input. Edge samples within half the FIR of either end see zero
    padding (same halo semantics as every causal op).

    Long flat streams are folded into rows of ``row_len`` with a per-row
    overlap halo (overlap-save across rows): XLA's TPU conv planner goes
    pathological on wide-and-batched shapes (measured 479 s of compile at
    (32, 2.1M) vs 11 s at (64, 1.05M) for the SAME total work), so the
    default row keeps the per-row width at 1M samples.
    """
    from .fir import blocked_causal_conv

    h = jnp.asarray(design_hilbert_fir(num_taps))
    d = (num_taps - 1) // 2
    squeeze = x.ndim == 1
    xp = (x[None, :] if squeeze else x).astype(jnp.float32)
    t = xp.shape[-1]

    if xp.shape[0] == 1 and t > 2 * row_len:
        # fold: row i covers [i*L, (i+1)*L); halo = the previous row's
        # trailing (num_taps-1) samples + d future samples from the next
        halo = num_taps - 1
        tp = -(-t // row_len) * row_len
        rows = jnp.pad(xp[0], (0, tp - t)).reshape(-1, row_len)
        prev = jnp.pad(rows[:-1, -halo:], ((1, 0), (0, 0)))  # zeros row 0
        nxt = jnp.pad(rows[1:, :d], ((0, 1), (0, 0)))  # zeros last row
        ext = jnp.concatenate([prev, rows, nxt], axis=-1)
        im = blocked_causal_conv(ext, h)[:, halo + d : halo + d + row_len]
        z = jax.lax.complex(xp, im.reshape(1, tp)[:, :t])
        return z[0] if squeeze else z

    ext = jnp.pad(xp, ((0, 0), (0, d)))  # future halo for the delay shift
    im = blocked_causal_conv(ext, h)[..., d : d + t]
    z = jax.lax.complex(xp, im)
    return z[0] if squeeze else z


def envelope(x: jax.Array, *, method: str = "auto") -> jax.Array:
    """Instantaneous amplitude of a real signal: |hilbert(x)|."""
    return jnp.abs(hilbert(x, method=method)).astype(jnp.float32)
