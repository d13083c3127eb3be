"""General FIR filtering: direct (conv) and overlap-save (FFT) paths.

North-star scope beyond the reference's box filter (BASELINE.json: "general
FIR via overlap-save"). The box/moving-average kernels live in
pallas_scan/pallas_direct; this module handles arbitrary tap vectors over
planar float32 signals.

Layout convention for the float chain: ``(channels, time)`` — time on the
minor (lane) axis, channels batched on sublanes, which is the layout XLA's
TPU conv/FFT lowerings want. Causal semantics throughout: ``y[t] = sum_j
h[j] * x[t - j]`` with zeros before t=0 (same halo convention as the int16
averager: gpu_utils.h:112-114's zeroed prefix, here a trace-time pad).

Two implementations with the classic crossover:
- ``fir_direct``: lax.conv_general_dilated, O(T*k) MACs on the MXU — wins
  for short taps.
- ``fir_overlap_save``: block FFT convolution, O(T log L) — wins for long
  taps. Block length auto-picked as the power of two >= 8*k (amortizes the
  k-1 overlap to <13% redundant work).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _as_planar(x: jax.Array) -> tuple[jax.Array, bool]:
    if x.ndim == 1:
        return x[None, :], True
    if x.ndim == 2:
        return x, False
    raise ValueError(f"expected (time,) or (channels, time), got shape {x.shape}")


@functools.partial(jax.jit, static_argnames=())
def fir_direct(x: jax.Array, taps: jax.Array) -> jax.Array:
    """Causal direct-form FIR of (channels, time) or (time,) float signal."""
    xp, squeeze = _as_planar(x)
    c, t = xp.shape
    k = taps.shape[0]
    # conv_general_dilated computes correlation; flip taps for convolution.
    lhs = xp[:, None, :].astype(jnp.float32)  # (N=c, C=1, W=t)
    rhs = taps[::-1][None, None, :].astype(jnp.float32)  # (O=1, I=1, W=k)
    y = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1,),
        padding=((k - 1, 0),),  # causal: zeros before t=0
        dimension_numbers=("NCW", "OIW", "NCW"),
    )[:, 0, :]
    return y[0] if squeeze else y


def _pick_block(k: int) -> int:
    return max(256, 1 << int(np.ceil(np.log2(8 * max(k, 2)))))


@functools.partial(jax.jit, static_argnames=("block",))
def fir_overlap_save(x: jax.Array, taps: jax.Array, *, block: int | None = None) -> jax.Array:
    """Causal FIR via overlap-save block FFT convolution.

    Each length-``nfft`` segment overlaps its predecessor by k-1 samples; the
    first k-1 outputs of each block are circular-convolution garbage and are
    discarded (the "save" step). Zero left-padding gives causal startup.
    """
    xp, squeeze = _as_planar(x)
    c, t = xp.shape
    k = taps.shape[0]
    L = block or _pick_block(k)
    nfft = L + _next_pow2_overlap(k)
    nblocks = -(-t // L)
    # left halo of k-1 zeros + right pad to whole blocks
    pad_r = nblocks * L - t
    xpad = jnp.pad(xp.astype(jnp.float32), ((0, 0), (k - 1, pad_r + (nfft - L - (k - 1)))))
    # segment i covers [i*L, i*L + nfft) of the padded stream — built from
    # shifted reshapes, never a gather (utils.layout.overlapping_frames)
    from ..utils.layout import overlapping_frames

    segs = overlapping_frames(xpad, nblocks, L, nfft)  # (c, nblocks, nfft)
    H = jnp.fft.rfft(taps.astype(jnp.float32), n=nfft)
    Y = jnp.fft.irfft(jnp.fft.rfft(segs, axis=-1) * H, n=nfft, axis=-1)
    y = Y[:, :, k - 1 : k - 1 + L].reshape(c, nblocks * L)[:, :t]
    return y[0] if squeeze else y


def _next_pow2_overlap(k: int) -> int:
    # extra room beyond L for the k-1 overlap, rounded so nfft stays pow2-ish
    return 1 << int(np.ceil(np.log2(max(k, 2))))


def fir_filter(x: jax.Array, taps: jax.Array, *, method: str = "auto") -> jax.Array:
    """Causal FIR with automatic direct/overlap-save crossover (~64 taps)."""
    k = int(taps.shape[0])
    if method == "auto":
        method = "direct" if k <= 64 else "overlap_save"
    if method == "direct":
        return fir_direct(x, taps)
    if method == "overlap_save":
        return fir_overlap_save(x, taps)
    raise ValueError(f"unknown FIR method {method!r}")


def design_lowpass(num_taps: int, cutoff: float, *, window: str = "hamming") -> np.ndarray:
    """Windowed-sinc lowpass taps; cutoff in normalized (0, 1) Nyquist units."""
    if not 0.0 < cutoff < 1.0:
        raise ValueError(f"cutoff must be in (0,1) of Nyquist, got {cutoff}")
    n = np.arange(num_taps) - (num_taps - 1) / 2.0
    h = np.sinc(cutoff * n) * cutoff
    if window == "hamming":
        w = np.hamming(num_taps)
    elif window == "hann":
        w = np.hanning(num_taps)
    elif window == "rect":
        w = np.ones(num_taps)
    else:
        raise ValueError(f"unknown window {window!r}")
    h = h * w
    return (h / h.sum()).astype(np.float32)


def box_taps(window: int) -> np.ndarray:
    """The moving average as an FIR: k equal taps (ties the two API families)."""
    return np.full(window, 1.0 / window, dtype=np.float32)
