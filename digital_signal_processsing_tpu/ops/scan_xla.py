"""XLA-only scan averager — the correctness anchor (SURVEY.md §7 L2a).

The reference's O(N) insight (hillis_steele_averager.cu:87-100): a causal
box filter is a windowed difference of the *per-channel* inclusive prefix
sum at frame stride ``window``:

    out[f, c] = (cum[f, c] - cum[f - k, c]) / k        (cum[<0] = 0)

The per-channel segmentation is what the reference's stride-starts-at-C
doubling trick buys on the interleaved stream (hillis_steele_averager.cu:48);
in pure XLA the natural spelling is a reshape to (frames, channels) and a
batched cumsum — the compiler owns the scan lowering. The prefix sum runs in
int32 with two's-complement wraparound, bit-exact for k <= 65535
(utils/numerics.py — this replaces the reference's int64 widening, which
TPUs lack natively).

This module is deliberately kernel-free: it anchors correctness for the
Pallas kernels (ops/pallas_scan.py) and serves any channel count, including
ones the kernels' lane layout can't (channels not dividing 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.numerics import trunc_div


@functools.partial(jax.jit, static_argnames=("window", "channels"))
def moving_average_xla(x: jax.Array, window: int, channels: int = 1) -> jax.Array:
    """Causal moving average of a flat interleaved int16 stream (XLA scan).

    Bit-exact against golden.moving_average_golden for window <= 65535.
    """
    frames = x.shape[0] // channels
    xi = x.reshape(frames, channels).astype(jnp.int32)
    csum = jnp.cumsum(xi, axis=0)  # modular int32: differences below are exact
    shifted = jnp.pad(csum, ((window, 0), (0, 0)))[:frames]
    wsum = csum - shifted
    return trunc_div(wsum, window).astype(jnp.int16).reshape(-1)


@functools.partial(jax.jit, static_argnames=("channels",))
def cumsum_interleaved_xla(x: jax.Array, channels: int = 1) -> jax.Array:
    """Per-channel int32 modular prefix sum, interleaved in/out (scan oracle)."""
    frames = x.shape[0] // channels
    xi = x.reshape(frames, channels).astype(jnp.int32)
    return jnp.cumsum(xi, axis=0).reshape(-1)
