"""XLA-only scan averager — the correctness anchor (SURVEY.md §7 L2a).

The reference's O(N) insight (hillis_steele_averager.cu:87-100) is that a
causal box filter over an interleaved multi-channel stream is a windowed
difference of the *flat* inclusive prefix sum taken at stride
``window * channels``:

    out[i] = (cumsum[i] - cumsum[i - k*C]) / k        (0 when i-k*C < 0)

— per-channel segmentation falls out for free because the stride skips whole
frames (the stride-starts-at-C trick, hillis_steele_averager.cu:48). We keep
exactly that formulation; the prefix sum runs in int32 with two's-complement
wraparound, which is bit-exact for k <= 65535 (utils/numerics.py — this
replaces the reference's int64 widening, which TPUs lack natively).

This module is deliberately kernel-free: ``jnp.cumsum`` lets XLA pick its
own scan lowering. It anchors correctness for the Pallas kernels and is
itself a strong performer (XLA fuses the shift/subtract/divide into the scan
consumer).
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
    halo = window * channels
    acc = x.astype(jnp.int32)
    csum = jnp.cumsum(acc)  # modular int32: differences below are exact
    shifted = jnp.pad(csum, (halo, 0))[: csum.shape[0]]
    wsum = csum - shifted
    return trunc_div(wsum, window).astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("channels",))
def cumsum_interleaved_xla(x: jax.Array, channels: int = 1) -> jax.Array:
    """Flat int32 modular prefix sum (per-channel segmentation is implicit)."""
    del channels  # flat scan; channel structure only matters to the consumer
    return jnp.cumsum(x.astype(jnp.int32))
