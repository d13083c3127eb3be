"""Time-sharded FIR via overlap-save halo exchange.

The distributed generalization of overlap-save: each device filters its
contiguous time block after receiving the last ``k-1`` samples of its left
neighbor via one ``ppermute`` (device 0 receives zeros — causal startup).
The chunk boundary math is identical to ops/fir.py's block decomposition,
lifted one level from VMEM tiles to mesh shards; channels shard over the
``ch`` axis untouched (embarrassingly parallel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import CHANNEL_AXIS, TIME_AXIS
from ..ops.fir import fir_direct, fir_overlap_save


def _shard_body(xs: jax.Array, taps: jax.Array, *, method: str) -> jax.Array:
    k = taps.shape[0]
    ndev = jax.lax.axis_size(TIME_AXIS)
    if k > 1:
        halo = jax.lax.ppermute(
            xs[..., -(k - 1) :],
            TIME_AXIS,
            perm=[(d, d + 1) for d in range(ndev - 1)],
        )
        ext = jnp.concatenate([halo, xs], axis=-1)
    else:
        ext = xs
    if method == "direct":
        y = fir_direct(ext, taps)
    else:
        y = fir_overlap_save(ext, taps)
    return y[..., (k - 1 if k > 1 else 0) :]


@functools.partial(jax.jit, static_argnames=("mesh", "method"))
def sharded_fir_filter(
    x: jax.Array,
    taps: jax.Array,
    *,
    mesh: Mesh,
    method: str = "overlap_save",
) -> jax.Array:
    """Causal FIR of a (channels, time) signal sharded (ch, t) over the mesh.

    Requires taps length - 1 <= one time shard (single-hop halo).
    """
    k = int(taps.shape[0])
    t = x.shape[-1]
    ndev = mesh.shape[TIME_AXIS]
    if t % ndev != 0:
        raise ValueError(f"time length {t} not divisible by {ndev} shards")
    if k - 1 > t // ndev:
        raise ValueError(
            f"taps-1 = {k - 1} exceeds one time shard ({t // ndev})"
        )
    if x.ndim == 1:
        spec = P(TIME_AXIS)
    else:
        spec = P(CHANNEL_AXIS, TIME_AXIS)
    fn = jax.shard_map(
        functools.partial(_shard_body, method=method),
        mesh=mesh,
        in_specs=(spec, P()),
        out_specs=spec,
    )
    return fn(x, jnp.asarray(taps))
