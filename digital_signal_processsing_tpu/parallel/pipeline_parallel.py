"""Pipeline parallelism: a streaming FIR cascade staged across devices.

The PP row of the parallelism checklist (SURVEY.md §2: absent in the
reference; "optional: stage FIR→decimate→demod across chips"). DSP cascades
are the natural PP shape: S filter stages with identical chunk shapes, one
stage resident per device, microbatches (stream chunks) flowing left to
right with one ``ppermute`` per tick — a GPipe schedule where the "model"
is the filter cascade and the "activations" are audio chunks.

Because the stream is continuous, each stage also carries its streaming FIR
tail (ops/streaming.py) across microbatches, so the pipelined result is
bit-close to applying the cascade to the unchunked stream.

Schedule: ticks t = 0 .. m+S-2; device d processes microbatch t-d when
0 <= t-d < m. Device S-1 accumulates outputs; a final psum over the pp axis
(everyone else contributes zeros) replicates the result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import TIME_AXIS
from ..ops.fir import fir_direct


def _stage_body(taps_loc, x_chunks, *, axis: str):
    s = jax.lax.axis_size(axis)
    d = jax.lax.axis_index(axis)
    m, c, L = x_chunks.shape
    k = taps_loc.shape[-1]
    taps = taps_loc[0]  # (k,): this device's stage

    def tick(t, carry):
        recv, tail, out = carry
        # stage input: device 0 pulls microbatch t from the host stream;
        # others use what the left neighbor sent last tick
        mb = jnp.clip(t, 0, m - 1)
        act_in = jnp.where(d == 0, x_chunks[mb], recv)
        valid = jnp.logical_and(t - d >= 0, t - d < m)

        # streaming FIR for this stage (state advances only on valid ticks)
        ext = jnp.concatenate([tail, act_in], axis=-1)
        y_full = fir_direct(ext, taps)[..., k - 1 :]
        new_tail = jnp.where(valid, ext[..., L:], tail)
        y = jnp.where(valid, y_full, jnp.zeros_like(y_full))

        # last stage collects its finished microbatch
        out_idx = jnp.clip(t - d, 0, m - 1)
        take = jnp.logical_and(valid, d == s - 1)
        cur = jax.lax.dynamic_slice(out, (out_idx, 0, 0), (1, c, L))
        out = jax.lax.dynamic_update_slice(
            out, jnp.where(take, y[None], cur), (out_idx, 0, 0)
        )

        # hand the activation to the right neighbor for the next tick
        recv_next = jax.lax.ppermute(
            y, axis, perm=[(i, i + 1) for i in range(s - 1)]
        )
        return recv_next, new_tail, out

    recv0 = jnp.zeros((c, L), jnp.float32)
    tail0 = jnp.zeros((c, k - 1), jnp.float32)
    out0 = jnp.zeros((m, c, L), jnp.float32)
    _, _, out = jax.lax.fori_loop(0, m + s - 1, tick, (recv0, tail0, out0))
    # replicate the last stage's buffer to every device
    return jax.lax.psum(jnp.where(d == s - 1, out, jnp.zeros_like(out)), axis)


@functools.partial(jax.jit, static_argnames=("mesh",))
def pipelined_fir_cascade(
    x_chunks: jax.Array, stage_taps: jax.Array, *, mesh: Mesh
) -> jax.Array:
    """Apply a cascade of FIR stages, one stage per device, pipelined.

    x_chunks: (microbatches, channels, chunk_len) float32 — consecutive
    chunks of a continuous stream. stage_taps: (num_stages, taps) with
    num_stages == mesh time-axis size. Returns the cascaded output chunks.
    """
    s = mesh.shape[TIME_AXIS]
    if stage_taps.shape[0] != s:
        raise ValueError(
            f"{stage_taps.shape[0]} stages != {s} devices on the pp axis"
        )
    fn = jax.shard_map(
        functools.partial(_stage_body, axis=TIME_AXIS),
        mesh=mesh,
        in_specs=(P(TIME_AXIS), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(jnp.asarray(stage_taps, jnp.float32), jnp.asarray(x_chunks, jnp.float32))
