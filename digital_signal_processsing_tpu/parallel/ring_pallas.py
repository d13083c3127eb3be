"""Pallas-level ICI ring exchange: hand-rolled RDMA instead of lax.ppermute.

The XLA collective path (sharded_scan.py) is the idiomatic default; this
module is the Pallas counterpart — `pltpu.make_async_remote_copy` with DMA
semaphores pushing each shard's buffer one step around the mesh ring
(SURVEY.md §5's "right-permute pattern"; SNIPPETS.md [2]). Two reasons it
exists:

1. latency hiding: an explicit rdma handle lets a kernel overlap the
   neighbor exchange with interior compute (start -> compute -> wait),
   which `lax.ppermute` leaves to the XLA scheduler;
2. it is the building block for fully-fused multi-chip kernels (scan with
   in-kernel carry exchange) in later rounds.

`ring_shift_right` matches the collective's semantics used by the sharded
averager: device d receives device d-1's buffer; device 0 receives zeros
(the causal halo). Verified in interpret mode on the virtual CPU mesh and
drop-in tested against the ppermute path.

Restriction: Pallas dma_start supports meshes with ONE named axis only
(jax 0.9) — build the mesh with parallel.make_time_mesh; the 2-D (ch, t)
mesh raises NotImplementedError here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import TIME_AXIS


def _ring_kernel(in_ref, out_ref, send_sem, recv_sem, *, axis: str):
    ndev = lax.axis_size(axis)
    my_id = lax.axis_index(axis)
    right = lax.rem(my_id + 1, ndev)
    rdma = pltpu.make_async_remote_copy(
        src_ref=in_ref,
        dst_ref=out_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=right,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma.start()
    rdma.wait()


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# Every ring instantiation in a traced program needs its OWN collective_id:
# two pallas collectives sharing an id can cross-match their DMA semaphores
# (device A's send from exchange 1 paired with device B's wait from exchange
# 2 — a hang or wrong-data halo). A trace-time counter would only stay
# consistent across SPMD processes if every process traced ring collectives
# in exactly the same order — divergent jit-cache histories break that. The
# id is instead derived deterministically from the exchange's stable
# properties (shape/dtype/axis), which every process computes identically
# regardless of trace history; callers issuing several SAME-shaped exchanges
# in one traced program must pass distinct explicit ``collective_id``s.
def _stable_collective_id(shape, dtype, axis: str) -> int:
    import zlib

    key = f"{tuple(shape)}|{jnp.dtype(dtype).name}|{axis}".encode()
    # ids 0-15 are left free for explicit caller-assigned ids
    return 16 + (zlib.crc32(key) % 1008)


def ring_shift_right_shard(
    x_loc: jax.Array, axis: str = TIME_AXIS, *, collective_id: int | None = None
) -> jax.Array:
    """Inside shard_map: receive the LEFT neighbor's shard; device 0 gets zeros.

    x_loc must be 2-D (sublanes, lanes)-shaped for the DMA; callers reshape.
    """
    if collective_id is None:
        collective_id = _stable_collective_id(x_loc.shape, x_loc.dtype, axis)
    out = pl.pallas_call(
        functools.partial(_ring_kernel, axis=axis),
        out_shape=jax.ShapeDtypeStruct(x_loc.shape, x_loc.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id
        ),
        interpret=_interpret(),
    )(x_loc)
    # the ring wraps (device 0 receives device N-1); causal halos need zeros
    my_id = lax.axis_index(axis)
    return jnp.where(my_id == 0, jnp.zeros_like(out), out)


def ring_shift_right(x: jax.Array, mesh: Mesh, axis: str = TIME_AXIS) -> jax.Array:
    """Whole-array helper: shard x on `axis`, shift shards one step right."""
    spec = P(axis)

    def body(x_loc):
        flat = x_loc.reshape(1, -1)
        return ring_shift_right_shard(flat, axis).reshape(x_loc.shape)

    return jax.shard_map(
        body, mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False
    )(x)
