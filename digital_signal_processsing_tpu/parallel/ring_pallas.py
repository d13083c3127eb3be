"""Pallas-level ICI ring exchange: hand-rolled RDMA instead of lax.ppermute.

The XLA collective path (sharded_scan.py) is the idiomatic default; this
module is the Pallas counterpart — `pltpu.make_async_remote_copy` with DMA
semaphores pushing each shard's buffer one step around the mesh ring
(SURVEY.md §5's "right-permute pattern"; SNIPPETS.md [2]). Two layers:

1. `ring_shift_right` / `ring_shift_right_shard`: the bare RDMA collective
   (start+wait back to back) — a drop-in ppermute replacement and the
   debugging baseline for the fused kernel;
2. `fused_ring_windowed_shard`: the fully-fused multi-chip windowed
   averager — the halo RDMA is STARTED at grid step 0, interior tiles
   compute while it flies, and only the rotated-to-last halo-dependent
   tile waits. This is the latency-hiding structure `lax.ppermute` leaves
   to the XLA scheduler; selected via
   sharded_moving_average(halo_impl="fused_ring").

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
    cid = 16 + (zlib.crc32(key) % 1008)
    _check_collective_id_collision(cid, key.decode())
    return cid


# (trace_state, id, key) triples for the most recent traces: two DIFFERENT
# exchanges hashing to one id within the SAME traced program would silently
# cross-match their DMA semaphores (hang or wrong-data halo) — detect that
# at trace time and tell the caller to disambiguate with explicit ids.
_id_registry: list = []


def _check_collective_id_collision(cid: int, key: str) -> None:
    try:
        from jax.core import get_opaque_trace_state

        trace = get_opaque_trace_state()
    except Exception:  # pragma: no cover - older jax without the API
        return
    for t, other_cid, other_key in _id_registry:
        if other_cid == cid and other_key != key and t == trace:
            raise ValueError(
                f"ring collective_id collision inside one traced program: "
                f"exchanges {other_key!r} and {key!r} both hash to id {cid}. "
                f"Pass distinct explicit collective_id values (0-15) to the "
                f"colliding ring calls."
            )
    _id_registry.append((trace, cid, key))
    if len(_id_registry) > 512:
        del _id_registry[:256]


def ring_shift_right_shard(
    x_loc: jax.Array, axis: str = TIME_AXIS, *, collective_id: int | None = None
) -> jax.Array:
    """Inside shard_map: receive the LEFT neighbor's shard; device 0 gets zeros.

    x_loc must be 2-D (sublanes, lanes)-shaped for the DMA; callers reshape.
    """
    if collective_id is None:
        collective_id = _stable_collective_id(x_loc.shape, x_loc.dtype, axis)
    # a 1-device axis is a self-copy: Mosaic requires collective_id be None
    # when no cross-device barrier exists (real-TPU lowering rejects it)
    if lax.axis_size(axis) == 1:
        collective_id = None
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


# --- fused windowed averager with in-kernel halo RDMA ------------------------
#
# The reason this module exists (#1 in the module docstring): hide the
# neighbor-halo latency behind interior compute. The sharded windowed path's
# collective spelling (parallel/sharded_scan.py) ppermutes the halo BEFORE
# the kernel launches — the exchange is on the critical path. The fused
# kernel below restructures the grid so it isn't:
#
#   grid step 0:        START the RDMA pushing my trailing tail rightward,
#                       then compute data tile 1 (its halo is local);
#   steps 1..N-2:       data tiles 2..N-1 — interior compute, the DMA is
#                       in flight underneath;
#   step N-1:           WAIT, then compute data tile 0 (the only tile that
#                       needs the remote halo), seeded from the recv buffer
#                       (zeros on device 0 — the causal halo).
#
# The raw-sample tail carry makes the rotation legal: tiles 1..N-1 still run
# in time order (the scratch carry is valid), and tile 0's tail comes from
# the wire instead of a neighbor tile. A partial last data tile is handled
# exactly as in the unrotated kernel (Mosaic drops OOB writes; its tail
# feeds nothing because the next step seeds from the recv buffer).


def _fused_ring_windowed_kernel(
    first_tail_ref,
    send_ref,
    x_ref,
    o_ref,
    tail_ref,
    recv_ref,
    send_sem,
    recv_sem,
    *,
    window: int,
    channels: int,
    rows: int,
    tail_rows: int,
    n_tiles: int,
    axis: str,
):
    from ..ops.pallas_scan import LANES, _trunc_div_cast, _windowed_wsum

    t = pl.program_id(0)
    ndev = lax.axis_size(axis)
    my_id = lax.axis_index(axis)
    right = lax.rem(my_id + 1, ndev)
    rdma = pltpu.make_async_remote_copy(
        src_ref=send_ref,
        dst_ref=recv_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=right,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )

    @pl.when(t == 0)
    def _start():
        rdma.start()
        # seed for data tile 1: data tile 0's trailing rows (local)
        tail_ref[:] = first_tail_ref[:].astype(jnp.int32)

    @pl.when(t == n_tiles - 1)
    def _finish():
        rdma.wait()
        z = recv_ref[:].astype(jnp.int32)
        # the ring wraps; device 0's causal halo is zeros (gpu_utils.h:112-114)
        tail_ref[:] = jnp.where(my_id == 0, jnp.zeros_like(z), z)

    xi = x_ref[:].astype(jnp.int32)
    ext = jnp.concatenate([tail_ref[:], xi], axis=0)
    tail_ref[:] = xi[rows - tail_rows :, :]
    wsum = _windowed_wsum(ext, window, channels, True)
    o_ref[:] = _trunc_div_cast(wsum[tail_rows:, :], window)


def fused_ring_windowed_shard(
    xs: jax.Array,
    window: int,
    channels: int,
    axis: str = TIME_AXIS,
    *,
    tile_rows: int | None = None,
    collective_id: int | None = None,
) -> jax.Array:
    """Inside shard_map: windowed averager with in-kernel halo RDMA.

    Drop-in for the ppermute + seeded-kernel spelling
    (parallel/sharded_scan.py:_shard_body_windowed) with the halo exchange
    overlapped by interior tiles. Same envelope: channels | 128, lane-
    aligned shard, shard >= windowed_tail_rows*128 samples.
    """
    from ..ops.pallas_scan import (
        DEFAULT_WINDOWED_TILE_ROWS,
        LANES,
        MAX_WINDOWED_TILE_ROWS,
        _pick_tile_rows,
        windowed_tail_rows,
    )
    from ..utils import layout

    halo = window * channels
    tail_rows = windowed_tail_rows(window, channels)
    if tile_rows is None:
        tile_rows = max(
            DEFAULT_WINDOWED_TILE_ROWS, layout.round_up(halo, LANES) // LANES
        )
        tile_rows = layout.round_up(tile_rows, 16)
    rows = _pick_tile_rows(halo, tile_rows, MAX_WINDOWED_TILE_ROWS)
    if tail_rows > rows:
        rows = layout.round_up(tail_rows, 16)
        if rows > MAX_WINDOWED_TILE_ROWS:
            raise ValueError(
                f"windowed tail ({tail_rows} rows) exceeds the VMEM tile "
                f"budget ({MAX_WINDOWED_TILE_ROWS})"
            )
    n = xs.shape[0]
    if n == 0 or n % LANES != 0:
        raise ValueError(f"fused ring needs a lane-aligned shard, got {n}")
    x2d = xs.reshape(-1, LANES)
    n_rows = x2d.shape[0]
    if n_rows < tail_rows:
        raise ValueError(
            f"shard of {n_rows} rows cannot source a {tail_rows}-row halo"
        )
    n_tiles = layout.cdiv(n_rows, rows)
    send = x2d[n_rows - tail_rows :, :]
    if n_tiles > 1:
        first_tail = x2d[rows - tail_rows : rows, :]
    else:
        first_tail = jnp.zeros((tail_rows, LANES), xs.dtype)  # overwritten
    if collective_id is None:
        collective_id = _stable_collective_id(send.shape, send.dtype, axis)
    if jax.lax.axis_size(axis) == 1:
        collective_id = None  # self-copy: Mosaic rejects an id w/o a barrier
    small = pl.BlockSpec(
        (tail_rows, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM
    )
    tile = pl.BlockSpec(
        (rows, LANES), lambda t: ((t + 1) % n_tiles, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _fused_ring_windowed_kernel,
            window=window,
            channels=channels,
            rows=rows,
            tail_rows=tail_rows,
            n_tiles=n_tiles,
            axis=axis,
        ),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, jnp.int16),
        grid=(n_tiles,),
        in_specs=[small, small, tile],
        out_specs=tile,
        scratch_shapes=[
            pltpu.VMEM((tail_rows, LANES), jnp.int32),  # tail carry
            pltpu.VMEM((tail_rows, LANES), jnp.int16),  # RDMA recv buffer
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
            collective_id=collective_id,
        ),
        interpret=_interpret(),
    )(first_tail, send, x2d)
    return out.reshape(-1)
