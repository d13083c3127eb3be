"""Direct windowed-sum Pallas kernel — the naive/tiled ladder, TPU-native.

Analog of the reference's O(N·k) family (C9-C12 in SURVEY.md §2):
``profilable_parallel_averager.cu:13-23`` (one thread loops k times over
global memory), ``profilable_sm_averager.cu:14-45`` (block stages a
tile+halo into shared memory first), and the int2/int4 vectorized variants.

On TPU the whole ladder is one kernel: VMEM *is* the staged tile (the
"shared memory" step is how Pallas works), and the (8, 128) register layout
*is* the vectorized load (the int2/int4 rungs have no separate existence).
What remains is the direct algorithm: the window sum as ``k`` shifted adds
of the input tile, reading the previous tile from VMEM scratch for the halo
(the zeroed-halo-prefix trick of gpu_utils.h:112-114 becomes "tile 0's
scratch is zeros").

Work is O(k) VPU passes per element — the memory-latency-vs-compute regime
split the reference's README documents survives intact on TPU: this kernel
wins only for small windows; the scan kernels (pallas_scan.py) are O(log n)
passes regardless of k. The public dispatcher picks accordingly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import layout
from .pallas_scan import (
    LANES,
    _interpret,
    _pick_tile_rows,
    _trunc_div_cast,
)

# Beyond this window the O(k) direct kernel loses to the O(log) scan kernel;
# guard the API so nobody burns VPU cycles by accident.
MAX_DIRECT_WINDOW = 256


def _shift_from_concat_raw(concat_ref, s: int, rows: int):
    """Input tile shifted s elements back in flat order, halo from prev tile."""
    if s == 0:
        return concat_ref[rows : 2 * rows, :]
    sr, sl = divmod(s, LANES)
    t1 = concat_ref[rows - sr : 2 * rows - sr, :]
    if sl == 0:
        return t1
    t2 = concat_ref[rows - sr - 1 : 2 * rows - sr - 1, :]
    col = jax.lax.broadcasted_iota(jnp.int32, t1.shape, 1)
    return jnp.where(
        col >= sl, pltpu.roll(t1, sl, axis=1), pltpu.roll(t2, sl, axis=1)
    )


def _direct_kernel(x_ref, o_ref, concat_ref, *, window, channels, rows):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        concat_ref[0:rows, :] = jnp.zeros((rows, LANES), jnp.int32)

    xi = x_ref[:].astype(jnp.int32)
    concat_ref[rows : 2 * rows, :] = xi
    # Window sum over k frames of channel-interleaved data: the j-th previous
    # frame of the same channel sits k*C..C elements back in the flat stream
    # (profilable_parallel_averager.cu:19: samples[g - i*channels]).
    wsum = xi
    for j in range(1, window):
        wsum = wsum + _shift_from_concat_raw(concat_ref, j * channels, rows)
    o_ref[:] = _trunc_div_cast(wsum, window)
    concat_ref[0:rows, :] = xi  # rotate halo


@functools.partial(jax.jit, static_argnames=("window", "channels", "tile_rows"))
def direct_averager_pallas(
    x: jax.Array,
    window: int,
    channels: int = 1,
    *,
    tile_rows: int | None = None,
) -> jax.Array:
    """Causal moving average via k shifted adds (small-window fast path)."""
    layout.validate_window(window, MAX_DIRECT_WINDOW)
    halo = window * channels
    if tile_rows is None:
        # O(k) unrolled shifted adds: on big tiles the Mosaic compiler blows
        # up on the unrolled slice chain (observed: w=64 at 1024 rows fails
        # to compile); 256 rows compiles across the whole window range and
        # measured fastest for the small windows this kernel serves.
        tile_rows = max(256, layout.round_up(halo, 16 * layout.LANES) // layout.LANES)
    rows = _pick_tile_rows(halo, tile_rows)
    x2d, n = layout.pad_flat_to_tiles(x, rows)

    out = pl.pallas_call(
        functools.partial(
            _direct_kernel, window=window, channels=channels, rows=rows
        ),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, jnp.int16),
        grid=(x2d.shape[0] // rows,),
        in_specs=[
            pl.BlockSpec((rows, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (rows, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((2 * rows, LANES), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # halo ring: must run in order
        ),
        interpret=_interpret(),
    )(x2d)
    return layout.unpad_flat(out, n)
