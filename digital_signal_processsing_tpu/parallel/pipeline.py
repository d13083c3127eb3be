"""Sharded receiver pipeline: the full chain over a (ch, t) mesh.

BASELINE.json config 5 ("full chain: overlap-save FIR + polyphase decimate +
FM demod, 16 channels sharded across N>=2 hosts"). Strategy:

- receiver channels shard over the ``ch`` mesh axis — embarrassingly
  parallel (the DP analog);
- time shards over ``t`` with ONE raw-sample halo exchange covering the
  causal memory of *every* stage at once: channel-FIR taps + decimator taps
  + one decimated frame for the FM discriminator + audio-FIR taps (in raw
  samples). Each shard then runs the identical local chain on
  ``[halo | local]`` and drops the halo's outputs — overlap-save lifted to
  the mesh level, one ``ppermute`` per step regardless of stage count;
- the LO mix uses absolute time (chain ``t0``), so shard phases are
  globally coherent and the sharded output equals the single-device chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.chain import DspChain
from ..utils.layout import round_up
from .mesh import CHANNEL_AXIS, TIME_AXIS


def chain_halo(chain: DspChain) -> int:
    """Raw-sample causal memory of the full chain, rounded to the decimation
    grid (so every shard's polyphase phase matches the unsharded run)."""
    c = chain.config
    k_chan = int(chain.channel_taps.shape[0])
    k_audio = int(chain.audio_taps.shape[0])
    if c.fused_frontend:
        h = (k_chan - 1) + c.decimation + (k_audio - 1) * c.decimation
    else:
        k_dec = 8 * c.decimation  # decimate()'s default taps_per_phase * D
        h = (k_chan - 1) + (k_dec - 1) + c.decimation + (k_audio - 1) * c.decimation
    return round_up(h, c.decimation)


def _shard_body(
    iq_loc: jax.Array, lo_loc: jax.Array, *, chain: DspChain, halo: int
) -> jax.Array:
    d = chain.config.decimation
    t_loc = iq_loc.shape[-1]
    ndev = jax.lax.axis_size(TIME_AXIS)
    my_t = jax.lax.axis_index(TIME_AXIS)
    left = jax.lax.ppermute(
        iq_loc[:, -halo:], TIME_AXIS, perm=[(i, i + 1) for i in range(ndev - 1)]
    )  # shard 0 receives zeros: the causal startup the unsharded chain has
    ext = jnp.concatenate([left, iq_loc], axis=-1)
    # absolute index of ext[0]; shard 0's negative start is harmless — its
    # halo is zeros (matching the unsharded zero history) and its kept
    # outputs start at t0 + halo = 0.
    t0 = my_t * t_loc - halo
    out = chain(ext, t0=t0, lo_freqs=lo_loc)
    return out[:, halo // d :]


@functools.partial(jax.jit, static_argnames=("chain", "mesh"))
def sharded_chain(
    chain: DspChain, iq: jax.Array, mesh: Mesh
) -> jax.Array:
    """Run the flagship chain with channels over ``ch`` and time over ``t``.

    ``chain`` and ``mesh`` are static (hashed by identity): reuse the same
    objects across calls or every call re-traces.
    """
    c = chain.config
    ndev_t = mesh.shape[TIME_AXIS]
    ndev_c = mesh.shape[CHANNEL_AXIS]
    t = iq.shape[-1]
    if iq.shape[0] % ndev_c != 0:
        raise ValueError(
            f"{iq.shape[0]} channels not divisible by ch-axis {ndev_c}"
        )
    if t % (ndev_t * c.decimation) != 0:
        raise ValueError(
            f"time length {t} must divide into {ndev_t} shards of whole "
            f"decimation frames ({c.decimation})"
        )
    halo = chain_halo(chain)
    if halo > t // ndev_t:
        raise ValueError(
            f"chain halo {halo} exceeds one time shard ({t // ndev_t})"
        )
    spec = P(CHANNEL_AXIS, TIME_AXIS)
    fn = jax.shard_map(
        functools.partial(_shard_body, chain=chain, halo=halo),
        mesh=mesh,
        in_specs=(spec, P(CHANNEL_AXIS)),
        out_specs=spec,
        check_vma=False,
    )
    return fn(iq, chain.lo)


@functools.partial(jax.jit, static_argnames=("chain", "mesh"))
def sharded_chain_planar(
    chain: DspChain, i: jax.Array, q: jax.Array, mesh: Mesh
) -> jax.Array:
    """sharded_chain from separate I/Q float32 planes (transfer-safe: some
    PJRT backends can't stage complex64 host<->device). ``chain``/``mesh``
    are static — reuse the same objects across calls."""
    return sharded_chain(
        chain,
        jax.lax.complex(i.astype(jnp.float32), q.astype(jnp.float32)),
        mesh,
    )
