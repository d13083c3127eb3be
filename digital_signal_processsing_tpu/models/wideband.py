"""Wideband PFB receiver: one real stream -> N demodulated channels.

Second model family beside the per-channel DspChain (models/chain.py): where
the chain assumes the frontend already produced per-channel complex
baseband, this model takes ONE wideband real stream and splits it itself
with the polyphase filter-bank channelizer (ops/channelizer.py) — the
classic scanner/monitoring receiver. All N channels demodulate in a single
batched pass.

    x (T,) real @ fs
      -> PFB channelize: (N, T/N) complex baseband @ fs/N
      -> FM quadrature discriminator per channel
      -> audio FIR lowpass per channel
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.channelizer import design_prototype, pfb_channelize_planar
from ..ops.demod import fm_demodulate
from ..ops.fir import design_lowpass, fir_direct


@dataclasses.dataclass(frozen=True)
class WidebandConfig:
    n_channels: int = 64
    taps_per_phase: int = 8
    audio_taps: int = 63
    fm_gain: float = 1.0
    # mute channels whose mean baseband magnitude is below this fraction of
    # the strongest channel's (an FM discriminator turns empty channels into
    # full-scale noise — the classic scanner squelch). None = no squelch.
    squelch: float | None = 0.1


class WidebandFmReceiver:
    """Stateless wideband FM scanner; filters designed once at construction."""

    def __init__(self, config: WidebandConfig = WidebandConfig()):
        self.config = config
        self.prototype = jnp.asarray(
            design_prototype(config.n_channels, config.taps_per_phase)
        )
        self.audio_taps = jnp.asarray(design_lowpass(config.audio_taps, 0.5))

    @functools.partial(jax.jit, static_argnums=0)
    def __call__(self, x: jax.Array) -> jax.Array:
        """(T,) real float32 -> (n_channels, T // n_channels) float32 audio.

        Scales across chips with no hand-written collectives: feed a
        time-sharded input (``jax.device_put(x, NamedSharding(mesh,
        P("t")))``) and GSPMD partitions the whole pipeline — the PFB
        conv gets its halo exchange, the channel IFFT is local (the N axis
        is replicated), and the output arrives (N, t-sharded). Verified
        identical to the unsharded run in tests/test_wideband.py.
        """
        c = self.config
        i, q = pfb_channelize_planar(x, c.n_channels, self.prototype)
        audio = fm_demodulate(jax.lax.complex(i, q), gain=c.fm_gain)
        audio = fir_direct(audio, self.audio_taps)
        if c.squelch is not None:
            level = jnp.mean(jnp.sqrt(i * i + q * q), axis=-1)  # (N,)
            gate = level >= c.squelch * jnp.max(level)
            audio = audio * gate[:, None].astype(audio.dtype)
        return audio

    def example_input(self, t: int | None = None, seed: int = 0) -> np.ndarray:
        rng = np.random.default_rng(seed)
        t = t or self.config.n_channels * 4096
        return rng.normal(size=t).astype(np.float32)


__all__ = ["WidebandConfig", "WidebandFmReceiver"]
