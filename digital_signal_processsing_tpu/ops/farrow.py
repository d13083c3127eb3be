"""Farrow arbitrary-rate resampling: cubic Lagrange fractional delay.

Beyond the integer/rational polyphase family (ops/resample.py): a receiver
chain that must lock to a non-integer channel rate (BASELINE.json
configs[4]'s "polyphase resample" north star, e.g. 44.1k -> 48k or a
Doppler-corrected irrational ratio) needs output samples at arbitrary
continuous positions t_m = m / rate of the input timeline.

TPU-first shape, three decisions:

1. **Exact integer phase arithmetic.** ``rate`` is snapped once to a
   rational ``up/down`` (``Fraction.limit_denominator(1 << 16)`` — timing
   error <= 1.2e-10 of a sample per step, i.e. < 8e-3 samples across a 64M
   stream), then every output position is the integer pair
   ``(n, mu_num) = divmod(4*up + m*down, up)``. No float phase
   accumulator, no drift, and the streaming path is bit-exact with the
   one-shot path because both run the identical integer recurrence.
2. **Pointwise Farrow evaluation, not per-phase tap tables.** Each output
   is the cubic Lagrange combination of 4 neighbors,
   ``y[m] = sum_j c_j(mu_m) * x[n_m + j - 1]`` — four monotone gathers plus
   a VPU polynomial. A polyphase tap-table spelling needs ``4*up`` taps
   (up to 2^18 for near-irrational ratios); the pointwise form is
   rate-independent. (The gathers are the cost to watch on TPU — see
   BENCH_NOTES.md for the measured row.)
3. **One-shot indices are trace-time constants.** For ``resample_farrow``
   the whole index/mu schedule is host-side numpy int64 (exact, unbounded);
   only the streaming path does in-graph int32 phase arithmetic (the chunk
   length is validated against the int32 envelope).

Conventions match ops/fir.py: planar ``(channels, time)`` float32 (or
``(time,)``), output m aligned so ``y[0] = x[0]`` and ``y[m] ~ x(m/rate)``.
"""

from __future__ import annotations

import dataclasses
import functools
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from .fir import _as_planar

# Denominator cap for float -> rational snapping. 2^16 keeps the worst
# timing error below 1/(2*2^32) sample/step while the streaming path's
# int32 phase arithmetic still admits ~32k-sample chunks at the cap (the
# common audio ratios reduce to tiny denominators and allow multi-M chunks).
MAX_DENOMINATOR = 1 << 16


def as_rational_rate(rate) -> tuple[int, int]:
    """(up, down) for an output/input rate ratio; floats snapped exactly once.

    Accepts a positive float/int, a ``(up, down)`` pair, or a Fraction.
    """
    if isinstance(rate, tuple):
        up, down = int(rate[0]), int(rate[1])
    elif isinstance(rate, Fraction):
        up, down = rate.numerator, rate.denominator
    else:
        if not rate > 0:
            raise ValueError(f"rate must be positive, got {rate}")
        f = Fraction(float(rate)).limit_denominator(MAX_DENOMINATOR)
        up, down = f.numerator, f.denominator
    if up < 1 or down < 1:
        raise ValueError(f"rate must be positive, got {rate!r}")
    g = np.gcd(up, down)
    return int(up // g), int(down // g)


def _lagrange4(mu: jax.Array, g0, g1, g2, g3) -> jax.Array:
    """Cubic Lagrange through nodes {-1,0,1,2} evaluated at mu in [0,1).

    g0..g3 are x[n-1], x[n], x[n+1], x[n+2]. All f32 elementwise (VPU);
    the factored node products cost 5 mults + the 4 weighted adds.
    """
    a = mu - 1.0
    b = mu - 2.0
    c = mu + 1.0
    w0 = mu * a * b * jnp.float32(-1.0 / 6.0)
    w1 = a * c * b * jnp.float32(0.5)
    w2 = mu * c * b * jnp.float32(-0.5)
    w3 = mu * c * a * jnp.float32(1.0 / 6.0)
    return w0 * g0 + w1 * g1 + w2 * g2 + w3 * g3


@jax.jit
def _farrow_gather_combine(ext, n, mu_num, inv_up):
    """Gather 4 neighbors at the scheduled indices and combine (one-shot)."""
    mu = mu_num.astype(jnp.float32) * inv_up
    g0 = jnp.take(ext, n - 1, axis=-1)
    g1 = jnp.take(ext, n, axis=-1)
    g2 = jnp.take(ext, n + 1, axis=-1)
    g3 = jnp.take(ext, n + 2, axis=-1)
    return _lagrange4(mu, g0, g1, g2, g3)


def farrow_output_len(num_samples: int, rate) -> int:
    """Output length of :func:`resample_farrow` for an input of ``num_samples``."""
    up, down = as_rational_rate(rate)
    if num_samples < 4:
        return 0
    return (num_samples - 3) * up // down + 1


# Phase-matrix (matmul) path envelope: the (down+8, up) weight matrix must
# stay a reasonable constant. 1<<22 entries = 16 MB f32 — every practical
# rational rate (audio standards, chain locking) is far below this; only
# near-irrational snaps with ~2^16 numerator AND denominator exceed it.
MATMUL_MAX_PRODUCT = 1 << 22


def resample_farrow(x: jax.Array, rate, *, method: str = "auto") -> jax.Array:
    """Arbitrary-rate resample via cubic Lagrange (Farrow) interpolation.

    ``rate`` = output rate / input rate (float, Fraction, or (up, down)).
    ``y[m]`` interpolates the input at position ``m / rate`` (so
    ``y[0] == x[0]``); the last outputs stop where the 4-tap stencil runs
    out of input. Zero left-halo like every causal op here
    (gpu_utils.h:112-114's zeroed prefix): positions before x[1] blend with
    zeros via the stencil's x[n-1] tap — only y[0] is affected, and only
    when upsampling (outputs at t < 1 blend with the zero halo).

    ``method``:
    - ``matmul`` (auto default when ``up*down <= MATMUL_MAX_PRODUCT``):
      gather-free MXU spelling — input frames of ``down`` samples (+4-tap
      spill) against a banded (down+8, up) matrix holding the per-phase
      Lagrange weights; one matmul produces ``up`` outputs per frame.
      TPU gathers measured 0.03 GS/s at 16M; this path rides the MXU.
    - ``gather``: the pointwise spelling (any rate, exact schedule) — fast
      under CPU/interpret, slow on TPU; kept for rates whose exact
      rational exceeds the matrix envelope. Production arbitrary rates
      should snap within it: ``as_rational_rate(rate)`` with a smaller
      denominator changes the rate by < 1e-7 relative.

    NOTE anti-aliasing: like any pure interpolator, decimating by more than
    ~2x needs a lowpass first (compose with ops/resample.decimate or
    fir_filter); for moderate ratios the cubic kernel's own rolloff is the
    standard Farrow trade.
    """
    up, down = as_rational_rate(rate)
    xp, squeeze = _as_planar(x)
    t = xp.shape[-1]
    m_out = farrow_output_len(t, (up, down))
    if m_out <= 0:
        raise ValueError(
            f"input too short to resample: {t} samples at rate {up}/{down}"
        )
    if method == "auto":
        # beyond the periodic-matrix envelope the exact schedule runs
        # through the scalar-prefetch segment kernel (round 3) instead of
        # the 0.03 GS/s pointwise gather
        method = "matmul" if up * down <= MATMUL_MAX_PRODUCT else "segmented"
    from ..utils.dispatch import record_choice

    record_choice("resample_farrow", method)
    if method == "matmul":
        y = _farrow_matmul(xp, up, down, m_out)
    elif method == "segmented":
        y = resample_farrow_segmented(xp, (up, down))
    elif method == "gather":
        # exact host-side schedule (numpy int64): ext position
        # q = 4*up + m*down, taps ext[q-1 .. q+2], ext = [0,0,0,0, x...]
        num = 4 * up + np.arange(m_out, dtype=np.int64) * down
        n_idx = (num // up).astype(np.int32)
        mu_num = (num % up).astype(np.int32)
        ext = jnp.pad(xp.astype(jnp.float32), ((0, 0), (4, 0)))
        y = _farrow_gather_combine(ext, n_idx, mu_num, jnp.float32(1.0 / up))
    else:
        raise ValueError(
            f"unknown method {method!r}; options ('auto', 'matmul', 'segmented', 'gather')"
        )
    return y[0] if squeeze else y


def _phase_matrix(up: int, down: int) -> np.ndarray:
    """(down+8, up) float32: K[c, r] = Lagrange weight of frame column c for
    output phase r.

    Output m = a*up + r sits at ext position num = 4*up + m*down, i.e.
    frame a's column c = 4 + (r*down)//up + (j-1) carries tap j with weight
    c_j(mu_r), mu_r = (r*down mod up)/up. Columns span [3, down+7).
    """
    k = np.zeros((down + 8, up), np.float64)
    r = np.arange(up, dtype=np.int64)
    base = 4 + (r * down) // up
    mu = ((r * down) % up).astype(np.float64) / up
    w = [
        -mu * (mu - 1) * (mu - 2) / 6,
        (mu - 1) * (mu + 1) * (mu - 2) / 2,
        -mu * (mu + 1) * (mu - 2) / 2,
        mu * (mu + 1) * (mu - 1) / 6,
    ]
    for j in range(4):
        k[base + (j - 1), r] = w[j]
    return k.astype(np.float32)


def _farrow_matmul(xp: jax.Array, up: int, down: int, m_out: int) -> jax.Array:
    from ..utils.layout import overlapping_frames

    n_frames = -(-m_out // up)
    # ext = 4-zero halo + signal + tail pad covering the last frame's spill;
    # padded columns only feed outputs >= m_out (sliced off below)
    need = n_frames * down + 8
    ext = jnp.pad(xp.astype(jnp.float32), ((0, 0), (4, 0)))
    if ext.shape[-1] < need:
        ext = jnp.pad(ext, ((0, 0), (0, need - ext.shape[-1])))
    frames = overlapping_frames(ext, n_frames, down, down + 8)
    k = jnp.asarray(_phase_matrix(up, down))
    y = jnp.einsum(
        "cfd,dr->cfr", frames, k, precision=jax.lax.Precision.HIGHEST
    )
    return y.reshape(xp.shape[0], n_frames * up)[:, :m_out]


# --- streaming ---------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FarrowState:
    """Carry for streaming Farrow resampling.

    ``tail``: last 4 raw input samples per channel (the stencil halo).
    ``phase_num``: integer numerator of the next output position relative
    to the current ext origin (ext = tail ++ chunk), in 1/up units.
    """

    tail: jax.Array  # (channels, 4) float32
    phase_num: jax.Array  # () int32


def farrow_init(rate, channels: int = 1) -> FarrowState:
    up, _ = as_rational_rate(rate)
    return FarrowState(
        tail=jnp.zeros((channels, 4), jnp.float32),
        phase_num=jnp.asarray(4 * up, jnp.int32),
    )


def farrow_max_chunk_out(chunk_len: int, rate) -> int:
    """Static output capacity of one streaming chunk (valid count <= this)."""
    up, down = as_rational_rate(rate)
    # entry phase_num >= up+1 after the first chunk and 4*up at init; the
    # capacity bound uses the smallest possible entry phase (up + 1)
    return max(((chunk_len + 1) * up - (up + 1)) // down + 1, 0)


@functools.partial(jax.jit, static_argnames=("up", "down"))
def _farrow_chunk_jit(state: FarrowState, x2d: jax.Array, up: int, down: int):
    tc = x2d.shape[-1]
    ext = jnp.concatenate([state.tail, x2d.astype(jnp.float32)], axis=-1)
    m_max = farrow_max_chunk_out(tc, (up, down))
    m = jnp.arange(m_max, dtype=jnp.int32)
    num = state.phase_num + m * down  # int32; envelope validated by caller
    # emit while the stencil fits: q + 2 <= len(ext) - 1  <=>  num <= (tc+1)*up
    count = jnp.maximum(
        ((tc + 1) * up - state.phase_num) // down + 1, 0
    ).astype(jnp.int32)
    n = jnp.clip(num // up, 1, tc + 1)
    mu = (num % up).astype(jnp.float32) * jnp.float32(1.0 / up)
    g0 = jnp.take(ext, n - 1, axis=-1)
    g1 = jnp.take(ext, n, axis=-1)
    g2 = jnp.take(ext, n + 1, axis=-1)
    g3 = jnp.take(ext, n + 2, axis=-1)
    y = jnp.where(m < count, _lagrange4(mu, g0, g1, g2, g3), 0.0)
    new_state = FarrowState(
        tail=ext[:, -4:],
        phase_num=(state.phase_num + count * down - tc * up).astype(jnp.int32),
    )
    return new_state, y, count


def farrow_chunk(
    state: FarrowState, x: jax.Array, rate
) -> tuple[FarrowState, jax.Array, jax.Array]:
    """One chunk of streaming Farrow resampling.

    Returns ``(state, y, count)``: ``y`` has the static per-chunk capacity
    (:func:`farrow_max_chunk_out`); only ``y[..., :count]`` is valid (the
    host slices — output counts necessarily vary by +-1 across chunks
    unless ``chunk_len * up % down == 0``). Valid outputs concatenated
    across chunks are BIT-exact with ``resample_farrow(method="gather")``
    on the concatenated stream: both run the identical integer phase
    recurrence and identical f32 elementwise math (the matmul path agrees
    to float rounding, ~1e-6).
    """
    up, down = as_rational_rate(rate)
    squeeze = x.ndim == 1
    x2d = x[None, :] if squeeze else x
    tc = x2d.shape[-1]
    if tc < 1:
        raise ValueError("empty chunk")
    # int32 envelope for the in-graph phase arithmetic: num reaches at most
    # (tc+1)*up + down inside the chunk. Uses the ACTUAL down — rates given
    # as explicit (up, down) pairs or Fractions bypass the
    # limit_denominator snap, so the MAX_DENOMINATOR constant would
    # under-check a caller-supplied denominator > 2^16.
    if (tc + 4) * up + down >= 2**31:
        raise ValueError(
            f"chunk of {tc} samples at rate {up}/{down} exceeds the int32 "
            f"phase envelope; use chunks <= {(2**31 - down) // up - 4} "
            "samples (or a smaller rate denominator)"
        )
    new_state, y, count = _farrow_chunk_jit(state, x2d, up, down)
    return new_state, (y[0] if squeeze else y), count


__all__ = [
    "MAX_DENOMINATOR",
    "FarrowState",
    "as_rational_rate",
    "farrow_chunk",
    "farrow_init",
    "farrow_max_chunk_out",
    "farrow_output_len",
    "resample_farrow",
]


# --- streaming (matmul spelling) ---------------------------------------------
#
# The gather chunk path above is the bit-exactness baseline; on TPU its
# gathers run at ~0.03 GS/s (BENCH_NOTES). The matmul chunk path emits
# whole FRAMES of `up` outputs through the same banded phase matrix as the
# one-shot, carrying a (down+8)-sample input tail between chunks. All
# bookkeeping is in SAMPLES (small ints), so there is no int32 phase
# envelope; outputs match the one-shot matmul path exactly except that the
# final sub-frame (< up outputs) of the whole stream is deferred until
# enough input arrives (or the stream ends).


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FarrowMatmulState:
    """Carry for matmul-spelling streaming: a right-aligned raw-input tail.

    ``buf``: the last ``down + 8`` input samples per channel (garbage in
    the unused prefix); ``valid``: how many trailing samples are real and
    not yet consumed by emitted frames (includes the initial 4-zero halo).
    """

    buf: jax.Array  # (channels, down + 8) float32
    valid: jax.Array  # () int32


def farrow_matmul_init(rate, channels: int = 1) -> FarrowMatmulState:
    up, down = as_rational_rate(rate)
    return FarrowMatmulState(
        buf=jnp.zeros((channels, down + 8), jnp.float32),
        valid=jnp.asarray(4, jnp.int32),  # the 4-zero causal ext halo
    )


def farrow_matmul_max_out(chunk_len: int, rate) -> int:
    """Static output capacity of one matmul-spelling chunk."""
    up, down = as_rational_rate(rate)
    return ((chunk_len + down + 8 - 8) // down) * up


@functools.partial(jax.jit, static_argnames=("up", "down"))
def _farrow_matmul_chunk_jit(
    state: FarrowMatmulState, x2d: jax.Array, up: int, down: int
):
    from ..utils.layout import overlapping_frames

    c, tc = x2d.shape
    ht = down + 8
    ext = jnp.concatenate([state.buf, x2d.astype(jnp.float32)], axis=-1)
    # real samples occupy ext[:, ht - valid :]; realign so frame origins sit
    # at static hops from column 0 (one dynamic-slice copy per chunk). The
    # right pad keeps start + size inside the array — dynamic_slice CLAMPS
    # an overrunning start, which would silently misalign every frame.
    padded = jnp.pad(ext, ((0, 0), (0, ht)))
    start = (ht - state.valid).astype(jnp.int32)
    sl = jax.lax.dynamic_slice(padded, (jnp.int32(0), start), (c, tc + ht))
    a_max = (tc + ht - 8) // down
    n_avail = state.valid + tc
    a_valid = jnp.maximum((n_avail - 8) // down, 0).astype(jnp.int32)
    frames = overlapping_frames(sl, a_max, down, down + 8)
    k = jnp.asarray(_phase_matrix(up, down))
    y = jnp.einsum(
        "cfd,dr->cfr", frames, k, precision=jax.lax.Precision.HIGHEST
    ).reshape(c, a_max * up)
    m = jnp.arange(a_max * up, dtype=jnp.int32)
    y = jnp.where(m < a_valid * up, y, 0.0)
    new_state = FarrowMatmulState(
        buf=ext[:, -ht:],
        valid=(n_avail - a_valid * down).astype(jnp.int32),
    )
    return new_state, y, (a_valid * up).astype(jnp.int32)


def farrow_matmul_chunk(
    state: FarrowMatmulState, x: jax.Array, rate
) -> tuple[FarrowMatmulState, jax.Array, jax.Array]:
    """One chunk of matmul-spelling Farrow resampling.

    Returns ``(state, y, count)`` like :func:`farrow_chunk`; ``y`` has the
    static capacity :func:`farrow_matmul_max_out` and only
    ``y[..., :count]`` is valid (counts are always whole multiples of
    ``up``). Concatenated valid outputs equal
    ``resample_farrow(method="matmul")`` on the concatenated stream, up to
    the deferred final sub-frame.
    """
    up, down = as_rational_rate(rate)
    squeeze = x.ndim == 1
    x2d = x[None, :] if squeeze else x
    if x2d.shape[-1] < 1:
        raise ValueError("empty chunk")
    new_state, y, count = _farrow_matmul_chunk_jit(state, x2d, up, down)
    return new_state, (y[0] if squeeze else y), count


def farrow_matmul_flush_cap(rate) -> int:
    """Static capacity of :func:`farrow_matmul_flush`'s output."""
    up, down = as_rational_rate(rate)
    return up + (2 * up) // down + 2


@functools.partial(jax.jit, static_argnames=("up", "down"))
def _farrow_matmul_flush_jit(state: FarrowMatmulState, up: int, down: int):
    ht = down + 8
    cap = up + (2 * up) // down + 2
    r = np.arange(cap, dtype=np.int64)
    n_rel = (4 + (r * down) // up).astype(np.int32)  # same pattern as frame 0
    mu = jnp.asarray(((r * down) % up).astype(np.float32) / up)
    idx = (ht - state.valid) + jnp.asarray(n_rel)  # buf is right-aligned
    g = [jnp.take(state.buf, idx + (j - 1), axis=-1) for j in range(4)]
    y = _lagrange4(mu, *g)
    # emit while the 4-tap stencil fits the valid tail
    ok = jnp.asarray(n_rel) + 2 <= state.valid - 1
    count = jnp.sum(ok.astype(jnp.int32))
    return jnp.where(ok, y, 0.0), count


def farrow_matmul_flush(
    state: FarrowMatmulState, rate
) -> tuple[jax.Array, jax.Array]:
    """Emit the stream-end outputs the whole-frame chunks deferred.

    Returns ``(y, count)`` with ``y`` of static capacity
    :func:`farrow_matmul_flush_cap`; only ``y[..., :count]`` is valid.
    Concatenating chunk outputs + the flush reproduces the one-shot
    ``resample_farrow(method="matmul")`` on the whole stream (the flush
    itself evaluates the exact pointwise schedule on the carried tail).
    """
    up, down = as_rational_rate(rate)
    y, count = _farrow_matmul_flush_jit(state, up, down)
    return y, count


# --- segment kernel: past the phase-matrix envelope (round 3) -----------------
#
# Near-irrational exact rates (up*down > MATMUL_MAX_PRODUCT, e.g. two large
# primes) have no periodic phase matrix, and the pointwise gather spelling
# measured 0.03 GS/s on TPU (BENCH_NOTES). The segmented kernel below keeps
# the EXACT integer schedule and rides the MXU anyway:
#
# 1. The cubic is refactored into the classic FARROW STRUCTURE: y[m] =
#    sum_p mu_m^p * v_p[n_m], where v_p are four fixed 4-tap FIRs of the
#    input (the Lagrange weights expanded in powers of mu). The
#    data-dependent gather now hits 4 aligned streams at ONE index.
# 2. Outputs are processed in segments of S; each segment's window start
#    row (128-sample granular) comes from a host-exact int64 schedule and
#    reaches the kernel as a PREFETCHED SCALAR, so the BlockSpec index_map
#    DMAs exactly the rows the segment needs — data-dependent tiling, the
#    TPU-native replacement for the gather.
# 3. In-kernel, each output extracts v_p[j'] from the VMEM window by a
#    ONE-HOT matmul (bit-exact: bf16x3 limb products against exact 0/1)
#    plus a Wb-row masked reduction; mu comes from exact int32 arithmetic
#    (rho < 128*up + S*down < 2^31 guarded below).
#
# Cost per output: ~4*Wb*128 MXU MACs + ~(128 + 4*Wb) VPU ops; HBM reads
# ~4*Wb*128/S samples/output. Wb = ceil window rows, S the segment size.


def _farrow_streams(xp: jax.Array, rows_needed: int) -> jax.Array:
    """(C, T) -> (C*4, rows, 128) Farrow polynomial streams on the ext grid.

    v_p[q] = sum_j a_{pj} ext[q + j - 1] with ext = [0,0,0,0, x, 0-pad];
    a_{pj} from the power-of-mu expansion of the cubic Lagrange weights
    (matches :func:`_lagrange4` to float rounding).
    """
    c, t = xp.shape
    tv = rows_needed * 128
    # big[k] = ext_grid[k-1] (5-zero left pad), so the j-th tap stream
    # A_j[q] = ext_grid[q + j - 1] is the plain slice big[j : j + tv]
    ext = jnp.pad(xp.astype(jnp.float32), ((0, 0), (5, tv - t - 5 + 3)))
    xm1, x0, x1, x2 = ext[:, :-3], ext[:, 1:-2], ext[:, 2:-1], ext[:, 3:]
    third, sixth = jnp.float32(1 / 3), jnp.float32(1 / 6)
    v0 = x0
    v1 = -third * xm1 - 0.5 * x0 + x1 - sixth * x2
    v2 = 0.5 * (xm1 + x1) - x0
    v3 = sixth * (x2 - xm1) + 0.5 * (x0 - x1)
    v = jnp.stack([v0, v1, v2, v3], axis=1)  # (C, 4, Tv)
    return v.reshape(c * 4, rows_needed, 128)


def _farrow_segment_kernel(
    row_ref, rho_ref, rate_ref, v_ref, o_ref, scratch, *, s_out, wb, nch
):
    """One (segment, window-block) grid step; compute fires on the last one.

    ``wb`` counts 8-row (1024-sample) window blocks — the Pallas TPU block
    sublane granularity; the window start is 1024-sample aligned and the
    residual offset folds into the exact int32 phase ``rho``.

    ``up``/``down`` arrive as prefetched SCALARS (rate_ref), not baked
    constants — one compiled kernel serves every rate that lands on the
    same (nseg, wb, rows, c, s_out) structure (round-3: the baked
    spelling cost ~73 s of remote compile PER RATE).
    """
    from jax.experimental import pallas as pl

    s = pl.program_id(0)
    w = pl.program_id(1)
    b_total = 4 * nch
    w_rows = 8 * wb
    for b in range(b_total):
        scratch[pl.ds(b * w_rows + 8 * w, 8), :] = v_ref[b]

    @pl.when(w == wb - 1)
    def _compute():
        up = rate_ref[0]
        down = rate_ref[1]
        inv_up = jnp.float32(1.0) / up.astype(jnp.float32)
        rho0 = rho_ref[s]
        i = jax.lax.broadcasted_iota(jnp.int32, (1, s_out), 1)
        rho = rho0 + i * down
        # division-free rho // up: f32-reciprocal candidate plus exact int32
        # fix-up — integer division by a runtime value is the one elementwise
        # op the VPU has no fast lowering for. Error budget: rho < 2^27
        # (MAX_DENOMINATOR envelope) and the segmented path only runs when
        # up*down > 2^22 with down <= 2^16, so up >= 64 and the candidate is
        # within +-1 of true even with the runtime-reciprocal ulp; one
        # fix-up round restores exactness.
        jj = (rho.astype(jnp.float32) * inv_up).astype(jnp.int32)
        for _ in range(2):  # two rounds widen the correction to +-2
            r = rho - jj * up
            jj = jj + (r >= up).astype(jnp.int32) - (r < 0).astype(jnp.int32)
        mu_num = rho - jj * up
        mu = mu_num.astype(jnp.float32) * inv_up
        row = jax.lax.shift_right_logical(jj, 7)
        lane = jj - jax.lax.shift_left(row, 7)
        ol = (
            jax.lax.broadcasted_iota(jnp.int32, (128, s_out), 0)
            == jnp.broadcast_to(lane, (128, s_out))
        ).astype(jnp.float32)
        orr = (
            jax.lax.broadcasted_iota(jnp.int32, (w_rows, s_out), 0)
            == jnp.broadcast_to(row, (w_rows, s_out))
        ).astype(jnp.float32)
        inner = jax.lax.dot_general(
            scratch[:],
            ol,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (4C*W_rows, S): stream b's rows at [b*w_rows, (b+1)*w_rows)
        for ci in range(nch):
            g = []
            for p in range(4):
                b = ci * 4 + p
                sl = inner[b * w_rows : (b + 1) * w_rows, :]
                g.append(jnp.sum(sl * orr, axis=0, keepdims=True))
            y = g[0] + mu * (g[1] + mu * (g[2] + mu * g[3]))
            o_ref[0, ci : ci + 1, :] = y


def resample_farrow_segmented(
    x: jax.Array, rate, *, segment: int = 512
) -> jax.Array:
    """Exact-schedule Farrow resample for rates beyond the matrix envelope.

    Same output as ``resample_farrow(method="gather")`` to float rounding
    (identical integer index/mu schedule; the cubic is evaluated in Farrow
    power form instead of factored Lagrange products). Any rational rate;
    segments of ``segment`` outputs fetch their exact input window via
    scalar-prefetched block indices.

    The rate reaches the kernel as prefetched scalars and the grid/input
    shapes are bucketed (segment count to a multiple of 8, stream rows to
    a multiple of 1024), so nearby rates over the same stream reuse ONE
    compiled kernel — a rate sweep (Doppler search, clock-drift tracking)
    no longer pays the ~73 s Mosaic compile per rate.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    up, down = as_rational_rate(rate)
    xp, squeeze = _as_planar(x)
    c, t = xp.shape
    m_out = farrow_output_len(t, (up, down))
    if m_out <= 0:
        raise ValueError(
            f"input too short to resample: {t} samples at rate {up}/{down}"
        )
    s_out = int(segment)
    if s_out % 128 != 0:
        raise ValueError(f"segment must be a multiple of 128, got {segment}")
    if 1024 * up + s_out * down >= 2**31:
        raise ValueError(
            f"segment {s_out} at rate {up}/{down} exceeds the int32 phase "
            "envelope; use a smaller segment"
        )
    nseg = -(-m_out // s_out)
    # wb counts 8-row (1024-sample) blocks; the window covers the 1024-
    # aligned start residual (< 1024 samples) plus the segment's span
    wb = ((s_out - 1) * down // up + 1026) // 1024 + 1

    # host-exact segment schedule (int64), padded to the nseg bucket with
    # copies of the last real segment (their outputs are sliced away).
    # Bucketing only pays off when the stream is long enough that a rate
    # sweep would otherwise recompile per rate; below 64 segments the
    # padding waste (up to 7 extra segments) outweighs it, so stay exact.
    nseg_pad = -(-nseg // 8) * 8 if nseg >= 64 else nseg
    s_arr = np.arange(nseg, dtype=np.int64)
    start_num = 4 * up + s_arr * (s_out * down)
    n_start = start_num // up
    w_blocks = (n_start // 1024).astype(np.int32)
    rho0 = (start_num - w_blocks.astype(np.int64) * 1024 * up).astype(np.int32)
    if nseg_pad > nseg:
        w_blocks = np.concatenate(
            [w_blocks, np.full(nseg_pad - nseg, w_blocks[-1], np.int32)]
        )
        rho0 = np.concatenate(
            [rho0, np.full(nseg_pad - nseg, rho0[-1], np.int32)]
        )
    rows_needed = (int(w_blocks[nseg - 1]) + wb) * 8
    rows_needed = -(-rows_needed // 1024) * 1024  # bucket for compile reuse

    v = _farrow_streams(xp, rows_needed)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nseg_pad, wb),
        in_specs=[
            pl.BlockSpec(
                (4 * c, 8, 128),
                lambda s, w, row_ref, rho_ref, rate_ref: (0, row_ref[s] + w, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, c, s_out),
            lambda s, w, row_ref, rho_ref, rate_ref: (s, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((4 * c * wb * 8, 128), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _farrow_segment_kernel,
            s_out=s_out,
            wb=wb,
            nch=c,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nseg_pad, c, s_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        jnp.asarray(w_blocks),
        jnp.asarray(rho0),
        jnp.asarray([up, down], jnp.int32),
        v,
    )
    y = out.transpose(1, 0, 2).reshape(c, nseg_pad * s_out)[:, :m_out]
    return y[0] if squeeze else y


__all__.append("resample_farrow_segmented")
