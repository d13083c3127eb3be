"""Fused Pallas scan averagers — the flagship single-chip kernels.

TPU-native redesign of the reference's scan family (C13-C16 in SURVEY.md §2:
hillis_steele_averager.cu, blelloch_scan_averager.cu and their vectorized
variants). The CUDA architecture — per-block shared-memory scans, block
totals written to an aux array, a host-driven recursive re-launch tree over
carry levels, then a separate windowed-difference kernel — collapses on TPU
into ONE kernel invocation:

- a CUDA thread block's smem tile  →  a VMEM tile of (tile_rows, 128) lanes;
- int2/int4 vectorized loads       →  the (sublane, lane) register layout
  (vectorization is the default; the ladder disappears);
- the recursive aux-carry tree     →  a per-channel carry row in VMEM
  scratch, threaded through the *sequential* Pallas grid (TPU grid steps of
  one core run in order, unlike CUDA blocks — the property the reference
  spent three files and a host recursion working around);
- the separate window-diff kernel  →  fused into the same pass: the previous
  tile's global cumsum is kept in VMEM scratch, so ``cum[i - k*C]`` is
  on-chip and the kernel streams int16 in / int16 out at HBM speed-of-light;
- int64 accumulators               →  int32 modular arithmetic, bit-exact for
  windows <= 65535 (utils/numerics.py).

Channel handling is the reference's own trick, vectorized: the scan's
doubling stride STARTS at ``channels`` (hillis_steele_averager.cu:48), which
makes the interleaved-stream scan a per-channel segmented cumsum with zero
deinterleaving. On TPU this requires the channel phase to be row-invariant,
i.e. ``channels | 128``; other channel counts take the planar XLA path
(ops/scan_xla.py) via the public dispatcher.

Two in-tile scan variants keep the reference's algorithm ladder honest:

- ``blelloch``: work-efficient two-level scan — segmented per-row lane
  cumsum (log2(128/C) masked roll-adds), a tiny (tile_rows, C) scan of
  per-channel row totals, one broadcast add. ~9 full-tile VPU passes.
- ``hillis_steele``: the literal stride-doubling inclusive scan over the
  flat tile (log2(tile_rows*128/C) masked shifted adds). ~4x more VPU work —
  the same work-inefficiency the reference measured between its two
  families, reproduced for the benchmark ladder.

Reference anchors: segmented-scan stride trick hillis_steele_averager.cu:48,
fused windowed diff :87-100, recursive carry tree :69-84, work-efficient
up/downsweep blelloch_scan_averager.cu:72-114.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import layout
from ..utils.numerics import MAX_EXACT_WINDOW

LANES = layout.LANES
# Scratch = 2 tiles of int32 + in/out tiles; 2048 rows -> 2*2048*128*4 = 2 MiB
# concat scratch, well inside 16 MiB VMEM with double-buffered I/O tiles.
MAX_TILE_ROWS = 2048
# The carry-free windowed kernel keeps only a (hr+1)-row raw-sample tail in
# scratch, so its live int32 tiles (ext/p/rt/partials) set the VMEM budget:
# 4096 rows x 128 x 4B = 2 MiB per live value. Tile sweep on v5e (64M,
# k=1024, final kernel): 1024/1536/2048/3072/4096 rows -> 66/71/70/73-76/72
# GS/s; 3072 repeats consistently fastest.
MAX_WINDOWED_TILE_ROWS = 4096
DEFAULT_WINDOWED_TILE_ROWS = 3072
# The packed kernel's VPU variant holds two live int32 planes per pass;
# measured OOM at 4096 rows on v5e, so its budget stops at 2048.
MAX_PACKED_VPU_TILE_ROWS = 2048


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def supports_channels(channels: int) -> bool:
    """Kernel path needs a row-invariant channel phase: channels | 128."""
    return channels >= 1 and LANES % channels == 0


def windowed_tail_rows(window: int, channels: int) -> int:
    """Rows of raw-sample tail the windowed kernel carries between tiles.

    Also the halo a seeded (sharded) call must supply: the left neighbor's
    trailing ``windowed_tail_rows(...) * 128`` interleaved samples.
    """
    return layout.round_up(window * channels // LANES + 1, 8)


def windowed_supported(window: int, channels: int) -> bool:
    """True iff the carry-free windowed kernel can run this config.

    The single feasibility predicate for every dispatcher (the public
    moving_average, the sharded path, the streaming chunk op): lane-layout
    channels AND a tail (halo rounded up to whole scratch rows) that fits
    the kernel's VMEM tile budget — the tile must hold the tail.
    """
    return (
        supports_channels(channels)
        and window >= 1
        and windowed_tail_rows(window, channels) <= MAX_WINDOWED_TILE_ROWS
    )


def packed_tail_rows(window: int, channels: int) -> int:
    """Rows of packed-word tail the packed kernel carries between tiles.

    Also the halo a seeded (sharded) call must supply, in int32 PAIR words:
    ``packed_tail_rows(...) * 128`` packed words = twice that in samples.
    """
    c2 = channels // 2
    return layout.round_up(window * c2 // LANES + 1, 8)


def packed_supported(window: int, channels: int) -> bool:
    """True iff the int32 pair-packed windowed kernel can run this config.

    Needs even channels whose half respects the lane layout (each 16-bit
    plane is an interleaved stream of channels//2 channels) and a per-plane
    tail within the VMEM budget. Stream-shape requirements (even length,
    pair count | 128) are checked at call sites — they depend on n, not
    the config.
    """
    return (
        channels % 2 == 0
        and supports_channels(channels // 2)
        and window >= 1
        and packed_tail_rows(window, channels) <= MAX_WINDOWED_TILE_ROWS
    )


def _masked_roll(v, shift, axis):
    """v shifted by `shift` along axis with zero fill (non-circular)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, axis)
    return jnp.where(idx >= shift, pltpu.roll(v, shift, axis=axis), 0)


def _cumsum_rows(v):
    """Inclusive prefix sum down the rows (axis 0), log-depth roll-adds."""
    n = v.shape[0]
    s = 1
    while s < n:
        v = v + _masked_roll(v, s, 0)
        s *= 2
    return v


def _tail_mask(v, c: int):
    """Zero all but the last C lanes (where per-channel row totals live)."""
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(col >= LANES - c, v, 0)


def _fill_from_tail(w, c: int):
    """Broadcast per-channel values from the last C lanes to every lane.

    Input is full-width with nonzeros only in lanes [128-C, 128); output has
    lane l = input lane 128-C + (l % C). All ops stay 128 lanes wide —
    Mosaic rejects the narrow-slice + pad/concat spelling (layout offset
    mismatch), so the fill is a circular roll into lanes [0, C) followed by
    doubling: each masked roll-add doubles the filled region exactly once
    (the region being copied into is still zero), so every lane ends with
    exactly one copy. Needs C | 128.
    """
    out = pltpu.roll(w, c, axis=1)  # tail -> lanes [0, C); rest stays zero
    s = c
    while s < LANES:
        out = out + _masked_roll(out, s, 1)
        s *= 2
    return out


def _shift_flat(v, s: int, rows: int):
    """v[g - s] in row-major flat order, zero-filled below 0 (s static >= 0)."""
    if s == 0:
        return v
    sr, sl = divmod(s, LANES)
    if sl == 0:
        return _masked_roll(v, sr, 0) if sr else v
    a = _masked_roll(v, sr, 0) if sr else v
    b = _masked_roll(v, sr + 1, 0) if sr + 1 <= rows else jnp.zeros_like(v)
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(col >= sl, pltpu.roll(a, sl, axis=1), pltpu.roll(b, sl, axis=1))


def _tile_cumsum_blelloch(xi, channels: int):
    """Work-efficient segmented (stride-C) cumsum of a (rows, 128) int32 tile."""
    v = xi
    s = channels
    while s < LANES:  # per-row segmented lane cumsum
        v = v + _masked_roll(v, s, 1)
        s *= 2
    rt = _tail_mask(v, channels)  # per-channel row totals, tail lanes
    rp = _cumsum_rows(rt) - rt  # exclusive per-channel row prefix
    return v + _fill_from_tail(rp, channels)


def _tile_cumsum_hillis_steele(xi, channels: int):
    """Literal stride-doubling segmented scan over the flat tile (O(n log n))."""
    rows = xi.shape[0]
    n = rows * LANES
    v = xi
    s = channels
    while s < n:
        v = v + _shift_flat(v, s, rows)
        s *= 2
    return v


_MXU_BLOCK = 128  # rows per MXU scan block; 128*32768 = 2^22 < 2^24 (f32-exact)


def _tile_cumsum_mxu(xi, channels: int):
    """MXU-offloaded segmented cumsum (exact bf16 8-bit-limb matmuls).

    Samples split into exact 8-bit limbs (x = hi*256 + lo, both exact in
    bfloat16; f32 accumulation of <=128 terms of |v|<=255 is exact), so
    full-rate bf16 MXU matmuls against 0/1 triangular matrices compute
    block-local prefix sums EXACTLY. Per 128-row block B of the tile:

        Y = B @ U_C     per-row segmented lane-cumsum
                        (U_C[i,j] = 1 iff j>=i and (j-i)%C==0 — the
                         stride-starts-at-C trick as a matrix)
        P = L' @ B      strict column prefix down the rows
        S = circfold(P) per-channel row-prefix broadcast to every lane:
                        folding P by circular rolls of 64,32,...,C lanes
                        leaves each lane with the sum over its channel's
                        congruence class — no masks, no separate broadcast
        cum = Y + S + running block carry

    The two heavy O(log n)-pass VPU scans of the blelloch variant become
    four bf16 matmuls (128 MACs/element each); the VPU keeps the limb
    split/recombine, the 6-pass fold and the combine. Bit-identical output
    to the other variants. Measured on v5e (64M samples, k=1024): 19.8 GS/s
    — the 128x128 matmuls underutilize the MXU, so the VPU ``blelloch``
    variant (25.1 GS/s) remains the default; kept as the exact-MXU-scan
    reference implementation.
    """
    rows = xi.shape[0]
    assert rows % _MXU_BLOCK == 0
    r1 = jax.lax.broadcasted_iota(jnp.int32, (_MXU_BLOCK, _MXU_BLOCK), 0)
    r2 = jax.lax.broadcasted_iota(jnp.int32, (_MXU_BLOCK, _MXU_BLOCK), 1)
    u_c = ((r2 >= r1) & ((r2 - r1) % channels == 0)).astype(jnp.bfloat16)
    l_strict = (r2 < r1).astype(jnp.bfloat16)

    def mm(a, b):
        # bf16 x bf16 -> f32 runs the MXU at full rate; inputs are 8-bit
        # limbs (|v| <= 255, exact in bf16) and accumulation is exact in f32
        # (sums <= 128*255 < 2^24), so the result is an exact integer.
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    out = []
    carry = jnp.zeros((1, LANES), jnp.int32)
    for b in range(rows // _MXU_BLOCK):
        blk = xi[b * _MXU_BLOCK : (b + 1) * _MXU_BLOCK, :]
        # exact 8-bit limb split: x = hi*256 + lo, hi in [-128,127], lo in [0,255]
        hi = jnp.right_shift(blk, 8).astype(jnp.bfloat16)
        lo = jnp.bitwise_and(blk, 255).astype(jnp.bfloat16)
        y = mm(hi, u_c).astype(jnp.int32) * 256 + mm(lo, u_c).astype(jnp.int32)
        p = mm(l_strict, hi).astype(jnp.int32) * 256 + mm(l_strict, lo).astype(
            jnp.int32
        )
        s = p
        f = LANES // 2
        while f >= channels:  # circular fold: lane l accumulates its class
            s = s + pltpu.roll(s, f, axis=1)
            f //= 2
        cum = y + s + carry
        # block carry: every lane already holds its channel's running total
        # in the last row's fold... no — the fold of P excludes the last
        # row's own values; the true carry is the last row of cum broadcast
        # per channel, which circfold of the tail-masked last row provides.
        last = _tail_mask(cum[_MXU_BLOCK - 1 :, :], channels)
        f = LANES // 2
        while f >= channels:
            last = last + pltpu.roll(last, f, axis=1)
            f //= 2
        carry = last
        out.append(cum)
    return jnp.concatenate(out, axis=0)


_TILE_SCANS = {
    "blelloch": _tile_cumsum_blelloch,
    "hillis_steele": _tile_cumsum_hillis_steele,
    "mxu": _tile_cumsum_mxu,
}


def _row_window_sum(v, w: int):
    """Per-lane sum of rows [r-w+1, r] of ``v`` (valid for rows >= w-1).

    Binary-decomposition doubling — <= 2*log2(w) roll-add passes. Invariant:
    ``pw`` holds the window of ``width`` rows ending at r; ``acc`` the window
    of ``covered`` rows ending at r; extending acc downward shifts pw by
    ``covered`` so the two spans abut exactly.

    Rolls are CIRCULAR (unmasked): wrapped bottom-row garbage only reaches
    rows < w, and the windowed kernels discard all rows below their
    ``tail_rows`` (>= hr+1 >= any shift here) — saving the iota+compare+
    select of a zero-fill mask on every pass.
    """
    acc = None
    covered = 0
    pw, width = v, 1
    rem = w
    while rem:
        if rem & 1:
            if acc is None:
                acc, covered = pw, width
            else:
                acc = acc + pltpu.roll(pw, covered, axis=0)
                covered += width
        rem >>= 1
        if rem:
            pw = pw + pltpu.roll(pw, width, axis=0)
            width *= 2
    return acc


def _row_window_sum_mxu(rt, hr: int):
    """ROADMAP-item-2 experiment: _row_window_sum as banded limb matmuls.

    Per 128-row block, ws = W_intra^T rt_blk + W_prev^T rt_prev with 0/1
    banded (128, 128) masks (requires hr <= 128), each as THREE exact
    8-bit-limb bf16 matmuls (rowtot < 2^23; per-matmul limb sums < 2^15,
    f32-exact). Replaces ~2 log2(hr) VPU roll-add passes with 6 MXU
    matmuls per block. Semantics: ws[r] = sum rt[r-hr .. r-1]; rows < hr
    read wrapped/garbage like the circular-roll spelling — callers discard
    rows below tail_rows, and the first block's "previous" block is the
    tile's own wrapped tail, matching pltpu.roll semantics... except
    cross-block reads here use an explicit ROLL of rt by 128 rows, so the
    wrap behavior is identical to the VPU spelling's circular rolls.
    """
    total = rt.shape[0]
    r1 = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)  # r' (contract)
    r2 = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)  # r (out)
    w_intra = ((r1 >= r2 - hr) & (r1 <= r2 - 1)).astype(jnp.bfloat16)
    w_prev = (r1 >= r2 + 128 - hr).astype(jnp.bfloat16)

    def limbs(v):
        return (
            jax.lax.shift_right_arithmetic(v, 16).astype(jnp.bfloat16),
            jnp.bitwise_and(jax.lax.shift_right_arithmetic(v, 8), 255).astype(
                jnp.bfloat16
            ),
            jnp.bitwise_and(v, 255).astype(jnp.bfloat16),
        )

    def banded(blk, w):
        # ws[r, l] = sum_r' w[r', r] * blk[r', l]: contract the row dim
        a, b, c = limbs(blk)

        def mm(rhs):
            return jax.lax.dot_general(
                w, rhs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        return (
            mm(a).astype(jnp.int32) * 65536
            + mm(b).astype(jnp.int32) * 256
            + mm(c).astype(jnp.int32)
        )

    out = []
    for s in range(0, total, LANES):
        e = min(s + LANES, total)
        rb = e - s
        blk = rt[s:e, :]
        # full previous 128-row block (block 0 wraps to the tile tail,
        # matching the circular-roll spelling; those rows are discarded)
        prev = rt[s - LANES : s, :] if s >= LANES else rt[total - LANES :, :]
        wi = w_intra[:rb, :rb] if rb < LANES else w_intra
        wp = w_prev[:, :rb] if rb < LANES else w_prev
        out.append(banded(blk, wi) + banded(prev, wp))
    return jnp.concatenate(out, axis=0)


def _lane_prefix_and_totals_vpu(ext, channels: int):
    """(segmented per-row lane prefix, per-row class totals) via VPU rolls."""
    p = ext
    s = channels
    while s < LANES:
        p = p + _masked_roll(p, s, 1)
        s *= 2
    rt = ext
    f = LANES // 2
    while f >= channels:
        rt = rt + pltpu.roll(rt, f, axis=1)
        f //= 2
    return p, rt


def _lane_prefix_and_totals_mxu(ext, channels: int, f32_pass: bool = False):
    """Same two quantities as ONE pair of full-tile bf16-limb matmuls each.

    Cross-lane shifts (pltpu.roll axis=1) go through the permute unit and
    dominate the VPU variant's cost; both lane-wise passes are instead exact
    0/1-matrix products on the MXU (x = hi*256 + lo with |limb| <= 255 exact
    in bfloat16; f32 accumulation of <= 128 terms < 2^24 is exact):

      p  = ext @ U  where U[i,j] = 1 iff j >= i and (j-i) % C == 0
                    (the stride-starts-at-C trick as a matrix)
      rt = ext @ F  where F[i,j] = 1 iff (j-i) % C == 0
                    (class-total fold, already broadcast to every lane)

    ``f32_pass``: skip the limb split/recombine (saves ~6 VPU ops/word) and
    run ONE f32 matmul per matrix at HIGHEST precision — row sums stay
    <= 128*32768 < 2^23, exactly representable in f32, so a faithful f32
    dot is bit-exact (verified ON CHIP at w=16/1024). MEASURED 40% SLOWER
    on v5e (44.0 vs 73.7 GS/s at 64M/k=1024): HIGHEST's 6 bf16 passes cost
    3x the 2-pass limb spelling and the kernel is MXU-sensitive — the limb
    trick is load-bearing, kept as the default. The flag stays as the
    documented experiment (also note: the extra live f32 ext tile can
    exceed VMEM at extreme windows, e.g. w=65535 C=2).
    """
    r1 = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    r2 = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    same_class = (r2 - r1) % channels == 0
    if f32_pass:
        uf = ((r2 >= r1) & same_class).astype(jnp.float32)
        ff = same_class.astype(jnp.float32)
        xf = ext.astype(jnp.float32)

        def mmx(a, b):
            return jnp.dot(
                a,
                b,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )

        return mmx(xf, uf).astype(jnp.int32), mmx(xf, ff).astype(jnp.int32)
    u = ((r2 >= r1) & same_class).astype(jnp.bfloat16)
    f = same_class.astype(jnp.bfloat16)
    # scaled-limb split: hi*256 has the same 8-bit significand as hi (exact
    # in bf16), and (hi256 + lo)-sums stay < 2^23 — so the two limb matmuls
    # recombine with ONE f32 add + ONE cast (no *256 integer multiply)
    hi256 = (jnp.right_shift(ext, 8) << 8).astype(jnp.bfloat16)
    lo = jnp.bitwise_and(ext, 255).astype(jnp.bfloat16)

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    p = (mm(hi256, u) + mm(lo, u)).astype(jnp.int32)
    rt = (mm(hi256, f) + mm(lo, f)).astype(jnp.int32)
    return p, rt


def _windowed_wsum(
    ext, window: int, channels: int, lane_via_mxu: bool, lane_f32: bool = False,
    rows_via_mxu: bool = False,
):
    """Windowed per-channel sums of an int32 ext tile (the kernel core).

    wsum(r,l) = p(r,l) - p(r-hr, l-hl) + sum_{r'=r-hr}^{r-1} rowtot(r').
    """
    h = window * channels
    hr, hl = divmod(h, LANES)
    if lane_via_mxu:
        p, rt = _lane_prefix_and_totals_mxu(ext, channels, f32_pass=lane_f32)
    else:
        p, rt = _lane_prefix_and_totals_vpu(ext, channels)

    # windowed sum of row totals over rows [r-hr, r-1]. All axis-0 rolls
    # here are circular/unmasked: every shift is <= hr+1 <= tail_rows, so
    # wrapped garbage stays in rows the caller discards (< tail_rows).
    if hr == 0:
        ws = jnp.zeros_like(rt)
    elif rows_via_mxu and hr <= LANES and rt.shape[0] >= LANES:
        # masks already encode the post-roll window [r-hr, r-1]
        ws = _row_window_sum_mxu(rt, hr)
    else:
        ws = pltpu.roll(_row_window_sum(rt, hr), 1, axis=0)

    if hl == 0:
        return p - pltpu.roll(p, hr, axis=0) + ws
    # boundary lane l: lanes >= hl read p(r-hr, l-hl); lanes < hl wrap a
    # row further to p(r-hr-1, l-hl+128) and their row span gains one row
    a1 = pltpu.roll(p, hr, axis=0) if hr else p
    a2 = pltpu.roll(p, hr + 1, axis=0)
    col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    b = jnp.where(
        col >= hl, pltpu.roll(a1, hl, axis=1), pltpu.roll(a2, hl, axis=1)
    )
    ws = jnp.where(col >= hl, ws, ws + pltpu.roll(rt, hr + 1, axis=0))
    return p - b + ws


def _windowed_averager_kernel(
    *refs, window, channels, rows, tail_rows, lane_via_mxu, seeded,
    lane_f32=False, rows_via_mxu=False
):
    """Carry-free fused windowed averager (see windowed_averager_pallas)."""
    if seeded:
        seed_ref, x_ref, o_ref, tail_ref = refs
    else:
        x_ref, o_ref, tail_ref = refs
        seed_ref = None
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        if seeded:
            # tail seeded with the left neighbor's trailing raw samples
            # (sharded halo exchange, parallel/sharded_scan.py)
            tail_ref[:] = seed_ref[:].astype(jnp.int32)
        else:
            # zeroed halo semantics (gpu_utils.h:112-114): ramp-up / window
            tail_ref[:] = jnp.zeros((tail_rows, LANES), jnp.int32)

    xi = x_ref[:].astype(jnp.int32)
    ext = jnp.concatenate([tail_ref[:], xi], axis=0)  # (tail_rows+rows, 128)
    tail_ref[:] = xi[rows - tail_rows :, :]

    wsum = _windowed_wsum(
        ext, window, channels, lane_via_mxu, lane_f32, rows_via_mxu
    )
    o_ref[:] = _trunc_div_cast(wsum[tail_rows:, :], window)


def _trunc_div_i32(wsum, window: int):
    """trunc(wsum / window) kept in int32 (packed-path halves)."""
    q = _abs_div(wsum, window)
    return jnp.where(wsum < 0, -q, q)


def _windowed_packed_kernel(
    *refs, window, channels, rows, tail_rows, lane_via_mxu, seeded,
    lane_f32=False
):
    """Windowed averager over an int32-PACKED int16 stream (2 samples/word).

    int16 tiles relayout through pack/unpack on every VMEM load/store —
    measured 358 GB/s pure-copy ceiling vs 637 GB/s for int32 tiles on v5e.
    Streaming the stream as little-endian int16 PAIRS fixes the transport:
    for even channel counts a sample's channel parity equals its stream
    parity, so the low and high 16-bit planes are themselves interleaved
    streams of channels//2 channels and the same windowed math runs on each
    plane (sign-extend, compute, repack — all elementwise).
    """
    if seeded:
        seed_ref, x_ref, o_ref, tail_ref = refs
    else:
        x_ref, o_ref, tail_ref = refs
        seed_ref = None
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        if seeded:
            # tail seeded with the left neighbor's trailing packed words
            # (sharded halo exchange, parallel/sharded_scan.py)
            tail_ref[:] = seed_ref[:]
        else:
            tail_ref[:] = jnp.zeros((tail_rows, LANES), jnp.int32)

    x32 = x_ref[:]
    ext32 = jnp.concatenate([tail_ref[:], x32], axis=0)
    tail_ref[:] = x32[rows - tail_rows :, :]

    c2 = channels // 2
    lo = jnp.right_shift(jnp.left_shift(ext32, 16), 16)  # sign-extended
    hi = jnp.right_shift(ext32, 16)
    q_lo = _trunc_div_i32(
        _windowed_wsum(lo, window, c2, lane_via_mxu, lane_f32)[tail_rows:, :],
        window,
    )
    q_hi = _trunc_div_i32(
        _windowed_wsum(hi, window, c2, lane_via_mxu, lane_f32)[tail_rows:, :],
        window,
    )
    o_ref[:] = jnp.bitwise_or(
        jnp.left_shift(q_hi, 16), jnp.bitwise_and(q_lo, 0xFFFF)
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "window", "channels", "tile_rows", "lane_via_mxu", "lane_f32",
        "rows_via_mxu",
    ),
)
def windowed_averager_pallas(
    x: jax.Array,
    window: int,
    channels: int = 1,
    *,
    tile_rows: int | None = None,
    lane_via_mxu: bool = True,
    lane_f32: bool = False,
    rows_via_mxu: bool = False,
    seed: jax.Array | None = None,
) -> jax.Array:
    """Carry-free fused moving averager — the fastest variant on v5e.

    Rather than materializing the global per-channel cumsum and differencing
    it (the scan family's structure, hillis_steele_averager.cu:87-100), this
    kernel exploits that ``cum[g] - cum[g-kC]`` only ever reaches ``k*C``
    elements back: the windowed sum decomposes into per-row segmented lane
    prefixes plus a log-depth windowed sum of broadcast row totals,

        wsum(r,l) = p(r,l) - p(r-hr, l-hl) + sum_{r'=r-hr}^{r-1} rowtot(r')

    so no global carry chain, no concat-scratch rotation, and only a
    ``hr+1``-row raw-sample tail carried between grid steps. Bit-exact
    against the golden model (int32 modular arithmetic; final windowed sum
    <= 65535*32768 < 2^31). Requires channels | 128 and
    window*channels <= tile_rows*128.
    """
    _check_variant_channels("blelloch", channels)
    layout.validate_window(window, MAX_EXACT_WINDOW)
    halo = window * channels
    hr = halo // LANES
    tail_rows = layout.round_up(hr + 1, 8)
    if tile_rows is None:
        tile_rows = max(
            DEFAULT_WINDOWED_TILE_ROWS, layout.round_up(halo, LANES) // LANES
        )
        tile_rows = layout.round_up(tile_rows, 16)
    rows = _pick_tile_rows(halo, tile_rows, MAX_WINDOWED_TILE_ROWS)
    if tail_rows > rows:
        # the tile must hold the carried tail; re-check the VMEM budget
        # (windowed_supported uses the same geometry, so dispatchers never
        # reach this raise)
        rows = layout.round_up(tail_rows, 16)
        if rows > MAX_WINDOWED_TILE_ROWS:
            raise ValueError(
                f"windowed tail ({tail_rows} rows) exceeds the VMEM tile "
                f"budget ({MAX_WINDOWED_TILE_ROWS}); use method='scan'"
            )

    def raw_call(x2d):
        in_specs = [
            pl.BlockSpec((rows, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM)
        ]
        operands = [x2d]
        if seed is not None:
            in_specs.insert(
                0,
                pl.BlockSpec(
                    (tail_rows, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM
                ),
            )
            operands.insert(0, seed.reshape(tail_rows, LANES))
        return pl.pallas_call(
            functools.partial(
                _windowed_averager_kernel,
                window=window,
                channels=channels,
                rows=rows,
                tail_rows=tail_rows,
                lane_via_mxu=lane_via_mxu,
                lane_f32=lane_f32,
                rows_via_mxu=rows_via_mxu,
                seeded=seed is not None,
            ),
            out_shape=jax.ShapeDtypeStruct(x2d.shape, jnp.int16),
            grid=(layout.cdiv(x2d.shape[0], rows),),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (rows, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((tail_rows, LANES), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),  # raw-sample tail carry
            ),
            interpret=_interpret(),
        )(*operands)

    def padded_call(xs):
        x2d, n = layout.pad_flat_to_tiles(xs, rows)
        return layout.unpad_flat(raw_call(x2d), n)

    # Pad-free dispatch. Padding an unaligned stream to a tile multiple costs
    # a full extra HBM round-trip of the whole stream inside jit (measured
    # ~40% of end-to-end time at 64M samples). Whenever the length is a lane
    # multiple the kernel instead runs with a partial edge block — its
    # out-of-bounds rows are dropped by Mosaic, and since windows only look
    # BACKWARD the undefined rows of the partial input block can never reach
    # a kept output. A sub-lane remainder is re-run as a tiny tile seeded
    # with its real halo (the seed's ramp-up rows are discarded).
    n = x.shape[0]
    if seed is not None:
        if seed.shape != (tail_rows * LANES,):
            raise ValueError(
                f"seed must be the left neighbor's trailing "
                f"{tail_rows * LANES} samples (windowed_tail_rows*128), "
                f"got shape {seed.shape}"
            )
        if n % LANES != 0 or n == 0:
            raise ValueError(
                f"seeded calls need a lane-aligned stream (n % {LANES} == 0), "
                f"got {n}"
            )
        return raw_call(x.reshape(-1, LANES)).reshape(-1)
    if n % LANES == 0 and n > 0:
        return raw_call(x.reshape(-1, LANES)).reshape(-1)
    n128 = (n // LANES) * LANES
    if n128 == 0:
        return padded_call(x)
    h = min(halo, n128)
    main_out = raw_call(x[:n128].reshape(-1, LANES)).reshape(-1)
    chunk_out = padded_call(x[n128 - h :])[h:]
    return jnp.concatenate([main_out, chunk_out])


@functools.partial(
    jax.jit,
    static_argnames=("window", "channels", "tile_rows", "lane_via_mxu", "lane_f32"),
)
def windowed_averager_packed(
    x32: jax.Array,
    window: int,
    channels: int = 2,
    *,
    tile_rows: int | None = None,
    lane_via_mxu: bool = True,
    lane_f32: bool = False,
    seed: jax.Array | None = None,
) -> jax.Array:
    """Windowed averager over an int32-packed int16 stream (2 samples/word).

    ``x32`` is the little-endian pair view of the flat interleaved int16
    stream (``np.ndarray.view(np.int32)`` — free on the host; on-device
    bitcasts are NOT free on this backend, so pack at the transport layer:
    io/dataset.py's ``packed=True`` loaders emit these views). Returns the
    packed int16 output (same view convention). Requires even ``channels``
    with ``channels//2 | 128`` and an even-length stream whose pair count
    is a lane multiple; other shapes use the int16 kernel. ``seed``: the
    left neighbor's trailing ``packed_tail_rows*128`` packed words (sharded
    halo exchange). Bit-exact with :func:`windowed_averager_pallas`
    (tests/ verify both against the golden model).
    """
    if not packed_supported(window, channels):
        raise ValueError(
            f"packed kernel needs even channels with channels//2 | 128 and "
            f"the tail within VMEM, got window={window} channels={channels}; "
            "use windowed_averager_pallas"
        )
    layout.validate_window(window, MAX_EXACT_WINDOW)
    c2 = channels // 2
    halo2 = window * c2  # per-plane halo, in packed words
    tail_rows = packed_tail_rows(window, channels)
    # two int32 planes live at once: the VPU variant's extra live tiles blow
    # the 16 MiB VMEM budget past 2048 rows (measured OOM at 4096)
    max_rows = MAX_PACKED_VPU_TILE_ROWS if not lane_via_mxu else MAX_WINDOWED_TILE_ROWS
    if tile_rows is None:
        tile_rows = max(
            DEFAULT_WINDOWED_TILE_ROWS, layout.round_up(halo2, LANES) // LANES
        )
        tile_rows = min(layout.round_up(tile_rows, 16), max_rows)
    rows = _pick_tile_rows(halo2, tile_rows, max_rows)
    if tail_rows > rows:
        rows = layout.round_up(tail_rows, 16)
        if rows > max_rows:
            raise ValueError(
                f"packed windowed tail ({tail_rows} rows) exceeds the VMEM "
                f"tile budget ({max_rows})"
            )

    n32 = x32.shape[0]
    if n32 == 0 or n32 % LANES != 0:
        raise ValueError(
            f"packed stream needs a lane-aligned pair count (n32 % {LANES} "
            f"== 0), got {n32}; use windowed_averager_pallas"
        )
    in_specs = [
        pl.BlockSpec((rows, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM)
    ]
    x2d = x32.reshape(-1, LANES)
    operands = [x2d]
    if seed is not None:
        if seed.shape != (tail_rows * LANES,):
            raise ValueError(
                f"seed must be the left neighbor's trailing "
                f"{tail_rows * LANES} packed words (packed_tail_rows*128), "
                f"got shape {seed.shape}"
            )
        in_specs.insert(
            0,
            pl.BlockSpec(
                (tail_rows, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM
            ),
        )
        operands.insert(0, seed.reshape(tail_rows, LANES))
    return pl.pallas_call(
        functools.partial(
            _windowed_packed_kernel,
            window=window,
            channels=channels,
            rows=rows,
            tail_rows=tail_rows,
            lane_via_mxu=lane_via_mxu,
            lane_f32=lane_f32,
            seeded=seed is not None,
        ),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, jnp.int32),
        grid=(layout.cdiv(x2d.shape[0], rows),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (rows, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((tail_rows, LANES), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(*operands).reshape(-1)


def _shift_from_concat(concat_ref, h: int, rows: int):
    """Cumsum shifted h elements back, for the current tile.

    ``concat_ref`` rows [0, rows) hold the previous tile's global cumsum
    (zeros for tile 0 — the reference's zeroed halo prefix,
    gpu_utils.h:112-114), rows [rows, 2*rows) the current tile's.
    Requires h <= rows*128 so the window never reaches past one tile back.
    """
    hr, hl = divmod(h, LANES)
    t1 = concat_ref[rows - hr : 2 * rows - hr, :]
    if hl == 0:
        return t1
    t2 = concat_ref[rows - hr - 1 : 2 * rows - hr - 1, :]
    col = jax.lax.broadcasted_iota(jnp.int32, t1.shape, 1)
    return jnp.where(
        col >= hl, pltpu.roll(t1, hl, axis=1), pltpu.roll(t2, hl, axis=1)
    )


def _abs_div(wsum, window: int):
    """|wsum| // window, with a plain shift for power-of-two windows."""
    a = jnp.abs(wsum)
    if window & (window - 1) == 0:
        return jnp.right_shift(a, window.bit_length() - 1)
    return a // window


def _trunc_div_cast(wsum, window: int):
    """trunc(wsum / window) -> int16; |wsum| <= 65535*32768 < 2^31 so abs is safe."""
    return _trunc_div_i32(wsum, window).astype(jnp.int16)


def _scan_averager_kernel(
    x_ref, o_ref, concat_ref, carry_ref, *, window, channels, rows, variant
):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        carry_ref[:] = jnp.zeros((1, LANES), jnp.int32)
        concat_ref[0:rows, :] = jnp.zeros((rows, LANES), jnp.int32)

    xi = x_ref[:].astype(jnp.int32)
    # carry row: lane l holds the running per-channel cumsum of channel l%C
    cum = _TILE_SCANS[variant](xi, channels) + carry_ref[:]
    concat_ref[rows : 2 * rows, :] = cum
    carry_ref[:] = _fill_from_tail(_tail_mask(cum[rows - 1 :, :], channels), channels)
    shifted = _shift_from_concat(concat_ref, window * channels, rows)
    o_ref[:] = _trunc_div_cast(cum - shifted, window)
    concat_ref[0:rows, :] = cum  # rotate: current becomes previous


def _pick_tile_rows(
    halo: int, tile_rows: int | None, max_rows: int = MAX_TILE_ROWS
) -> int:
    if tile_rows is None:
        tile_rows = max(layout.DEFAULT_TILE_ROWS, layout.round_up(halo, LANES) // LANES)
        tile_rows = layout.round_up(tile_rows, 16)
    if tile_rows % 16 != 0:
        raise ValueError(f"tile_rows must be a multiple of 16, got {tile_rows}")
    if halo > tile_rows * LANES:
        raise ValueError(
            f"window*channels = {halo} exceeds one tile ({tile_rows * LANES}); "
            f"raise tile_rows (max {max_rows})"
        )
    if tile_rows > max_rows:
        raise ValueError(f"tile_rows {tile_rows} exceeds VMEM budget ({max_rows})")
    return tile_rows


def _check_variant_channels(variant: str, channels: int) -> None:
    if variant not in _TILE_SCANS:
        raise ValueError(f"unknown variant {variant!r}; options {sorted(_TILE_SCANS)}")
    if not supports_channels(channels):
        raise ValueError(
            f"Pallas scan kernels need channels | 128, got {channels}; "
            "use the planar XLA path (method='xla_scan') for other layouts"
        )


@functools.partial(
    jax.jit, static_argnames=("window", "channels", "variant", "tile_rows")
)
def scan_averager_pallas(
    x: jax.Array,
    window: int,
    channels: int = 1,
    *,
    variant: str = "blelloch",
    tile_rows: int | None = None,
) -> jax.Array:
    """Causal moving average of a flat interleaved int16 stream, one fused pass.

    Bit-exact against the golden model for ``window <= 65535`` and
    ``window*channels <= MAX_TILE_ROWS*128`` (= 262144). Streams int16 in /
    int16 out; the prefix sum, per-channel carry chain and windowed
    difference never leave VMEM.
    """
    _check_variant_channels(variant, channels)
    layout.validate_window(window, MAX_EXACT_WINDOW)
    halo = window * channels
    rows = _pick_tile_rows(halo, tile_rows)

    x2d, n = layout.pad_flat_to_tiles(x, rows)
    grid = (x2d.shape[0] // rows,)

    out = pl.pallas_call(
        functools.partial(
            _scan_averager_kernel,
            window=window,
            channels=channels,
            rows=rows,
            variant=variant,
        ),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, jnp.int16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (rows, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * rows, LANES), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # carry chain: must run in order
        ),
        interpret=_interpret(),
    )(x2d)
    return layout.unpad_flat(out, n)


@functools.partial(jax.jit, static_argnames=("window", "channels", "variant"))
def moving_average_two_pass(
    x: jax.Array, window: int, channels: int = 1, *, variant: str = "blelloch"
) -> jax.Array:
    """Scan averager for halos too large to keep in one tile's VMEM ring.

    Pass 1: fused Pallas segmented cumsum (int32 modular). Pass 2: the
    windowed difference + truncating division in XLA, reading the cumsum at
    two offsets (the reference's standalone averager_kernel,
    hillis_steele_averager.cu:87-100, as a fused elementwise consumer).
    Costs one extra int32 round-trip through HBM vs the fused kernel —
    only used when window*channels > MAX_TILE_ROWS*128.
    """
    layout.validate_window(window, MAX_EXACT_WINDOW)
    halo = window * channels
    cum = cumsum_pallas(x, channels, variant=variant)
    shifted = jnp.pad(cum, (halo, 0))[: cum.shape[0]]
    wsum = cum - shifted
    q = jnp.abs(wsum) // window
    return jnp.where(wsum < 0, -q, q).astype(jnp.int16)


def _cumsum_kernel(x_ref, o_ref, carry_ref, *, channels, rows, variant):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        carry_ref[:] = jnp.zeros((1, LANES), jnp.int32)

    if variant == "fused":
        # MXU lane passes (cross-lane rolls are the VPU bottleneck — see
        # _lane_prefix_and_totals_mxu) + cheap sublane row scan; rt is
        # already broadcast per class, so the exclusive row prefix and the
        # carry update need no tail-mask/fill passes at all.
        p, rt = _lane_prefix_and_totals_mxu(x_ref[:].astype(jnp.int32), channels)
        rincl = _cumsum_rows(rt)  # inclusive per-class row prefix, broadcast
        cum = p + (rincl - rt) + carry_ref[:]
        o_ref[:] = cum
        carry_ref[:] = carry_ref[:] + rincl[rows - 1 :, :]
        return

    cum = _TILE_SCANS[variant](x_ref[:].astype(jnp.int32), channels) + carry_ref[:]
    o_ref[:] = cum
    carry_ref[:] = _fill_from_tail(_tail_mask(cum[rows - 1 :, :], channels), channels)


@functools.partial(jax.jit, static_argnames=("channels", "variant", "tile_rows"))
def cumsum_pallas(
    x: jax.Array,
    channels: int = 1,
    *,
    variant: str = "fused",
    tile_rows: int | None = None,
) -> jax.Array:
    """Per-channel int32 modular inclusive prefix sum of an interleaved stream.

    The unfused building block (the reference's scan kernels before the
    windowed diff): used by the two-pass fallback for windows whose halo
    exceeds one tile, by the sharded scan (parallel/), and by the scan-GB/s
    roofline benchmark row. Default variant ``fused`` = MXU lane passes +
    sublane row scan; ``blelloch``/``hillis_steele``/``mxu`` keep the
    reference's algorithm ladder.
    """
    if variant != "fused":
        _check_variant_channels(variant, channels)
    elif not supports_channels(channels):
        raise ValueError(
            f"Pallas scan kernels need channels | 128, got {channels}; "
            "use the planar XLA path (method='xla_scan') for other layouts"
        )
    # fused: 2048 rows measured best (40.6 GS/s vs 34.7 at 1024, v5e 64M)
    rows = tile_rows or (2048 if variant == "fused" else layout.DEFAULT_TILE_ROWS)
    x2d, n = layout.pad_flat_to_tiles(x, rows)
    out = pl.pallas_call(
        functools.partial(_cumsum_kernel, channels=channels, rows=rows, variant=variant),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, jnp.int32),
        grid=(x2d.shape[0] // rows,),
        in_specs=[
            pl.BlockSpec((rows, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (rows, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((1, LANES), jnp.int32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(x2d)
    return layout.unpad_flat(out, n)
