"""Polyphase filter-bank (PFB) channelizer — wideband split into N bands.

Beyond-reference framework op: the standard SDR structure that replaces N
parallel mix→filter→decimate chains with one polyphase FIR + one FFT,

    Y[k, m] = sum_j h[j] x[N·m − j] · e^{2πi k j / N}
            = N · IFFT_q( v_q[m] ),   v_q = h_q ⊛ u_q  (per-branch causal FIR)

with branch taps h_q[r] = h[rN+q] and branch inputs u_q[m] = x[Nm − q]
(the reverse-running commutator: u_0[m] = x[Nm], u_q[m] = x[(m−1)N + (N−q)]
for q ≥ 1). Bit-matches the literal mix-filter-decimate bank (the test
oracle) for every channel.

TPU shape: the branch FIRs are ONE dense-feature conv over block index m —
the diagonal (N in → N out) banded taps matrix keeps the MXU's feature
dims full (same trick as ops/fir.py's lane-blocked convs; a grouped
depthwise conv lowers at ~1/N utilization) — and the channel FFT is a
single batched length-N IFFT on the minor axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .fir import design_lowpass


def branch_fir(u: jax.Array, hq: jax.Array, *, dilation: int = 1) -> jax.Array:
    """Per-phase causal FIR over block index m: ONE dense diagonal conv.

    ``u``: (batch, M, N) float32 branch signals; ``hq``: (P, N) per-phase
    taps; ``dilation`` spreads the taps over the block axis (the
    2x-oversampled bank's stride-2 branch filters, ops/pfb_os.py). A
    grouped depthwise conv lowers at ~1/N MXU utilization — the diagonal
    banded (N in -> N out) rhs keeps the feature dims full.
    """
    p, n = hq.shape
    eye = np.eye(n, dtype=np.float32)
    rhs = jnp.asarray(eye[None, :, :]) * hq[::-1][:, None, :]  # (P, N, N)
    return jax.lax.conv_general_dilated(
        u,
        rhs,
        window_strides=(1,),
        padding=((dilation * (p - 1), 0),),
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=jax.lax.Precision.HIGHEST,
    )


def dft_matmul(
    re_in: jax.Array, im_in: jax.Array | None, n: int, *, sign: int = 1
) -> tuple[jax.Array, jax.Array]:
    """(..., N) @ DFT_N as two MXU matmuls: sum_q v[q] e^{sign*2πi q k / N}.

    XLA's length-N FFT over millions of rows lowers poorly on TPU; for
    N <= 128 the explicit matmul keeps the transform on the MXU, and the
    planar form never builds complex constants (PJRT portability).
    """
    qk = np.outer(np.arange(n), np.arange(n)) * (2.0 * np.pi / n)
    cos = jnp.asarray(np.cos(qk), jnp.float32)
    sin = jnp.asarray(np.sin(qk) * sign, jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    if im_in is None:
        return (
            jnp.dot(re_in, cos, precision=hp),
            jnp.dot(re_in, sin, precision=hp),
        )
    re = jnp.dot(re_in, cos, precision=hp) - jnp.dot(im_in, sin, precision=hp)
    im = jnp.dot(re_in, sin, precision=hp) + jnp.dot(im_in, cos, precision=hp)
    return re, im


def _fused_pfb_kernel(
    halo_ref, main_ref, hq_ref, cos_ref, sin_ref, re_ref, im_ref, *, p, d, rows
):
    """Branch FIR + channel DFT for one tile of blocks, entirely in VMEM.

    The composed spelling round-trips the (M, N) branch tensor through HBM
    between the conv and the two DFT matmuls; here each (rows, N) tile
    stays resident: P shifted broadcast-madds (the causal branch FIR,
    ``d``-dilated for the 2x-oversampled bank) feed the (N, N) cos/sin
    contractions directly.
    """
    e = jnp.concatenate([halo_ref[0], main_ref[0]], axis=0)  # (halo+R, N)
    # tap r weights u[m - d*r] = e rows [d*(p-1-r), d*(p-1-r)+rows)
    v = e[d * (p - 1) : d * (p - 1) + rows, :] * hq_ref[0:1, :]
    for r in range(1, p):
        off = d * (p - 1 - r)
        v = v + e[off : off + rows, :] * hq_ref[r : r + 1, :]
    hp = jax.lax.Precision.HIGHEST
    re_ref[0] = jax.lax.dot_general(
        v, cos_ref[:], (((1,), (0,)), ((), ())), precision=hp,
        preferred_element_type=jnp.float32,
    )
    im_ref[0] = jax.lax.dot_general(
        v, sin_ref[:], (((1,), (0,)), ((), ())), precision=hp,
        preferred_element_type=jnp.float32,
    )


def _fused_pfb_prepare(u, hq, *, sign: int, dilation: int, tile_rows: int):
    """Pre-kernel relayout for :func:`fused_branch_dft` (exposed so the
    r4 profile can time the relayout and the kernel separately)."""
    from ..utils.layout import overlapping_frames

    m, n = u.shape
    p = int(hq.shape[0])
    d = int(dilation)
    halo = d * (p - 1)
    # VMEM cap: the (n, n) cos/sin pair plus ~4 (rows, n) buffers must fit
    # scoped VMEM — at n=1024 the flat 512-row default OOMs the Mosaic
    # stack (measured: 20.7M vs the 16M limit, r5_channelizer_wide_ab)
    if n > 128:
        tile_rows = min(tile_rows, max(32, (tile_rows * 128) // n))
    rows = min(tile_rows, -(-m // 8) * 8)
    nt = -(-m // rows)
    uf = u.astype(jnp.float32)
    upad = jnp.pad(uf, ((0, nt * rows - m), (0, 0)))
    hal_src = jnp.pad(upad, ((halo, 0), (0, 0)))[: nt * rows + halo]
    # overlapping_frames works over the LAST axis: frame the transposed
    # rows then restore (N, nt, halo) -> (nt, halo, N)
    halos = overlapping_frames(hal_src.T, nt, rows, halo).transpose(1, 2, 0)
    main = upad.reshape(nt, rows, n)

    qk = np.outer(np.arange(n), np.arange(n)) * (2.0 * np.pi / n)
    cos = jnp.asarray(np.cos(qk), jnp.float32)
    sin = jnp.asarray(np.sin(qk) * sign, jnp.float32)
    return halos, main, cos, sin, (m, n, p, d, rows, nt)


def _fused_pfb_run(halos, main, hq, cos, sin, meta):
    """The pallas_call of :func:`fused_branch_dft` on prepared tiles."""
    import functools as _ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, n, p, d, rows, nt = meta
    halo = d * (p - 1)
    tile = lambda r: pl.BlockSpec(  # noqa: E731
        (1, r, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    const = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    re, im = pl.pallas_call(
        _ft.partial(_fused_pfb_kernel, p=p, d=d, rows=rows),
        out_shape=[
            jax.ShapeDtypeStruct((nt, rows, n), jnp.float32),
            jax.ShapeDtypeStruct((nt, rows, n), jnp.float32),
        ],
        grid=(nt,),
        in_specs=[
            tile(halo),
            tile(rows),
            const(hq),
            const(cos),
            const(sin),
        ],
        out_specs=[tile(rows), tile(rows)],
        interpret=jax.default_backend() != "tpu",
    )(halos, main, hq.astype(jnp.float32), cos, sin)
    return re.reshape(nt * rows, n)[:m], im.reshape(nt * rows, n)[:m]


def fused_branch_dft(
    u: jax.Array,
    hq: jax.Array,
    *,
    sign: int = 1,
    dilation: int = 1,
    tile_rows: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """Fused ``branch_fir`` + ``dft_matmul`` (real input): (M, N) -> 2x(M, N).

    Pallas per-tile chain (see the kernel doc); bit-close to the composed
    pair. ``hq`` must be concrete or traced — it rides VMEM, one compile
    per (P, N, dilation, tile_rows) structure.
    """
    halos, main, cos, sin, meta = _fused_pfb_prepare(
        u, hq, sign=sign, dilation=dilation, tile_rows=tile_rows
    )
    return _fused_pfb_run(halos, main, hq, cos, sin, meta)


def _fused_pfb_raw_kernel(
    x_ref, hp_ref, cos_ref, sin_ref, re_ref, im_ref, carry_ref,
    *, n, p, d, rows, hr, width
):
    """PFB straight from the RAW stream tile — no commutator, no framing.

    The r4 stage profile showed the fused path's cost was the pre-kernel
    relayouts (commutator + pads + halo arrays), each a full HBM round
    trip of the 256 MB stream. This kernel reads raw (rows, 128) tiles —
    B = 128//n blocks per row, full lanes — and folds the commutator's
    lane reversal into the tap and DFT constants:

      lane l holds block m = row*B + l//n, in-block lane lb = l%n, and is
      assigned channel-domain index q = (n - lb) % n, so the commutator
      u[m, q] = x2d[m - (q>0), sigma(q)] becomes a PER-LANE block shift
      delta(l) = (lb != 0) of the raw tile. The branch ladder then needs
      only E_s = "raw tile at block offset s" (a lane roll by n per
      intra-row step + row shifts), and the final select between the
      delta=0/1 ladders is one more block shift of the ladder OUTPUT
      (the per-lane taps hp[r, l] depend on lb only, so they commute with
      block shifts). The channel DFT rides as a block-diagonal (128, 128)
      matmul with the q-permutation folded in.

    Raw-tile carry across the sequential grid supplies the causal history
    (zeros at t=0 — the commutator's zero prefix).

    Round-5 generalization to n >= 128 (``width`` = n, B = 1): a whole
    block IS one full-lane row of the (M, n) reshape — no lane rolls at
    all, the commutator's per-lane reversal folds into the tap/DFT
    constants exactly as before, and ``bshift`` degenerates to a pure row
    shift with the lane-0 (q = 0) select. One kernel covers n = 32..1024.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _jnp = jnp
    b = width // n
    t_id = pl.program_id(0)

    @pl.when(t_id == 0)
    def _seed():
        carry_ref[:] = _jnp.zeros_like(carry_ref)

    ext = _jnp.concatenate([carry_ref[:], x_ref[:]], axis=0)  # (hr+rows, W)

    def bshift(y):
        # out[row, l] = y[row - (l < n), (l - n) % width]
        rolled = y if b == 1 else pltpu.roll(y, n, axis=1)
        down1 = _jnp.concatenate([rolled[:1] * 0.0, rolled[:-1]], axis=0)
        if b == 1:
            lane = jax.lax.broadcasted_iota(_jnp.int32, y.shape, 1)
            return _jnp.where(lane < n, down1, rolled) if n < width else down1
        lane = jax.lax.broadcasted_iota(_jnp.int32, y.shape, 1)
        return _jnp.where(lane < n, down1, rolled)

    # intra-row block-shift variants V_j = E_j, j = 0..B-1
    variants = [ext]
    for _ in range(b - 1):
        variants.append(bshift(variants[-1]))

    # ladder S0 over rows [hr-1, hr-1+rows+1): one extra leading row so the
    # final block shift (S1) has its history
    w = rows + 1
    s0 = None
    for r in range(p):
        s = d * r
        v = variants[s % b]
        r0 = hr - 1 - s // b
        term = v[r0 : r0 + w, :] * hp_ref[r : r + 1, :]
        s0 = term if s0 is None else s0 + term
    s1 = bshift(s0)
    lane = jax.lax.broadcasted_iota(_jnp.int32, (w, width), 1)
    vsel = _jnp.where(lane % n == 0, s0, s1)[1:, :]  # (rows, W)

    hp_prec = jax.lax.Precision.HIGHEST
    re_ref[:] = jax.lax.dot_general(
        vsel, cos_ref[:], (((1,), (0,)), ((), ())), precision=hp_prec,
        preferred_element_type=_jnp.float32,
    )
    im_ref[:] = jax.lax.dot_general(
        vsel, sin_ref[:], (((1,), (0,)), ((), ())), precision=hp_prec,
        preferred_element_type=_jnp.float32,
    )
    carry_ref[:] = x_ref[rows - hr :, :]


def fused_pfb_raw(
    x: jax.Array,
    n: int,
    hq: jax.Array,
    *,
    sign: int = 1,
    dilation: int = 1,
    tile_rows: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """Raw-stream fused PFB analysis: (T,) float32 -> 2x(M, N) planes.

    Envelope: T % 128 == 0 and n in {32, 64, 128} (blocks-per-row B =
    128//n, B-1 lane rolls per tile) OR n in {256, 512, 1024} (round-5
    two-level extension: tile width = n, B = 1 — a block is one full-lane
    row, so the only data movement left is the carry row shift; ROADMAP
    candidate 5 / VERDICT r4 item 3). Callers outside it use the u-tensor
    ``fused_branch_dft`` path.
    """
    import functools as _ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = x.shape[-1]
    if n <= 128:
        ok = t % 128 == 0 and n in (32, 64, 128)
    else:
        ok = n in (256, 512, 1024) and t % n == 0
    if not ok:
        raise ValueError(
            "fused_pfb_raw needs len % 128 == 0 and n in "
            f"(32, 64, 128, 256, 512, 1024); got len={t}, n={n}"
        )
    p = int(hq.shape[0])
    d = int(dilation)
    width = max(n, 128)
    b = width // n
    m = t // n
    r_rows = t // width
    hr = (d * (p - 1) + 1) // b + 2
    # VMEM budget: the (width, width) cos/sin pair + ~6 (rows, width)
    # tiles; cap rows so n=1024 stays inside VMEM (8 MB of DFT constants)
    cap = tile_rows if width <= 128 else max(32, (tile_rows * 128) // width)
    # the carry holds the last hr rows of each tile, so rows >= hr is a hard
    # kernel requirement; clamp up for short streams (the tile then extends
    # past r_rows — lookback-only OOB reads feed only dropped outputs, and
    # with nt == 1 the garbage carry is never consumed).
    rows = min(cap, -(-r_rows // 8) * 8)
    rows = max(rows, -(-hr // 8) * 8)
    nt = -(-r_rows // rows)

    x2d = x.astype(jnp.float32).reshape(r_rows, width)

    lb = np.arange(width) % n
    qv = (n - lb) % n
    # per-lane taps (p, W); hq may be traced — index with jnp (tiny gather)
    hp = jnp.take(hq.astype(jnp.float32), jnp.asarray(qv), axis=1)
    blk = np.arange(width) // n
    k_out = np.arange(width) % n
    ang = 2.0 * np.pi * np.outer(qv, k_out) / n
    mask = (blk[:, None] == blk[None, :]).astype(np.float32)
    cos = jnp.asarray((np.cos(ang) * mask).astype(np.float32))
    sin = jnp.asarray((np.sin(ang) * sign * mask).astype(np.float32))

    # partial last tile runs with Mosaic OOB semantics (reads garbage only
    # into dropped outputs — lookback-only windows; writes past r_rows are
    # dropped): zero-copy, no pad pass (BENCH_NOTES "padding is a full
    # extra HBM round-trip")
    tile = pl.BlockSpec(
        (rows, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    const = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    re, im = pl.pallas_call(
        _ft.partial(
            _fused_pfb_raw_kernel, n=n, p=p, d=d, rows=rows, hr=hr,
            width=width,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((r_rows, width), jnp.float32),
            jax.ShapeDtypeStruct((r_rows, width), jnp.float32),
        ],
        grid=(nt,),
        in_specs=[tile, const(hp), const(cos), const(sin)],
        out_specs=[tile, tile],
        scratch_shapes=[pltpu.VMEM((hr, width), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=jax.default_backend() != "tpu",
    )(x2d, hp, cos, sin)
    return re.reshape(m, n), im.reshape(m, n)


def design_prototype(
    n_channels: int, taps_per_phase: int = 8, *, window: str | tuple = "hamming"
) -> np.ndarray:
    """Prototype lowpass for an N-channel PFB: cutoff at the channel edge."""
    return design_lowpass(
        n_channels * taps_per_phase, 1.0 / n_channels, window=window
    )


@functools.partial(jax.jit, static_argnames=("n_channels", "method"))
def pfb_channelize(
    x: jax.Array,
    n_channels: int,
    taps: jax.Array | None = None,
    *,
    method: str = "auto",
) -> jax.Array:
    """Split a real stream into N complex baseband channels at rate fs/N.

    ``x``: (time,) float32, length a multiple of ``n_channels``. Returns
    (n_channels, time // n_channels) complex64 — channel k centered at
    normalized frequency k/N cycles/sample (k > N/2 are the negative
    frequencies, as in an FFT).
    """
    n = n_channels
    if x.ndim != 1:
        raise ValueError(f"expected a flat (time,) stream, got shape {x.shape}")
    t = x.shape[0]
    if t % n != 0:
        raise ValueError(f"stream length {t} not a multiple of n_channels {n}")
    if taps is None:
        taps = jnp.asarray(design_prototype(n))
    k = taps.shape[0]
    p = -(-k // n)  # taps per phase
    h = jnp.pad(taps.astype(jnp.float32), (0, p * n - k))

    hq = h.reshape(p, n)  # hq[r, q] = h[rN + q]
    if method == "auto":
        # round-4 same-session A/B (logs/r4_onchip/r4_channelizer_profile):
        # fused_raw 13.09 GS/s vs fused 3.26 vs composed ~2.6 at 64ch/64M —
        # the r4 stage profile showed ~18 of the fused path's 19.7 ms was
        # the commutator + pad + framing relayouts, which the raw kernel
        # folds into per-lane constants (on-chip parity <= 1.6e-7 across
        # n=32/64/128). Round 5 extends the raw envelope to n=256/512/1024
        # (tile width = n, B = 1 — the wideband-scanner shapes that used to
        # fall back to the 4x slower u-tensor path; A/B in
        # logs/r5_onchip/r5_channelizer_wide_ab.log). Outside the raw
        # envelope the u-tensor fused kernel; off-TPU / single-tap the
        # composed XLA pair.
        raw_ok = t % 128 == 0 and n in (32, 64, 128, 256, 512, 1024)
        if jax.default_backend() == "tpu" and p > 1:
            method = "fused_raw" if raw_ok else "fused"
        else:
            method = "composed"
    from ..utils.dispatch import record_choice

    record_choice("pfb_channelize", method)
    if method == "fused_raw":
        re, im = fused_pfb_raw(x, n, hq, sign=1)
        return jax.lax.complex(re, im).T  # (N, M)

    m = t // n
    xp = x.astype(jnp.float32).reshape(m, n)
    # reverse-running commutator: u[:, 0] = xp[:, 0]; u[m, q] = xp[m-1, N-q]
    rev = xp[:, ::-1]
    u = jnp.concatenate(
        [
            xp[:, :1],
            jnp.pad(rev[:-1, : n - 1], ((1, 0), (0, 0))),
        ],
        axis=1,
    )

    # per-branch causal FIR + channel transform (both MXU; see helpers).
    # ``fused`` runs both stages per VMEM tile — the composed pair
    # round-trips the (M, N) branch tensor through HBM.
    if method == "fused":
        re, im = fused_branch_dft(u, hq, sign=1)
    elif method == "composed":
        v = branch_fir(u[None, :, :], hq)[0]  # (M, N)
        re, im = dft_matmul(v, None, n)  # Y[m, k] = sum_q v e^{+2πi qk/N}
    else:
        raise ValueError(
            f"unknown method {method!r}; options "
            "('auto', 'fused_raw', 'fused', 'composed')"
        )
    return jax.lax.complex(re, im).T  # (N, M)


@functools.partial(jax.jit, static_argnames=())
def pfb_synthesize(
    channels: jax.Array,
    taps: jax.Array | None = None,
) -> jax.Array:
    """Inverse of :func:`pfb_channelize`: N complex basebands -> wideband.

    The synthesis (transmultiplexer / TX) bank:

        x[n] = sum_k sum_m Y[k, m] g[n - mN] e^{2πi k n / N}

    i.e. channel IFFT across k, per-phase interpolation FIR with the
    gain-compensated prototype, plain phase interleave. For channel signals
    bandlimited inside their band this reconstructs them to prototype
    accuracy (~60 dB with the default prototype; verified by the
    synthesize->analyze round trip in tests/test_channelizer.py). NOTE: the
    critically-sampled analysis->synthesis round trip of a FULL-band signal
    is aliasing-limited (~12 dB) — that direction needs an oversampled
    bank, not a better prototype.

    ``channels``: (N, M) complex64 -> (N*M,) complex64 wideband.
    """
    n, m = channels.shape
    if taps is None:
        taps = jnp.asarray(design_prototype(n))
    k = taps.shape[0]
    p = -(-k // n)
    g = jnp.pad(taps.astype(jnp.float32) * n, (0, p * n - k)).reshape(p, n)

    # s[m, p] = sum_k Y[k, m] e^{+2πi k p / N} — MXU DFT matmul, like the
    # analysis direction (XLA's batched small FFT lowers poorly)
    yi = jnp.real(channels).astype(jnp.float32).T  # (M, N)
    yq = jnp.imag(channels).astype(jnp.float32).T
    s_re, s_im = dft_matmul(yi, yq, n)
    v = branch_fir(jnp.stack([s_re, s_im]), g)  # (2, M, N)
    return jax.lax.complex(v[0].reshape(-1), v[1].reshape(-1))


@functools.partial(jax.jit, static_argnames=())
def pfb_synthesize_planar(
    ch_i: jax.Array,
    ch_q: jax.Array,
    taps: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """:func:`pfb_synthesize` with planar I/Q in and out (PJRT-portable)."""
    y = pfb_synthesize(
        jax.lax.complex(ch_i.astype(jnp.float32), ch_q.astype(jnp.float32)),
        taps,
    )
    return jnp.real(y).astype(jnp.float32), jnp.imag(y).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_channels",))
def pfb_channelize_planar(
    x: jax.Array,
    n_channels: int,
    taps: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """:func:`pfb_channelize` returning (I, Q) float32 planes.

    Complex64 host<->device transfer is unimplemented on some PJRT backends
    (e.g. the axon tunnel — same caveat as the receiver chain's planar entry
    points); this wrapper keeps the FFT complex on device and splits before
    anything crosses the host boundary.
    """
    y = pfb_channelize(x, n_channels, taps)
    return jnp.real(y).astype(jnp.float32), jnp.imag(y).astype(jnp.float32)


def pfb_stream_init(n_channels: int, taps_len: int | None = None) -> jax.Array:
    """Zero carry for :func:`pfb_channelize_chunk`: the last
    ``ceil(taps/N)`` input BLOCKS (the analysis filter's memory)."""
    p = -(-(taps_len or 8 * n_channels) // n_channels)
    return jnp.zeros((p * n_channels,), jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_channels",))
def pfb_channelize_chunk(
    state: jax.Array,
    x: jax.Array,
    n_channels: int,
    taps: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """One chunk of the analysis bank with carried raw-sample blocks.

    Halo-recompute across time (the same strategy as the chain's stream
    API): prepend the carried blocks, channelize, drop their output
    columns. Chunked output is bit-close to one-shot on the concatenated
    stream (float conv ordering only). Chunk length must be a multiple of
    ``n_channels``.
    """
    n = n_channels
    halo = state.shape[0]
    taps_len = 8 * n if taps is None else taps.shape[0]
    need = -(-taps_len // n) * n
    if halo != need:
        raise ValueError(
            f"carried state holds {halo} samples but these taps need {need} "
            f"(pfb_stream_init(n_channels, taps_len={taps_len}))"
        )
    ext = jnp.concatenate([state, x.astype(jnp.float32)])
    y = pfb_channelize(ext, n, taps)[:, halo // n :]
    new_state = ext[ext.shape[0] - halo :]
    return new_state, y


@functools.partial(jax.jit, static_argnames=("n_channels",))
def pfb_channelize_chunk_planar(
    state: jax.Array,
    x: jax.Array,
    n_channels: int,
    taps: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """:func:`pfb_channelize_chunk` returning (state, I, Q) float32 —
    the streaming path stays usable on PJRT backends without complex
    host transfer (same caveat as the one-shot planar wrappers)."""
    state, y = pfb_channelize_chunk(state, x, n_channels, taps)
    return state, jnp.real(y).astype(jnp.float32), jnp.imag(y).astype(jnp.float32)


__all__ = [
    "pfb_channelize",
    "pfb_channelize_planar",
    "pfb_synthesize",
    "pfb_synthesize_planar",
    "pfb_stream_init",
    "pfb_channelize_chunk",
    "pfb_channelize_chunk_planar",
    "branch_fir",
    "fused_branch_dft",
    "dft_matmul",
    "design_prototype",
]
