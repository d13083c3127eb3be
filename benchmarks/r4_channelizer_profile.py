"""Round-4: where do the fused PFB channelizer's milliseconds go?

VERDICT r3 item 5: fused = 3.57 GS/s vs composed 2.56 at 64ch/64M — 1.39x
vs the 1.5x ROADMAP target. HBM floor for the op is ~0.94 ms (256 MB in +
512 MB out at 819 GB/s) yet the fused call takes ~17.9 ms, so ~95% of the
time is NOT mandatory traffic. Stage-wise K-differential rows:

  1. commutator   — build u from x (reshape+reverse+pad+concat relayout)
  2. prepare      — pads + halo framing + (nt, rows, n) reshape
  3. kernel       — the pallas_call alone on prepared tiles
  4. full fused   — the shipped path (anchor; 3.57 GS/s in r3)
  5. branch_fir   — composed stage A alone
  6. dft_matmul   — composed stage B alone

Each row crash-isolated. Run serially (one TPU client).
"""

from __future__ import annotations

import sys
import time
import traceback

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

N = 64_000_000
NCH = 64
TAPS = 8
CRASHES = 0


def row(name, fn):
    global CRASHES
    try:
        fn()
    except Exception:
        CRASHES += 1
        print(f"CRASH {name}:", flush=True)
        traceback.print_exc()


def k_diff(name, fn, args, work, klo=2, khi=8, reps=3):
    fns = {}
    for k in (klo, khi):

        @jax.jit
        def chained(a, k=k):
            def body(i, acc):
                # i-dependent perturbation prevents loop-invariant hoisting;
                # fn takes ONE pytree arg (never unpack an array as *args —
                # that iterates it element-wise in Python)
                out = fn(jax.tree_util.tree_map(
                    lambda v: v + i.astype(v.dtype) * jnp.asarray(1e-12, v.dtype), a
                ))
                leaves = jax.tree_util.tree_leaves(out)
                return acc + sum(jnp.sum(jnp.abs(l[..., :8])) for l in leaves)

            return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

        t0 = time.perf_counter()
        np.asarray(chained(args))
        print(f"  compiled {name} k={k}: {time.perf_counter()-t0:.1f}s", flush=True)
        fns[k] = chained
    best = {k: float("inf") for k in fns}
    for _ in range(reps):
        for k, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f(args))
            best[k] = min(best[k], time.perf_counter() - t0)
    per = (best[khi] - best[klo]) / (khi - klo)
    print(
        f"{name}: {per*1e3:.2f} ms/iter = {work/per/1e9:.2f} GS/s "
        f"(t{klo}={best[klo]:.3f}s t{khi}={best[khi]:.3f}s)",
        flush=True,
    )


def main() -> None:
    assert jax.default_backend() == "tpu"
    from digital_signal_processsing_tpu.ops import channelizer as ch

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.normal(size=N).astype(np.float32))
    proto = jnp.asarray(ch.design_prototype(NCH, TAPS))
    p = TAPS
    hq = jnp.pad(proto.astype(jnp.float32), (0, p * NCH - proto.shape[0])).reshape(
        p, NCH
    )
    m = N // NCH

    def commutator(v):
        xp = v.astype(jnp.float32).reshape(m, NCH)
        rev = xp[:, ::-1]
        return jnp.concatenate(
            [xp[:, :1], jnp.pad(rev[:-1, : NCH - 1], ((1, 0), (0, 0)))], axis=1
        )

    # prebuilt u for the stage rows
    u = jax.jit(commutator)(x)
    u = jax.block_until_ready(u)

    def prepare(uu):
        halos, main, cos, sin, meta = ch._fused_pfb_prepare(
            uu, hq, sign=1, dilation=1, tile_rows=512
        )
        return halos, main

    def kernel_only(uu):
        halos, main, cos, sin, meta = ch._fused_pfb_prepare(
            uu, hq, sign=1, dilation=1, tile_rows=512
        )
        # halos/main are traced from uu here, but XLA will still fuse —
        # so ALSO time prepare alone and subtract (see rows 2 vs 3+2)
        return ch._fused_pfb_run(halos, main, hq, cos, sin, meta)

    def full(v):
        y = ch.pfb_channelize(v, NCH, proto, method="fused")
        return jnp.real(y), jnp.imag(y)

    def composed_a(uu):
        return ch.branch_fir(uu[None, :, :], hq)[0]

    v_pre = jax.block_until_ready(jax.jit(composed_a)(u))

    def composed_b(vv):
        return ch.dft_matmul(vv, None, NCH)

    def fused_raw(v):
        y = ch.pfb_channelize(v, NCH, proto, method="fused_raw")
        return jnp.real(y), jnp.imag(y)

    row("commutator", lambda: k_diff("commutator (relayout only)", commutator, x, N))
    row("prepare", lambda: k_diff("prepare (pads+framing)", prepare, u, N))
    row("prep+kernel", lambda: k_diff("prepare+kernel", kernel_only, u, N))
    row("full fused", lambda: k_diff("full fused (anchor)", full, x, N))
    row("fused_raw", lambda: k_diff("fused_raw (r4 candidate)", fused_raw, x, N))
    row("branch_fir", lambda: k_diff("composed branch_fir", composed_a, u, N))
    row("dft_matmul", lambda: k_diff("composed dft_matmul", composed_b, v_pre, N))

    print(f"DONE crashes={CRASHES}", flush=True)


if __name__ == "__main__":
    main()
