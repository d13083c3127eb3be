"""Round-4: stage profile of the MFCC/STFT front end at (8, 2M).

The surface row measured 0.905 GS/s input-rate for mfcc nfft=512 hop=256
(r4_surface_rows). Back-of-envelope says the DFT matmul is ~2 ms and the
framing traffic ~1 ms at this shape, so ~17 ms/call has an unexplained
4x — this profile splits the chain: framing+window, stft, |.|^2,
melspectrogram, mfcc, and the rfft engine A/B (mxu factored vs xla).
Run serially.
"""

from __future__ import annotations

import sys
import time
import traceback

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

CRASHES = 0


def row(name, fn):
    global CRASHES
    try:
        fn()
    except Exception:
        CRASHES += 1
        print(f"CRASH {name}:", flush=True)
        traceback.print_exc()


def k_diff(name, make, x, work, klo=4, khi=12, reps=3):
    fns = {}
    for k in (klo, khi):
        f = make(k)
        t0 = time.perf_counter()
        np.asarray(f(x))
        print(f"  compiled {name} k={k}: {time.perf_counter()-t0:.1f}s", flush=True)
        fns[k] = f
    best = {k: float("inf") for k in fns}
    for _ in range(reps):
        for k, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f(x))
            best[k] = min(best[k], time.perf_counter() - t0)
    per = (best[khi] - best[klo]) / (khi - klo)
    print(
        f"{name}: {work/per/1e9:.3f} GS/s = {per*1e3:.2f} ms/call "
        f"(t{klo}={best[klo]:.3f}s t{khi}={best[khi]:.3f}s)",
        flush=True,
    )


def main() -> None:
    assert jax.default_backend() == "tpu"
    from digital_signal_processsing_tpu.ops import fft as F
    from digital_signal_processsing_tpu.ops import mel as M
    from digital_signal_processsing_tpu.utils.layout import overlapping_frames

    rng = np.random.default_rng(3)
    C, T = 8, 2_000_000
    nfft, hop, n_mels = 512, 256, 40
    x = jnp.asarray(rng.standard_normal((C, T)), jnp.float32)
    work = C * T

    def wrap(fn):
        def mk(k):
            @jax.jit
            def chained(v):
                def body(i, acc):
                    out = fn(v + i.astype(jnp.float32) * 1e-12)
                    leaves = jax.tree_util.tree_leaves(out)
                    s = jnp.zeros((), jnp.float32)
                    for l in leaves:
                        lf = l if l.dtype == jnp.float32 else jnp.abs(l)
                        s = s + jnp.sum(lf[..., :4].astype(jnp.float32))
                    return acc + s

                return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

            return chained

        return mk

    nframes = (T - nfft) // hop + 1
    w = jnp.asarray(F.spectral_window("hann", nfft))

    stages = [
        ("framing+window", lambda v: overlapping_frames(v, nframes, hop, nfft) * w),
        ("stft mxu", lambda v: F.stft(v, nfft=nfft, hop=hop, method="mxu")),
        ("stft xla", lambda v: F.stft(v, nfft=nfft, hop=hop, method="xla")),
        ("|stft|^2", lambda v: jnp.abs(F.stft(v, nfft=nfft, hop=hop)) ** 2),
        ("melspec", lambda v: M.melspectrogram(v, sample_rate=16000.0, nfft=nfft, hop=hop, n_mels=n_mels)),
        ("mfcc", lambda v: M.mfcc(v, sample_rate=16000.0, n_mfcc=13, nfft=nfft, hop=hop, n_mels=n_mels)),
    ]
    for name, fn in stages:
        row(name, lambda n=name, f=fn: k_diff(n, wrap(f), x, work))

    print(f"DONE crashes={CRASHES}", flush=True)


if __name__ == "__main__":
    main()
