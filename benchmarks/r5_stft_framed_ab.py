"""A/B: framed dense rfft (framing folded into banded matmuls) vs the
round-4 overlapping_frames + dense-matmul stft, same session, interleaved.

VERDICT r4 item 5: stft closed round 4 at 25.4 GS/s (nfft=512, (8, 2M))
against its own ~41 GS/s framing floor — the gap was the
overlapping_frames concat + windowed-segment materialization.
`fft_mxu.rfft_dense_framed` never materializes the (frames, nfft) tensor:
out = sum_j x2[j:j+F] @ (w * W)[j*hop:(j+1)*hop]. mfcc re-measured after.

K-differential protocol; run alone on the chip.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

K_SMALL, K_BIG = 4, 12
REPEATS = 3


def k_diff(name, make_fn, arg, work_items):
    fns = {}
    for k in (K_SMALL, K_BIG):
        t0 = time.perf_counter()
        f = make_fn(k)
        np.asarray(jax.tree_util.tree_leaves(f(arg))[0].ravel()[:8])
        fns[k] = f
        print(f"  compiled {name} k={k}: {time.perf_counter()-t0:.1f}s", flush=True)
    best = {k: float("inf") for k in fns}
    for _ in range(REPEATS):
        for k, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(f(arg))[0].ravel()[:8])
            best[k] = min(best[k], time.perf_counter() - t0)
    per = (best[K_BIG] - best[K_SMALL]) / (K_BIG - K_SMALL)
    print(f"{name}: {work_items / per / 1e9:.3f} GS/s ({per*1e3:.2f} ms/iter)", flush=True)


def main() -> None:
    from digital_signal_processsing_tpu.ops import fft as F
    from digital_signal_processsing_tpu.ops import mel
    from digital_signal_processsing_tpu.ops.fft import _mxu_rfft, spectral_window
    from digital_signal_processsing_tpu.utils.layout import overlapping_frames

    rng = np.random.default_rng(0)
    c, t = 8, 2_000_000
    x = jnp.asarray(rng.standard_normal((c, t)), jnp.float32)

    for nfft in (512, 1024, 2048, 4096):
        hop = nfft // 2
        nframes = (t - nfft) // hop + 1

        def mk_framed(k, nfft=nfft, hop=hop):
            @jax.jit
            def chained(v):
                def body(_, y):
                    s = F.stft(y, nfft=nfft, hop=hop, window="hann", method="mxu")
                    return y + 0.0 * jnp.real(s).sum()

                return jax.lax.fori_loop(0, k, body, v)

            return chained

        def mk_old(k, nfft=nfft, hop=hop, nframes=nframes):
            w = jnp.asarray(spectral_window("hann", nfft))

            @jax.jit
            def chained(v):
                def body(_, y):
                    segs = overlapping_frames(y, nframes, hop, nfft)
                    s = _mxu_rfft(segs * w)
                    return y + 0.0 * jnp.real(s).sum()

                return jax.lax.fori_loop(0, k, body, v)

            return chained

        # interleaved A/B
        k_diff(f"stft framed nfft={nfft} (8,2M)", mk_framed, x, c * t)
        k_diff(f"stft r4-old nfft={nfft} (8,2M)", mk_old, x, c * t)

    # mfcc re-measure (r4 row: 9.83 GS/s at (8, 2M), nfft=512/hop=256)
    def mk_mfcc(k):
        @jax.jit
        def chained(v):
            def body(_, y):
                c13 = mel.mfcc(
                    y, sample_rate=16000.0, n_mfcc=13, nfft=512, hop=256, n_mels=80
                )
                return y + 0.0 * c13.sum()

            return jax.lax.fori_loop(0, k, body, v)

        return chained

    k_diff("mfcc nfft=512 (8,2M)", mk_mfcc, x, c * t)


if __name__ == "__main__":
    main()
