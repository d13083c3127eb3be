"""Round-4: dense-rfft vs factored vs XLA for the STFT family, on chip.

The mfcc stage profile (r4_mfcc_profile.log) found 17.5 of 17.8 ms in
dft_factored at nfft=512/(8, 2M) — batched (n/128, 128) stage-B matmuls +
per-frame relayouts. The dense engine (fft_mxu.rfft_dense) is ONE
(n, n//2+1) matmul pair. This A/B measures stft at nfft 512/1024/2048/
4096 across the three engines (factored selected by zeroing
DENSE_RFFT_MAX_N, dense at 4096 by raising it), istft nfft=1024, and
mfcc end to end — same session, interleaved. Sets DENSE_RFFT_MAX_N from
measurement. Run serially.
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
    from digital_signal_processsing_tpu.ops import fft_mxu as FM
    from digital_signal_processsing_tpu.ops import mel as M

    rng = np.random.default_rng(3)
    C, T = 8, 2_000_000
    x = jnp.asarray(rng.standard_normal((C, T)), jnp.float32)
    work = C * T

    # --- parity first: dense vs xla at nfft=512, on chip ------------------
    # complex64 host fetch is UNIMPLEMENTED on this backend (and one such
    # error poisons the whole client) — fetch planar f32 components only.
    def parity():
        def planar(method):
            s = F.stft(x[:, :100000], nfft=512, hop=256, method=method)
            return (
                np.asarray(jnp.real(s).astype(jnp.float32)),
                np.asarray(jnp.imag(s).astype(jnp.float32)),
            )

        ar_, ai_ = planar("mxu")
        br_, bi_ = planar("xla")
        scale = max(np.abs(br_).max(), np.abs(bi_).max())
        err = max(np.abs(ar_ - br_).max(), np.abs(ai_ - bi_).max()) / scale
        assert err < 5e-6, err
        print(f"on-chip dense-vs-xla stft parity: {err:.2e}", flush=True)

    row("parity", parity)

    def wrap(fn):
        def mk(k):
            @jax.jit
            def chained(v):
                def body(i, acc):
                    out = fn(v + i.astype(jnp.float32) * 1e-12)
                    return acc + jnp.sum(jnp.abs(out[..., :4]))

                return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

            return chained

        return mk

    def stft_row(nfft, hop, engine):
        saved = FM.DENSE_RFFT_MAX_N
        if engine == "dense":
            FM.DENSE_RFFT_MAX_N = max(saved, nfft)
        elif engine == "factored":
            FM.DENSE_RFFT_MAX_N = 0
        # the inner @jax.jit stft caches by static args — clear it so the
        # engine flip is actually retraced
        F.stft.clear_cache()
        method = "xla" if engine == "xla" else "mxu"
        try:
            k_diff(
                f"stft nfft={nfft} hop={hop} {engine}",
                wrap(lambda v: F.stft(v, nfft=nfft, hop=hop, method=method)),
                x,
                work,
            )
        finally:
            FM.DENSE_RFFT_MAX_N = saved

    for nfft in (512, 1024, 2048, 4096):
        hop = nfft // 2
        if nfft == 512:
            hop = 256
        for engine in ("dense", "factored", "xla"):
            row(f"stft {nfft} {engine}", lambda n=nfft, h=hop, e=engine: stft_row(n, h, e))

    # --- istft (vocoder synthesis side), nfft=1024 ------------------------
    s = F.stft(x, nfft=1024, hop=512, window="sqrt_hann")
    sw = int(np.prod(s.shape[:-1]))

    def istft_row(engine):
        saved = FM.DENSE_RFFT_MAX_N
        if engine == "factored":
            FM.DENSE_RFFT_MAX_N = 0
        F.istft.clear_cache()
        method = "xla" if engine == "xla" else "mxu"
        try:
            k_diff(
                f"istft nfft=1024 {engine}",
                wrap(
                    lambda v: F.istft(
                        v, nfft=1024, hop=512, window="sqrt_hann", method=method
                    )
                ),
                s,
                work,
            )
        finally:
            FM.DENSE_RFFT_MAX_N = saved

    for engine in ("dense", "factored", "xla"):
        row(f"istft {engine}", lambda e=engine: istft_row(e))

    # --- mfcc end to end on the shipped auto -------------------------------
    row(
        "mfcc e2e dense",
        lambda: k_diff(
            "mfcc nfft=512 (8x2M) dense",
            wrap(
                lambda v: M.mfcc(
                    v, sample_rate=16000.0, n_mfcc=13, nfft=512, hop=256,
                    n_mels=40,
                )
            ),
            x,
            work,
        ),
    )

    print(f"DONE crashes={CRASHES}", flush=True)


if __name__ == "__main__":
    main()
