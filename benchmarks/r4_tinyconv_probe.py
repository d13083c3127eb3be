"""Round-4: pinpoint the tiny-shape wrongness of the blocked conv on chip.

r4_correlate_direct_ab's parity row failed ON TPU at (3, 300)/k=7 with
rel err 0.95 (CPU exact; (4, 1M)/k=1025 on-chip parity passed in r2).
This probe bisects: blocked_causal_conv at a grid of (t, k) against the
float64 numpy causal conv, plus a raw conv_general_dilated NWC probe at
the same tiny frame counts, to separate "our tap-matrix math is wrong at
some edge" from "the axon TPU conv lowering miscompiles tiny spatial
widths with asymmetric padding". Run serially.
"""

from __future__ import annotations

import sys
import traceback

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def causal_ref(x, h):
    # y[t] = sum_j h[j] x[t-j], zeros before 0 — float64
    c, t = x.shape
    out = np.zeros((c, t))
    for j, hv in enumerate(np.asarray(h, np.float64)):
        if hv != 0.0:
            out[:, j:] += hv * x[:, : t - j].astype(np.float64)
    return out


def main() -> None:
    assert jax.default_backend() == "tpu"
    from digital_signal_processsing_tpu.ops.fir import blocked_causal_conv

    rng = np.random.default_rng(9)
    print("=== blocked_causal_conv grid (rel err vs float64) ===", flush=True)
    for t in (306, 384, 512, 1000, 4096, 65536):
        for k in (7, 63, 128, 257):
            x = rng.standard_normal((3, t)).astype(np.float32)
            h = rng.standard_normal(k).astype(np.float32)
            try:
                got = np.asarray(
                    blocked_causal_conv(jnp.asarray(x), jnp.asarray(h))
                )
                want = causal_ref(x, h)
                err = np.abs(got - want).max() / (np.abs(want).max() + 1e-12)
                flag = "  <-- WRONG" if err > 1e-4 else ""
                print(f"t={t:6d} k={k:4d}: rel={err:.2e}{flag}", flush=True)
            except Exception:
                print(f"t={t:6d} k={k:4d}: CRASH", flush=True)
                traceback.print_exc()

    print("=== raw NWC conv probe (window 2, pad (1,0)) ===", flush=True)
    for tb in (2, 3, 4, 8, 32):
        x = rng.standard_normal((2, tb, 128)).astype(np.float32)
        w = rng.standard_normal((2, 128, 128)).astype(np.float32)
        y = np.asarray(
            jax.lax.conv_general_dilated(
                jnp.asarray(x),
                jnp.asarray(w),
                window_strides=(1,),
                padding=((1, 0),),
                dimension_numbers=("NWC", "WIO", "NWC"),
                precision=jax.lax.Precision.HIGHEST,
            )
        )
        # reference: y[n, t, o] = sum_{s in 0..1} sum_i x[n, t-1+s, i] w[s, i, o]
        xp = np.concatenate([np.zeros((2, 1, 128), np.float64), x.astype(np.float64)], 1)
        want = (
            np.einsum("nti,io->nto", xp[:, :-1], w[0].astype(np.float64))
            + np.einsum("nti,io->nto", xp[:, 1:], w[1].astype(np.float64))
        )
        err = np.abs(y - want).max() / (np.abs(want).max() + 1e-12)
        flag = "  <-- WRONG" if err > 1e-4 else ""
        print(f"frames={tb}: rel={err:.2e}{flag}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
