"""Round-4: map the jit-only miscompile of blocked_causal_conv on axon.

r4_tinyconv_probe: EAGER blocked_causal_conv is exact at every probed
(t, k). The jit bisect (logs/r4_onchip/r4_correlate_direct_ab.log crash +
/tmp bisect): the SAME call under jax.jit reads rel err 0.947 at
(3, 306)/k=7 — an XLA-TPU fusion miscompile, not a math bug. This probe
(a) grids jitted parity over (t, k) to find the envelope, (b) prints the
diff structure (which frames/lanes) at a failing shape, (c) tries
workarounds: optimization_barrier on the tap matrix, host-built constant
taps, DEFAULT precision, symmetric-pad spelling. Run serially.
"""

from __future__ import annotations

import sys
import traceback

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def causal_ref(x, h):
    c, t = x.shape
    out = np.zeros((c, t))
    for j, hv in enumerate(np.asarray(h, np.float64)):
        out[:, j:] += hv * x[:, : t - j].astype(np.float64)
    return out


def main() -> None:
    assert jax.default_backend() == "tpu"
    from digital_signal_processsing_tpu.ops.fir import blocked_causal_conv

    jitted = jax.jit(blocked_causal_conv)
    rng = np.random.default_rng(9)

    print("=== JITTED blocked_causal_conv grid ===", flush=True)
    bad = None
    for t in (306, 384, 512, 1000, 4096, 65536, 1 << 20):
        for k in (7, 63, 128, 257):
            x = rng.standard_normal((3, t)).astype(np.float32)
            h = rng.standard_normal(k).astype(np.float32)
            try:
                got = np.asarray(jitted(jnp.asarray(x), jnp.asarray(h)))
                want = causal_ref(x, h)
                err = np.abs(got - want).max() / (np.abs(want).max() + 1e-12)
                flag = "  <-- WRONG" if err > 1e-4 else ""
                if err > 1e-4 and bad is None:
                    bad = (x, h, got, want)
                print(f"t={t:8d} k={k:4d}: rel={err:.2e}{flag}", flush=True)
            except Exception:
                print(f"t={t:8d} k={k:4d}: CRASH", flush=True)
                traceback.print_exc()

    if bad is not None:
        x, h, got, want = bad
        d = np.abs(got - want)
        t = x.shape[-1]
        tb = -(-t // 128)
        dpad = np.pad(d, ((0, 0), (0, tb * 128 - t))).reshape(3, tb, 128)
        print("=== diff structure at first failing shape ===", flush=True)
        print("per-frame max:", dpad.max((0, 2)).round(3).tolist(), flush=True)
        print("per-lane max (first 16):", dpad.max((0, 1))[:16].round(3).tolist(), flush=True)
        print("per-lane max (last 16):", dpad.max((0, 1))[-16:].round(3).tolist(), flush=True)
        frame0 = dpad.max((0, 2)).argmax()
        lanes_bad = np.nonzero(dpad[:, frame0].max(0) > 1e-3)[0]
        print(f"worst frame {frame0}: bad lanes {lanes_bad[:20].tolist()}...({lanes_bad.size})", flush=True)

        # --- workarounds at the failing shape -----------------------------
        k = h.shape[0]
        B = 128
        P = (k + B - 2) // B

        def build(x, hv, *, barrier=False, precision=jax.lax.Precision.HIGHEST, sympad=False):
            c, t = x.shape
            tb = -(-t // B)
            xf = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, tb * B - t))).reshape(c, tb, B)
            idx = (
                np.arange(B)[None, None, :]
                - np.arange(B)[None, :, None]
                + B * (P - np.arange(P + 1))[:, None, None]
            )
            hm = jnp.where(
                (idx >= 0) & (idx < k),
                jnp.asarray(hv, jnp.float32)[np.clip(idx, 0, k - 1)],
                0.0,
            )
            if barrier:
                hm = jax.lax.optimization_barrier(hm)
                xf = jax.lax.optimization_barrier(xf)
            if sympad:
                xf = jnp.concatenate([jnp.zeros((c, P, B), jnp.float32), xf], 1)
                pad = ((0, 0),)
            else:
                pad = ((P, 0),)
            y = jax.lax.conv_general_dilated(
                xf, hm, window_strides=(1,), padding=pad,
                dimension_numbers=("NWC", "WIO", "NWC"), precision=precision,
            ).reshape(c, -1)
            if sympad:
                pass  # output frames = tb already (VALID over tb+P with window P+1)
            return y[:, :t]

        for name, kw in [
            ("barrier", dict(barrier=True)),
            ("const-taps", dict()),
            ("default-prec", dict(precision=jax.lax.Precision.DEFAULT)),
            ("sympad", dict(sympad=True)),
        ]:
            try:
                if name == "const-taps":
                    f = jax.jit(lambda xx: build(xx, np.asarray(h)))
                    got2 = np.asarray(f(jnp.asarray(x)))
                else:
                    f = jax.jit(lambda xx, hh: build(xx, hh, **kw))
                    got2 = np.asarray(f(jnp.asarray(x), jnp.asarray(h)))
                err = np.abs(got2 - want).max() / (np.abs(want).max() + 1e-12)
                print(f"workaround {name}: rel={err:.2e}", flush=True)
            except Exception:
                print(f"workaround {name}: CRASH", flush=True)
                traceback.print_exc()

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
