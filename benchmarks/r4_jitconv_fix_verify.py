"""Round-4: verify the blocked-conv jit-miscompile fix on chip.

Runs the JITTED blocked_causal_conv parity grid (the shapes from
r4_jitconv_probe, which found wrong results pre-fix) plus the full
correlate/correlate_complex direct parity rows that crashed in
r4_correlate_direct_ab. All rows must read < 5e-6. Run serially.
"""

from __future__ import annotations

import sys
import traceback

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

BAD = 0


def causal_ref(x, h):
    c, t = x.shape
    out = np.zeros((c, t))
    for j, hv in enumerate(np.asarray(h, np.float64)):
        out[:, j:] += hv * x[:, : t - j].astype(np.float64)
    return out


def main() -> None:
    global BAD
    assert jax.default_backend() == "tpu"
    from digital_signal_processsing_tpu.ops import correlate as C
    from digital_signal_processsing_tpu.ops.fir import blocked_causal_conv

    jitted = jax.jit(blocked_causal_conv)
    rng = np.random.default_rng(9)
    print("=== JITTED blocked_causal_conv grid (post-fix) ===", flush=True)
    for t in (306, 384, 512, 1000, 4096, 65536):
        for k in (7, 63, 128, 257):
            x = rng.standard_normal((3, t)).astype(np.float32)
            h = rng.standard_normal(k).astype(np.float32)
            got = np.asarray(jitted(jnp.asarray(x), jnp.asarray(h)))
            want = causal_ref(x, h)
            err = np.abs(got - want).max() / (np.abs(want).max() + 1e-12)
            flag = ""
            if err > 1e-4:
                flag = "  <-- WRONG"
                BAD += 1
            print(f"t={t:8d} k={k:4d}: rel={err:.2e}{flag}", flush=True)

    print("=== correlate direct parity (the crashed A/B row) ===", flush=True)
    try:
        for ta, tv, batch in [(300, 7, 3), (1024, 128, 2), (65536 * 4, 128, 2)]:
            a = rng.standard_normal((batch, ta)).astype(np.float32)
            v = rng.standard_normal(tv).astype(np.float32)
            for mode in ("full", "same", "valid"):
                want = np.stack(
                    [
                        np.correlate(r.astype(np.float64), v.astype(np.float64), mode)
                        for r in a
                    ]
                )
                got = np.asarray(
                    C.correlate(jnp.asarray(a), jnp.asarray(v), mode, method="direct")
                )
                err = np.abs(got - want).max() / (np.abs(want).max() + 1e-12)
                flag = ""
                if err > 5e-6:
                    flag = "  <-- WRONG"
                    BAD += 1
                print(f"corr ({batch},{ta}) tv={tv} {mode}: rel={err:.2e}{flag}", flush=True)
        ac = rng.standard_normal((2, 100000)) + 1j * rng.standard_normal((2, 100000))
        vc = rng.standard_normal(128) + 1j * rng.standard_normal(128)
        want = np.stack([np.correlate(r, vc, "valid") for r in ac])
        fr, fi = C.correlate_complex(
            jnp.asarray(ac.real, jnp.float32),
            jnp.asarray(ac.imag, jnp.float32),
            jnp.asarray(vc.real, jnp.float32),
            jnp.asarray(vc.imag, jnp.float32),
            "valid",
            method="direct",
        )
        got = np.asarray(fr) + 1j * np.asarray(fi)
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-12)
        flag = ""
        if err > 5e-6:
            flag = "  <-- WRONG"
            BAD += 1
        print(f"corr_complex (2,100000) tv=128 valid: rel={err:.2e}{flag}", flush=True)
    except Exception:
        BAD += 1
        traceback.print_exc()

    print("=== jitted ragged cwt vs eager (the 17 GS/s kernel's shape class) ===", flush=True)
    try:
        from digital_signal_processsing_tpu.ops import wavelets

        widths = list(range(1, 9))
        xs = rng.standard_normal(5000).astype(np.float32)  # ext len ragged
        eager = np.asarray(wavelets.cwt(xs, wavelets.ricker, widths))
        jit_cwt = jax.jit(lambda v: wavelets.cwt(v, wavelets.ricker, widths))
        got = np.asarray(jit_cwt(jnp.asarray(xs)))
        err = np.abs(got - eager).max() / (np.abs(eager).max() + 1e-12)
        flag = ""
        if err > 1e-5:
            flag = "  <-- WRONG"
            BAD += 1
        print(f"cwt jit-vs-eager n=5000: rel={err:.2e}{flag}", flush=True)
    except Exception:
        BAD += 1
        traceback.print_exc()

    print("=== jitted ragged blocked_interp_conv ===", flush=True)
    try:
        from digital_signal_processsing_tpu.ops.fir import blocked_interp_conv

        x = rng.standard_normal((2, 1000)).astype(np.float32)
        h = rng.standard_normal(33).astype(np.float32)
        up = 3
        got = np.asarray(
            jax.jit(lambda a, b: blocked_interp_conv(a, b, up=up))(
                jnp.asarray(x), jnp.asarray(h)
            )
        )
        stuffed = np.zeros((2, 1000 * up))
        stuffed[:, ::up] = x.astype(np.float64)
        want = causal_ref(stuffed, h)
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-12)
        flag = ""
        if err > 1e-4:
            flag = "  <-- WRONG"
            BAD += 1
        print(f"interp up=3 t=1000 k=33: rel={err:.2e}{flag}", flush=True)
    except Exception:
        BAD += 1
        traceback.print_exc()

    print(f"DONE bad={BAD}", flush=True)


if __name__ == "__main__":
    main()
