"""On-chip numeric parity for every round-2 kernel (not a perf script).

CPU interpret mode cannot catch MXU/Mosaic-specific numerics (round-1
lesson: default matmul precision, relayouts). One chip session checks each
new kernel against an independent oracle and prints PASS/FAIL rows.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def row(name, ok, detail=""):
    print(json.dumps({"check": name, "ok": bool(ok), "detail": detail}), flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import scipy.signal as sps

    rng = np.random.default_rng(0)

    # fused overlap-save vs direct conv (the HIGHEST dot_generals + Mosaic
    # lowering must reproduce the reference response)
    from digital_signal_processsing_tpu.ops.fft_mxu import (
        overlap_save_fused,
        overlap_save_mxu,
    )
    from digital_signal_processsing_tpu.ops.fir import fir_direct

    x = rng.normal(size=(4, 1_000_000)).astype(np.float32)
    xd = jax.device_put(x)
    h = rng.normal(size=1025).astype(np.float32) / 32
    want = np.asarray(fir_direct(xd, jnp.asarray(h)))
    got_f = np.asarray(overlap_save_fused(xd, h, block=8192))
    rel = np.max(np.abs(got_f - want)) / np.max(np.abs(want))
    row("osave_fused_vs_direct", rel < 1e-4, f"rel={rel:.2e}")
    got_m = np.asarray(overlap_save_mxu(xd, jnp.asarray(h), block=8192))
    rel = np.max(np.abs(got_m - want)) / np.max(np.abs(want))
    row("osave_mxu_vs_direct", rel < 1e-4, f"rel={rel:.2e}")

    # farrow matmul vs the float64 schedule oracle
    from digital_signal_processsing_tpu.ops.farrow import resample_farrow

    xf = rng.normal(size=500_000).astype(np.float32)
    xfd = jax.device_put(xf)
    for up, down in ((160, 147), (441, 2560)):
        got = np.asarray(resample_farrow(xfd, (up, down), method="matmul"))
        ext = np.concatenate([np.zeros(4), xf.astype(np.float64)])
        num = 4 * up + np.arange(got.shape[0], dtype=np.int64) * down
        n = num // up
        mu = (num % up).astype(np.float64) / up
        g = [ext[n - 1 + j] for j in range(4)]
        w0 = -mu * (mu - 1) * (mu - 2) / 6
        w1 = (mu - 1) * (mu + 1) * (mu - 2) / 2
        w2 = -mu * (mu + 1) * (mu - 2) / 2
        w3 = mu * (mu + 1) * (mu - 1) / 6
        want = w0 * g[0] + w1 * g[1] + w2 * g[2] + w3 * g[3]
        err = np.max(np.abs(got - want))
        row(f"farrow_matmul_{up}_{down}", err < 1e-4, f"abs={err:.2e}")

    # dispatched sosfilt + streaming chunks vs scipy
    from digital_signal_processsing_tpu.ops.iir import (
        design_butterworth,
        sosfilt,
        sosfilt_chunk_pallas,
        sosfilt_init,
    )

    sos = design_butterworth(4, 0.2)
    xs = rng.normal(size=(2, 1_000_000)).astype(np.float32)
    xsd = jax.device_put(xs)
    want = sps.sosfilt(sos.astype(np.float64), xs, axis=-1)
    got = np.asarray(sosfilt(sos, xsd))
    rel = np.max(np.abs(got - want)) / np.max(np.abs(want))
    row("sosfilt_dispatched_vs_scipy", rel < 1e-4, f"rel={rel:.2e}")
    st = sosfilt_init(sos, batch_shape=(2,))
    outs = []
    for a, b in ((0, 400_000), (400_000, 737_123), (737_123, 1_000_000)):
        st, y = sosfilt_chunk_pallas(st, sos, xsd[:, a:b])
        outs.append(np.asarray(y))
    gotc = np.concatenate(outs, axis=-1)
    rel = np.max(np.abs(gotc - want)) / np.max(np.abs(want))
    row("sosfilt_chunks_vs_scipy", rel < 1e-4, f"rel={rel:.2e}")

    # folded hilbert vs the exact FFT method (1M fits both)
    from digital_signal_processsing_tpu.ops.fft import hilbert_fir, _hilbert_fft

    # BANDLIMITED probe: white noise has energy in the FIR transformer's
    # DC/Nyquist rolloff where it legitimately differs from the ideal FFT
    # method — compare where both define the same response
    t_ax = np.arange(1_048_576)
    xh = (
        np.sin(2 * np.pi * 0.11 * t_ax) + 0.5 * np.cos(2 * np.pi * 0.31 * t_ax)
    ).astype(np.float32)
    xhd = jax.device_put(xh)
    zf = np.asarray(jnp.imag(_hilbert_fft(xhd)))
    zb = np.asarray(jnp.imag(hilbert_fir(xhd, row_len=1 << 18)))
    d = 513 // 2
    err = np.max(np.abs(zf[d:-d] - zb[d:-d]))
    row("hilbert_folded_vs_fft", err < 5e-3, f"abs={err:.2e}")

    # folded flat fir_direct vs planar spelling
    xl = rng.normal(size=4_000_000).astype(np.float32)
    xld = jax.device_put(xl)
    h2 = rng.normal(size=257).astype(np.float32) / 16
    got = np.asarray(fir_direct(xld, jnp.asarray(h2)))
    want = np.asarray(fir_direct(xld[None, :], jnp.asarray(h2)))[0]
    err = np.max(np.abs(got - want)) / np.max(np.abs(want))
    row("fir_direct_folded_vs_planar", err < 1e-5, f"rel={err:.2e}")

    # fused-ring windowed on the degenerate real mesh, bit-exact vs golden
    from digital_signal_processsing_tpu.golden import moving_average_golden
    from digital_signal_processsing_tpu.parallel.mesh import make_time_mesh
    from digital_signal_processsing_tpu.parallel.sharded_scan import (
        sharded_moving_average,
    )

    x16 = rng.integers(-32768, 32768, size=1 << 21, dtype=np.int16)
    tmesh = make_time_mesh()
    got = np.asarray(
        sharded_moving_average(
            jax.device_put(x16), 700, 2, mesh=tmesh, halo_impl="fused_ring"
        )
    )
    ok = np.array_equal(got, moving_average_golden(x16, 700, 2))
    row("fused_ring_bit_exact_onchip", ok)

    # packed sharded path, bit-exact vs golden
    got32 = np.asarray(
        sharded_moving_average(
            jax.device_put(x16.view(np.int32)), 700, 2, mesh=tmesh
        )
    )
    ok = np.array_equal(got32.view(np.int16), moving_average_golden(x16, 700, 2))
    row("packed_sharded_bit_exact_onchip", ok)


if __name__ == "__main__":
    main()
