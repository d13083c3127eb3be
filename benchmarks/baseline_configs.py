"""Run BASELINE.json's five headline configurations and emit JSON rows.

Configs (BASELINE.json "configs"):
  1. serial CPU moving averager, 1M samples, k=16  (reference parity row)
  2. naive/direct parallel averager, single chip, k in 4..64 (memory regime)
  3. scan averager, k in 256..4096 (compute regime)
  4. Blelloch scan averager, 64M samples time-block-sharded w/ carry exchange
  5. full chain (overlap-save FIR + polyphase decimate + FM demod),
     16 channels sharded over the mesh

On a single-chip runner, configs 4-5 use every available device (the one
TPU, or the virtual CPU mesh under XLA_FLAGS); weak-scaling efficiency is
reported when >= 2 devices exist.

Usage: python benchmarks/baseline_configs.py [--out BASELINE_RESULTS.json]
Kernel times are isolated with the K-differential chaining method
(see bench.py) to cancel dispatch/transfer overhead.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

# allow running as `python benchmarks/<script>.py` without installing
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _diff_time(make_fn, xd, k1=4, k2=16, repeats=3):
    """Per-iteration seconds of fn via chained-jit differential timing."""
    import jax

    def chained(k):
        @jax.jit
        def f(v):
            def body(i, y):
                return make_fn(y)

            return jax.lax.fori_loop(0, k, body, v)

        return f

    ts = {}
    for k in (k1, k2):
        g = chained(k)
        np.asarray(g(xd)[:8])  # compile + warm with a real fetch
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(g(xd)[:8])
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    per = (ts[k2] - ts[k1]) / (k2 - k1)
    return per if per > 0 else ts[k2] / k2


def config1_cpu_serial():
    from digital_signal_processsing_tpu.harness.profile import benchmark
    from digital_signal_processsing_tpu.golden import moving_average_golden

    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32768, size=1_000_000, dtype=np.int16)
    row = {"config": "cpu_serial_1M_k16"}
    try:
        from digital_signal_processsing_tpu.io import native

        ms = native.bench_moving_average_native(x, 16, 1, warmup=3, rounds=5)
        row["impl"] = "native_cpp"
    except Exception:
        ms = benchmark(lambda: moving_average_golden(x, 16, 1), warmup=2, rounds=3)
        row["impl"] = "numpy_golden"
    row["ms"] = round(ms, 3)
    row["msamples_per_s"] = round(x.size / ms / 1e3, 1)
    return row


def config2_direct_small_windows(n=64_000_000):
    import jax

    from digital_signal_processsing_tpu.ops.pallas_direct import (
        direct_averager_pallas,
    )

    rng = np.random.default_rng(0)
    xd = jax.device_put(rng.integers(-32768, 32768, size=n, dtype=np.int16))
    rows = []
    for w in (4, 16, 64):
        per = _diff_time(lambda y, w=w: direct_averager_pallas(y, w, 2), xd)
        rows.append(
            {
                "config": f"direct_k{w}",
                "n": n,
                "gsamples_per_s": round(n / per / 1e9, 2),
            }
        )
    return rows


def config3_scan_large_windows(n=64_000_000):
    import jax

    from digital_signal_processsing_tpu.ops.pallas_scan import (
        scan_averager_pallas,
        windowed_averager_pallas,
    )

    rng = np.random.default_rng(0)
    xd = jax.device_put(rng.integers(-32768, 32768, size=n, dtype=np.int16))
    rows = []
    for w in (256, 1024, 4096):
        per = _diff_time(lambda y, w=w: scan_averager_pallas(y, w, 2), xd)
        rows.append(
            {
                "config": f"scan_k{w}",
                "n": n,
                "gsamples_per_s": round(n / per / 1e9, 2),
            }
        )
        per = _diff_time(lambda y, w=w: windowed_averager_pallas(y, w, 2), xd)
        rows.append(
            {
                "config": f"windowed_k{w}",
                "n": n,
                "gsamples_per_s": round(n / per / 1e9, 2),
            }
        )
    return rows


def config4_sharded_scan(n=64_000_000):
    import jax

    from digital_signal_processsing_tpu.parallel import (
        make_mesh,
        sharded_moving_average,
        time_sharding,
    )

    ndev = jax.device_count()
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    n = (n // (ndev * 2)) * ndev * 2
    x = rng.integers(-32768, 32768, size=n, dtype=np.int16)
    xd = jax.device_put(x, time_sharding(mesh))
    use_pallas = jax.default_backend() == "tpu"

    rows = []
    for method in ("windowed", "scan"):
        per = _diff_time(
            lambda y, m=method: sharded_moving_average(
                y, 1024, 2, mesh=mesh, use_pallas=use_pallas, method=m
            ),
            xd,
            k1=4,
            k2=16,
            repeats=5,
        )
        rows.append(
            {
                "config": f"sharded_{method}_64M_k1024",
                "devices": ndev,
                "n": n,
                "gsamples_per_s": round(n / per / 1e9, 2),
            }
        )
    return rows


def config5_full_chain(t=1 << 22):
    import jax

    from digital_signal_processsing_tpu.models import ChainConfig, DspChain
    from digital_signal_processsing_tpu.parallel import make_mesh
    from digital_signal_processsing_tpu.parallel.pipeline import sharded_chain_planar

    ndev = jax.device_count()
    rng = np.random.default_rng(0)
    base_cfg = ChainConfig(channels=16, decimation=8)
    t = (t // (ndev * base_cfg.decimation)) * ndev * base_cfg.decimation
    # I/Q as float planes: complex64 host transfer is unimplemented on axon
    xi = rng.normal(size=(16, t)).astype(np.float32)
    xq = rng.normal(size=(16, t)).astype(np.float32)
    n_ch = 2 if ndev % 2 == 0 and ndev > 1 else 1
    mesh = make_mesh(n_time=ndev // n_ch, n_channel=n_ch)
    di, dq = jax.device_put(xi), jax.device_put(xq)

    # K-differential: chain k dependent calls inside one jit so the ~30 ms
    # tunnel dispatch+fetch overhead cancels in the slope (BENCH_NOTES.md).
    import jax.numpy as jnp

    rows = []
    for fused in (False, True):
        chain = DspChain(
            ChainConfig(channels=16, decimation=8, fused_frontend=fused)
        )
        fn = lambda a, b: sharded_chain_planar(chain, a, b, mesh)

        def make(k):
            @jax.jit
            def f(a, b):
                acc = fn(a, b)
                for _ in range(k - 1):
                    acc = fn(a + jnp.sum(acc) * 0, b)
                return acc

            return f

        ts = []
        for k in (1, 3):
            g = make(k)
            np.asarray(g(di, dq)[:, :4])  # compile + fetch
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(g(di, dq)[:, :4])
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        per = max((ts[1] - ts[0]) / 2, 1e-9)
        total_samples = 16 * t
        rows.append(
            {
                "config": "full_chain_16ch"
                + ("_fused_frontend" if fused else ""),
                "devices": ndev,
                "mesh": f"{n_ch}x{ndev // n_ch}",
                "t": t,
                "msamples_per_s_in": round(total_samples / per / 1e6, 1),
                "wall_ms": round(per * 1e3, 2),
            }
        )
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--skip", nargs="*", default=[], help="config numbers to skip")
    args = p.parse_args(argv)
    results = {}
    runners = {
        "1": config1_cpu_serial,
        "2": config2_direct_small_windows,
        "3": config3_scan_large_windows,
        "4": config4_sharded_scan,
        "5": config5_full_chain,
    }
    for num, fn in runners.items():
        if num in args.skip:
            continue
        try:
            results[num] = fn()
        except Exception as e:  # keep going; report the failure
            results[num] = {"error": str(e)[:300]}
        print(json.dumps({num: results[num]}), flush=True)
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
