"""Weak-scaling study: time-block-sharded scan at growing mesh sizes.

BASELINE.md target: >=85% weak-scaling efficiency at >=2 hosts. On real
multi-chip hardware this script measures it directly; on a single chip it
degenerates to the 1-device row, and under the virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8 with jax_platforms=cpu)
it exercises the collective path and reports *algorithmic* scaling (virtual
devices share one socket, so treat CPU numbers as a smoke check, not ICI
performance).

Each row holds the per-device problem size fixed (weak scaling): N = d *
per_device samples, window 1024 stereo. Efficiency = throughput(d) /
(d * throughput(1)).

Usage: python benchmarks/weak_scaling.py [--per-device 8000000] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def measure(mesh, n, use_pallas, window=1024, channels=2, k1=2, k2=8):
    import jax

    from digital_signal_processsing_tpu.parallel import (
        sharded_moving_average,
        time_sharding,
    )

    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32768, size=n, dtype=np.int16)
    xd = jax.device_put(x, time_sharding(mesh))

    def chained(k):
        @jax.jit
        def f(v):
            def body(i, y):
                return sharded_moving_average(
                    y, window, channels, mesh=mesh, use_pallas=use_pallas
                )

            return jax.lax.fori_loop(0, k, body, v)

        return f

    ts = {}
    for k in (k1, k2):
        g = chained(k)
        np.asarray(g(xd)[:8])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(g(xd)[:8])
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    per = (ts[k2] - ts[k1]) / (k2 - k1)
    return n / per if per > 0 else n * k2 / ts[k2]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--per-device", type=int, default=8_000_000)
    p.add_argument("--cpu", action="store_true", help="force the virtual CPU mesh")
    args = p.parse_args(argv)

    if args.cpu:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from digital_signal_processsing_tpu.parallel import make_mesh

    ndev = jax.device_count()
    use_pallas = jax.default_backend() == "tpu"
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev]
    base = None
    for d in sizes:
        mesh = make_mesh(n_time=d, devices=np.asarray(jax.devices()[:d]))
        n = args.per_device * d
        sps = measure(mesh, n, use_pallas)
        if base is None:
            base = sps
        eff = sps / (d * base)
        print(
            json.dumps(
                {
                    "devices": d,
                    "n": n,
                    "gsamples_per_s": round(sps / 1e9, 2),
                    "weak_scaling_efficiency": round(eff, 3),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
