"""Same-session A/B: int16 windowed kernel vs int32 pair-packed transport.

Settles the round-1 bookkeeping contradiction (BENCH_NOTES kernel table
listed packed at 46.7-57.5 GS/s while claiming "+7-11% over int16"): one
process, one chip session, strictly interleaved measurements (A,B,A,B,...)
with the K-differential protocol, so session-to-session variance (~±30%
through the axon tunnel) cannot split the two rows.

Usage: python benchmarks/ab_packed.py [--n 64000000] [--windows 16,1024,4096]
Emits one JSON row per (window, variant) plus a verdict row per window.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

K_SMALL, K_BIG = 8, 40
REPEATS = 5


def make_chained(fn, k):
    import jax

    @jax.jit
    def chained(v):
        def body(i, y):
            return fn(y)

        return jax.lax.fori_loop(0, k, body, v)

    return chained


def time_once(fn, xd):
    t0 = time.perf_counter()
    np.asarray(fn(xd)[:8])  # tiny fetch forces completion
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64_000_000)
    ap.add_argument("--windows", default="16,1024,4096")
    ap.add_argument("--channels", type=int, default=2)
    args = ap.parse_args()
    windows = [int(w) for w in args.windows.split(",")]

    import jax

    from digital_signal_processsing_tpu.ops.pallas_scan import (
        windowed_averager_packed,
        windowed_averager_pallas,
    )

    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32768, size=args.n, dtype=np.int16)
    xd16 = jax.device_put(x)
    xd32 = jax.device_put(x.view(np.int32))  # host pair view: free

    for w in windows:
        a = make_chained(
            lambda v, w=w: windowed_averager_pallas(v, w, args.channels),
            K_BIG,
        )
        a_s = make_chained(
            lambda v, w=w: windowed_averager_pallas(v, w, args.channels),
            K_SMALL,
        )
        b = make_chained(
            lambda v, w=w: windowed_averager_packed(v, w, args.channels),
            K_BIG,
        )
        b_s = make_chained(
            lambda v, w=w: windowed_averager_packed(v, w, args.channels),
            K_SMALL,
        )
        # compile/warm all four before any timing
        for fn, xd in ((a, xd16), (a_s, xd16), (b, xd32), (b_s, xd32)):
            np.asarray(fn(xd)[:8])
        # strictly interleaved min-of-REPEATS
        t = {"a_big": [], "a_small": [], "b_big": [], "b_small": []}
        for _ in range(REPEATS):
            t["a_big"].append(time_once(a, xd16))
            t["b_big"].append(time_once(b, xd32))
            t["a_small"].append(time_once(a_s, xd16))
            t["b_small"].append(time_once(b_s, xd32))
        rows = {}
        for name, xd in (("int16", xd16), ("packed", xd32)):
            key = "a" if name == "int16" else "b"
            per = (min(t[f"{key}_big"]) - min(t[f"{key}_small"])) / (
                K_BIG - K_SMALL
            )
            sps = args.n / per if per > 0 else float("nan")
            rows[name] = sps
            print(
                json.dumps(
                    {
                        "metric": f"windowed_{name}_k{w}",
                        "value": round(sps / 1e9, 2),
                        "unit": "GS/s",
                    }
                )
            )
        ratio = rows["packed"] / rows["int16"]
        print(
            json.dumps(
                {
                    "metric": f"packed_vs_int16_k{w}",
                    "value": round(ratio, 4),
                    "unit": "x",
                    "verdict": "packed wins" if ratio > 1.0 else "int16 wins",
                }
            )
        )


if __name__ == "__main__":
    main()
